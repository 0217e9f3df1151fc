package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.QuoteStream.Quote

class StreamingSpec extends AnyFunSuite with TestSpark {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("bar gate deduplicates same-bar quotes, keeping one per (ticker, bar)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Quote]
    val gated = QuoteStream.barGate(input.toDF())
    val q = gated.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      input.addData(
        Quote("A", ts(0, 1), 100), Quote("A", ts(0, 30), 101), // same bar
        Quote("A", ts(1, 2), 102),                             // next bar
        Quote("B", ts(0, 5), 50))
      q.processAllAvailable()
      val rows = spark.table("gate_out").collect()
      assert(rows.length === 3)
      // keep-first semantics: bar 10:00 for A kept the 100 quote
      val aBar0 = spark.table("gate_out")
        .where(col("ticker") === "A" && minute(col("bar_ts")) === 0).head()
      assert(aBar0.getAs[Double]("price") === 100.0)
    } finally q.stop()
  }

  test("live portfolio engine: streaming micro-batches produce fill-identical output to batch backtest") {
    import graft.exec.PortfolioEngine
    import graft.exec.PortfolioEngine.{Config, Event}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a sequence that exercises every state transition the store must
    // carry across batches: long entry → ratchet arm → take-profit,
    // short entry → stop, time exit, cover, plus a second ticker with
    // interleaved timestamps; slippage on so fill arithmetic is live
    val cfg = Config(slippagePct = 0.001, maxHoldBars = 4)
    def ev(t: String, min: Int, p: Double, a: String, conf: Double = 0.8,
        syn: Boolean = false, atr: Double = 2.0) =
      Event(t, ts(min), p, a, conf, syn, atr, regimeRiskMult = 1.0)
    val seqA = Seq(
      ev("A", 0, 100.0, "BUY"),            // open long
      ev("A", 1, 101.0, "HOLD"),
      ev("A", 2, 103.5, "BUY", syn = true), // ratchet arms (+1.5 ATR), adds lot
      ev("A", 3, 111.0, "HOLD"),           // take-profit exit (>= 110)
      ev("A", 4, 112.0, "SELL"),           // flat + SELL → open short
      ev("A", 5, 118.5, "HOLD"),           // short stop (>= 117.6)
      ev("A", 6, 117.0, "BUY"),            // no-op (flat, BUY opens long)
      ev("A", 7, 116.0, "HOLD"),
      ev("A", 8, 115.0, "HOLD"),
      ev("A", 9, 114.0, "HOLD"),
      ev("A", 10, 113.8, "HOLD"),          // time exit (maxHoldBars=4)
      ev("A", 11, 113.0, "SELL"))          // open short again
    val seqB = Seq(
      ev("B", 0, 50.0, "SELL", conf = 0.4), // open short from flat
      ev("B", 2, 47.0, "HOLD"),             // ratchet arms
      ev("B", 4, 44.0, "BUY", syn = true),  // signal cover
      ev("B", 6, 45.0, "BUY"),              // open long
      ev("B", 8, 42.5, "HOLD"))             // stop loss (<= 42.75)
    val all = (seqA ++ seqB).sortBy(_.ts.getTime)

    val batch = PortfolioEngine.backtest(all.toDF(), cfg).collect()
      .map(r => (r.ticker, r.tradeId, r.action, r.quantity, r.price,
        r.isClose, r.entryTradeId, r.pnl, r.exitReason, r.isSynthetic, r.side))
      .sortBy(x => (x._1, x._2))

    val input = MemoryStream[Event]
    val fills = graft.streaming.LivePortfolio.fills(input.toDS(), cfg)
    val q = fills.writeStream.format("memory").queryName("live_fills")
      .outputMode("append").start()
    try {
      // deliver in FOUR micro-batches split mid-position (ticker order
      // preserved): the state store must carry open lots, armed stops,
      // cash, and the bar counter across batch boundaries
      val chunks = Seq(all.take(5), all.slice(5, 9), all.slice(9, 14), all.drop(14))
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val streamed = spark.table("live_fills").as[PortfolioEngine.ExecRow].collect()
        .map(r => (r.ticker, r.tradeId, r.action, r.quantity, r.price,
          r.isClose, r.entryTradeId, r.pnl, r.exitReason, r.isSynthetic, r.side))
        .sortBy(x => (x._1, x._2))
      assert(batch.nonEmpty && batch.exists(_._6), "fixture must close positions")
      assert(batch.exists(_._11 == "SHORT"), "fixture must exercise shorts")
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()

    // exactly-once persistence: the fills stream through the MERGE sink
    // keyed on (ticker, tradeId); replaying the WHOLE sequence through a
    // fresh stream (fresh checkpoint — the worst replay) converges the
    // table instead of double-counting fills
    val tmp = java.nio.file.Files.createTempDirectory("graft_live_fills")
    val sink = new graft.sources.MergeSink(spark, s"$tmp/fills",
      keyCols = Seq("ticker", "tradeId"), partitionCol = "fill_date")
    def replayAll(): Unit = {
      val in = MemoryStream[Event]
      val fq = graft.streaming.LivePortfolio.upsertFills(
        graft.streaming.LivePortfolio.fills(in.toDS(), cfg), sink,
        java.nio.file.Files.createTempDirectory("graft_live_ckpt").toString)
      try { in.addData(all); fq.processAllAvailable() } finally fq.stop()
    }
    replayAll()
    val once = sink.read().count()
    replayAll() // full duplicate delivery
    assert(once === batch.length.toLong, "sink row count = batch fill count")
    assert(sink.read().count() === once, "replay must collapse, not append")
  }

  test("out-of-order front: events SHUFFLED across micro-batches still match the batch backtest") {
    import graft.exec.PortfolioEngine
    import graft.exec.PortfolioEngine.{Config, Event}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = Config(slippagePct = 0.001, maxHoldBars = 4)
    // same state-transition-heavy shape as the in-order parity test, with
    // seq ids so tied-timestamp ordering is total
    def ev(t: String, min: Int, p: Double, a: String, conf: Double = 0.8,
        syn: Boolean = false) =
      Event(t, ts(min), p, a, conf, syn, atr = 2.0, regimeRiskMult = 1.0,
        seq = min.toLong)
    val base = Seq(
      ev("A", 0, 100.0, "BUY"), ev("A", 1, 101.0, "HOLD"),
      ev("A", 2, 103.5, "BUY", syn = true), ev("A", 3, 111.0, "HOLD"),
      ev("A", 4, 112.0, "SELL"), ev("A", 5, 118.5, "HOLD"),
      ev("A", 6, 117.0, "BUY"), ev("A", 7, 116.0, "HOLD"),
      ev("A", 8, 115.0, "HOLD"), ev("A", 9, 114.0, "HOLD"),
      ev("A", 10, 113.8, "HOLD"), ev("A", 11, 113.0, "SELL"),
      ev("B", 0, 50.0, "SELL", conf = 0.4), ev("B", 2, 47.0, "HOLD"),
      ev("B", 4, 44.0, "BUY", syn = true), ev("B", 6, 45.0, "BUY"),
      ev("B", 8, 42.5, "HOLD"))
    // flush sentinel: far enough ahead that the watermark (max ts − 30m)
    // passes every base event; harmless to the engine (HOLD at the last
    // price, no stop/target/time boundary crossed)
    val sentinel = ev("A", 59, 113.0, "HOLD", conf = 0.0)
    val batch = PortfolioEngine.backtest((base :+ sentinel).toDF(), cfg)
      .collect().map(_.toString).sorted

    val input = MemoryStream[Event]
    val fills = graft.streaming.LivePortfolio.fillsOrdered(
      input.toDS(), cfg, delay = "30 minutes")
    val q = fills.writeStream.format("memory").queryName("ooo_fills")
      .outputMode("append").start()
    try {
      // ADVERSARIAL delivery: one ticker's events shuffled across four
      // micro-batches (the in-order tests' forbidden input) — the
      // watermark buffer must reassemble event-time order before the
      // engine sees anything
      val shuffled = new scala.util.Random(7).shuffle(base)
      shuffled.grouped(5).foreach { c => input.addData(c); q.processAllAvailable() }
      input.addData(Seq(sentinel))
      q.processAllAvailable() // watermark jump + timeout flush
      val streamed = spark.table("ooo_fills")
        .as[PortfolioEngine.ExecRow].collect().map(_.toString).sorted
      assert(batch.nonEmpty && streamed.nonEmpty, "fixture must fill")
      assert(streamed.toSeq === batch.toSeq,
        "shuffled cross-batch delivery must replay to batch parity")
    } finally q.stop()

    // incremental-release scenario: bounded jitter (±2 min) under a
    // 5-minute delay, so the watermark passes events MID-stream and the
    // engine consumes the buffer batch by batch, not in one final flush
    val rng = new scala.util.Random(11)
    val jittered = base.sortBy(ev => ev.ts.getTime + (rng.nextInt(5) - 2) * 60000L)
    val input2 = MemoryStream[Event]
    val q2 = graft.streaming.LivePortfolio.fillsOrdered(
        input2.toDS(), cfg, delay = "5 minutes")
      .writeStream.format("memory").queryName("ooo_fills2")
      .outputMode("append").start()
    try {
      jittered.grouped(4).foreach { c => input2.addData(c); q2.processAllAvailable() }
      val preFlush = spark.table("ooo_fills2").count()
      input2.addData(Seq(sentinel))
      q2.processAllAvailable()
      val streamed2 = spark.table("ooo_fills2")
        .as[PortfolioEngine.ExecRow].collect().map(_.toString).sorted
      assert(streamed2.toSeq === batch.toSeq, "jittered delivery diverged")
      assert(preFlush > 0, "watermark must release fills before the final flush")
    } finally q2.stop()
  }

  test("property: streaming/batch fill parity holds under random sequences and random batch splits") {
    import graft.exec.PortfolioEngine
    import graft.exec.PortfolioEngine.{Config, Event}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(43)
    val actions = Array("BUY", "SELL", "HOLD")
    (1 to 3).foreach { trial =>
      val cfg = Config(slippagePct = 0.001, maxHoldBars = 3 + rng.nextInt(5),
        shortCap = if (rng.nextBoolean()) 0.10 else 0.0)
      // 2 tickers × 40 bars of a jittery random walk with random signals:
      // enough churn to hit entries, adds, stops, targets, time exits,
      // shorts and covers in every trial
      val events = (for {
        t <- Seq("X", "Y")
        i <- 0 until 40
      } yield {
        val drift = if (t == "X") 0.5 else -0.3
        Event(t, ts(i), 100.0 + drift * i + rng.nextGaussian() * 3.0,
          actions(rng.nextInt(3)), 0.3 + rng.nextDouble() * 0.7,
          isSynthetic = rng.nextBoolean(), atr = 1.0 + rng.nextDouble() * 2.0,
          regimeRiskMult = 0.5 + rng.nextDouble())
      }).sortBy(_.ts.getTime)

      val batch = PortfolioEngine.backtest(events.toDF(), cfg).collect()
        .map(_.toString).sorted

      // random batch boundaries (1..6 chunks), ticker-order preserved
      // because `events` is globally time-sorted and splits are prefixes
      val cuts = (Seq(0, events.length) ++
        Seq.fill(rng.nextInt(5))(rng.nextInt(events.length))).distinct.sorted
      val input = MemoryStream[Event]
      val q = graft.streaming.LivePortfolio.fills(input.toDS(), cfg)
        .writeStream.format("memory").queryName(s"fuzz_fills_$trial")
        .outputMode("append").start()
      try {
        cuts.sliding(2).foreach { case Seq(a, b) =>
          if (b > a) { input.addData(events.slice(a, b)); q.processAllAvailable() }
        }
        val streamed = spark.table(s"fuzz_fills_$trial")
          .as[PortfolioEngine.ExecRow].collect().map(_.toString).sorted
        assert(streamed.toSeq === batch.toSeq, s"trial $trial diverged")
        assert(batch.nonEmpty, s"trial $trial produced no fills (weak fixture)")
      } finally q.stop()
    }
  }

  test("gated stream upserts into the MERGE sink: replays collapse on the bar key") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sbars").toString
    val sink = new graft.sources.MergeSink(spark, s"$dir/bars",
      keyCols = Seq("ticker", "bar_ts"), partitionCol = "bar_date")
    val input = MemoryStream[Quote]
    val q = QuoteStream.upsertBars(QuoteStream.barGate(input.toDF()), sink,
      s"$dir/ckpt")
    try {
      input.addData(
        Quote("A", ts(0, 1), 100), Quote("A", ts(0, 30), 101), // same bar
        Quote("B", ts(0, 5), 50))
      q.processAllAvailable()
      input.addData(Quote("A", ts(1, 2), 102)) // next bar, second batch
      q.processAllAvailable()
      val t = sink.read()
      assert(t.count() === 3) // one row per (ticker, bar)
      assert(t.groupBy("ticker", "bar_ts").count()
        .where(col("count") > 1).count() === 0)
    } finally q.stop()
    // simulated checkpoint replay: re-upserting a batch that was already
    // applied must not duplicate (ON CONFLICT semantics)
    val replay = Seq(("A", ts(0, 0), 100.0, ts(0, 1), java.sql.Date.valueOf("2024-01-01")))
      .toDF("ticker", "bar_ts", "price", "ts", "bar_date")
      .select(col("ticker"), col("ts"), col("price"), col("bar_ts"), col("bar_date"))
    val st = sink.upsert(replay.select(sink.read().columns.map(col): _*))
    assert(st.inserted + st.updated === 1 && sink.read().count() === 3)
  }

  test("gated stream upserts into a VersionedTable: converged rows + one version per batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vbars").toString
    val table = new graft.sources.VersionedTable(spark, s"$dir/bars",
      partitionCol = "bar_date")
    val input = MemoryStream[Quote]
    val q = QuoteStream.upsertBarsVersioned(QuoteStream.barGate(input.toDF()),
      table, keyCols = Seq("ticker", "bar_ts"), s"$dir/ckpt")
    try {
      input.addData(
        Quote("A", ts(0, 1), 100), Quote("A", ts(0, 30), 101), // same bar
        Quote("B", ts(0, 5), 50))
      q.processAllAvailable()
      input.addData(Quote("A", ts(1, 2), 102)) // next bar, second batch
      q.processAllAvailable()
      val t = table.read()
      assert(t.count() === 3) // one row per (ticker, bar)
      assert(t.groupBy("ticker", "bar_ts").count()
        .where(col("count") > 1).count() === 0)
      // snapshot history: each micro-batch committed exactly one version,
      // and the pre-second-batch snapshot is still readable (time travel)
      assert(table.history().length === 2)
      assert(table.readAt(1).count() === 2)
    } finally q.stop()
  }

  test("sliding window stats aggregate the stream by event time") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Quote]
    val agg = QuoteStream.slidingStats(input.toDF())
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      input.addData((0 until 20).map(i => Quote("A", ts(i), 100 + i)): _*)
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      assert(rows.nonEmpty)
      // a 10-minute window sliding by 5 covers each quote twice
      val totalN = rows.map(_.getAs[Long]("n")).sum
      assert(totalN === 40)
    } finally q.stop()
  }

  test("vol alerts fire on a spike and stay quiet on calm data") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Quote]
    val alerts = QuoteStream.volAlerts(input.toDS(), k = 3.0)
    val q = alerts.writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").start()
    try {
      // calm phase: tiny oscillation builds EWMA state
      val calm = (0 until 30).map(i =>
        Quote("A", ts(i), 100 + 0.01 * (i % 2)))
      input.addData(calm: _*)
      q.processAllAvailable()
      assert(spark.table("alerts_out").isEmpty)
      // spike: +5% jump after ~0.01% moves
      input.addData(Quote("A", ts(31), 105.0))
      q.processAllAvailable()
      val out = spark.table("alerts_out").collect()
      assert(out.length === 1)
      assert(out.head.getAs[String]("ticker") === "A")
      assert(out.head.getAs[Double]("ret") > 0.04)
      // state persists across batches: follow-up calm quote, no new alert
      input.addData(Quote("A", ts(32), 105.0))
      q.processAllAvailable()
      assert(spark.table("alerts_out").count() === 1)
    } finally q.stop()
  }

  test("session_window aggregation: streaming (complete mode) matches the q188 batch expression") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // q188's session expression minus countDistinct (exact distinct is
    // unsupported in streaming aggregation); sessions split at > 30 min
    // gaps, merge at <= 30 min (the boundary is INCLUSIVE — an exactly-
    // 30-min gap merges; this case pins the oracle's `> 1800000000`
    // break rule), and one user's sessions never leak into another's. Events arrive across THREE micro-batches, out of order
    // within a user, so session-merge state must carry between batches.
    import StreamingSpec.Ev
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), graft.queries.Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"),
        col("n_events"), col("sum_value"))
    val evs = Seq(
      Ev(1, ts(0), 1.0), Ev(1, ts(29), 2.0),   // merges: 29 min gap
      Ev(1, ts(59), 4.0),                      // merges again (session 0..59+30)
      Ev(1, ts(95), 8.0),                      // 36 min gap -> new session
      Ev(2, ts(0), 16.0), Ev(2, ts(30), 32.0), // exactly 30 min -> MERGES (inclusive)
      Ev(2, ts(60, 1), 64.0))                  // 30:01 gap -> new session
    val batch = agg(evs.toDF()).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).sortBy(x => (x._1, x._2.getTime))
    assert(batch.map(x => (x._1, x._4, x._5)).toSeq ===
      Seq((1L, 3L, 7.0), (1L, 1L, 8.0), (2L, 2L, 48.0), (2L, 1L, 64.0)))

    val input = MemoryStream[Ev]
    val q = agg(input.toDF()).writeStream.format("memory")
      .queryName("sess_out").outputMode("complete").start()
    try {
      input.addData(evs(0), evs(4))             // batch 1: session openers
      q.processAllAvailable()
      input.addData(evs(2), evs(6), evs(5))     // batch 2: out-of-order merges
      q.processAllAvailable()
      input.addData(evs(1), evs(3))             // batch 3: bridge + new session
      q.processAllAvailable()
      val stream = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).sortBy(x => (x._1, x._2.getTime))
      assert(stream.toSeq === batch.toSeq)
    } finally q.stop()
  }
}

object StreamingSpec {
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
}
