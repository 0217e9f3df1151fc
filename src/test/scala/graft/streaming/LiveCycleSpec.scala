package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.AutoTrader
import graft.sources.SyntheticSource

class LiveCycleSpec extends AnyFunSuite with TestSpark {

  test("streaming live cycle matches batch auto-trader fill-for-fill through the MERGE sink") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bars = SyntheticSource.generate(spark, Seq("A1", "A2"), 160, seed = 19)
      .toDF().cache()
    val cycles = 5
    // permissive decision stack (diagnostic risk mode, loose signal
    // thresholds, no quant gate) so the short fixture actually trades —
    // parity on zero fills is vacuous; the same configs feed BOTH modes
    val mode = Some(AutoTrader.RiskPolicy.diagnostic)
    val sigCfg = graft.signals.SignalGenerator.Config(
      minExpectedReturn = 0.0002, minConfidence = 0.15, minSnr = 0.05)
    val gateCfg: Option[graft.signals.QuantGate.Config] = None

    // batch mode: the reference cycle loop, fills exposed
    val (results, batchFillsDf) = AutoTrader.runDetailed(spark, bars, cycles,
      sigCfg = sigCfg, gateCfg = gateCfg, riskMode = mode)
    val cols = Seq("ticker", "tradeId", "action", "quantity", "price",
      "isClose", "entryTradeId", "pnl", "exitReason", "isSynthetic", "side")
    val batchFills = batchFillsDf.select(cols.map(col): _*)
      .collect().map(_.toString).sorted
    assert(results.size === cycles)
    assert(batchFills.nonEmpty,
      "fixture produced no fills — parity would be vacuous")

    // streaming mode: same bars as a stream, same configs; the batch
    // loop's first cycle sees (dates − cycles + 1) bars of history
    val nDates = graft.etl.Splitter.distinctDates(bars).length
    val minBars = nDates - cycles + 1
    val src = bars
      .select($"ticker", $"date".as("ts"), $"close", $"high", $"low")
      .as[LiveCycle.Bar].collect().sortBy(b => (b.ts.getTime, b.ticker))

    val input = MemoryStream[LiveCycle.Bar]
    val fills = LiveCycle.fills(input.toDS(), minBars,
      sigCfg = sigCfg, gateCfg = gateCfg, riskMode = mode)
    // full §3.2 loop: bars → forecast → signal → gate → engine → MERGE
    // sink, exactly-once on (ticker, tradeId)
    val tmp = java.nio.file.Files.createTempDirectory("graft_livecycle")
    val sink = new graft.sources.MergeSink(spark, s"$tmp/fills",
      keyCols = Seq("ticker", "tradeId"), partitionCol = "fill_date")
    val q = LivePortfolio.upsertFills(fills, sink, s"$tmp/ckpt")
    try {
      // three micro-batches, cut mid-cycle (prefix splits of the global
      // time order keep the per-ticker order contract)
      val cut = src.length / 3
      Seq(src.take(cut), src.slice(cut, 2 * cut), src.drop(2 * cut))
        .foreach { c => input.addData(c); q.processAllAvailable() }
      val streamed = sink.read().select(cols.map(col): _*)
        .collect().map(_.toString).sorted
      assert(streamed.toSeq === batchFills.toSeq,
        "streaming cycle diverged from the batch auto-trader")
    } finally q.stop()
  }
}
