package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.math.{BigDecimal => JBig}

/** Halo-exchange rolling windows — per-key sliding frames whose
  * parallelism scales with ROWS, not with distinct partition keys.
  *
  * `Window.partitionBy(ticker)` puts each ticker's entire history in ONE
  * task. The reference works on a handful of tickers
  * (/root/reference/etl/time_series_feature_builder.py:71-290 iterates a
  * small universe), so at 100 TB a 5-ticker window stage serializes the
  * whole job onto 5 cores no matter how many executors exist. This
  * operator restores row-proportional parallelism for bounded
  * `rowsBetween(lo, hi)` frames (lo <= hi <= 0):
  *
  *   1. ONE range shuffle on (key, t, seq) through an explicitly built
  *      RangePartitioner — its bounds are sampled once on the driver and
  *      shared by every job below (`repartitionByRange` would re-sample
  *      per job and the jobs would disagree on partitioning; the shuffle
  *      output itself is reused across jobs via lineage);
  *   2. a tiny metadata job collects, per (partition, key): the row
  *      count and the last h rows (h = frame depth). The driver turns
  *      counts into per-key start offsets (-> dense per-key row index
  *      with NO per-key window) and boundary tails into the "halo" each
  *      partition must prepend to a key continued from earlier
  *      partitions. Collected size is O(partitions * keys-per-partition
  *      * h) — broadcast back;
  *   3. each partition streams its sorted rows once with an O(h)
  *      ring buffer of exact decimal prefix sums — no second shuffle,
  *      no row duplication.
  *
  * Exactness: quantization happens in Spark expressions BEFORE the
  * kernel — x itself on the raw (38,6) grid, the higher moments as
  * GRID-EXACT integer products (Det.qfloor at grid2/grid3, multiplied
  * as DECIMAL(38,0) — no lossy double→decimal rounding of a computed
  * product, the q83 tie class). The kernel only adds/subtracts
  * BigDecimals, which is exact and order-independent — so results are
  * hash-identical to the same grid-exact plain-window expressions
  * (spec: ChunkedWindowSpec). s2/s3 are divided back by grid²/grid³
  * in-kernel, so callers see value semantics.
  * Null x follows plain-window semantics: excluded from `n` (count(x))
  * and the sums (a null row contributes zero via coalesce, never a null
  * BigDecimal), sums go null when the frame has no non-null x, and
  * `prev` (lag 1) passes the previous row's null through.
  */
object ChunkedWindow {

  /** Row entering the kernel: pre-quantized decimal moments of x (public
    * only because Spark codegen must construct it). Null x arrives as
    * `x = None, c = 0` with the decimals coalesced to ZERO — the kernel
    * never sees a null BigDecimal, and `c` is the prefix-countable
    * "counts toward count(x)" flag. */
  case class Raw(key: String, t: Long, seq: Long, x: Option[Double],
      c: Long, d1: JBig, d2: JBig, d3: JBig)

  /** Kernel output: frame count, exact decimal moment sums (as the same
    * doubles `sum(dec).cast("double")` yields), and the 1-row lag.
    * Matches plain-window null semantics: `n` counts NON-NULL x in the
    * frame, sums are None when the frame holds no non-null x, `prev` is
    * the previous row's x (None when that x is null or no row exists). */
  final case class Moments(key: String, seq: Long, x: Option[Double],
      prev: Option[Double], n: Long,
      s1: Option[Double], s2: Option[Double], s3: Option[Double])

  private case class Halo(x: Option[Double], c: Long, d1: JBig, d2: JBig, d3: JBig)

  /** Rolling moments of `xCol` over `rowsBetween(lo, hi)` per `keyCol`,
    * ordered by (`tCol`, `seqCol`). Requires lo <= hi <= 0. Returns
    * columns: key, seq, x, prev (lag 1), n, s1 (Σ dec6(x)), s2 (grid-
    * exact Σx² on the grid2 grid), s3 (grid-exact Σx³ on grid3) — sums
    * as doubles, null when the frame is empty. `numPartitions` defaults to
    * spark.sql.shuffle.partitions — size it to the data, not the keys.
    */
  def rollingMoments(df: DataFrame, keyCol: String, tCol: String,
      seqCol: String, xCol: String, lo: Int, hi: Int,
      numPartitions: Int = 0,
      scale1: Int = 6, grid2: Double = 1e6, grid3: Double = 1e4): Dataset[Moments] = {
    require(lo <= hi && hi <= 0, s"need lo <= hi <= 0, got [$lo, $hi]")
    val h = math.max(-lo, 1) // look-back depth; >= 1 so `prev` is present
    val spark = df.sparkSession
    import spark.implicits._

    val x = col(xCol)
    def dec(c: org.apache.spark.sql.Column, s: Int) =
      coalesce(c.cast(s"decimal(38,$s)"), lit(0).cast(s"decimal(38,$s)"))
    val dec0 = "decimal(38,0)"
    def pw(g: Double, p: Int) = {
      val q = graft.queries.Det.qfloor(x, g).cast(dec0)
      coalesce((1 until p).foldLeft(q)((acc, _) => acc * q),
        lit(0).cast(dec0))
    }
    val div2 = grid2 * grid2
    val div3 = grid3 * grid3 * grid3
    val base = df.select(
      col(keyCol).cast("string").as("key"),
      col(tCol).cast("long").as("t"),
      col(seqCol).cast("long").as("seq"),
      x.cast("double").as("x"),
      x.isNotNull.cast("long").as("c"),
      dec(x, scale1).as("d1"),
      pw(grid2, 2).as("d2"),
      pw(grid3, 3).as("d3"))

    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = base.as[Raw].rdd.map(r => ((r.key, r.t, r.seq), r))
    // bounds are sampled from a 3-column projection: the sampling job
    // prunes the parquet scan to (key, t, seq) and skips the decimal
    // moment casts entirely — only the real shuffle pays for them
    val light = df.select(
      col(keyCol).cast("string"), col(tCol).cast("long"), col(seqCol).cast("long"))
      .as[(String, Long, Long)].rdd.map(k => (k, ()))
    val part = new org.apache.spark.RangePartitioner(p, light)
    val sorted = keyed.repartitionAndSortWithinPartitions(part).map(_._2)

    // metadata pass: per (partition, key) -> (count, last h rows)
    val meta = sorted.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[String, (Long, scala.collection.mutable.ArrayDeque[Halo])]
      it.foreach { r =>
        val (cnt, tail) = m.getOrElseUpdate(r.key,
          (0L, scala.collection.mutable.ArrayDeque.empty[Halo]))
        tail.append(Halo(r.x, r.c, r.d1, r.d2, r.d3))
        if (tail.length > h) tail.removeHead()
        m.update(r.key, (cnt + 1L, tail))
      }
      m.iterator.map { case (k, (n, tail)) => (pid, k, n, tail.toArray) }
    }.collect()
    // driver-side by design: one row per (partition, key-run) — at most
    // p + #keys entries, each carrying ≤ h halo rows. For p=1000 tasks,
    // 10k keys, h=126 that is ~11k × 126 small structs (a few MB), and
    // it does NOT grow with fact rows. The guard enforces the bound.
    require(meta.length <= 1000000,
      s"halo metadata unexpectedly large (${meta.length} partition-key runs)")

    // driver: per-key cumulative offsets + the halo rows partition p must
    // prepend for key k (the last min(h, startRn) rows from earlier pids)
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    val halos = scala.collection.mutable.HashMap.empty[(Int, String), Array[Halo]]
    meta.groupBy(_._2).foreach { case (k, rows) =>
      var acc = 0L
      val carry = scala.collection.mutable.ArrayDeque.empty[Halo]
      rows.sortBy(_._1).foreach { case (pid, _, n, tail) =>
        offsets((pid, k)) = acc
        if (acc > 0) halos((pid, k)) = carry.toArray // length = min(h, acc)
        acc += n
        if (n >= h) { carry.clear(); carry.appendAll(tail) }
        else {
          carry.appendAll(tail)
          while (carry.length > h) carry.removeHead()
        }
      }
    }
    val bOffsets = spark.sparkContext.broadcast(offsets.toMap)
    val bHalos = spark.sparkContext.broadcast(halos.toMap)

    // kernel: one streaming pass per partition, O(h) ring of prefix sums
    val out = sorted.mapPartitionsWithIndex { (pid, it) =>
      val offs = bOffsets.value
      val hls = bHalos.value
      val ring = h + 2 // prefix sums P(i-h-1..i) kept mod `ring`
      val p1 = new Array[JBig](ring)
      val p2 = new Array[JBig](ring)
      val p3 = new Array[JBig](ring)
      val pc = new Array[Long](ring) // prefix count of NON-NULL x
      val xs = new Array[Option[Double]](ring) // last rows' x for `prev`
      var curKey: String = null
      var rn = 0L // per-key global row index of the NEXT row
      var i = 0L // local index including halo (prefix P(i) at slot i%ring)

      def push(x: Option[Double], cnt: Long, d1: JBig, d2: JBig, d3: JBig): Unit = {
        val s = ((i + 1) % ring).toInt
        val c = (i % ring).toInt
        p1(s) = p1(c).add(d1); p2(s) = p2(c).add(d2); p3(s) = p3(c).add(d3)
        pc(s) = pc(c) + cnt
        xs(s) = x
        i += 1
      }

      it.flatMap { r =>
        if (r.key != curKey) {
          curKey = r.key
          rn = offs((pid, r.key))
          i = 0
          p1(0) = JBig.ZERO; p2(0) = JBig.ZERO; p3(0) = JBig.ZERO; pc(0) = 0L
          hls.get((pid, r.key)).foreach(_.foreach(t => push(t.x, t.c, t.d1, t.d2, t.d3)))
        }
        push(r.x, r.c, r.d1, r.d2, r.d3)
        // this row sits at local prefix index i (P(i) includes it);
        // frame [rn+lo, rn+hi] -> prefix range (i + lo', i + hi'] with
        // clipping at the key's first row (rn = 0)
        val rows = (rn + hi) - math.max(rn + lo, 0L) + 1 // frame size in ROWS
        val prev = if (rn > 0) xs(((i - 1) % ring).toInt) else None
        val m =
          if (rows <= 0) Moments(r.key, r.seq, r.x, prev, 0, None, None, None)
          else {
            val hiP = ((i + hi) % ring).toInt // hi <= 0: within ring
            val loP = ((i + hi - rows) % ring).toInt
            val n = pc(hiP) - pc(loP) // count(x): nulls excluded
            if (n == 0) Moments(r.key, r.seq, r.x, prev, 0, None, None, None)
            else Moments(r.key, r.seq, r.x, prev, n,
              Some(p1(hiP).subtract(p1(loP)).doubleValue),
              Some(p2(hiP).subtract(p2(loP)).doubleValue / div2),
              Some(p3(hiP).subtract(p3(loP)).doubleValue / div3))
          }
        rn += 1
        Seq(m)
      }
    }
    spark.createDataset(out)
  }
}
