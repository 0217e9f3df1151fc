package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed keys — the portable answer when one key holds a
  * disproportionate share of rows (a hot ticker, an empty-string
  * join key, the "the quick brown fox" shingle): a shuffle hashes by
  * key, so the hot key's entire volume lands on ONE task no matter how
  * many executors exist.
  *
  * First resort at runtime is AQE's OptimizeSkewedJoin (splits oversized
  * sort-merge partitions after measuring them); salting is the
  * plan-level technique that also covers aggregations and the cases AQE
  * cannot re-plan (e.g. a skewed groupBy feeding a window, bucketed
  * joins that bypass exchanges). Both patterns preserve results exactly:
  *
  *  - [[saltedJoin]]: dim rows replicate `salts` times (dim × salts
  *    stays tiny), fact rows get a deterministic per-row salt, and the
  *    join key becomes (key, salt) — the hot key spreads over `salts`
  *    tasks.
  *  - [[saltedAgg]]: two-stage aggregation — partial aggregate on
  *    (key, salt), final re-aggregate on key. The classic hot-key
  *    groupBy fix (map-side combine already helps; the salt stage caps
  *    the reducer-side hot partition too).
  */
object SkewSalt {

  /** Deterministic per-row salt in [0, salts): hash of the whole row, so
    * a retry computes the same spread (no rand() — task retries must
    * not re-deal rows or counts drift). */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong)).cast("int")

  /** Inner equi-join of a skewed fact against a small dim with the key
    * spread over `salts` sub-keys. Result rows identical to
    * `fact.join(dim, keys)`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, salts))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }

  /** Inner equi-join where BOTH sides are large (fact × fact, including
    * self-joins — q51's shingle pair generation): neither side can
    * replicate per-salt like [[saltedJoin]]'s dim, so each side gets a
    * deterministic group in [0, groups) and is replicated across the
    * OTHER side's group axis; the join key becomes (keys, ga, gb). A
    * matching row pair meets exactly once — at (ga(left row), gb(right
    * row)) — so the result is row-identical to `left.join(right, keys)`,
    * while a hot key's work spreads over groups² tasks for a groups×
    * replication cost per side. Use when the hot key's quadratic output
    * is inherent (exact all-pairs) and only the BALANCE can be fixed.
    * The two sides must have disjoint non-key column names. */
  def saltedFactFactJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      groups: Int = 8): DataFrame = {
    val l = left.withColumn("__ga", rowSalt(left, groups))
      .withColumn("__gb", explode(sequence(lit(0), lit(groups - 1))))
    val r = right.withColumn("__gb", rowSalt(right, groups))
      .withColumn("__ga", explode(sequence(lit(0), lit(groups - 1))))
    l.join(r, keys ++ Seq("__ga", "__gb")).drop("__ga", "__gb")
  }

  /** [[saltedFactFactJoin]] with the salt tax paid ONLY where it buys
    * balance: a sampled per-key frequency histogram (one cheap agg over
    * a `sampleFraction` sample of each side) finds the hot keys first,
    * and the join splits BY KEY — hot keys through the two-sided grid
    * salt, everything else through the plain equi-join. With no hot key
    * the plain join is returned untouched, so unskewed data pays only
    * the sampled histogram instead of the blanket groups× replication
    * (which cost q51 ~2× on unskewed sf0.1 data).
    *
    * A key is flagged hot when its sampled count implies ≥
    * `hotRowThreshold` rows on a side (≥ hotRowThreshold² join pairs) —
    * detection at half the expected sampled count, so a genuinely hot
    * key is caught with high probability while a false positive merely
    * pays the salt tax on one key. The hot set is bounded by
    * construction (each hot key carries ≥ threshold rows, so there are
    * at most |rows|/threshold of them) and is broadcast to both arms;
    * hotness is a property of the KEY, so no hot-cold cross pair exists
    * and the two arms partition the output exactly. */
  def adaptiveSaltedFactFactJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], groups: Int = 8, hotRowThreshold: Long = 1000L,
      sampleFraction: Double = 0.05, seed: Long = 42L,
      selfJoin: Boolean = false): DataFrame = {
    val kCols = keys.map(col)
    val cut = sampleFraction * hotRowThreshold * 0.5
    // Detection resolution: with cut < ~5 a key seen once or twice in
    // the sample is flagged hot, so nearly EVERY distinct key would be
    // collected to the driver and blanket-salted — the opposite of the
    // adaptive intent, plus a driver-OOM risk. Fail loud instead of
    // silently degrading (raise sampleFraction or hotRowThreshold).
    require(cut >= 5.0,
      s"adaptive salt under-resolved: sampleFraction*hotRowThreshold/2 = $cut < 5 " +
        "flags near-singleton sampled keys as hot (driver-side hot-set blowup); " +
        "raise sampleFraction or hotRowThreshold")
    def hotOf(df: DataFrame) = df.sample(withReplacement = false, sampleFraction, seed)
      .groupBy(kCols: _*).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= cut).select(kCols: _*)
    // selfJoin: both sides carry the same key multiset (q51's shingle
    // self-join) — one sampled histogram covers both and skips a full
    // second scan of the input pipeline. The collect is belt-and-braces
    // bounded: beyond maxHotKeys the "hot minority" premise is wrong
    // (broadcast + per-key salting no longer fit) — fail loud.
    val maxHotKeys = 100000
    val hot =
      (if (selfJoin) hotOf(left)
       else hotOf(left).union(hotOf(right)).distinct())
        .limit(maxHotKeys + 1).collect()
    require(hot.length <= maxHotKeys,
      s"adaptive salt found > $maxHotKeys hot keys — skew is not a minority " +
        "of keys here; use saltedFactFactJoin (blanket salt) or repartition")
    if (hot.isEmpty) left.join(right, keys)
    else {
      val s = left.sparkSession
      val hotDf = broadcast(s.createDataFrame(
        java.util.Arrays.asList(hot: _*), left.select(kCols: _*).schema))
      val lh = left.join(hotDf, keys, "left_semi")
      val lc = left.join(hotDf, keys, "left_anti")
      val rh = right.join(hotDf, keys, "left_semi")
      val rc = right.join(hotDf, keys, "left_anti")
      lc.join(rc, keys).unionByName(saltedFactFactJoin(lh, rh, keys, groups))
    }
  }

  /** Two-stage skew-safe aggregation: sums/counts named in `sums` /
    * `counts` over `keys`, numerically identical to the direct groupBy
    * (sum re-association only — integer/decimal sums are exact; for
    * doubles route through decimal like the rest of the engine). */
  def saltedAgg(df: DataFrame, keys: Seq[String], sums: Seq[String],
      counts: Boolean = true, salts: Int = 16): DataFrame = {
    val partialAggs =
      sums.map(c => sum(col(c)).as(s"__s_$c")) ++
        (if (counts) Seq(count(lit(1)).as("__n")) else Seq.empty)
    val partial = df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sums.map(c => sum(col(s"__s_$c")).as(s"sum_$c")) ++
        (if (counts) Seq(sum(col("__n")).as("n")) else Seq.empty)
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
