package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.SkewSalt

class SkewSaltSpec extends AnyFunSuite with TestSpark {

  test("salted join/agg are exact under heavy skew and actually spread the hot key") {
    val s = spark; import s.implicits._
    // 90% of rows on ONE key — the shape that serializes a plain shuffle
    val fact = (1 to 50000).map { i =>
      val k = if (i % 10 == 0) s"T${i % 7}" else "HOT"
      (k, i.toLong, (i % 997) * 1L)
    }.toDF("ticker", "seq", "qty")
    val dim = (Seq("HOT") ++ (0 until 7).map(i => s"T$i"))
      .zipWithIndex.map { case (t, i) => (t, s"sector$i") }.toDF("ticker", "sector")

    val salted = SkewSalt.saltedJoin(fact, dim, Seq("ticker"), salts = 8)
    val plain = fact.join(dim, Seq("ticker"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)

    // the hot key really is spread: its rows carry >1 distinct salt
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(8L)).cast("int"))
      .where($"ticker" === "HOT").select("__salt").distinct().count()
    assert(spread === 8)

    // fact×fact two-sided salting (the self-join case saltedJoin can't
    // cover — no small side to replicate per-salt): row-identical to the
    // plain join, including the hot key's full quadratic pair set, and
    // each matching pair meets exactly ONCE (no dup from replication)
    val left = fact.select($"ticker", $"seq".as("la"), $"qty".as("qa"))
      .where($"seq" % 100 === 0)
    val right = fact.select($"ticker", $"seq".as("lb"), $"qty".as("qb"))
      .where($"seq" % 100 === 50)
    val ff = SkewSalt.saltedFactFactJoin(left, right, Seq("ticker"), groups = 4)
    val ffPlain = left.join(right, Seq("ticker"))
    assert(ff.count() === ffPlain.count())
    assert(ff.exceptAll(ffPlain).count() === 0)
    assert(ffPlain.exceptAll(ff).count() === 0)
    // plan-shape guard: the physical join must key on the salt axes too
    // (a regression to a bare-key join would silently re-concentrate the
    // hot key on one task while still returning correct rows)
    val ffPlan = ff.queryExecution.executedPlan.toString
    assert(ffPlan.contains("__ga") && ffPlan.contains("__gb"),
      "salted fact-fact join lost its salt keys")

    // ADAPTIVE fact×fact: the HOT key (90% of rows, far past the sampled
    // threshold) must be detected and routed through the salted arm;
    // result stays row-identical to the plain join
    val aff = SkewSalt.adaptiveSaltedFactFactJoin(left, right, Seq("ticker"),
      groups = 4, hotRowThreshold = 50, sampleFraction = 0.5)
    assert(aff.exceptAll(ffPlain).count() === 0)
    assert(ffPlain.exceptAll(aff).count() === 0)
    val affPlan = aff.queryExecution.executedPlan.toString
    assert(affPlan.contains("__ga") && affPlan.contains("__gb"),
      "adaptive join did not salt the hot key")

    // unskewed input → NO salt arm at all: the plain join comes back
    // untouched (the whole point — no blanket replication tax)
    val flatL = (1 to 2000).map(i => (s"K${i % 500}", i.toLong)).toDF("ticker", "la")
    val flatR = (1 to 2000).map(i => (s"K${i % 500}", i.toLong)).toDF("ticker", "lb")
    val flat = SkewSalt.adaptiveSaltedFactFactJoin(flatL, flatR, Seq("ticker"),
      groups = 4, hotRowThreshold = 1000, sampleFraction = 0.5)
    val flatPlan = flat.queryExecution.executedPlan.toString
    assert(!flatPlan.contains("__ga"), "unskewed input must not pay the salt tax")
    assert(flat.exceptAll(flatL.join(flatR, Seq("ticker"))).count() === 0)

    // two-stage aggregation: bit-identical (long sums are exact)
    val direct = fact.groupBy($"ticker")
      .agg(sum($"qty").as("sum_qty"), count(lit(1)).as("n"))
    val twoStage = SkewSalt.saltedAgg(fact, Seq("ticker"), Seq("qty"), salts = 8)
      .withColumnRenamed("sum_qty", "sum_qty")
    assert(twoStage.select("ticker", "sum_qty", "n")
      .exceptAll(direct.select("ticker", "sum_qty", "n")).count() === 0)
    assert(direct.select("ticker", "sum_qty", "n")
      .exceptAll(twoStage.select("ticker", "sum_qty", "n")).count() === 0)
  }

  test("adaptive salt × AQE: row-identical with adaptive on and off, and no AQE skew-split fires on the salted arm") {
    val s = spark; import s.implicits._
    // same heavy-skew fixture as above: 90% of rows on HOT
    val fact = (1 to 50000).map { i =>
      val k = if (i % 10 == 0) s"T${i % 7}" else "HOT"
      (k, i.toLong, (i % 997) * 1L)
    }.toDF("ticker", "seq", "qty")
    val left = fact.select($"ticker", $"seq".as("la")).where($"seq" % 100 === 0)
    val right = fact.select($"ticker", $"seq".as("lb")).where($"seq" % 100 === 50)
    def run() = SkewSalt.adaptiveSaltedFactFactJoin(left, right, Seq("ticker"),
      groups = 4, hotRowThreshold = 50, sampleFraction = 0.5)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.select($"ticker", $"la", $"lb").as[(String, Long, Long)]
        .collect().sorted.toSeq
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key)
    try {
      // Both the manual grid salt and AQE's OptimizeSkewedJoin target
      // the same skew; they must COMPOSE, not conflict. The grid salt
      // runs at plan-build time, so by the time AQE sees runtime
      // partition sizes the hot key is already spread across
      // groups² salt cells — AQE should find nothing to split on the
      // salted arm (its skew marker stays absent), and the result must
      // not depend on whether AQE re-plans around it.
      s.conf.set(key, "true")
      val dfOn = run()
      val on = rowsOf(dfOn) // collect first: AQE finalizes plans lazily
      val finalPlan = dfOn.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("skew=true"),
        "AQE skew-split fired inside the salted arm — the grid salt and " +
          "AQE are double-handling the same key")
      s.conf.set(key, "false")
      val off = rowsOf(run())
      assert(on === off,
        "adaptive salt results depend on spark.sql.adaptive.enabled")
      // the multiset equality above is the exactly-once-pair-meeting
      // guarantee: it holds against the plain join too
      val plain = rowsOf(left.join(right, Seq("ticker")))
      assert(on === plain)
    } finally s.conf.set(key, prev)
  }
}
