package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall times.
  *
  * Method: a warm-up pass (JVM/JIT + codegen + parquet footer caches)
  * over every query at sf0.001, then each query timed REPS times (≥3 by
  * default) with a `noop` sink so the FULL result is materialized (a
  * bare count() would let Catalyst prune the projections measured).
  * Reported value = MIN across reps: single-shot timings on a shared
  * 32-thread box showed 6× phantom swings (r5's q88) from GC/scheduler
  * noise; the minimum is the standard steady-state estimator.
  *
  * Reps are interleaved ROUND-ROBIN across queries (pass 1 runs every
  * query once, then pass 2, then pass 3) rather than back-to-back per
  * query: three consecutive reps all land inside a single sustained
  * load burst on a shared box (r6's q51 reported 7.81 s vs 2.04 s on a
  * quiet rerun), while passes spread each query's samples minutes apart
  * so the min survives bursts shorter than a full pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execOn(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def exec(name: String): Unit = execOn(name, sfDir)

    // Warm-up: run EVERY query once against the tiny sf0.001 tables.
    // Whole-stage codegen classes are cached by generated source, which
    // depends on the plan shape, not the input path — so this compiles
    // (Janino + JIT) every query's code up front and the timed single-shot
    // runs below measure dataflow, not compilation (~0.5-1 s per query
    // otherwise). Also covers the ChunkedWindow halo kernel's JIT.
    // optional dev filter: bench only the named queries (comma-separated)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    names.foreach { q =>
      try execOn(q, warmDir) catch { case _: Throwable => () }
    }
    // Warm the TARGET sf dir's file listings / parquet footers / page
    // cache with one cheap scan per table, so the first timed query
    // measures its dataflow rather than cold metadata IO.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }

    // The timed work-list: every SparkEntry query, plus (unfiltered runs
    // only) the end-to-end ETL pipeline at the reference's published scale
    // (2 tickers × 1006 bars = 2,012 rows — BASELINE.md "full pipeline"
    // rows): extraction (synthetic, the no-network stand-in) → validate
    // → preprocess → features → split/normalize → parquet stage writes.
    val work = scala.collection.mutable.ArrayBuffer.empty[(String, () => Unit)]
    names.foreach { name => work += name -> (() => exec(name)) }
    if (only.isEmpty) {
      val etlTmp = java.nio.file.Files.createTempDirectory("graft_bench_etl").toString
      // extraction is a CACHE-HIT read (parquet written once, outside the
      // clock) to match the baseline row's condition — its ~25 s cold row
      // is network-bound, which the sandbox can't reproduce
      graft.sources.SyntheticSource
        .generate(spark, Seq("AAPL", "MSFT"), 1006, seed = 3).toDF()
        .write.mode("overwrite").parquet(s"$etlTmp/cache")
      work += "etl_pipeline_2012" -> (() =>
        graft.pipeline.EtlPipeline.run(spark,
          spark.read.parquet(s"$etlTmp/cache"),
          graft.pipeline.EtlPipeline.Config(outDir = s"$etlTmp/out")))
    }

    // Fail FAST on short-key collisions (two q114_* variants): the same
    // invariant is re-checked at emit time, but catching it here aborts
    // before any rep is spent rather than after the full timing loop.
    locally {
      def sn(n: String): String = if (n.startsWith("q")) n.takeWhile(_ != '_') else n
      val dup = work.map(w => sn(w._1)).groupBy(identity).filter(_._2.size > 1).keys
      require(dup.isEmpty, s"short bench keys collide: ${dup.mkString(",")}")
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    val lastDur = scala.collection.mutable.Map.empty[String, Double]
    // Passes are the OUTER loop (round-robin): each query's reps sample
    // temporally spread points, so a contention burst shorter than one
    // full pass (~60 s at sf0.1) can inflate at most one rep per query.
    (1 to reps).foreach { _ =>
      work.foreach { case (name, body) =>
        val t0 = System.nanoTime()
        // Failures must be LOUD on stderr AND visible in the machine-read
        // JSON (a swallowed exception reads as a suspiciously fast query —
        // the round-3 q84 trap). The success flag is PER REP: a rep that
        // throws must never feed its time-to-exception into the min, even
        // when another rep succeeded.
        var repOk = false
        try { body(); repOk = true } catch {
          case t: Throwable => System.err.println(s"[bench] $name FAILED: $t")
        }
        val dur = (System.nanoTime() - t0) / 1e9
        lastDur(name) = dur
        if (repOk) best(name) = math.min(best.getOrElse(name, Double.MaxValue), dur)
      }
    }
    val failed = work.map(_._1).filterNot(best.contains)

    // CC soak (unfiltered runs only): ~1M-edge synthetic graph — 100k
    // dense 6-node clusters + 16k 32-node chains — timing min-label
    // propagation (O(diameter) rounds: ~33 here) against the star
    // contraction (O(log n) rounds + bounded local finish) on the SAME
    // edges, with label parity REQUIRED after the clocks stop. Single
    // shot, not min-of-3: each algorithm runs tens of jobs, so rep noise
    // amortizes internally, and 3 reps of a ~30 s propagation would
    // dominate the whole bench budget.
    val soak: Seq[(String, Double)] =
      if (only.nonEmpty) Seq.empty
      else {
        import graft.operators.ConnectedComponents
        val edges = ConnectedComponents.soakEdges(spark)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count() // materialize the generator outside the clocks
        def clock(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        var stars: org.apache.spark.sql.DataFrame = null
        var rounds = -1
        val tStars = clock {
          val (df, r) = ConnectedComponents.runStarsCounted(edges)
          stars = df; rounds = r; stars.count(): Unit
        }
        var prop: org.apache.spark.sql.DataFrame = null
        val tProp = clock { prop = ConnectedComponents.run(edges); prop.count(): Unit }
        require(stars.exceptAll(prop).isEmpty && prop.exceptAll(stars).isEmpty,
          "cc soak: star-contraction labels diverged from min-propagation")
        System.err.println(
          f"[bench] cc_soak: stars=$tStars%.2fs ($rounds%d rounds + local finish), " +
            f"prop=$tProp%.2fs")
        edges.unpersist()
        Seq("cc_soak_stars_1m" -> tStars, "cc_soak_prop_1m" -> tProp)
      }

    val results: Seq[(String, Double)] =
      work.map { case (name, _) => name -> best.getOrElse(name, lastDur(name)) }.toSeq ++ soak
    // Seconds at 2-decimal precision: the driver keeps only a ~2000-char
    // tail of stdout, so the single JSON line must stay well under that
    // or the HEAD of the JSON gets truncated away (r6's full-name line
    // was 1897 chars at 80 entries; this round crosses 90). Keys are the
    // unique qNN prefix — the name every other artifact (CORRECTNESS,
    // VERDICT, BASELINE) already uses — which keeps the line ~1.1k.
    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def shortName(n: String): String =
      if (n.startsWith("q")) n.takeWhile(_ != '_') else n
    require(results.map(r => shortName(r._1)).distinct.size == results.size,
      "short bench keys must stay unique")
    val qs = results.map { case (k, v) => "\"" + shortName(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // headline total = the repeatable query workload; the cc_soak pair is
    // a one-shot scale experiment (~70 s of deliberate O(diameter) work)
    // and would swamp round-over-round total comparisons
    val total = results.filterNot(_._1.startsWith("cc_soak")).map(_._2).sum
    // Print the JSON line as the LAST stdout output of the JVM: silence
    // Spark and stop the session first so no shutdown log line can trail
    // it if the driver merges stderr into the captured stream.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    // `failed` is emitted only when non-empty so the happy-path line stays
    // short; a failed query's "timing" is its time-to-exception.
    val failedField =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$failedField}""")
  }
}
