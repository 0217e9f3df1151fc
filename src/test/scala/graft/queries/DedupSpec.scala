package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property checks for the hash-signature dedup operators that have no
  * SQL oracle (q52/q53): MinHash-LSH candidate recall against the exact
  * n-gram Jaccard pairs, and SimHash locality. */
class DedupSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH candidates cover every exact Jaccard>=0.5 pair") {
    val exact = DedupTextQueries.queries("q51_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = DedupTextQueries.queries("q52_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    val missed = exact -- candidates
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
    // and it should not degenerate into all-pairs
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(candidates.size < nDocs * (nDocs - 1) / 20,
      s"LSH candidate set too dense: ${candidates.size}")
  }

  test("q90 LSH+verify matches the exact all-pairs near-dup output (q51)") {
    val exact = DedupTextQueries.queries("q51_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val verified = DedupTextQueries.queries("q90_neardup_lsh_verify")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(verified === exact)
  }

  test("q90 plan has no shingle-only equi-join (the q51 skew shape)") {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = DedupTextQueries.queries("q90_neardup_lsh_verify")(spark, dir)
    // every equi-join touching the shingle column must also carry a
    // doc-id key: a join keyed on `sh` alone is exactly the hot-key
    // quadratic fan-out q90 exists to avoid.
    val bad = df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        val eqs = j.condition.toSeq.flatMap(_.collect { case e: EqualTo => e })
        val onShingle = eqs.filter(_.references.exists(_.name == "sh"))
        val hasOtherKey = eqs.exists(_.references.forall(_.name != "sh"))
        onShingle.nonEmpty && !hasOtherKey
    }.count(identity)
    assert(bad === 0, "found a join keyed on the shingle column alone")
  }

  test("q125 contamination plan: benchmark shingles broadcast, corpus never shuffles on sh") {
    val df = DedupTextQueries.queries("q125_contamination")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "benchmark side must broadcast")
    // a sort-merge join on the shingle key would re-introduce the hot-key
    // shuffle the broadcast design exists to avoid
    assert(!plan.contains("SortMergeJoin"), "corpus side shuffled on sh")
  }

  test("SimHash: near-dup pairs have small hamming distance vs random pairs") {
    val sims = DedupTextQueries.queries("q53_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = DedupTextQueries.queries("q51_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDist = nearDups.map { case (a, b) => hamming(sims(a), sims(b)) }
    val rng = new scala.util.Random(1)
    val ids = sims.keys.toArray
    val randDist = (1 to 200).map { _ =>
      val a = ids(rng.nextInt(ids.length)); val b = ids(rng.nextInt(ids.length))
      hamming(sims(a), sims(b))
    }
    assert(dupDist.sum.toDouble / dupDist.length <
      randDist.sum.toDouble / randDist.length / 2,
      s"near-dup mean=${dupDist.sum.toDouble / dupDist.length} rand=${randDist.sum.toDouble / randDist.length}")
  }

  test("short docs generate ZERO n-grams (no null grams, no engine-mismatch rows)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // sequence(1, 0) steps DOWN to [1, 0] in Spark, so the unguarded
    // idiom emitted NULL grams for docs shorter than n while DuckDB's
    // generate_series(1, 0) is empty — TextGrams.gramsSql guards this.
    val grams3 = Seq(Tuple1("a b")).toDF("text")
      .select(split($"text", " ").as("t"))
      .select(explode(expr(graft.functions.TextGrams.gramsSql(3))).as("sh"))
    assert(grams3.count() === 0L, "2-token doc must yield no 3-grams")
    val grams5 = Seq(Tuple1("a b c d")).toDF("text")
      .select(split($"text", " ").as("t"))
      .select(explode(expr(graft.functions.TextGrams.gramsSql(5))).as("sh"))
    assert(grams5.count() === 0L, "4-token doc must yield no 5-grams")
    val exact3 = Seq(Tuple1("a b c")).toDF("text")
      .select(split($"text", " ").as("t"))
      .select(explode(expr(graft.functions.TextGrams.gramsSql(3))).as("sh"))
      .collect().map(_.getString(0))
    assert(exact3.toSeq === Seq("a b c"))

    // end-to-end: a corpus with short docs — the gram-family queries
    // must DROP them (the oracle's generate_series semantics), never
    // emit null-gram or n_hits=0 phantom rows
    val tmp = java.nio.file.Files.createTempDirectory("graft_short").toString
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6", "en", "s0", 17L),
      (2L, "w1 w2 w3 w4 w5 xx", "en", "s0", 17L),
      (11L, "w1 w2 w3 w4 w5 zz", "en", "s0", 17L), // doc_id%11==0 → q125 bench slice
      (3L, "too short", "en", "s0", 9L), // 2 tokens: no 3- or 5-grams
      (4L, "just four tokens here", "en", "s0", 21L) // 4 tokens: no 5-grams
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val contam = DedupTextQueries.queries("q125_contamination")(s, tmp).collect()
    assert(contam.map(_.getLong(0)).toSet === Set(1L, 2L),
      "q125 must omit docs with no 5-grams, exactly as the oracle does")
    val dupFrac = CorpusQueries.queries("q129_dup_ngram_frac")(s, tmp).collect()
    assert(dupFrac.map(_.getLong(0)).toSet === Set(1L, 2L, 11L))
    assert(dupFrac.forall(r => !r.isNullAt(1)))
  }

  test("cosine top-k: ranks are 1..5 per query, self excluded, scores sorted") {
    val rows = DedupTextQueries.queries("q54_cosine_topk")(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 50)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to 5))
      assert(sorted.forall(_.getLong(1) != qid))
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
