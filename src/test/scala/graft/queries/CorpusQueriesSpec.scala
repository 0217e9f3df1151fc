package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property checks for the corpus-curation operators (q129-q133):
  * the duplicate-n-gram profile on a hand-built corpus, hash-sampling
  * determinism, stratified-sample caps, mixture-weight conservation,
  * and LSH-bucketed near-dup recall/reduction against the exact q86
  * pairs.
  */
class CorpusQueriesSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("q129 dup-ngram fraction on a crafted corpus: cross-doc grams count, within-doc repeats don't") {
    val s = spark; import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    Seq(
      // A and B share the 5-gram "w1 w2 w3 w4 w5"; each has one unique gram
      (0L, "w1 w2 w3 w4 w5 w6", "en", "s0", 17L),
      (1L, "w1 w2 w3 w4 w5 xx", "en", "s0", 17L),
      // C: all grams unique corpus-wide
      (2L, "c1 c2 c3 c4 c5 c6", "en", "s0", 17L),
      // D: gram "a b c d e" occurs TWICE within the doc but in no other
      // doc — document frequency 1, so none of its 6 instances are dups
      (3L, "a b c d e a b c d e", "en", "s0", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = CorpusQueries.queries("q129_dup_ngram_frac")(s, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) === ((2L, 1L, 0.5)))
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((6L, 0L, 0.0)))
  }

  test("q130 hash sample is deterministic, correctly bounded, and exactly the md5 predicate") {
    val s = spark; import s.implicits._
    val a = CorpusQueries.queries("q130_hash_sample")(s, dir).collect()
    val b = CorpusQueries.queries("q130_hash_sample")(s, dir).collect()
    assert(a.toSeq === b.toSeq, "hash sampling must be run-to-run identical")
    val n = graft.Tables.load(s, dir, "documents").count()
    // 26/256 expected acceptance; allow wide slack for small n
    assert(a.length > n / 50 && a.length < n / 4, s"sample size ${a.length} of $n")
    // every kept row satisfies the predicate, recomputed independently
    val recount = graft.Tables.load(s, dir, "documents")
      .where(substring(md5($"doc_id".cast("string")), 1, 2) < "1a").count()
    assert(a.length.toLong === recount)
  }

  test("q131 stratified sample: at most 3 per (lang, qband), ranks contiguous from 1") {
    val s = spark; import s.implicits._
    val rows = CorpusQueries.queries("q131_stratified_sample")(s, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, g) =>
      assert(g.length <= 3, s"stratum $k overfull")
      assert(g.map(_._4).sorted.toSeq === (1 to g.length), s"ranks not contiguous in $k")
    }
  }

  test("q132 mixture weights conserve mass: weight × share = 1/G, Σ share = 1, Σ weight·n = total") {
    val s = spark; import s.implicits._
    val rows = CorpusQueries.queries("q132_mix_weights")(s, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val g = rows.length
    val total = rows.map(_._1).sum
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    rows.foreach { case (_, share, weight) =>
      assert(math.abs(weight * share - 1.0 / g) < 1e-12)
    }
    assert(math.abs(rows.map(r => r._3 * r._1).sum - total.toDouble) < 1e-6)
  }

  test("q133 LSH near-dup: subset of exact q86 pairs, recall floor, candidate reduction") {
    val s = spark; import s.implicits._
    val exact = DedupTextQueries.queries("q86_cosine_neardup")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = CorpusQueries.queries("q133_lsh_embed_neardup")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    // every LSH-verified pair must be an exact pair with the same cosine
    lsh.foreach { case (k, c) =>
      assert(exact.get(k).contains(c), s"pair $k not in exact set (or cosine drift)")
    }
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.25, s"recall $recall below floor (lsh=${lsh.size}, exact=${exact.size})")
    // the candidate volume (pre-verify) must be a small fraction of all pairs
    val e = graft.Tables.load(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("ed"))
    val bands = e.select($"vec_id", explode(array((0 until 8).map { b =>
      struct(lit(b).as("band"), expr(
        s"concat_ws('', transform(sequence(${b * 8 + 1}, ${b * 8 + 8}), " +
          "i -> CASE WHEN element_at(ed, i) >= 0D THEN '1' ELSE '0' END))").as("bkey"))
    }: _*)).as("bk"))
      .select($"vec_id", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    val nCand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" && $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id", $"y.vec_id").distinct().count()
    val n = e.count()
    assert(nCand < n * (n - 1) / 2 / 10,
      s"LSH candidates $nCand not a >=10x reduction over ${n * (n - 1) / 2}")
  }

  test("q136 exact percentiles bound the percentile_approx sketch (the 100 TB path)") {
    val s = spark; import s.implicits._
    // the exact rank-arithmetic values are the baseline the mergeable
    // sketch is measured against — with accuracy 10000 on these
    // cardinalities the sketch must land within one neighbor rank
    val exact = CorpusQueries.queries("q136_len_percentiles")(s, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val sk = graft.Tables.load(s, dir, "documents")
      .select($"lang", size(split($"text", " ")).cast("long").as("n_tokens"))
      .groupBy($"lang")
      .agg(expr("percentile_approx(n_tokens, array(0.5D, 0.9D, 0.99D), 10000)").as("qs"))
      .collect().flatMap { r =>
        val qs = r.getSeq[Long](1)
        Seq(0.5, 0.9, 0.99).zip(qs).map { case (p, v) => (r.getString(0), p) -> v }
      }.toMap
    assert(exact.nonEmpty && sk.keySet === exact.keySet)
    exact.foreach { case (k, v) =>
      val approx = sk(k)
      assert(math.abs(approx - v) <= math.max(2L, v / 10),
        s"sketch $approx far from exact $v at $k")
    }
  }

  test("HLL approx distinct tracks exact shingle counts (the 100 TB cardinality path)") {
    val s = spark; import s.implicits._
    // SURVEY §2 routes 100 TB distinct-count profiling through
    // approx_count_distinct (a mergeable HLL sketch — one pass, no
    // shuffle-wide exact distinct); this pins its error against the
    // exact counts on the 5-gram corpus, per language (group-level
    // merge included) and globally. rsd=0.02 → expect well under 5%.
    val grams = graft.Tables.load(s, dir, "documents")
      .select($"lang", split($"text", " ").as("t"))
      .select($"lang", explode(expr(
        graft.functions.TextGrams.gramsSql(5))).as("sh"))
    val both = grams.groupBy($"lang").agg(
      countDistinct($"sh").as("exact"),
      approx_count_distinct($"sh", 0.02).as("approx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty)
    both.foreach { case (lang, e, a) =>
      assert(e > 100, s"degenerate stratum $lang")
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"HLL off by ${math.abs(a - e).toDouble / e} at $lang ($a vs $e)")
    }
    val g = grams.agg(countDistinct($"sh").as("e"),
      approx_count_distinct($"sh", 0.02).as("a")).head()
    assert(math.abs(g.getLong(1) - g.getLong(0)).toDouble / g.getLong(0) <= 0.05)
  }

  test("q201 CMS one-sided error: estimate >= exact for EVERY key, not just the top-50") {
    val s = spark; import s.implicits._
    // the count-min estimate can only overcount (each cell sums its
    // key's count plus colliders) — run the q201 estimate over the
    // FULL key set, not the top-50 the gate reports
    val toks = graft.Tables.load(s, dir, "documents")
      .select(split($"text", " ").as("t"))
    val uni = toks.select(explode($"t").as("tok")).where($"tok" =!= "")
    val bi = toks.select(explode(expr(
      "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), " +
        "i -> concat(t[i-1], ' ', t[i])) ELSE CAST(array() AS array<string>) END"))
      .as("tok"))
    val cnt = uni.unionByName(bi).groupBy($"tok").agg(count(lit(1)).as("c"))
    def pos(i: Int) =
      pmod(conv(substring(md5(concat(lit(s"$i:"), $"tok")), 18, 15), 16, 10)
        .cast("long"), lit(256L))
    val keyed = cnt.select($"tok" +: $"c" +:
      (0 until 4).map(i => pos(i).as(s"p$i")): _*)
    val est = (0 until 4).foldLeft(keyed) { (acc, i) =>
      acc.join(broadcast(keyed.groupBy(col(s"p$i").as(s"q$i"))
        .agg(sum($"c").as(s"s$i"))), col(s"p$i") === col(s"q$i"))
    }.select($"tok", $"c", least($"s0", $"s1", $"s2", $"s3").as("e"))
    assert(est.where($"e" < $"c").count() === 0)
    assert(est.count() > 500) // unigrams + bigrams give a real key set
  }

  test("q144 packing: every doc once, bins never overflow, offsets contiguous") {
    val s = spark; import s.implicits._
    val L = 1024L
    val rows = CorpusQueries.queries("q144_seq_pack")(s, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).distinct.length ===
      graft.Tables.load(s, dir, "documents").count())
    rows.groupBy(r => (r._1, r._4)).foreach { case ((src, bin), ds) =>
      val tot = ds.map(_._3).sum
      // a bin exceeds L only when it holds a single oversized doc
      assert(tot <= L || ds.length == 1, s"overflowing multi-doc bin $bin in $src")
      // offsets are the prefix sums of sizes in doc-id order
      val sorted = ds.sortBy(_._2)
      sorted.foldLeft(0L) { (expOff, d) =>
        assert(d._5 === expOff, s"gap at doc ${d._2} in $src/$bin")
        expOff + d._3
      }
    }
    // bins are used densely per source
    rows.groupBy(_._1).foreach { case (src, ds) =>
      val bins = ds.map(_._4).distinct.sorted
      assert(bins.toSeq === (0L until bins.length.toLong), s"sparse bins in $src")
      assert(bins.length > 1, s"packing trivial in $src")
    }
  }

  test("q146 training order: unique positions, round-robin shard rotation, replayable") {
    val s = spark; import s.implicits._
    val rows = CorpusQueries.queries("q146_train_order")(s, dir)
      .as[(String, Long, Long)].collect()
    val nShards = rows.map(_._1).distinct.length
    // every bin exactly once, at a unique position
    assert(rows.map(_._3).distinct.length === rows.length)
    // arithmetic interleave: position mod n_shards identifies the shard,
    // so consecutive occupied positions rotate across shards
    val shardOf = rows.groupBy(_._1).map { case (src, ds) =>
      src -> ds.map(_._3 % nShards).distinct.toSeq
    }
    shardOf.values.foreach(m => assert(m.length === 1))
    assert(shardOf.values.flatten.toSet.size === nShards)
    // deterministic: a second evaluation replays the identical order
    val again = CorpusQueries.queries("q146_train_order")(s, dir)
      .as[(String, Long, Long)].collect()
    assert(again.sortBy(_._3).toSeq === rows.sortBy(_._3).toSeq)
  }
}
