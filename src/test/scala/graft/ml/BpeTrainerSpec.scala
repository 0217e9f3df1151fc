package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ml.BpeTrainer.Merge

class BpeTrainerSpec extends AnyFunSuite with TestSpark {

  test("applyMerge is simultaneous leftmost-greedy (the oracle's islands-parity rule)") {
    // overlapping self-pair runs: 1st/3rd/5th… occurrence merges
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa"))
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a"), "a", "a") ===
      Seq("aa", "a"))
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa", "a"))
    // distinct pair: every occurrence merges (matches can never overlap)
    assert(BpeTrainer.applyMerge(Seq("a", "b", "a", "b"), "a", "b") ===
      Seq("ab", "ab"))
    // merged output does not cascade within the same pass
    assert(BpeTrainer.applyMerge(Seq("a", "b", "b"), "a", "b") ===
      Seq("ab", "b"))
    // no match → unchanged; singleton untouched
    assert(BpeTrainer.applyMerge(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(BpeTrainer.applyMerge(Seq("x"), "x", "x") === Seq("x"))
  }

  test("train reproduces the hand-computed merge sequence, tiebreak, and early exhaustion") {
    val spark2 = spark
    import spark2.implicits._
    // corpus: "aab"×3, "ab"×2. Round-1 census: (a,a)=3, (a,b)=5,
    // (b,</w>)=5 — a COUNT TIE broken lexicographically → (a,b) wins.
    val wf = Seq(("aab", 3L), ("ab", 2L)).toDF("word", "wf")
    val (merges, segDf) = BpeTrainer.train(wf, rounds = 5)
    assert(merges === Seq(
      Merge("a", "b", 5L, 1),
      Merge("ab", "</w>", 5L, 2),
      Merge("a", "ab</w>", 3L, 3))) // round 4 has no pairs left → stops
    val seg = segDf.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(seg.toSeq === Seq(
      ("aab", 3L, 1L, "aab</w>"),
      ("ab", 2L, 1L, "ab</w>")))
  }

  test("wordFrequencies drops empty tokens and aggregates across docs") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    val wf = BpeTrainer.wordFrequencies(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(wf.toSeq === Seq(("x", 2L), ("y", 2L)))
  }
}
