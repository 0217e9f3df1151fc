package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextRankSpec extends AnyFunSuite with TestSpark {

  test("star graph: the hub outranks every leaf; mass is conserved up to div truncation") {
    val s = spark; import s.implicits._
    // hub "h" connected to 5 leaves, unit weights
    val adj = Seq(("h", "l1", 1L), ("h", "l2", 1L), ("h", "l3", 1L),
      ("h", "l4", 1L), ("h", "l5", 1L)).toDF("a", "b", "w")
    val out = TextRank.run(adj).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val leaves = out.filter(_._1 != "h").values
    assert(leaves.forall(out("h") > _), s"hub must dominate: $out")
    assert(leaves.toSet.size === 1, "symmetric leaves must tie exactly")
    // each damping step can only LOSE mass to integer truncation
    val total = out.values.sum
    assert(total <= 1000000000000L && total > 990000000000L, s"mass $total")
  }

  test("heavier edges pull rank: the lightly-attached node ranks last") {
    val s = spark; import s.implicits._
    // a-b heavy, b-c light: c hangs off b by a 1/11 weight share. (The
    // a-vs-b order is NOT asserted — a path graph is bipartite, so
    // finite damped iteration still oscillates between the two sides
    // at 8 rounds; c losing by an order of magnitude is iteration-
    // count-robust.)
    val adj = Seq(("a", "b", 10L), ("b", "c", 1L)).toDF("a", "b", "w")
    val out = TextRank.run(adj).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") > 4 * out("c") && out("b") > 4 * out("c"),
      s"light node must trail: $out")
  }

  test("empty adjacency returns an empty frame, not a divide-by-zero") {
    val s = spark; import s.implicits._
    val adj = Seq.empty[(String, String, Long)].toDF("a", "b", "w")
    val out = TextRank.run(adj)
    assert(out.columns.toSeq === Seq("node", "pr_q", "score"))
    assert(out.isEmpty)
  }
}
