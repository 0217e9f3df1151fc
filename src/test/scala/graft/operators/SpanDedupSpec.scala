package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed fixture for span-level exact-substring dedup (K=3).
  *
  * doc 0  a b c d e f g h      — earliest copy of everything: one full
  *                              span, CANONICAL, nothing removed
  * doc 1  x y c d e f z w      — carries doc 0's "c d e f": one span
  *                              [3,6], no canonical window → removed
  * doc 2  p q r s t u          — clean: zeros
  * doc 3  a b c d e f g h      — exact copy of doc 0: whole doc one
  *                              removed span → strips to empty
  * doc 4  m n o m n o m n o    — WITHIN-doc repeat: one span covering
  *                              the doc, first window is canonical →
  *                              kept (first-occurrence retention is
  *                              corpus-wide, including self)
  * doc 5  c d e u1 u2 u3 u4 d e f — two duplicate passages separated by
  *                              a gap: islands must NOT merge
  * doc 6  a b                  — shorter than K: no windows at all
  */
class SpanDedupSpec extends AnyFunSuite with TestSpark {

  private lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y c d e f z w"),
      (2L, "p q r s t u"),
      (3L, "a b c d e f g h"),
      (4L, "m n o m n o m n o"),
      (5L, "c d e u1 u2 u3 u4 d e f"),
      (6L, "a b")
    ).toDF("doc_id", "text")
  }

  test("spanCensus: spans merge, first occurrence is retained, gaps split islands") {
    val got = SpanDedup.spanCensus(docs, 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7))))
      .toMap
    //                 n_tokens n_spans dup removed max  frac   heavy
    assert(got(0L) === ((8L, 1L, 8L, 0L, 8L, 1.0, true)))
    assert(got(1L) === ((8L, 1L, 4L, 4L, 4L, 0.5, true)))
    assert(got(2L) === ((6L, 0L, 0L, 0L, 0L, 0.0, false)))
    assert(got(3L) === ((8L, 1L, 8L, 8L, 8L, 1.0, true)))
    assert(got(4L) === ((9L, 1L, 9L, 0L, 9L, 1.0, true)))
    assert(got(5L) === ((10L, 2L, 6L, 6L, 3L, 0.6, true)))
    assert(got(6L) === ((2L, 0L, 0L, 0L, 0L, 0.0, false)))
  }

  test("stripSpans: removed spans drop, canonical and clean text survives verbatim") {
    val got = SpanDedup.stripSpans(docs, 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(0L) === ((8L, "a b c d e f g h")))
    assert(got(1L) === ((4L, "x y z w")))
    assert(got(2L) === ((6L, "p q r s t u")))
    assert(got(3L) === ((0L, "")))
    assert(got(4L) === ((9L, "m n o m n o m n o")))
    assert(got(5L) === ((4L, "u1 u2 u3 u4")))
    assert(got(6L) === ((2L, "a b")))
  }

  test("census covers every doc exactly once and dup_tokens bounds removed_tokens") {
    val rows = SpanDedup.spanCensus(docs, 3).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L to 6L))
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3)) // removed <= dup
      assert(r.getLong(3) <= r.getLong(1)) // dup <= n_tokens
    }
  }

  test("strip -> re-census composition (the q216 loop): 8 band memberships per shingled doc, exact-dup buckets dissolve") {
    val s = spark; import s.implicits._
    import graft.streaming.NearDupStream
    def census(df: org.apache.spark.sql.DataFrame) =
      NearDupStream.bucketCensus(df.as[(Long, String)]
        .map { case (id, t) => NearDupStream.Doc(id, t) }).collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    // pre-strip: docs 0 and 3 are byte-identical -> identical shingle
    // sets -> all 8 band keys coincide (eight m=2 buckets)
    val before = census(docs.select($"doc_id", $"text"))
    assert(before.count(_._2 === 2L) === 8)
    val stripped = SpanDedup.stripSpans(docs, 3)
    val after = census(stripped.select($"doc_id", $"clean_text"))
    // every doc with >= 3 kept tokens contributes exactly 8 band
    // memberships; shorter docs contribute none (shingle-degenerate)
    val shingled = stripped.where($"kept_tokens" >= 3).count()
    assert(after.map(_._2).sum === 8L * shingled)
    // the remedy outcome on this fixture: the exact-dup copy stripped to
    // empty, remaining docs have disjoint shingle sets -> no bucket
    // holds two docs any more
    assert(after.nonEmpty && after.map(_._2).max === 1L)
  }
}
