package graft.functions

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ContextChunkerSpec extends AnyFunSuite with TestSpark {

  private val C = 32
  private val O = 8
  private val S = C - O

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference chunker: the documented convention, written independently. */
  private def refChunks(tokens: Vector[String]): Seq[(Long, Long, Long, String)] = {
    val n = tokens.length
    val nk = if (n <= C) 1 else math.ceil((n - C).toDouble / S).toInt + 1
    (0 until nk).map { k =>
      val start = k.toLong * S
      val end = math.min(start + C, n.toLong)
      (k.toLong, start, end, tokens.slice(start.toInt, end.toInt).mkString(" "))
    }
  }

  test("chunks tile each doc per the pinned convention, shas match a reference chunker") {
    val s = spark; import s.implicits._
    // lengths straddling every boundary: 1, C-1, C, C+1, C+S, C+S+1, long
    val lens = Seq(1, 31, 32, 33, 56, 57, 99, 240)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val got = ContextChunker.chunks(docs, "text", Seq("doc_id"), C, O)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2).toSeq }

    lens.zipWithIndex.foreach { case (n, i) =>
      val toks = (0 until n).map(j => s"w${i}_$j").toVector
      val ref = refChunks(toks)
      val g = got(i.toLong)
      assert(g.length === ref.length, s"doc $i (n=$n) chunk count")
      g.zip(ref).foreach { case ((_, cid, st, en, nt, sh), (rcid, rst, ren, rtext)) =>
        assert((cid, st, en) === ((rcid, rst, ren)), s"doc $i chunk $rcid span")
        assert(nt === ren - rst)
        assert(sh === sha(rtext), s"doc $i chunk $rcid sha")
      }
      // tiling: first starts at 0, last ends at n, stride exact
      assert(g.head._3 === 0L && g.last._4 === n.toLong)
      g.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 - a._3 === S.toLong)
        case _ =>
      }
      // all but the last chunk are full-size
      g.dropRight(1).foreach(r => assert(r._5 === C.toLong))
      assert(g.last._5 > 0L && g.last._5 <= C.toLong)
    }
  }

  test("invalid size/overlap combinations are rejected") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      ContextChunker.chunks(df, "text", Seq("doc_id"), 8, 8))
    intercept[IllegalArgumentException](
      ContextChunker.chunks(df, "text", Seq("doc_id"), 0, 0))
    intercept[IllegalArgumentException](
      ContextChunker.chunks(df, "text", Seq("doc_id"), 8, -1))
  }
}
