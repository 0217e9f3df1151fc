package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.NearDupStream.{CandPair, Doc}

/** The streaming band index must reproduce the batch LSH candidate set
  * (q52) on real documents regardless of how arrivals split across
  * micro-batches — pairs appear as soon as both members have arrived,
  * and the distinct set over the whole stream is the batch set. */
class NearDupStreamSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[Doc] = {
    val s = spark
    import s.implicits._
    graft.Tables.load(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().map { case (id, t) => Doc(id, t) }.toSeq
  }

  private def batchPairs: Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.queries.DedupTextQueries.queries("q52_minhash_lsh")(s, dir)
      .as[(Long, Long)].collect().toSet
  }

  test("distinct streamed candidates equal batch q52 across shuffled micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs
    assert(all.size >= 100)
    // adversarial split: members of a near-dup pair land in different
    // micro-batches (mod-3 split is independent of content)
    val batches = all.groupBy(_.docId % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[Doc]
    val q = NearDupStream.candidates(input.toDS())
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table("neardup_cands").as[CandPair].collect()
        .map(p => (p.da, p.db)).toSet
      val expect = batchPairs
      assert(got === expect)
      assert(got.nonEmpty)
      got.foreach { case (a, b) => assert(a < b) }
    } finally q.stop()
  }

  test("maxBucket recall dial: cap 1 emits no pairs, uncapped is batch-complete") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = NearDupStream.candidates(input.toDS(), maxBucket = 1)
      .writeStream.format("memory").queryName("neardup_capped")
      .outputMode("append").start()
    try {
      input.addData(docs); q.processAllAvailable()
      assert(spark.table("neardup_capped").isEmpty)
    } finally q.stop()
  }
}
