package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.CorpusStream.{Doc, Decision}

/** The streaming corpus ingest must reproduce the batch q127-style
  * taxonomy (exact_dup → lang → low_quality → keep) across micro-batch
  * boundaries: cross-batch duplicates drop, the first arrival claims the
  * content, gates fire on the claimant's own text. */
class CorpusStreamSpec extends AnyFunSuite with TestSpark {

  // good: long enough, stopword-rich, no punctuation
  private val good =
    ("the market data " * 30).trim                        // 90 tokens, stop-heavy
  private val goodB = ("a price series " * 30).trim
  private val noStops = "alpha beta gamma delta " * 10    // no stopwords -> lang
  private val shouty = "the !!! ??? %%% &&& $$$ ###"      // punct-heavy -> low_quality

  private def expected(docs: Seq[Doc]): Map[Long, (Boolean, String)] = {
    val canon = docs.groupBy(_.text).map { case (t, ds) => t -> ds.map(_.docId).min }
    docs.map { d =>
      val reason =
        if (d.docId != canon(d.text)) "exact_dup"
        else CorpusStream.gateReason(d.text)
      d.docId -> (reason == "keep", reason)
    }.toMap
  }

  test("cross-batch exact dedup + gates match the batch taxonomy, fill for fill") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val b1 = Seq(Doc(1, good, "en", "s0"), Doc(2, noStops.trim, "und", "s0"),
      Doc(3, good, "en", "s1")) // 3 duplicates 1 within the batch
    val b2 = Seq(Doc(4, shouty, "en", "s0"), Doc(5, goodB, "en", "s2"))
    val b3 = Seq(Doc(6, good, "en", "s3"), // duplicates batch 1's content
      Doc(7, goodB, "en", "s0"),           // duplicates batch 2's content
      Doc(8, noStops.trim, "und", "s1"))   // duplicate of a NON-kept doc: still exact_dup
    val all = b1 ++ b2 ++ b3

    val input = MemoryStream[Doc]
    val q = CorpusStream.ingest(input.toDS())
      .writeStream.format("memory").queryName("corpus_ingest")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table("corpus_ingest").as[Decision].collect()
        .map(d => d.docId -> (d.keep, d.reason)).toMap
      assert(got === expected(all))
      // the crafted corpus exercises every reason
      assert(got.values.map(_._2).toSet === Set("keep", "exact_dup", "lang", "low_quality"))
    } finally q.stop()
  }

  test("checkpoint restart: dedup markers resume and decisions stay batch-identical") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus_rs")
    val sink = new graft.sources.MergeSink(spark, s"$tmp/decisions",
      keyCols = Seq("docId"), partitionCol = "shard")
    val input = MemoryStream[Doc]
    def startQ() = CorpusStream.ingest(input.toDS())
      .withColumn("shard", pmod(col("docId"), lit(4L)).cast("string"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) => sink.upsert(batch): Unit }
      .start()
    val h1 = Seq(Doc(1, good, "en", "s0"), Doc(2, noStops.trim, "und", "s0"))
    // h2 re-delivers batch-1 CONTENT under new ids: only the restored
    // sha-keyed markers can classify them as exact_dup
    val h2 = Seq(Doc(3, good, "en", "s1"), Doc(4, goodB, "en", "s2"),
      Doc(5, noStops.trim, "und", "s1"))
    val q1 = startQ()
    try { input.addData(h1); q1.processAllAvailable() } finally q1.stop()
    val q2 = startQ()
    try {
      input.addData(h2); q2.processAllAvailable()
      val got = sink.read().select($"docId", $"keep", $"reason")
        .as[(Long, Boolean, String)].collect()
        .map(d => d._1 -> (d._2, d._3)).toMap
      assert(got === expected(h1 ++ h2),
        "restart from checkpoint diverged from the batch taxonomy")
      assert(got(3)._2 === "exact_dup" && got(5)._2 === "exact_dup")
    } finally q2.stop()
  }

  test("single-batch delivery decides identically to micro-batched delivery") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(Doc(1, good, "en", "s0"), Doc(2, noStops.trim, "und", "s0"),
      Doc(3, good, "en", "s1"), Doc(4, shouty, "en", "s0"),
      Doc(5, goodB, "en", "s2"), Doc(6, good, "en", "s3"))
    val input = MemoryStream[Doc]
    val q = CorpusStream.ingest(input.toDS())
      .writeStream.format("memory").queryName("corpus_ingest_one")
      .outputMode("append").start()
    try {
      input.addData(all); q.processAllAvailable()
      val got = spark.table("corpus_ingest_one").as[Decision].collect()
        .map(d => d.docId -> (d.keep, d.reason)).toMap
      assert(got === expected(all))
    } finally q.stop()
  }
}
