package graft.ml

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) — the
  * subword-tokenizer training stage of a training-data pipeline,
  * engineered the way BPE actually scales:
  *
  *  - The corpus collapses to a DISTINCT-word frequency table first
  *    (`wordFrequencies`): every census afterwards is O(Σ|word| over the
  *    VOCAB), not over the corpus — at 100 TB the vocab table is
  *    millions of rows where the corpus is trillions of tokens, and the
  *    collapse itself is one map-side-combined groupBy.
  *  - Each round is (a) one distributed pair census over the exploded
  *    adjacent symbol pairs, weighted by word frequency (overlapping
  *    occurrences count, per the reference algorithm), and (b) one
  *    vocab-sized typed map applying the chosen merge. The chosen pair
  *    is a 1-row bounded collect per round — the k-means
  *    centroid-literal pattern, never a driver iteration over words.
  *  - Tie-break is fully deterministic: count DESC, then (a, b)
  *    lexicographic — the reference's arbitrary dict-order max made
  *    replayable.
  *
  * Merge application is simultaneous leftmost-greedy (standard BPE): in
  * a run of overlapping matches ("aaa" under merge (a,a)) the 1st, 3rd,
  * 5th… occurrences merge. The DuckDB oracle replays this as an
  * islands-parity window rule; BpeTrainerSpec pins the Scala fold to
  * that rule on the adversarial fixtures.
  */
object BpeTrainer {

  final case class WordSyms(word: String, wf: Long, syms: Seq[String])
  final case class Merge(a: String, b: String, cnt: Long, round: Int)

  /** End-of-word marker appended as its own symbol (Sennrich §3.2). */
  val EndOfWord = "</w>"

  /** Distinct-word frequency table of a corpus text column. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wf"))

  /** One simultaneous leftmost-greedy merge pass over a symbol list. */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** `rounds` BPE merges over a (word, wf) table. Returns the learned
    * merge list (in order) and the final per-word segmentation
    * (word, wf, n_syms, seg — symbols joined by ' '). */
  def train(wordFreq: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    // Every round's state is an EAGER localCheckpoint, not a cache on a
    // growing lineage: with cache(), round r's census plan carried r
    // chained typed maps, so Catalyst re-analyzed and re-generated code
    // for a DIFFERENT (deeper) plan every round — ~0.5 s/round of pure
    // driver work that dwarfed the vocab-sized dataflow (q190 measured
    // 6.2 s at sf0.001 even on local[1]). Checkpointing resets each
    // round's plan to LogicalRDD → census, a CONSTANT shape, so
    // analysis is trivial and codegen caches after round 1 — the same
    // fix TextRank needed for its iteration loop. The checkpoint write
    // is vocab-sized (trivial), and it doubles as the per-round
    // durability point a production vocab-scale run wants anyway.
    var cur: Dataset[WordSyms] = wordFreq
      .select($"word".as[String], $"wf".as[Long])
      .map { case (w, f) => WordSyms(w, f, w.map(_.toString) :+ EndOfWord) }
      .localCheckpoint(true)
    val merges = ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = cur.toDF()
        .select($"wf", explode(expr(
          "CASE WHEN size(syms) >= 2 THEN transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i+1] AS b)) " +
            "ELSE CAST(array() AS array<struct<a:string,b:string>>) END")).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"wf").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += Merge(a, b, c, r)
        cur = cur.map(ws => ws.copy(syms = applyMerge(ws.syms, a, b)))
          .localCheckpoint(true)
        r += 1
      }
    }
    // Snapshot the result: the segmentation is the durable artifact (a
    // production run reliably-checkpoints or writes it here); callers
    // reuse a materialized table with no lineage into the round states.
    val seg = cur.toDF().select($"word", $"wf",
      size($"syms").cast("long").as("n_syms"),
      array_join($"syms", " ").as("seg"))
      .localCheckpoint(true)
    (merges.toSeq, seg)
  }

  // Keyed by the session OBJECT via a WeakHashMap: identityHashCode is
  // not unique (after GC a new session can collide with a stopped one's
  // hash and hand back a DataFrame bound to a dead session). The VALUES
  // hold SoftReferences: a DataFrame strongly references its session, so
  // a strong value would pin its own key forever (the WeakHashMap javadoc
  // trap) — soft values keep cache semantics (a plain GC between q190
  // and q191 does not drop the entry) while letting memory pressure
  // collect stopped sessions' entries, and with them the keys. A cleared
  // reference just retrains; correctness is unaffected.
  private val segMemo =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int),
        java.lang.ref.SoftReference[DataFrame]]]

  /** Memoized [[train]] over a dir's `documents` table: q190, q191, and
    * the serve-artifact build consume the SAME 12-round segmentation, so
    * one Verify/serve run trains once instead of three times (r12
    * ADVICE). Safe because train() now returns an eager localCheckpoint
    * (session-lived, lineage-free). Bench clears the memo before every
    * timed rep ([[clearSegMemo]]) so the q190/q191 gate arms remain
    * self-contained measurements. */
  def trainedSegmentation(spark: org.apache.spark.sql.SparkSession,
      dir: String, rounds: Int = 12): DataFrame = {
    val perSession = segMemo.synchronized {
      var m = segMemo.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, Int),
          java.lang.ref.SoftReference[DataFrame]]
        segMemo.put(spark, m)
      }
      m
    }
    val key = (dir, rounds)
    perSession.get(key).flatMap(r => Option(r.get)).getOrElse {
      val seg = train(
        wordFrequencies(graft.Tables.load(spark, dir, "documents")),
        rounds)._2
      perSession.put(key, new java.lang.ref.SoftReference(seg))
      seg
    }
  }

  def clearSegMemo(): Unit = segMemo.synchronized(segMemo.clear())
}
