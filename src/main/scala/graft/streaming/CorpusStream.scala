package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus ingestion — the shape a continuous crawl actually
  * arrives in: document micro-batches exact-deduplicated against ALL
  * previously ingested content and gated by the q55/q56 language/quality
  * signals before they reach the training store. This is the q127 batch
  * taxonomy (exact_dup → lang → low_quality → keep) applied continuously;
  * CorpusStreamSpec proves fill-for-fill batch parity on crafted batches.
  *
  * Scale design:
  *  - State per distinct document is ONE Long (the keeper's doc id) keyed
  *    by the sha-256 content hash: the state store shards by hash across
  *    executors, so a 1000-executor cluster holds billions of markers in
  *    O(1) per key.
  *  - The hash-keyed shuffle is the SAME exchange batch exact-dedup pays;
  *    streaming adds only the store lookup.
  *  - State here never expires (exact dedup is exact). A bounded-recall
  *    variant (dedup within the last N days) would add a watermark +
  *    EventTimeTimeout expiry — at 100 TB that expiry is a RECALL dial,
  *    not a correctness one, and the taxonomy is unchanged.
  */
object CorpusStream {

  final case class Doc(docId: Long, text: String, lang: String, source: String)
  final case class Decision(docId: Long, keep: Boolean, reason: String)

  private val stop = Set("the", "a", "of", "and", "to", "in", "is")

  /** The q56/q127 per-row gate, computed statelessly: same constants and
    * op order as the oracled SQL (punct = chars outside [a-z0-9 ]). */
  private[streaming] def gateReason(text: String): String = {
    val toks = text.split(" ")
    val stopRatio = toks.count(stop.contains).toDouble / toks.length
    val punctRatio = text.count(c =>
      !((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '))
      .toDouble / text.length
    val quality = 0.4 * math.min(toks.length.toDouble / 100.0, 1.0) +
      0.3 * (1.0 - punctRatio) + 0.3 * math.min(stopRatio * 10.0, 1.0)
    if (stopRatio < 0.05) "lang"
    else if (quality < 0.5) "low_quality"
    else "keep"
  }

  /** Cross-batch exact dedup + gates. The FIRST arrival of a content
    * hash claims it (ties within a batch broken by doc id) and is gated
    * on its own text; every later arrival — same batch, later batch, or
    * checkpoint-replayed batch — is `exact_dup`, exactly the batch
    * taxonomy's `doc_id != min(doc_id) per text` arm when delivery order
    * follows doc id. */
  def ingest(docs: Dataset[Doc]): Dataset[Decision] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(sha2($"text", 256).as("h"), $"docId", $"text")
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Decision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, String)],
            state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(_._2)
          val out = Seq.newBuilder[Decision]
          var claimed = state.getOption.isDefined
          sorted.foreach { case (_, id, text) =>
            if (claimed) out += Decision(id, keep = false, "exact_dup")
            else {
              claimed = true
              state.update(id)
              val r = gateReason(text)
              out += Decision(id, r == "keep", r)
            }
          }
          out.result().iterator
      }
  }
}
