package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level exact-substring deduplication — the third dedup mode next
  * to document-level exact dedup (q50) and near-dup dedup (q90/q95):
  * find every maximal token span whose exact K-token windows occur more
  * than once corpus-wide, and drop every occurrence EXCEPT the first
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022 — the suffix-array ExactSubstr operator,
  * re-expressed as a distributed rolling K-gram inventory, which is how
  * it is run at corpus scale).
  *
  * Pipeline (all built-in codegen'd expressions, no UDF):
  *  1. Each doc emits one fingerprint per K-token window:
  *     `f = md5(space-joined window)`, positions `i` 1-based. The md5
  *     key is engine-portable (DuckDB-oracled) and fixed-width, so the
  *     shuffle never carries the window text.
  *  2. ONE corpus-wide aggregation on `f` yields each fingerprint's
  *     occurrence count and its earliest occurrence (min packed
  *     `doc_id·2^20 + i` — valid while docs stay under 2^20 tokens and
  *     doc ids under 2^43; both hold by orders of magnitude here and at
  *     100 TB the key widens to a struct min).
  *  3. Windows of fingerprints seen ≥ 2 times join back (shuffle on
  *     `f`; both sides are hash-partitioned by the groupBy, and only
  *     the DUPLICATE subset survives — the data reduction happens at
  *     this semi-join, so everything after costs ∝ duplicated volume,
  *     not corpus volume).
  *  4. Per doc, overlapping/adjacent duplicate windows merge into
  *     MAXIMAL spans (gaps-and-islands: running `max(i+K−1)` over the
  *     preceding rows starts a new island when the next window no
  *     longer extends contiguous coverage).
  *  5. A span is REMOVED iff none of its windows is its fingerprint's
  *     earliest occurrence — i.e. every repeated passage keeps exactly
  *     its first copy, later copies drop (first-occurrence retention).
  *
  * Scale notes: the full window inventory is touched by exactly one
  * aggregation shuffle plus one join-back shuffle; the island window and
  * the two small groupBys run over duplicate windows only. The
  * documents scan happens twice (inventory + stats arms) — a real
  * deployment checkpoints the gram frame; the oracle arm stays
  * self-contained (the q127 artifact class).
  */
object SpanDedup {

  /** Duplicate K-windows: (doc_id, i, canon) — `canon` marks the
    * corpus-wide first occurrence of the window's fingerprint. */
  private def dupWindows(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select($"doc_id", split($"text", " ").as("t"))
    // sequence(1, 0) steps DOWN (the TextGrams lesson) — guard short docs
    val grams = toks
      .select($"doc_id", $"t", explode(expr(
        s"CASE WHEN size(t) >= $k THEN sequence(1, size(t) - ${k - 1}) " +
          "ELSE CAST(array() AS array<int>) END")).as("i"))
      .select($"doc_id", $"i",
        md5(concat_ws(" ", expr(s"slice(t, i, $k)"))).as("f"))
    val stats = grams.groupBy($"f")
      .agg(count(lit(1)).as("c"),
        min($"doc_id" * 1048576L + $"i").as("mk"))
      .where($"c" >= 2)
    grams.join(stats, "f")
      .select($"doc_id", $"i",
        ($"doc_id" * 1048576L + $"i" === $"mk").as("canon"))
  }

  /** Maximal duplicate spans: (doc_id, span_start, span_end, has_canon)
    * over 1-based token positions, end inclusive. */
  private def spans(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val byDoc = Window.partitionBy($"doc_id").orderBy($"i")
    dupWindows(docs, k)
      .withColumn("prev_end",
        max($"i" + lit(k - 1)).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when($"prev_end".isNull || $"i" > $"prev_end" + 1, 1L)
          .otherwise(0L)).over(byDoc))
      .groupBy($"doc_id", $"island")
      .agg(min($"i").as("span_start"),
        (max($"i") + lit(k - 1)).as("span_end"),
        max($"canon".cast("int")).as("has_canon"))
  }

  /** Per-doc duplicate-span census over every document (zeros for clean
    * docs): n_tokens · n_spans · dup_tokens (coverage of ALL duplicate
    * spans) · removed_tokens (coverage of spans losing first-occurrence
    * retention) · max_span_tokens · dup_frac · heavy_dup (> 30 % of the
    * doc duplicated — the drop threshold a curation pipeline gates on). */
  def spanCensus(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val perDoc = spans(docs, k)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("ns"),
        sum($"span_end" - $"span_start" + 1).as("dt"),
        sum(when($"has_canon" === 0, $"span_end" - $"span_start" + 1)
          .otherwise(0L)).as("rt"),
        max($"span_end" - $"span_start" + 1).as("ms"))
    docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"ns", lit(0L)).as("n_spans"),
        coalesce($"dt", lit(0L)).as("dup_tokens"),
        coalesce($"rt", lit(0L)).as("removed_tokens"),
        coalesce($"ms", lit(0L)).as("max_span_tokens"),
        (coalesce($"dt", lit(0L)).cast("double") / $"n_tokens").as("dup_frac"))
      .withColumn("heavy_dup", $"dup_frac" > 0.3)
  }

  /** The dedup ACTION: every removed span's tokens stripped from the
    * text, first occurrences kept verbatim. Returns (doc_id,
    * kept_tokens, clean_text); a doc whose every token is duplicated
    * elsewhere comes back empty, never null. Removed spans per doc are
    * few and short relative to the doc, so the per-doc span list rides
    * a broadcast-sized array column into a codegen'd positional filter. */
  def stripSpans(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val removed = spans(docs, k)
      .where($"has_canon" === 0)
      .groupBy($"doc_id")
      .agg(collect_list(struct($"span_start".as("s"), $"span_end".as("e")))
        .as("rs"))
    docs.select($"doc_id", split($"text", " ").as("t"))
      .join(removed, Seq("doc_id"), "left")
      .select($"doc_id", expr(
        // filter's index is 0-based; spans are 1-based inclusive
        """CASE WHEN rs IS NULL THEN t ELSE
          |  filter(t, (x, i) ->
          |    NOT exists(rs, p -> i + 1 >= p.s AND i + 1 <= p.e))
          |END""".stripMargin).as("kept"))
      .select($"doc_id",
        size($"kept").cast("long").as("kept_tokens"),
        concat_ws(" ", $"kept").as("clean_text"))
  }
}
