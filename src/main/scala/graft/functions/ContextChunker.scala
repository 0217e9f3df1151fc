package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping context-window chunking of whitespace-token documents —
  * the pretraining prep step that splits long documents into
  * model-context-sized windows with an overlap, so no token span is
  * seen only straddling a chunk boundary.
  *
  * Convention (pinned here because several exist in the wild): with
  * stride S = chunkSize − overlap, chunk k covers tokens
  * [k·S, min(k·S + chunkSize, n)) and the chunk count is 1 when
  * n ≤ chunkSize, else ceil((n − chunkSize)/S) + 1. Chunks tile the
  * document (first starts at 0, last ends at n, consecutive starts are
  * exactly S apart), every chunk except possibly the last holds exactly
  * `chunkSize` tokens, and the last holds at least one token its
  * predecessor lacks.
  *
  * Scale: pure map-side DataFrame algebra (split → sequence → explode
  * → slice) — no shuffle, no UDF, fuses into whatever stage already
  * scans the text; output rows are Σ_doc ceil-ish(n/S) independent of
  * parallelism. `sequence(0, nk−1)` is safe from the descending-
  * sequence trap ([[TextGrams]]'s scaladoc) because nk ≥ 1 by
  * construction.
  */
object ContextChunker {

  /** Chunk plan + content hash per (doc, window): `idCols ++ (chunk_id,
    * start_tok, end_tok, n_tok, chunk_sha)` where `chunk_sha` is the
    * sha-256 of the space-rejoined token window (whitespace-split, so
    * rejoining is lossless per window). */
  def chunks(docs: DataFrame, textCol: String, idCols: Seq[String],
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val keyed = docs
      .withColumn("__t", split(col(textCol), " "))
      .withColumn("__n", size(col("__t")).cast("long"))
      // ceil((n − C)/S) + 1 via the mirrored floor-of-double idiom
      .withColumn("__nk", when(col("__n") <= chunkSize, lit(1L))
        .otherwise(floor((col("__n") - chunkSize + (stride - 1)) / lit(stride.toDouble)) + lit(1L)))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__nk") - 1)))
    val start = col("chunk_id") * stride
    val end = least(start + chunkSize, col("__n"))
    keyed.select(
      idCols.map(col) ++ Seq(
        col("chunk_id"),
        start.as("start_tok"),
        end.as("end_tok"),
        (end - start).as("n_tok"),
        sha2(array_join(
          slice(col("__t"), (start + 1).cast("int"), (end - start).cast("int")), " "),
          256).as("chunk_sha")): _*)
  }
}
