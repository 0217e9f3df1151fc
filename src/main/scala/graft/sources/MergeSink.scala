package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style idempotent upsert into a partitioned parquet table — the
  * Spark emulation of the reference's SQLite `INSERT ... ON CONFLICT
  * (ticker, date, source)` bars sink (/root/reference/etl/
  * database_manager.py:1603-1687), shaped like Delta's `MERGE WHEN
  * MATCHED UPDATE / WHEN NOT MATCHED INSERT`.
  *
  * Scale design: only partitions TOUCHED by the update batch are read,
  * merged (update-wins anti-join), rewritten to a staging dir, and
  * atomically swapped in via filesystem rename — a 100 TB table with a
  * daily delta rewrites only the delta's partitions, never the table.
  * Plain parquet gives per-partition (not cross-partition) atomicity;
  * the staging-dir swap keeps readers from ever seeing a half-written
  * partition.
  */
final class MergeSink(spark: SparkSession, path: String,
    keyCols: Seq[String], partitionCol: String) {
  require(keyCols.nonEmpty && !keyCols.contains(partitionCol))

  final case class MergeStats(inserted: Long, updated: Long, partitions: Long)

  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  def read(): DataFrame = spark.read.parquet(path)

  /** Upsert `updates`; rows matching an existing key replace it, others
    * insert. Duplicate keys WITHIN the batch keep the row with the
    * highest `versionCol` (ties broken arbitrarily but deterministically
    * by a final row_number), mirroring last-write-wins. */
  def upsert(updates: DataFrame, versionCol: Option[String] = None): MergeStats = {
    val keyCs = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCs: _*)
      .orderBy(versionCol.map(c => desc(c)).getOrElse(lit(1)))
    val batch = updates
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .cache()

    if (!exists) {
      val n = batch.count()
      batch.write.partitionBy(partitionCol).parquet(path)
      val parts = batch.select(partitionCol).distinct()
        .collect().map(r => String.valueOf(r.get(0))).toSeq
      batch.unpersist()
      writeCommitMarker(parts, n, 0)
      return MergeStats(inserted = n, updated = 0, partitions = parts.length.toLong)
    }

    val touched = batch.select(col(partitionCol)).distinct()
      .collect().map(_.get(0))
    val existing = read()
      .where(col(partitionCol).isin(touched: _*))
      .cache()
    val updated = existing.join(batch, keyCols, "left_semi").count()
    val inserted = batch.count() - updated
    val merged = batch.unionByName(
      existing.join(batch, keyCols, "left_anti").select(batch.columns.map(col): _*))

    // stage the merged partitions, then swap each partition dir in
    val staging = s"$path/.staging_${java.util.UUID.randomUUID().toString.take(8)}"
    merged.write.partitionBy(partitionCol).parquet(staging)
    existing.unpersist()
    batch.unpersist()
    touched.foreach { v =>
      val part = s"$partitionCol=$v"
      val live = new Path(s"$path/$part")
      val staged = new Path(s"$staging/$part")
      if (fs.exists(staged)) {
        if (fs.exists(live)) fs.delete(live, true)
        fs.rename(staged, live)
      }
    }
    fs.delete(new Path(staging), true)
    writeCommitMarker(touched.map(String.valueOf), inserted, updated)
    MergeStats(inserted, updated, touched.length.toLong)
  }

  /** Cross-partition atomicity is per-directory only on plain parquet;
    * the commit marker closes the observability gap: it is written LAST,
    * after every partition swap, so a reader that checks
    * `lastCommit.exists(_.partitions == <expected>)` can detect a torn
    * multi-partition upsert (crash between swaps) and retry/alert —
    * the manifest-file shape of a Delta commit, minus the log. */
  private def writeCommitMarker(parts: Seq[String], inserted: Long, updated: Long): Unit = {
    val marker = new Path(s"$path/_graft_commit")
    val tmp = new Path(s"$path/._graft_commit_tmp")
    val payload =
      s"""{"ts":${System.currentTimeMillis()},"partitions":[${
        parts.map(p => "\"" + p + "\"").mkString(",")}],"inserted":$inserted,"updated":$updated}"""
    val out = fs.create(tmp, true)
    out.write(payload.getBytes("UTF-8"))
    out.close()
    if (fs.exists(marker)) fs.delete(marker, false)
    fs.rename(tmp, marker)
  }

  final case class Commit(ts: Long, partitions: Seq[String], inserted: Long, updated: Long)

  /** The last completed upsert's manifest, if any. */
  def lastCommit: Option[Commit] = {
    val marker = new Path(s"$path/_graft_commit")
    if (!fs.exists(marker)) return None
    val in = fs.open(marker)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def longOf(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(raw).map(_.group(1).toLong)
    val parts = """"partitions":\[([^\]]*)\]""".r.findFirstMatchIn(raw)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    for (ts <- longOf("ts"); i <- longOf("inserted"); u <- longOf("updated"))
      yield Commit(ts, parts, i, u)
  }
}
