package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A bar-series view derived deterministically from the `events` table so
  * the per-ticker window operators of the reference feature engine
  * (/root/reference/etl/time_series_feature_builder.py:71-290) can be
  * exercised and DuckDB-oracled on driver testdata:
  * ticker = event_type, time = (ts, event_id) [event_id breaks ties],
  * price = value, day = date_trunc('day', ts) for cross-sectional ops.
  *
  * Scale note: partitioned by ticker → every per-ticker window is a
  * single narrow shuffle on ticker; cross-sectional ops shuffle on day.
  */
object Bars {
  def of(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "events")
      // zero prices would divide-by-zero every return expression under
      // ANSI mode (sf0.1 contains a handful) — excluded on BOTH sides
      .where(col("value") =!= 0)
      .select(
        col("event_type").as("ticker"),
        col("ts"),
        col("event_id").as("seq"),
        col("value").as("price"),
        date_trunc("day", col("ts")).as("day"))

  /** The first `n` bars per ticker in (ts, seq) order, rank-filtered
    * IN-PLAN before any per-ticker kernel groups them: the window keeps
    * only n rows per ticker, so `groupByKey(...).flatMapGroups` holds
    * O(n) rows per group regardless of the per-ticker bar count — a
    * billion-bar ticker at 100 TB costs the same executor memory as a
    * 200-bar one. (Kernels still sort their ≤ n survivors: the shuffle
    * does not preserve order.) Mirrors the oracles' `QUALIFY rn <= n`. */
  def firstN(s: SparkSession, dir: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ticker")).orderBy(col("ts"), col("seq"))
    of(s, dir)
      .select(col("ticker"), col("ts"), col("seq"), col("price"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= n)
      .select(col("ticker"), col("ts"), col("seq"), col("price"))
  }

  /** DuckDB CTE mirroring [[of]] — prepend to oracle SQL. */
  val sql: String =
    """WITH bars AS (
      |  SELECT event_type AS ticker, ts, event_id AS seq, value AS price,
      |         date_trunc('day', ts) AS day
      |  FROM events WHERE value <> 0
      |)""".stripMargin

  /** [[sql]] plus a `barsn` CTE mirroring [[firstN]]. Sequential-kernel
    * oracles (per-bar recursive CTEs: EWMA/Kalman/GARCH) read `barsn`
    * so their recursion depth is FIXED at n per ticker at every scale
    * factor — the oracle walks the same ~n-step recurrence whether the
    * table holds 2k or 20k bars per ticker, instead of a depth (and
    * roughly quadratic cost) that grows with SF. */
  def sqlFirstN(n: Int): String =
    s"""$sql,
       |barsn AS (
       |  SELECT ticker, ts, seq, price, day FROM (
       |    SELECT ticker, ts, seq, price, day,
       |      row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS brn
       |    FROM bars) b WHERE brn <= $n)""".stripMargin
}
