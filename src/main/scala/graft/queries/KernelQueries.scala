package graft.queries

import org.apache.spark.sql.functions._

import graft.forecast.Ewma

/** Sequential-recurrence kernels surfaced through the oracle gate.
  *
  * q47 runs the REAL graft.forecast.Ewma kernel inside a per-ticker
  * `groupByKey.flatMapGroups` (the engine's topology for recurrences) and
  * the oracle replays the identical IEEE operation sequence with a
  * DuckDB recursive CTE — so the comparison is bit-exact, no rounding.
  */
object KernelQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q47_ewma_vol" -> ((s, dir) => {
      import s.implicits._
      Bars.of(s, dir)
        .select($"ticker", $"ts", $"seq", $"price")
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
          val rets = sorted.sliding(2).collect {
            case Array(a, b) => (b._3, b._4 / a._4 - 1) // (seq, return)
          }.toArray
          val path = Ewma.variancePath(rets.map(_._2), 0.94)
          rets.zip(path).map { case ((seq, _), s2) => (ticker, seq, s2) }.iterator
        }
        .toDF("ticker", "seq", "ewma_var")
    })
  )

  override def oracles: Map[String, String] = Map(
    // identical op order: s2_1 = r*r; s2_n = 0.94*prev + (1-0.94)*r*r,
    // all in DOUBLE (the bare 0.94 literal would be DECIMAL in DuckDB and
    // fold 1-0.94 exactly — CASTs force the same IEEE constants Scala uses)
    "q47_ewma_vol" ->
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |rets AS (
         |  SELECT ticker, seq, ts,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY ts, seq) - 1 AS r
         |  FROM bars),
         |numbered AS (
         |  SELECT ticker, seq, r,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM rets WHERE r IS NOT NULL),
         |rec AS (
         |  SELECT ticker, seq, rn, r * r AS s2 FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT t.ticker, t.seq, t.rn,
         |    CAST(0.94 AS DOUBLE) * rec.s2
         |      + (CAST(1 AS DOUBLE) - CAST(0.94 AS DOUBLE)) * t.r * t.r
         |  FROM numbered t JOIN rec
         |    ON t.ticker = rec.ticker AND t.rn = rec.rn + 1)
         |SELECT ticker, seq, s2 AS ewma_var FROM rec""".stripMargin
  )
}
