package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** Data-layout queries: the Z-order (Morton) key pipeline under the
  * oracle gate.
  *
  * q183 runs the REAL [[graft.sources.ZOrder]] key arithmetic — the
  * same Column expressions [[graft.sources.ZOrderLayout.write]] lays
  * files out with — over the events table and reports, per Z-curve
  * bucket (top 6 key bits = 64 curve segments, the per-file granularity
  * of a 64-file layout), the row count and the (user_id, value)
  * bounding rectangle. Those per-bucket rectangles ARE the layout
  * property the writer exists for: each curve segment covers a bounded
  * range of BOTH dimensions, which is what parquet footer min/max
  * pruning consumes. The oracle replays the quantizer (clamp + the
  * 3-op IEEE interior path) and the 4-step magic-mask bit spread as
  * chained CTEs — every op is 64-bit integer shift/AND/OR or a
  * mirrored double op, so the gate is exact with no float-class caveat
  * beyond the documented shared-IEEE multiply/divide.
  */
object LayoutQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q183_zorder_locality" -> ((s, dir) => {
      import s.implicits._
      val ev = graft.Tables.load(s, dir, "events").select($"user_id", $"value")
      // quantizer bounds: one-row broadcast params frame (the standing
      // crossJoin-against-broadcast-dim pattern, zero shuffle)
      val b = ev.agg(
        min($"user_id".cast("double")).as("ulo"),
        max($"user_id".cast("double")).as("uhi"),
        min($"value").as("vlo"), max($"value").as("vhi"))
      ev.crossJoin(broadcast(b))
        .withColumn("zkey", ZOrder.interleave2(
          ZOrder.quant16($"user_id".cast("double"), $"ulo", $"uhi"),
          ZOrder.quant16($"value", $"vlo", $"vhi")))
        .withColumn("z_bucket", shiftright($"zkey", 26))
        .groupBy($"z_bucket")
        .agg(count(lit(1)).as("n"),
          min($"user_id").as("u_min"), max($"user_id").as("u_max"),
          min($"value").as("v_min"), max($"value").as("v_max"),
          min($"zkey").as("z_min"), max($"zkey").as("z_max"))
    })
  )

  override def oracles: Map[String, String] = {
    // quant16: clamp to the edge buckets, interior by the same
    // left-associated (v - lo) * 65535.0 / (hi - lo) double expression
    def q16(v: String, lo: String, hi: String) =
      s"""CASE WHEN $v <= $lo THEN CAST(0 AS BIGINT)
         |     WHEN $v >= $hi THEN CAST(65535 AS BIGINT)
         |     ELSE CAST(FLOOR(($v - $lo) * 65535.0 / ($hi - $lo)) AS BIGINT) END""".stripMargin
    Map(
      "q183_zorder_locality" ->
        s"""WITH b AS (
           |  SELECT MIN(CAST(user_id AS DOUBLE)) AS ulo,
           |         MAX(CAST(user_id AS DOUBLE)) AS uhi,
           |         MIN(value) AS vlo, MAX(value) AS vhi
           |  FROM events),
           |q AS (
           |  SELECT user_id, value,
           |    ${q16("CAST(user_id AS DOUBLE)", "ulo", "uhi")} AS xu,
           |    ${q16("value", "vlo", "vhi")} AS xv
           |  FROM events, b),
           |s1 AS (SELECT user_id, value,
           |  (((xu & 65535) | ((xu & 65535) << 8)) & 16711935) AS au,
           |  (((xv & 65535) | ((xv & 65535) << 8)) & 16711935) AS av FROM q),
           |s2 AS (SELECT user_id, value,
           |  ((au | (au << 4)) & 252645135) AS bu,
           |  ((av | (av << 4)) & 252645135) AS bv FROM s1),
           |s3 AS (SELECT user_id, value,
           |  ((bu | (bu << 2)) & 858993459) AS cu,
           |  ((bv | (bv << 2)) & 858993459) AS cv FROM s2),
           |s4 AS (SELECT user_id, value,
           |  ((cu | (cu << 1)) & 1431655765) AS du,
           |  ((cv | (cv << 1)) & 1431655765) AS dv FROM s3),
           |k AS (SELECT user_id, value, (du | (dv << 1)) AS zkey FROM s4)
           |SELECT zkey >> 26 AS z_bucket, COUNT(*) AS n,
           |  MIN(user_id) AS u_min, MAX(user_id) AS u_max,
           |  MIN(value) AS v_min, MAX(value) AS v_max,
           |  MIN(zkey) AS z_min, MAX(zkey) AS z_max
           |FROM k GROUP BY 1""".stripMargin
    )
  }
}
