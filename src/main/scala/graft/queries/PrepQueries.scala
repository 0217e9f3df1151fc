package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Preprocessor

/** Preprocessor operators under the oracle gate — the missing-data fills
  * and the leak-safe z-score (reference etl/preprocessor.py:48-74 fills,
  * :216-328 normalization; post-split application forced by
  * scripts/run_etl_pipeline.py:1463-1482).
  *
  * Null injection is deterministic on BOTH sides (seq % 7, leading rows)
  * and the fill value is floor(price): integer-valued doubles make every
  * double sum exact regardless of summation order, so the group-mean arm
  * and the window averages hash identically on any engine. The fills
  * themselves run through the REAL [[graft.etl.Preprocessor]] code.
  */
object PrepQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    // All four missing-data strategies in one gate, each on its own
    // column: v_ff causal ffill only; v_fb ffill+bfill (leading nulls
    // backfilled); v_gm ffill+group-mean (leading nulls get the ticker
    // mean of the surviving values); v_li linear interpolation with
    // edge fallback. Leading nulls are forced (rn <= 2) so the
    // bfill/group-mean branches fire at every SF.
    "q154_preprocess_fill" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"ticker").orderBy($"date")
      val b0 = Bars.of(s, dir)
        .select($"ticker", $"seq".as("date"),
          floor($"price").cast("double").as("v0"))
        .withColumn("rn", row_number().over(w))
      val nul = lit(null).cast("double")
      val interior = when(pmod($"date", lit(7)) === 0, nul).otherwise($"v0")
      val leading = when($"rn" <= 2 || pmod($"date", lit(7)) === 0, nul)
        .otherwise($"v0")
      val base = b0.select($"ticker", $"date",
        interior.as("v_ff"), leading.as("v_fb"),
        leading.as("v_gm"), interior.as("v_li"))
      val s1 = Preprocessor.handleMissing(base, Seq("v_ff"),
        backfill = false, groupMean = false)
      val s2 = Preprocessor.handleMissing(s1, Seq("v_fb"),
        backfill = true, groupMean = false)
      val s3 = Preprocessor.handleMissing(s2, Seq("v_gm"),
        backfill = false, groupMean = true)
      Preprocessor.interpolate(s3, "v_li")
        .select($"ticker", $"date", $"v_ff", $"v_fb", $"v_gm", $"v_li")
    }),

    // Leak-safe z-score: stats fitted on the chronological 70% train
    // prefix per ticker, applied WITHOUT refit to every row (train and
    // test alike — the reference's post-split normalization). Emitting
    // the role alongside z pins the cut-point arithmetic too.
    "q155_zscore_split" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"ticker").orderBy($"ts", $"seq")
      val b = Bars.of(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"ticker")))
      val tagged = b.withColumn("role",
        when($"rn" <= floor($"cnt" * lit(0.7)), lit("train"))
          .otherwise(lit("test")))
      val train = tagged.where($"role" === "train")
      val stats = Preprocessor.fitZScore(train, Seq("price"))
      Preprocessor.applyZScore(tagged, stats, Seq("price"))
        .select($"ticker", $"seq", $"role", $"price".as("z"))
    })
  )

  override def oracles: Map[String, String] = Map(
    // every fill replayed with the identical window frames; IGNORE NULLS
    // mirrors Spark's last/first(ignoreNulls); the group mean averages
    // the POST-injection column (nulls ignored), exactly as
    // handleMissing's avg-over-partition does
    "q154_preprocess_fill" ->
      s"""${Bars.sql},
         |b0 AS (
         |  SELECT ticker, seq AS date,
         |         CAST(FLOOR(price) AS DOUBLE) AS v0,
         |         row_number() OVER (PARTITION BY ticker ORDER BY seq) AS rn
         |  FROM bars),
         |base AS (
         |  SELECT ticker, date, rn,
         |    CASE WHEN date % 7 = 0 THEN NULL ELSE v0 END AS v_ff,
         |    CASE WHEN rn <= 2 OR date % 7 = 0 THEN NULL ELSE v0 END AS v_fb,
         |    CASE WHEN rn <= 2 OR date % 7 = 0 THEN NULL ELSE v0 END AS v_gm,
         |    CASE WHEN date % 7 = 0 THEN NULL ELSE v0 END AS v_li
         |  FROM b0),
         |filled AS (
         |  SELECT ticker, date, rn, v_li,
         |    last_value(v_ff IGNORE NULLS) OVER wp AS f_ff,
         |    COALESCE(
         |      last_value(v_fb IGNORE NULLS) OVER wp,
         |      first_value(v_fb IGNORE NULLS) OVER wf) AS f_fb,
         |    COALESCE(
         |      last_value(v_gm IGNORE NULLS) OVER wp,
         |      avg(v_gm) OVER (PARTITION BY ticker)) AS f_gm,
         |    last_value(v_li IGNORE NULLS) OVER wp AS li_prev,
         |    last_value(CASE WHEN v_li IS NOT NULL THEN rn END IGNORE NULLS)
         |      OVER wp AS li_prev_rn,
         |    first_value(v_li IGNORE NULLS) OVER wf AS li_next,
         |    first_value(CASE WHEN v_li IS NOT NULL THEN rn END IGNORE NULLS)
         |      OVER wf AS li_next_rn
         |  FROM base
         |  WINDOW
         |    wp AS (PARTITION BY ticker ORDER BY date
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wf AS (PARTITION BY ticker ORDER BY date
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT ticker, date, f_ff AS v_ff, f_fb AS v_fb, f_gm AS v_gm,
         |  CASE
         |    WHEN v_li IS NOT NULL THEN v_li
         |    WHEN li_prev IS NOT NULL AND li_next IS NOT NULL
         |         AND li_next_rn <> li_prev_rn
         |      THEN li_prev + (li_next - li_prev) * (rn - li_prev_rn)
         |           / (li_next_rn - li_prev_rn)
         |    ELSE COALESCE(v_li, li_prev, li_next)
         |  END AS v_li
         |FROM filled""".stripMargin,

    // stats from the train prefix only (Det's exact decimal moments on
    // both sides), applied to all rows; the std=0/null → 0 branch and
    // the FLOOR(cnt * 0.7-as-double) cut both mirrored
    "q155_zscore_split" ->
      s"""${Bars.sql},
         |b AS (
         |  SELECT ticker, ts, seq, price,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn,
         |    count(*) OVER (PARTITION BY ticker) AS cnt
         |  FROM bars),
         |tagged AS (
         |  SELECT *, CASE WHEN rn <= FLOOR(cnt * CAST(0.7 AS DOUBLE))
         |    THEN 'train' ELSE 'test' END AS role FROM b),
         |stats AS (
         |  SELECT ticker, ${Det.sqlAvg12("price")} AS m,
         |         ${Det.sqlStddev12("price")} AS sd
         |  FROM tagged WHERE role = 'train' GROUP BY ticker)
         |SELECT t.ticker, t.seq, t.role,
         |  CASE WHEN s.sd IS NULL OR s.sd = 0.0 OR s.m IS NULL THEN 0.0
         |       ELSE (t.price - s.m) / s.sd END AS z
         |FROM tagged t LEFT JOIN stats s USING (ticker)""".stripMargin
  )
}
