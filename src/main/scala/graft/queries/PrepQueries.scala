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
    }),

    // The post-preprocess structural validator + PASS/WARN/FAIL routing
    // (reference etl/preprocessor.py:79-214, classification :174-186)
    // under the oracle gate: the REAL Validator.reportDf aggregation
    // (lazy — no job at construction) over four deterministic scenarios
    // derived from the same bars — clean (PASS/CLEAN), injected volume
    // nulls (WARN via missing-ratio + residual nulls → SPARSE_DATA), a
    // high imputed-fraction on clean data (WARN → HIGH_IMPUTE,
    // research_ok but not production_ok), and duplicated keys (FAIL →
    // BLOCKED). Every count, the missing ratio, the status chain, and
    // the classificationCols routing replay as closed-form SQL.
    "q173_quality_routing" -> ((s, dir) => {
      import s.implicits._
      val base = Bars.of(s, dir).select($"ticker", $"seq".as("date"),
        $"price".as("open"), ($"price" * lit(1.01)).as("high"),
        ($"price" * lit(0.99)).as("low"), $"price".as("close"),
        lit(100L).as("volume"))
      val scenarios = Seq(
        ("clean", base, 0.0),
        ("warn", base.withColumn("volume",
          when(pmod($"date", lit(3)) === 0, lit(null).cast("long"))
            .otherwise($"volume")), 0.0),
        ("impute", base, 0.35),
        ("fail", base.unionAll(base.where(pmod($"date", lit(50)) === 0)), 0.0))
      scenarios.map { case (name, df, imputed) =>
        graft.etl.Validator.reportDf(df)
          .withColumn("scenario", lit(name))
          .select(Seq($"scenario", $"n_rows", $"n_tickers", $"n_dup",
            $"n_nonmono", $"n_nonfinite", $"n_nulls", $"n_nonpos",
            $"n_negvol", $"missing_ratio", $"min_bars", $"status") ++
            graft.etl.Validator.classificationCols(
              $"status", lit(imputed), lit(0.0)): _*)
      }.reduce(_ unionByName _)
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
         |FROM tagged t LEFT JOIN stats s USING (ticker)""".stripMargin,

    // each scenario replays reportDf's aggregation (window columns →
    // one global agg → status chain) plus the classificationCols
    // routing with its scenario's imputed-fraction literal; the
    // missing ratio is the same left-associated five-term avg sum / 5
    "q173_quality_routing" -> {
      def nf(c: String) =
        s"SUM(CASE WHEN isnan($c) OR $c = CAST('infinity' AS DOUBLE) OR $c = CAST('-infinity' AS DOUBLE) THEN 1 ELSE 0 END)"
      def nn(c: String) = s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"
      def np(c: String) = s"SUM(CASE WHEN $c <= 0 THEN 1 ELSE 0 END)"
      def mr(c: String) = s"AVG(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"
      val cols = Seq("open", "high", "low", "close")
      def rep(src: String, scen: String, imputed: String): String = {
        val hi = s"(CAST($imputed AS DOUBLE) > CAST(0.30 AS DOUBLE) OR CAST(0.0 AS DOUBLE) > CAST(0.20 AS DOUBLE))"
        s"""SELECT '$scen' AS scenario, r.*,
           |  CASE WHEN status = 'FAIL' THEN FALSE
           |       WHEN status = 'WARN' OR $hi THEN FALSE
           |       ELSE TRUE END AS production_ok,
           |  CASE WHEN status = 'FAIL' THEN FALSE ELSE TRUE END AS research_ok,
           |  CASE WHEN status = 'FAIL' THEN 'BLOCKED'
           |       WHEN $hi THEN 'HIGH_IMPUTE'
           |       WHEN status = 'WARN' THEN 'SPARSE_DATA'
           |       ELSE 'CLEAN' END AS quality_tag
           |FROM (
           |  SELECT a.*,
           |    CASE WHEN n_rows = 0 OR n_dup > 0 OR n_nonmono > 0
           |           OR n_nonfinite > 0 OR n_nonpos > 0 OR n_negvol > 0
           |           OR COALESCE(min_bars, 0) < 30 THEN 'FAIL'
           |         WHEN missing_ratio > CAST(0.05 AS DOUBLE) OR n_nulls > 0
           |           THEN 'WARN'
           |         ELSE 'PASS' END AS status
           |  FROM (
           |    SELECT COUNT(*) AS n_rows,
           |      COUNT(DISTINCT ticker) AS n_tickers,
           |      CAST(SUM(CASE WHEN key_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           |      CAST(SUM(CASE WHEN prev_date IS NOT NULL AND date <= prev_date
           |          THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmono,
           |      CAST(${cols.map(nf).reduce((a, b) => s"($a + $b)")} AS BIGINT) AS n_nonfinite,
           |      CAST(${(cols :+ "volume").map(nn).reduce((a, b) => s"($a + $b)")} AS BIGINT) AS n_nulls,
           |      CAST(${cols.map(np).reduce((a, b) => s"($a + $b)")} AS BIGINT) AS n_nonpos,
           |      CAST(SUM(CASE WHEN volume < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negvol,
           |      ${(cols :+ "volume").map(mr).reduce((a, b) => s"($a + $b)")} / 5
           |        AS missing_ratio,
           |      MIN(ticker_bars) AS min_bars
           |    FROM (
           |      SELECT t.*,
           |        lag(date, 1) OVER (PARTITION BY ticker ORDER BY date)
           |          AS prev_date,
           |        count(*) OVER (PARTITION BY ticker, date) AS key_cnt,
           |        count(*) OVER (PARTITION BY ticker) AS ticker_bars
           |      FROM $src t)) a) r""".stripMargin
      }
      s"""${Bars.sql},
         |vbase AS (
         |  SELECT ticker, seq AS date, price AS open,
         |    price * CAST(1.01 AS DOUBLE) AS high,
         |    price * CAST(0.99 AS DOUBLE) AS low,
         |    price AS close, CAST(100 AS BIGINT) AS volume
         |  FROM bars),
         |vwarn AS (
         |  SELECT ticker, date, open, high, low, close,
         |    CASE WHEN date % 3 = 0 THEN NULL ELSE volume END AS volume
         |  FROM vbase),
         |vfail AS (
         |  SELECT * FROM vbase
         |  UNION ALL SELECT * FROM vbase WHERE date % 50 = 0)
         |${rep("vbase", "clean", "0.0")}
         |UNION ALL ${rep("vwarn", "warn", "0.0")}
         |UNION ALL ${rep("vbase", "impute", "0.35")}
         |UNION ALL ${rep("vfail", "fail", "0.0")}""".stripMargin
    }
  )
}
