package graft.queries

import org.apache.spark.sql.functions._

import Det._

/** Aggregation + scalar-function operators from SURVEY.md §2.4/§2.12:
  * statistical summary (etl/time_series_analyzer.py:279-337), performance
  * summary with conditional sums (etl/database_manager.py:3417-3480),
  * vectorized quality check (etl/yfinance_extractor.py:123-150),
  * missing-data profile (etl/time_series_analyzer.py:121-183), distinct
  * census, rollup reporting, JSON-in-TEXT access, calendar flags, and
  * SHA-256 content hashing (etl/checkpoint_manager.py:107-121).
  *
  * All double aggregates route through decimal accumulation ([[Det]]) so
  * results are partition-order independent at any scale.
  */
object AggQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    // count/mean/std/min/max/skew/kurt per ticker — explicit exact moments.
    "q20_stats_summary" -> ((s, dir) => {
      import s.implicits._
      val x = $"price"
      val n = count(x).cast("double")
      val sx = sum(x.cast("decimal(38,6)")).cast("double")
      // higher moments GRID-EXACT (Det.qpowsum): the old DECIMAL(38,9)
      // casts rounded 12/18/24-dp products to 9 dp — the q83 tie class.
      // Squares on the raw 1e6 grid are exact; cubes/quartics on 1e4
      // (exact power-of-ten divisors 1e12/1e12/1e16)
      val sx2 = qpowsum(x, 1e6, 2)
      val sx3 = qpowsum(x, 1e4, 3)
      val sx4 = qpowsum(x, 1e4, 4)
      val mean = sx / n
      val m2 = sx2 / n - mean * mean
      val m3 = sx3 / n - lit(3.0) * mean * sx2 / n + lit(2.0) * mean * mean * mean
      val m4 = sx4 / n - lit(4.0) * mean * sx3 / n +
        lit(6.0) * mean * mean * sx2 / n - lit(3.0) * mean * mean * mean * mean
      Bars.of(s, dir).groupBy($"ticker").agg(
        count(x).as("n"),
        mean.as("mean"),
        dstddev(x).as("std"),
        min(x).as("min"),
        max(x).as("max"),
        (m3 / pow(m2, 1.5)).as("skew"),
        (m4 / (m2 * m2) - 3.0).as("kurt"))
    }),

    // win_rate / profit_factor / avg+largest win/loss over signed pnl.
    "q21_perf_summary" -> ((s, dir) => {
      import s.implicits._
      val pnl = $"price" - lit(100.0)
      val wins = sum(when(pnl > 0, pnl).otherwise(lit(0.0)).cast("decimal(38,6)")).cast("double")
      val losses = sum(when(pnl < 0, pnl).otherwise(lit(0.0)).cast("decimal(38,6)")).cast("double")
      Bars.of(s, dir).groupBy($"ticker").agg(
        count(lit(1)).as("n_trades"),
        (sum(when(pnl > 0, 1).otherwise(0)).cast("double") / count(lit(1))).as("win_rate"),
        (wins / abs(losses)).as("profit_factor"),
        (wins / sum(when(pnl > 0, 1).otherwise(0))).as("avg_win"),
        (losses / sum(when(pnl < 0, 1).otherwise(0))).as("avg_loss"),
        max(pnl).as("largest_win"),
        min(pnl).as("largest_loss"))
    }),

    // distinct census: exact per-group + percent share.
    "q22_distinct" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events").groupBy($"event_type").agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
    }),

    // ROLLUP reporting over (ticker, dow) with decimal sums.
    "q23_rollup" -> ((s, dir) => {
      import s.implicits._
      Bars.of(s, dir)
        .withColumn("dow", dayofweek($"ts") - 1)
        .rollup($"ticker", $"dow")
        .agg(count(lit(1)).as("n"), dsum($"price").as("sum_price"))
    }),

    // missing-data profile after synthetic null injection (value > 400 → NULL).
    "q24_missing_profile" -> ((s, dir) => {
      import s.implicits._
      val v = when($"price" > 400, lit(null)).otherwise($"price")
      Bars.of(s, dir).groupBy($"ticker").agg(
        count(lit(1)).as("n"),
        sum(when(v.isNull, 1).otherwise(0)).as("n_missing"),
        (sum(when(v.isNull, 1).otherwise(0)).cast("double") / count(lit(1))).as("missing_ratio"))
    }),

    // single-pass vectorized quality check.
    "q25_quality_check" -> ((s, dir) => {
      import s.implicits._
      val neg = sum(when($"price" <= 0, 1).otherwise(0))
      val zero = sum(when($"price" === lit(0.0), 1).otherwise(0))
      Bars.of(s, dir).groupBy($"ticker").agg(
        neg.as("n_nonpositive"),
        zero.as("n_zero"),
        (lit(1.0) - neg.cast("double") / count(lit(1))).as("quality_score"))
    }),

    // JSON-in-TEXT access (props -> k) + grouped agg on the extracted key.
    "q26_json_extract" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events")
        .select($"event_id",
          get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy(($"k" % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), max($"k").as("max_k"))
    }),

    // calendar flags: month-end / quarter-end per distinct day.
    "q27_calendar" -> ((s, dir) => {
      import s.implicits._
      // d stays TimestampType: pandas renders parquet date32 as datetime.date
      // but DuckDB DATE as Timestamp — the driver's cell normalizer would
      // then never match. Timestamps normalize identically on both sides.
      Bars.of(s, dir)
        .select($"day".as("d")).distinct()
        .select($"d",
          (last_day(to_date($"d")) === to_date($"d")).cast("int").as("is_month_end"),
          ((last_day(to_date($"d")) === to_date($"d")) &&
            month($"d").isin(3, 6, 9, 12)).cast("int").as("is_quarter_end"),
          month($"d").as("month"), quarter($"d").as("quarter"))
    }),

    // SHA-256 content hash per document (checkpoint/dataset-id hashing).
    "q28_content_hash" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "documents")
        .select($"doc_id", sha2($"text", 256).as("text_sha"),
          upper(trim($"source")).as("source_norm"))
    }),

    // CUBE over (event_type, dow) with grouping_id — q23's rollup
    // sibling covering the full 2^k lattice; gid pins that both
    // engines assign the same bitmask (leftmost column = MSB).
    "q197_cube" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events")
        .withColumn("dow", dayofweek($"ts") - 1)
        .cube($"event_type", $"dow")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"),
          grouping_id().cast("long").as("gid"))
    }),

    // PIVOT: per-user wide matrix of count + exact decimal value-sum by
    // event type — explicit value list, so the plan is a single
    // groupBy(user_id) with no distinct-values pre-scan (the two-pass
    // auto-infer form is the scale trap; at 100 TB the value list is
    // config, not discovery). Absent (user, type) combos are NULL in
    // Spark's pivot; the oracle mirrors with NULLIF/CASE.
    "q198_pivot" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("v"))
    }),

    // Order-independent table fingerprint (anti-entropy checksum): the
    // MERGE/replication verifier that tells two 100 TB replicas apart
    // in ONE aggregation pass with no sort and no shuffle beyond the
    // final 1-row combine — per-row md5 over a canonical serialization
    // (doubles quantized via Det so the serialization is engine-stable,
    // every nullable column coalesced to a sentinel BEFORE concat —
    // Spark's concat_ws SKIPS nulls while || propagates them, so
    // explicit coalesce is the only portable null story), folded by
    // commutative SUM (split 30-bit lo/hi so 100k×2^30 stays far inside
    // BIGINT) and BIT_XOR channels. Equal fingerprints don't prove
    // equality, but unequal ones locate drift for free.
    "q206_table_checksum" -> ((s, dir) => {
      import s.implicits._
      val qv = Det.qfloor($"value", 1e6).cast("long")
      val key = md5(concat(
        $"event_id".cast("string"), lit("|"),
        unix_micros($"ts").cast("string"), lit("|"),
        $"user_id".cast("string"), lit("|"),
        coalesce($"event_type", lit("~")), lit("|"),
        coalesce(qv.cast("string"), lit("~")), lit("|"),
        coalesce($"props", lit("~"))))
      graft.Tables.load(s, dir, "events")
        .select(conv(substring(key, 18, 15), 16, 10).cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(pmod($"h", lit(1073741824L))).as("sum_lo"),
          sum(expr("h div 1073741824")).as("sum_hi"),
          expr("bit_xor(h)").as("xor_h"))
    }),

    // Exact WEIGHTED median (per-lang doc length weighted by token
    // count) via cumulative-weight rank arithmetic — q136's unweighted
    // rank trick generalized: the median is the first value whose
    // running weight reaches half the total (2·cw ≥ tw in integers, no
    // division), one partitioned window + one aggregate, no global
    // sort. The weighted form is what mixture/budget planning actually
    // needs: "the doc length below which half the TOKENS sit", not
    // half the docs.
    "q205_weighted_median" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val run = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.Tables.load(s, dir, "documents")
        .select($"lang", $"doc_id", $"n_chars",
          size(split($"text", " ")).cast("long").as("wt"))
        .withColumn("cw", sum($"wt").over(run))
        .withColumn("tw", sum($"wt").over(Window.partitionBy($"lang")))
        .where($"cw" * 2 >= $"tw")
        .groupBy($"lang")
        .agg(min($"n_chars").as("median_chars"), max($"tw").as("total_tokens"))
    })
  )

  override def oracles: Map[String, String] = {
    val sx = "CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE)"
    val sx2 = sqlQpowsum("price", "1e6", 2, "1e12")
    val sx3 = sqlQpowsum("price", "1e4", 3, "1e12")
    val sx4 = sqlQpowsum("price", "1e4", 4, "1e16")
    Map(
      "q20_stats_summary" ->
        s"""${Bars.sql}
           |SELECT ticker, COUNT(price) AS n,
           |  $sx / CAST(COUNT(price) AS DOUBLE) AS mean,
           |  ${sqlStddev("price")} AS std,
           |  MIN(price) AS min, MAX(price) AS max,
           |  (($sx3/CAST(COUNT(price) AS DOUBLE)
           |    - 3.0*($sx/CAST(COUNT(price) AS DOUBLE))*$sx2/CAST(COUNT(price) AS DOUBLE)
           |    + 2.0*($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE)))
           |   / pow($sx2/CAST(COUNT(price) AS DOUBLE) - ($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE)), 1.5)) AS skew,
           |  (($sx4/CAST(COUNT(price) AS DOUBLE)
           |    - 4.0*($sx/CAST(COUNT(price) AS DOUBLE))*$sx3/CAST(COUNT(price) AS DOUBLE)
           |    + 6.0*($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE))*$sx2/CAST(COUNT(price) AS DOUBLE)
           |    - 3.0*($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE)))
           |   / (($sx2/CAST(COUNT(price) AS DOUBLE) - ($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE)))
           |      * ($sx2/CAST(COUNT(price) AS DOUBLE) - ($sx/CAST(COUNT(price) AS DOUBLE))*($sx/CAST(COUNT(price) AS DOUBLE)))) - 3.0) AS kurt
           |FROM bars GROUP BY ticker""".stripMargin,
      "q21_perf_summary" -> {
        val wins = "CAST(SUM(CAST(CASE WHEN price - 100.0 > 0 THEN price - 100.0 ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
        val losses = "CAST(SUM(CAST(CASE WHEN price - 100.0 < 0 THEN price - 100.0 ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
        s"""${Bars.sql}
           |SELECT ticker, COUNT(*) AS n_trades,
           |  CAST(SUM(CASE WHEN price - 100.0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS win_rate,
           |  $wins / abs($losses) AS profit_factor,
           |  $wins / SUM(CASE WHEN price - 100.0 > 0 THEN 1 ELSE 0 END) AS avg_win,
           |  $losses / SUM(CASE WHEN price - 100.0 < 0 THEN 1 ELSE 0 END) AS avg_loss,
           |  MAX(price - 100.0) AS largest_win,
           |  MIN(price - 100.0) AS largest_loss
           |FROM bars GROUP BY ticker""".stripMargin
      },
      "q22_distinct" ->
        """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
          |FROM events GROUP BY 1""".stripMargin,
      "q23_rollup" ->
        s"""${Bars.sql}
           |SELECT ticker, date_part('dow', ts) AS dow, COUNT(*) AS n,
           |  ${sqlSum("price")} AS sum_price
           |FROM bars GROUP BY ROLLUP(ticker, dow)""".stripMargin,
      "q24_missing_profile" ->
        s"""${Bars.sql}
           |SELECT ticker, COUNT(*) AS n,
           |  CAST(SUM(CASE WHEN price > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           |  CAST(SUM(CASE WHEN price > 400 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS missing_ratio
           |FROM bars GROUP BY ticker""".stripMargin,
      "q25_quality_check" ->
        s"""${Bars.sql}
           |SELECT ticker,
           |  CAST(SUM(CASE WHEN price <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive,
           |  CAST(SUM(CASE WHEN price = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           |  1.0 - CAST(SUM(CASE WHEN price <= 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS quality_score
           |FROM bars GROUP BY ticker""".stripMargin,
      "q26_json_extract" ->
        """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
          |  COUNT(*) AS n,
          |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
          |FROM events GROUP BY 1""".stripMargin,
      "q27_calendar" ->
        s"""${Bars.sql}
           |SELECT DISTINCT day AS d,
           |  CAST(last_day(CAST(day AS DATE)) = CAST(day AS DATE) AS INT) AS is_month_end,
           |  CAST(last_day(CAST(day AS DATE)) = CAST(day AS DATE)
           |       AND date_part('month', day) IN (3,6,9,12) AS INT) AS is_quarter_end,
           |  date_part('month', day) AS month,
           |  date_part('quarter', day) AS quarter
           |FROM bars""".stripMargin,
      "q28_content_hash" ->
        """SELECT doc_id, sha256(text) AS text_sha, upper(trim(source)) AS source_norm
          |FROM documents""".stripMargin,
      "q197_cube" ->
        s"""WITH e AS (
           |  SELECT event_type, date_part('dow', ts) AS dow, value FROM events)
           |SELECT event_type, dow, COUNT(*) AS n,
           |  ${sqlSum("value")} AS sum_value,
           |  CAST(GROUPING(event_type, dow) AS BIGINT) AS gid
           |FROM e GROUP BY CUBE(event_type, dow)""".stripMargin,
      "q206_table_checksum" -> {
        val hexParse =
          """list_reduce(list_transform(string_split_regex(substr(k, 18, 15), ''),
            |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)""".stripMargin
        val qv = s"CAST(${sqlQfloor("value", "1e6")} AS BIGINT)"
        s"""WITH keyed AS (
           |  SELECT md5(
           |    CAST(event_id AS VARCHAR) || '|' ||
           |    CAST(epoch_us(ts) AS VARCHAR) || '|' ||
           |    CAST(user_id AS VARCHAR) || '|' ||
           |    COALESCE(event_type, '~') || '|' ||
           |    COALESCE(CAST($qv AS VARCHAR), '~') || '|' ||
           |    COALESCE(props, '~')) AS k
           |  FROM events),
           |h AS (SELECT $hexParse AS h FROM keyed)
           |SELECT COUNT(*) AS n_rows,
           |  CAST(SUM(h % 1073741824) AS BIGINT) AS sum_lo,
           |  CAST(SUM(h // 1073741824) AS BIGINT) AS sum_hi,
           |  bit_xor(h) AS xor_h
           |FROM h""".stripMargin
      },
      "q205_weighted_median" ->
        """WITH d AS (
          |  SELECT lang, doc_id, n_chars,
          |    len(string_split(text, ' ')) AS wt
          |  FROM documents),
          |c AS (
          |  SELECT *,
          |    SUM(wt) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          |    SUM(wt) OVER (PARTITION BY lang) AS tw
          |  FROM d)
          |SELECT lang, MIN(n_chars) AS median_chars,
          |  CAST(MAX(tw) AS BIGINT) AS total_tokens
          |FROM c WHERE cw * 2 >= tw GROUP BY 1""".stripMargin,
      "q198_pivot" -> {
        def arm(v: String) =
          s"""NULLIF(COUNT(CASE WHEN event_type = '$v' THEN 1 END), 0) AS ${v}_n,
             |  ${sqlSum(s"CASE WHEN event_type = '$v' THEN value END")} AS ${v}_v""".stripMargin
        s"""SELECT user_id,
           |  ${Seq("view", "click", "purchase", "signup", "error")
                .map(arm).mkString(",\n  ")}
           |FROM events GROUP BY 1""".stripMargin
      }
    )
  }
}
