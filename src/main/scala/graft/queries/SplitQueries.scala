package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Splitter
import Det._

/** Split / CV / drift operators (SURVEY.md §2.8) + the covariance-matrix
  * operator (§2.10), run through the REAL graft.etl.Splitter and oracled
  * by replicating its unique-date cut-point arithmetic in SQL.
  */
object SplitQueries extends QueryModule {

  private def asBars(s: org.apache.spark.sql.SparkSession, dir: String) =
    Bars.of(s, dir).select(
      col("ticker"), col("ts").as("date"), col("price").as("close"), col("day"))

  override def queries: Map[String, QFn] = Map(
    // chronological 70/15/15 tags by unique date (data_storage.py:179-439)
    "q80_split_tags" -> ((s, dir) => {
      Splitter.chronological(asBars(s, dir))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), dsum(col("close")).as("sum_close"))
    }),

    // expanding k-fold CV fold/role census (time_series_cv.py:55-322) —
    // the lazy rank-join path (no driver collect at construction); the
    // eager FoldSpec API stays spec-covered for pipeline consumers
    "q81_cv_folds" -> ((s, dir) => {
      Splitter.cvFoldTags(asBars(s, dir), k = 4)
        .groupBy(col("fold_id"), col("role"))
        .agg(count(lit(1)).as("n"))
    }),

    // mean/std drift between train and validation (split_diagnostics.py:58-80)
    "q82_split_drift" -> ((s, dir) => {
      val tagged = Splitter.chronological(asBars(s, dir))
      val a = when(col("split") === "training", col("close"))
      val b = when(col("split") === "validation", col("close"))
      tagged.where(col("split").isin("training", "validation"))
        .groupBy(col("ticker")).agg(
          (davg(b) - davg(a)).as("mean_delta"),
          (dstddev(b) - dstddev(a)).as("std_delta"),
          (dstddev(b) / dstddev(a)).as("vol_ratio"))
    }),

    // pairwise Pearson correlation of per-day mean prices across tickers
    // (covariance-matrix operator, portfolio_math.py:239-311) — daily dim
    // is tiny, so the pair join broadcasts.
    //
    // Moment quantization: pa/pb are full-precision doubles (davg
    // outputs), and casting their PRODUCTS to a fixed-scale decimal is
    // engine-rounding territory — Spark and DuckDB quantize a double's
    // last decimal digit through different paths and disagreed by one
    // ulp on sf0.001 data. floor(x·1e6 + 0.5) is pure IEEE double
    // arithmetic (identical in every engine); the quanta (≤1e10) and
    // their day-count-bounded sums stay exactly representable through
    // the DECIMAL(38,0) accumulation and the final double cast.
    "q83_corr_matrix" -> ((s, dir) => {
      import s.implicits._
      val daily = Bars.of(s, dir).groupBy($"ticker", $"day")
        .agg(davg($"price").as("p"))
      val a = daily.select($"ticker".as("ta"), $"day", $"p".as("pa"))
      val b = daily.select($"ticker".as("tb"), $"day", $"p".as("pb"))
      val pairs = a.join(b, Seq("day")).where($"ta" < $"tb")
      def q6(e: Column): Column =
        sum(floor(e * lit(1e6) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(1e6)
      val n = count(lit(1)).cast("double")
      val sx = q6($"pa")
      val sy = q6($"pb")
      val sxy = q6($"pa" * $"pb")
      val sx2 = q6($"pa" * $"pa")
      val sy2 = q6($"pb" * $"pb")
      pairs.groupBy($"ta", $"tb").agg(
        ((n * sxy - sx * sy) /
          sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))).as("corr"),
        ((n * sxy - sx * sy) / (n * (n - 1))).as("cov"))
    }),

    // Ledoit-Wolf shrunk covariance of daily returns with the OPTIMAL
    // intensity δ* (Ledoit & Wolf 2004; the sklearn estimator the
    // reference calls, portfolio_math.py:267-306), computed entirely as
    // distributed aggregations: pairwise centered moments give S (the /n
    // covariance), per-day row-sums of squares give b̄², and the tiny
    // scalar frame (μ, d², δ*) broadcasts back onto the pairs. Single
    // pass over days per aggregate; no driver-side matrix.
    "q84_ledoit_wolf" -> ((s, dir) => {
      import s.implicits._
      val daily = Bars.of(s, dir).groupBy($"ticker", $"day")
        .agg(davg($"price").as("p"))
      val wd = Window.partitionBy($"ticker").orderBy($"day")
      val rets = daily
        .select($"ticker", $"day", ($"p" / lag($"p", 1).over(wd) - 1).as("r"))
        .where($"r".isNotNull)
      // align: keep only days where every ticker has a return (the
      // ticker count joins in as a 1-row broadcast — no driver action)
      val nt = rets.agg(countDistinct($"ticker").as("p_t"))
      val full = rets.groupBy($"day").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(nt))
        .where($"c" === $"p_t").select($"day")
      val al = rets.join(broadcast(full), Seq("day"))
      // Moment quantization (the q83 fix, same hazard): r and its
      // products are full-precision doubles; decimal casts of them are
      // engine-rounding territory. floor(x·scale + 0.5) is engine-
      // invariant IEEE arithmetic; returns ~1e-2 keep every quantum and
      // sum exactly representable at these scales.
      def q12(e: Column): Column =
        sum(floor(e * lit(1e12) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(1e12)
      // center: per-ticker means (quantized-exact), broadcast back
      val means = al.groupBy($"ticker").agg((q12($"r") / count($"r")).as("m"))
      val cent = al.join(broadcast(means), Seq("ticker"))
        .select($"ticker", $"day", ($"r" - $"m").as("c"))
      // pairwise /n second moments -> S_ij (i <= j)
      val a = cent.select($"ticker".as("ta"), $"day", $"c".as("ca"))
      val b = cent.select($"ticker".as("tb"), $"day", $"c".as("cb"))
      val pairs = a.join(b, Seq("day")).where($"ta" <= $"tb")
        .groupBy($"ta", $"tb").agg(
          count(lit(1)).as("n"),
          (q12($"ca" * $"cb") / count(lit(1))).as("s"))
      // scalar frame: μ = tr(S)/p, ‖S‖²_F (off-diagonals count twice),
      // d², b̄² (via per-day row-sums of squares), δ* = min(b̄²,d²)/d².
      // Computed as WINDOW aggregates over the (tiny, p²-row) pairs set:
      // a separate .agg() branch would make Spark recompute the whole
      // pair-join subtree a second time — the window shares one scan.
      // NB: the day-count column must NOT be named "n" — pairs already
      // has an "n", and the crossJoin would make $"n" ambiguous.
      val rows = cent.groupBy($"day")
        .agg(q12($"c" * $"c").as("rk"))
        .agg(q12($"rk" * $"rk").as("q"),
          count(lit(1)).as("nd"))
      // single-partition window BY DESIGN (emits the WindowExec "No
      // Partition Defined" WARN once in the bench tail): its input is
      // the p×(p+1)/2 ticker-PAIR rows — a p-asset universe yields ~p²/2
      // rows (5k assets → 12.5M scalars at most, one task's worth) — so
      // the "all data to a single partition" cost is bounded by the
      // ASSET count, never the bar count. The fact-side reduction to
      // pair sums happened in the distributed aggs above.
      val wAll = Window.partitionBy(lit(1))
      def q12Over(e: Column): Column =
        sum(floor(e * lit(1e12) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .over(wAll).cast("double") / lit(1e12)
      val pCol = sum(when($"ta" === $"tb", 1L).otherwise(0L)).over(wAll).cast("double")
      val tr = q12Over(when($"ta" === $"tb", $"s").otherwise(lit(0.0)))
      val sumS2 = q12Over(when($"ta" === $"tb", $"s" * $"s")
        .otherwise(lit(2.0) * $"s" * $"s"))
      pairs
        .withColumn("p", pCol).withColumn("tr", tr).withColumn("sum_s2", sumS2)
        .withColumn("mu", $"tr" / $"p")
        .crossJoin(broadcast(rows))
        .withColumn("d2",
          ($"sum_s2" - lit(2.0) * $"mu" * $"tr" + $"p" * $"mu" * $"mu") / $"p")
        .withColumn("b2bar",
          ($"q" / $"nd" - $"sum_s2") / ($"nd".cast("double") * $"p"))
        .withColumn("delta",
          when($"d2" <= 0, lit(0.0))
            .otherwise(least(lit(1.0), greatest(lit(0.0), least($"b2bar", $"d2") / $"d2"))))
        .select($"ta", $"tb", $"s", $"delta",
          ((lit(1.0) - $"delta") * $"s" +
            when($"ta" === $"tb", $"delta" * $"mu").otherwise(lit(0.0))).as("shrunk"))
    })
  )

  // SQL mirror of Splitter.chronological's cut arithmetic (Scala
  // math.round == DuckDB round() for positive halves; all fractions
  // forced to DOUBLE so both engines fold constants identically).
  private val splitTagSql =
    s"""${Bars.sql},
       |d AS (SELECT DISTINCT ts FROM bars),
       |ranked AS (SELECT ts, row_number() OVER (ORDER BY ts) AS rn,
       |                  COUNT(*) OVER () AS n FROM d),
       |params AS (
       |  SELECT n,
       |    greatest(1, CAST(round(n * CAST(0.70 AS DOUBLE)) AS BIGINT)) AS n_train,
       |    greatest(1, CAST(round(n * CAST(0.15 AS DOUBLE)) AS BIGINT)) AS n_val
       |  FROM (SELECT max(n) AS n FROM ranked)),
       |tags AS (
       |  SELECT r.ts,
       |    CASE WHEN r.rn <= least(p.n_train, p.n - 2) THEN 'training'
       |         WHEN r.rn <= least(p.n_train + p.n_val, p.n - 1) THEN 'validation'
       |         ELSE 'testing' END AS split
       |  FROM ranked r CROSS JOIN params p)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q80_split_tags" ->
      s"""$splitTagSql
         |SELECT t.split, COUNT(*) AS n, ${sqlSum("b.price")} AS sum_close
         |FROM bars b JOIN tags t ON b.ts = t.ts
         |GROUP BY 1""".stripMargin,
    "q81_cv_folds" ->
      s"""${Bars.sql},
         |d AS (SELECT DISTINCT ts FROM bars),
         |ranked AS (SELECT ts, row_number() OVER (ORDER BY ts) AS rn FROM d),
         |params AS (
         |  SELECT n, n - CAST(round(n * CAST(0.15 AS DOUBLE)) AS BIGINT) AS cv
         |  FROM (SELECT COUNT(*) AS n FROM d)),
         |spec AS (
         |  SELECT fold_id, cv // 5 AS fs, cv
         |  FROM (SELECT unnest([1, 2, 3, 4]) AS fold_id) f CROSS JOIN params),
         |tagged AS (
         |  SELECT r.ts, s.fold_id,
         |    CASE WHEN r.rn <= s.fold_id * s.fs THEN 'train'
         |         WHEN r.rn <= least((s.fold_id + 1) * s.fs, s.cv) THEN 'validation'
         |         END AS role
         |  FROM ranked r CROSS JOIN spec s)
         |SELECT t.fold_id, t.role, COUNT(*) AS n
         |FROM bars b JOIN tagged t ON b.ts = t.ts
         |WHERE t.role IS NOT NULL
         |GROUP BY 1, 2""".stripMargin,
    "q82_split_drift" -> {
      def m(c: String) = sqlAvg(c)
      s"""$splitTagSql,
         |joined AS (
         |  SELECT b.ticker, b.price, t.split FROM bars b JOIN tags t ON b.ts = t.ts
         |  WHERE t.split IN ('training', 'validation')),
         |vals AS (
         |  SELECT ticker,
         |    CASE WHEN split = 'training' THEN price END AS a,
         |    CASE WHEN split = 'validation' THEN price END AS b
         |  FROM joined)
         |SELECT ticker,
         |  ${m("b")} - ${m("a")} AS mean_delta,
         |  ${sqlStddev("b")} - ${sqlStddev("a")} AS std_delta,
         |  ${sqlStddev("b")} / ${sqlStddev("a")} AS vol_ratio
         |FROM vals GROUP BY ticker""".stripMargin
    },
    "q83_corr_matrix" -> {
      // floor-quantized moments — see the q83 query comment: double→
      // decimal casts of products round differently across engines;
      // floor(x*1e6 + 0.5) is engine-invariant IEEE arithmetic
      def qs(x: String) =
        s"(CAST(SUM(CAST(floor(($x)*1e6 + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE) / 1e6)"
      val n = "CAST(COUNT(*) AS DOUBLE)"
      val sx = qs("pa")
      val sy = qs("pb")
      val sxy = qs("pa*pb")
      val sx2 = qs("pa*pa")
      val sy2 = qs("pb*pb")
      s"""${Bars.sql},
         |daily AS (
         |  SELECT ticker, day, ${sqlAvg("price")} AS p
         |  FROM bars GROUP BY ticker, day)
         |SELECT a.ticker AS ta, b.ticker AS tb,
         |  ($n*$sxy - $sx*$sy) / sqrt(($n*$sx2 - $sx*$sx) * ($n*$sy2 - $sy*$sy)) AS corr,
         |  ($n*$sxy - $sx*$sy) / ($n*($n - 1)) AS cov
         |FROM (SELECT ticker, day, p AS pa FROM daily) a
         |JOIN (SELECT ticker, day, p AS pb FROM daily) b USING (day)
         |WHERE a.ticker < b.ticker
         |GROUP BY 1, 2""".stripMargin
    },
    "q84_ledoit_wolf" -> {
      // floor-quantized moments — see q83/q84 query comments: decimal
      // casts of double products round differently across engines
      def q12(x: String) =
        s"(CAST(SUM(CAST(floor(($x)*1e12 + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE) / 1e12)"
      s"""${Bars.sql},
         |daily AS (
         |  SELECT ticker, day, ${sqlAvg("price")} AS p
         |  FROM bars GROUP BY ticker, day),
         |rets AS (
         |  SELECT ticker, day,
         |    p / lag(p, 1) OVER (PARTITION BY ticker ORDER BY day) - 1 AS r
         |  FROM daily
         |  QUALIFY r IS NOT NULL),
         |fulld AS (
         |  SELECT day FROM rets GROUP BY day
         |  HAVING COUNT(*) = (SELECT COUNT(DISTINCT ticker) FROM rets)),
         |al AS (SELECT rets.* FROM rets JOIN fulld USING (day)),
         |means AS (
         |  SELECT ticker, ${q12("r")} / COUNT(r) AS m FROM al GROUP BY ticker),
         |cent AS (
         |  SELECT al.ticker, al.day, al.r - means.m AS c
         |  FROM al JOIN means USING (ticker)),
         |pairs AS (
         |  SELECT a.ticker AS ta, b.ticker AS tb, COUNT(*) AS n,
         |    ${q12("a.c * b.c")} / COUNT(*) AS s
         |  FROM cent a JOIN cent b USING (day)
         |  WHERE a.ticker <= b.ticker
         |  GROUP BY 1, 2),
         |dayrows AS (
         |  SELECT day, ${q12("c * c")} AS rk
         |  FROM cent GROUP BY day),
         |rowsq AS (
         |  SELECT ${q12("rk * rk")} AS q, COUNT(*) AS n
         |  FROM dayrows),
         |sc0 AS (
         |  SELECT
         |    ${q12("CASE WHEN ta = tb THEN s ELSE 0.0 END")}
         |      / COUNT(DISTINCT ta) AS mu,
         |    ${q12("CASE WHEN ta = tb THEN s * s ELSE 2.0 * s * s END")} AS sum_s2,
         |    ${q12("CASE WHEN ta = tb THEN s ELSE 0.0 END")} AS tr,
         |    CAST(COUNT(DISTINCT ta) AS DOUBLE) AS p
         |  FROM pairs),
         |sc1 AS (
         |  SELECT mu, p, rowsq.n AS n,
         |    (sum_s2 - 2.0 * mu * tr + p * mu * mu) / p AS d2,
         |    (q / rowsq.n - sum_s2) / (CAST(rowsq.n AS DOUBLE) * p) AS b2bar
         |  FROM sc0, rowsq),
         |scal AS (
         |  SELECT mu,
         |    CASE WHEN d2 <= 0 THEN 0.0
         |      ELSE least(1.0, greatest(0.0, least(b2bar, d2) / d2)) END AS delta
         |  FROM sc1)
         |SELECT ta, tb, s, delta,
         |  (1.0 - delta) * s +
         |    (CASE WHEN ta = tb THEN delta * mu ELSE 0.0 END) AS shrunk
         |FROM pairs, scal""".stripMargin
    }
  )
}
