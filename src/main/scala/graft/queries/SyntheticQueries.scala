package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.SyntheticSource

/** The synthetic extractor under the hash gate (reference
  * etl/synthetic_extractor.py:77-715) — the largest previously-spec-only
  * kernel, gated with the q159 pattern generalized: EVERY draw the
  * simulator makes (regime uniform, shock, model-specific draws, OHLC
  * span, volume) routes through the pluggable
  * [[graft.sources.SyntheticSource.Draws]] stream, and the gate swaps in
  * the minstd LCG so a DuckDB recursive CTE replays the ENTIRE path
  * recurrence — Markov regime chain included (a single wrong transition
  * changes drift/vol and hence every subsequent close) — in BIGINT +
  * IEEE-double arithmetic. The seeded-Gaussian default stays
  * spec-covered (SyntheticSpec): java.util.Random's Marsaglia rejection
  * loop has no SQL replay.
  *
  * KNOWN ULP DEPENDENCY: the close recurrence close' = max(0.01,
  * close·EXP(ret)) (and the OU arm's LN) relies on DuckDB's libm
  * exp/log agreeing with Java Math.exp/log — the same accepted class as
  * q171's EXP and q172's LN. Divergence would be ~1 ulp relative
  * (1e-14 absolute on a ~100 price after 120 bars), invisible under the
  * driver's round-9 value hash; a tie would need a value landing exactly
  * on a 9-dp rounding boundary.
  *
  * All four path families are gated: q174 GBM, q175 OU (log-price
  * mean-reversion toward the ticker's base level — pins the logBase
  * state), q177 Merton (compound-Poisson jump branch with its
  * CONDITIONAL draw — the state advance itself depends on the jump
  * uniform, replayed as CASE arithmetic), q178 Heston (CIR variance
  * state with full-truncation floor; SQRT is IEEE-exact). q176 pins the
  * order-independent content-hash dataset id over an integer-quantized
  * projection (sha256 pre-images must render identically — BIGINT→string
  * does, double→string does not).
  */
object SyntheticQueries extends QueryModule {

  /** Per-ticker LCG seed the oracle can re-derive in SQL: 42 + the
    * position-weighted ASCII sum of the ticker (1-based positions).
    * Deliberately NOT String.hashCode — replaying Java's 31-power hash
    * in SQL is possible but noisy; this is equally collision-free over
    * a ticker universe and one list_sum in DuckDB. */
  private[queries] def lcgSeed(t: String): Long = {
    var h = 0L
    var j = 0
    while (j < t.length) { h += t.charAt(j).toLong * (j + 1); j += 1 }
    42L + h
  }

  private def lcgFor: String => SyntheticSource.Draws =
    t => new SyntheticSource.LcgDraws(lcgSeed(t))

  private val start = LocalDate.of(2024, 1, 1)

  /** Generate + index the LCG-driven path for one model family. The
    * ticker dim stays in-plan (generateFrom), construction is lazy. */
  private def pathDf(s: org.apache.spark.sql.SparkSession, dir: String,
      model: String, nBars: Int) = {
    import s.implicits._
    val w = Window.partitionBy("ticker").orderBy("date")
    SyntheticSource.generateFrom(
        Bars.of(s, dir).select($"ticker").distinct().as[String],
        nBars = nBars, startDate = start, seed = 42L, basePrice = 100.0,
        cfg = SyntheticSource.Config(model = model),
        drawsFor = Some(lcgFor))
      .toDF()
      .withColumn("i", row_number().over(w))
      .select($"ticker", $"i", $"open", $"high", $"low", $"close",
        $"volume")
  }

  override def queries: Map[String, QFn] = Map(
    "q174_synthetic_gbm" -> ((s, dir) => pathDf(s, dir, "gbm", 120)),
    "q175_synthetic_ou" -> ((s, dir) => pathDf(s, dir, "ou", 120)),
    "q177_synthetic_merton" -> ((s, dir) => pathDf(s, dir, "merton", 200)),
    "q178_synthetic_heston" -> ((s, dir) => pathDf(s, dir, "heston", 120)),
    // the content-hash dataset id over the q174 GBM path — LAZY single-row
    // aggregation (datasetIdDf), quantized to the 1e-6 price grid so both
    // engines hash identical pre-image strings
    "q176_synthetic_id" -> ((s, dir) => {
      import s.implicits._
      SyntheticSource.datasetIdDf(
        SyntheticSource.generateFrom(
          Bars.of(s, dir).select($"ticker").distinct().as[String],
          nBars = 120, startDate = start, seed = 42L, basePrice = 100.0,
          cfg = SyntheticSource.Config(model = "gbm"),
          drawsFor = Some(lcgFor)))
    })
  )

  // ---------------------------------------------------------------- SQL

  private val M = "CAST(2147483647 AS DOUBLE)"
  private def D(x: String) = s"CAST($x AS DOUBLE)"
  private def adv(c: String) = s"(16807 * $c) % 2147483647"
  private def uni(c: String) = s"CAST($c AS DOUBLE) / $M"
  private def gsh(c: String) = s"((${uni(c)} - ${D("0.5")}) * ${D("4.0")})"

  /** Ticker dim + per-ticker LCG seed + the two init draws (regime
    * `nextInt(3)` and the base-price uniform). */
  private val seedSql: String =
    s"""tick AS (SELECT DISTINCT event_type AS ticker FROM events
       |         WHERE value <> 0),
       |sd AS (SELECT ticker,
       |    CAST((42 + list_sum(list_transform(range(1, length(ticker) + 1),
       |      j -> ascii(substr(ticker, CAST(j AS INTEGER), 1)) * j)))
       |      % 2147483646 + 1 AS BIGINT) AS s0
       |  FROM tick),
       |seed2 AS (
       |  SELECT ticker, s2, CAST(s1 % 3 AS INTEGER) AS regime0,
       |    ${D("100.0")} * (${D("0.5")} + ${uni("s2")}) AS close0
       |  FROM (SELECT ticker, s1, ${adv("s1")} AS s2
       |        FROM (SELECT ticker, ${adv("s0")} AS s1 FROM sd)))""".stripMargin

  /** The regime step + shock draw layers shared by every model: consumes
    * walk state (s, regime), produces (s2b, regime2, u1, shock, drift,
    * vol). Transition-row sums are written as the same two-literal IEEE
    * adds the Scala kernel performs. */
  private def stepLayers(n: Int): String =
    s"""SELECT *,
       |  ${gsh("s2b")} AS shock,
       |  CASE regime2 WHEN 0 THEN ${D("0.0008")}
       |    WHEN 1 THEN ${D("-0.0006")} ELSE ${D("0.0001")} END AS drift,
       |  CASE regime2 WHEN 0 THEN ${D("0.010")}
       |    WHEN 1 THEN ${D("0.018")} ELSE ${D("0.025")} END AS vol
       |FROM (
       |  SELECT *, ${adv("s1b")} AS s2b,
       |    CASE regime
       |      WHEN 0 THEN (CASE WHEN u1 < ${D("0.97")} THEN 0
       |        WHEN u1 < ${D("0.97")} + ${D("0.02")} THEN 1 ELSE 2 END)
       |      WHEN 1 THEN (CASE WHEN u1 < ${D("0.03")} THEN 0
       |        WHEN u1 < ${D("0.03")} + ${D("0.95")} THEN 1 ELSE 2 END)
       |      ELSE (CASE WHEN u1 < ${D("0.02")} THEN 0
       |        WHEN u1 < ${D("0.02")} + ${D("0.03")} THEN 1 ELSE 2 END)
       |    END AS regime2
       |  FROM (
       |    SELECT w.*, ${adv("w.s")} AS s1b, ${uni(s"(${adv("w.s")})")} AS u1
       |    FROM walk w WHERE w.i < $n))""".stripMargin

  /** OHLCV tail layers shared by every model: from (sR = state after the
    * model's last return draw, o2 = open, close_, shock, vol) produce
    * span/high/low/volume and the final state advance. */
  private def tailLayers(inner: String): String =
    s"""SELECT *,
       |  GREATEST(o2, close_) + span AS high_,
       |  GREATEST(${D("0.005")}, LEAST(o2, close_) - span) AS low_,
       |  CAST(TRUNC((${D("1e5")} * (${D("1.0")} + ABS(shock)))
       |    * (${D("1.0")} + ${D("0.5")} * ${uni("sV")})) AS BIGINT) AS volume_
       |FROM (
       |  SELECT *, (ABS(${gsh("sS")}) * vol) * o2 AS span,
       |    ${adv("sS")} AS sV
       |  FROM ($inner))""".stripMargin

  /** Full recursive walk for one model. `retLayers` must produce columns
    * (sS = state before the span draw, o2, close_) given the stepLayers
    * output; emitted state is (ticker, i, s, regime, open, high, low,
    * close, volume, logbase, v). */
  private def walkSql(n: Int, retLayers: String, vNext: String): String =
    s"""$seedSql,
       |walk AS (
       |  SELECT ticker, 0 AS i, s2 AS s, regime0 AS regime,
       |    close0 AS open, close0 AS high, close0 AS low, close0 AS close,
       |    CAST(0 AS BIGINT) AS volume, LN(close0) AS logbase,
       |    ${D("0.0")} AS v
       |  FROM seed2
       |  UNION ALL
       |  SELECT ticker, i + 1 AS i, sV AS s, regime2 AS regime,
       |    o2 AS open, high_ AS high, low_ AS low, close_ AS close,
       |    volume_ AS volume, logbase, $vNext AS v
       |  FROM (
       |${tailLayers(retLayers)}))""".stripMargin

  /** GBM / OU: ret in one layer, sS = adv(s2b). */
  private def simpleRet(n: Int, retExpr: String): String =
    s"""SELECT *, close AS o2,
       |  GREATEST(${D("0.01")}, close * EXP(ret)) AS close_,
       |  ${adv("s2b")} AS sS
       |FROM (
       |  SELECT *, $retExpr AS ret
       |  FROM (
       |${stepLayers(n)}))""".stripMargin

  private val gbmRet = s"drift + vol * shock"
  private val ouRet =
    s"${D("0.05")} * (logbase - LN(close)) + vol * shock"

  /** Merton: the jump uniform ALWAYS advances the state; the jump
    * Gaussian advances it ONLY when the jump fires — the conditional
    * draw replays as CASE arithmetic on the state itself. */
  private def mertonRet(n: Int): String =
    s"""SELECT *, close AS o2,
       |  GREATEST(${D("0.01")}, close * EXP(ret)) AS close_,
       |  ${adv("sJ")} AS sS
       |FROM (
       |  SELECT *,
       |    (drift + vol * shock) + CASE WHEN jtaken
       |      THEN ${D("-0.02")} + ${D("0.05")} * ${gsh(s"(${adv("s3m")})")}
       |      ELSE ${D("0.0")} END AS ret,
       |    CASE WHEN jtaken THEN ${adv("s3m")} ELSE s3m END AS sJ
       |  FROM (
       |    SELECT *, ${adv("s2b")} AS s3m,
       |      ${uni(s"(${adv("s2b")})")} < ${D("0.02")} AS jtaken
       |    FROM (
       |${stepLayers(n)})))""".stripMargin

  /** Heston: CIR variance state (lazy-seeded at v<=0 from the CURRENT
    * regime's vol, exactly like the kernel), z2 drawn between shock and
    * span; SQRT is IEEE-exact in both engines. */
  private def hestonRet(n: Int): String =
    s"""SELECT *, close AS o2,
       |  GREATEST(${D("0.01")}, close * EXP(ret)) AS close_,
       |  ${adv("s3h")} AS sS
       |FROM (
       |  SELECT *, drift + SQRT(vnew) * shock AS ret
       |  FROM (
       |    SELECT *, GREATEST(${D("1e-10")},
       |      (vseed + ${D("0.10")} * ((vol * vol) - vseed))
       |        + ((${D("0.25")} * SQRT(vseed)) * ${gsh("s3h")}) * vol) AS vnew
       |    FROM (
       |      SELECT *, ${adv("s2b")} AS s3h,
       |        CASE WHEN v <= ${D("0.0")} THEN vol * vol ELSE v END AS vseed
       |      FROM (
       |${stepLayers(n)}))))""".stripMargin

  private val emit =
    "SELECT ticker, i, open, high, low, close, volume FROM walk WHERE i >= 1"

  override def oracles: Map[String, String] = Map(
    "q174_synthetic_gbm" ->
      s"""WITH RECURSIVE
         |${walkSql(120, simpleRet(120, gbmRet), "v")}
         |$emit""".stripMargin,
    "q175_synthetic_ou" ->
      s"""WITH RECURSIVE
         |${walkSql(120, simpleRet(120, ouRet), "v")}
         |$emit""".stripMargin,
    "q177_synthetic_merton" ->
      s"""WITH RECURSIVE
         |${walkSql(200, mertonRet(200), "v")}
         |$emit""".stripMargin,
    "q178_synthetic_heston" ->
      s"""WITH RECURSIVE
         |${walkSql(120, hestonRet(120), "vnew")}
         |$emit""".stripMargin,
    // the q174 walk hashed: sha256 per quantized row, hashes sorted and
    // concatenated, sha256 again, first 16 hex chars — Spark's
    // sort_array(collect_list(h)) ≡ string_agg(h, '' ORDER BY h)
    "q176_synthetic_id" ->
      s"""WITH RECURSIVE
         |${walkSql(120, simpleRet(120, gbmRet), "v")},
         |hrows AS (
         |  SELECT sha256(concat_ws('|', ticker,
         |    CAST(DATE '2024-01-01' + CAST(i - 1 AS INTEGER) AS VARCHAR),
         |    CAST(CAST(FLOOR(open * 1e6 + 0.5) AS BIGINT) AS VARCHAR),
         |    CAST(CAST(FLOOR(high * 1e6 + 0.5) AS BIGINT) AS VARCHAR),
         |    CAST(CAST(FLOOR(low * 1e6 + 0.5) AS BIGINT) AS VARCHAR),
         |    CAST(CAST(FLOOR(close * 1e6 + 0.5) AS BIGINT) AS VARCHAR),
         |    CAST(volume AS VARCHAR))) AS h
         |  FROM walk WHERE i >= 1)
         |SELECT substr(sha256(string_agg(h, '' ORDER BY h)), 1, 16)
         |  AS dataset_id
         |FROM hrows""".stripMargin
  )
}
