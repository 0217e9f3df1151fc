package graft.features

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.SyntheticSource

class FeatureBuilderSpec extends AnyFunSuite with TestSpark {

  private lazy val bars = SyntheticSource
    .generate(spark, Seq("AAPL", "MSFT"), nBars = 200, seed = 11).toDF().cache()
  private lazy val feats = FeatureBuilder.build(bars, dropNa = false).cache()

  test("feature-health telemetry: counts, null fractions, warn flags") {
    val h = FeatureBuilder.health(feats).head()
    assert(h.getAs[Long]("rows") === feats.count())
    assert(h.getAs[Long]("tickers") === 2L)
    val nf = h.getAs[Double]("null_frac_ret_20")
    assert(nf >= 0.0 && nf <= 1.0)
    assert(h.getAs[Int]("decomp_available") === 1)
    // dropNa=false build keeps warm-up nulls; ret_20 misses ~20/200 rows
    // per ticker (10%), under the 30% warn threshold
    assert(h.getAs[Int]("warn_high_null_fraction") === 0)
  }

  test("lags and returns match hand-computed values") {
    val spark2 = spark
    import spark2.implicits._
    val a = bars.where($"ticker" === "AAPL").orderBy("date")
      .select("close").as[Double].collect()
    val f = feats.where($"ticker" === "AAPL").orderBy("date")
      .select("close_lag_1", "ret_1", "diff_1").collect()
    assert(f(0).isNullAt(0))
    (1 until a.length).foreach { i =>
      assert(f(i).getDouble(0) === a(i - 1))
      assert(math.abs(f(i).getDouble(1) - (a(i) / a(i - 1) - 1)) < 1e-12)
      assert(math.abs(f(i).getDouble(2) - (a(i) - a(i - 1))) < 1e-12)
    }
  }

  test("rolling mean over 5 matches a sliding average with min_periods=1") {
    val spark2 = spark
    import spark2.implicits._
    val a = bars.where($"ticker" === "MSFT").orderBy("date")
      .select("close").as[Double].collect()
    val f = feats.where($"ticker" === "MSFT").orderBy("date")
      .select("roll_mean_5").as[Double].collect()
    a.indices.foreach { i =>
      val wnd = a.slice(math.max(0, i - 4), i + 1)
      assert(math.abs(f(i) - wnd.sum / wnd.length) < 1e-9)
    }
  }

  test("cross-sectional rank is a per-date percentile across tickers") {
    val oneDate = feats.where(col("xsec_rank_ret5").isNotNull)
      .groupBy("date").agg(min("xsec_rank_ret5").as("mn"), max("xsec_rank_ret5").as("mx"),
        count(lit(1)).as("n"))
      .where(col("n") === 2)
    assert(oneDate.where(col("mn") =!= 0.0 || col("mx") =!= 1.0).isEmpty)
  }

  test("ATR is positive and drawdown non-positive") {
    assert(feats.where(col("atr_14") < 0).isEmpty)
    assert(feats.where(col("drawdown_60") > 1e-12).isEmpty)
  }

  test("cvar proxy equals exact quantile of the trailing window") {
    val spark2 = spark
    import spark2.implicits._
    val r = feats.where($"ticker" === "AAPL").orderBy("date")
      .select("ret_1", "cvar_95_60").collect()
    val rets = r.map(x => if (x.isNullAt(0)) Double.NaN else x.getDouble(0))
    (60 until r.length).foreach { i =>
      val wnd = rets.slice(i - 59, i + 1).filterNot(_.isNaN).sorted
      val idx = math.floor(0.05 * (wnd.length - 1)).toInt
      assert(math.abs(r(i).getDouble(1) - math.abs(wnd(idx))) < 1e-12)
    }
  }

  test("seasonal-126: per-phase index is the phase mean of the detrended series, resid phase-means are zero") {
    // 300 bars > 2 full cycles of 126 — the reference's statsmodels
    // precondition for the decomposition to engage (:197-201)
    val longBars = SyntheticSource
      .generate(spark, Seq("AAPL"), nBars = 300, seed = 7).toDF()
    val f = FeatureBuilder.build(longBars, dropNa = false)
      .orderBy("date")
      .select("close", "seasonal_trend_126", "seasonal_126", "seasonal_resid_126")
      .collect()
    assert(f.length === 300)
    // recompute the decomposition by hand
    val close = f.map(_.getDouble(0))
    val trend = close.indices.map(i =>
      close.slice(math.max(0, i - 125), i + 1).sum /
        (i - math.max(0, i - 125) + 1))
    val detrended = close.indices.map(i => close(i) - trend(i))
    val phaseMean = detrended.indices.groupBy(_ % 126).view
      .mapValues(is => is.map(detrended).sum / is.size).toMap
    f.zipWithIndex.foreach { case (row, i) =>
      assert(math.abs(row.getDouble(1) - trend(i)) < 1e-9, s"trend@$i")
      assert(math.abs(row.getDouble(2) - phaseMean(i % 126)) < 1e-9, s"seasonal@$i")
      assert(math.abs(row.getDouble(3) -
        (detrended(i) - phaseMean(i % 126))) < 1e-9, s"resid@$i")
    }
    // per-phase means of the residual vanish exactly (the seasonal index
    // IS the phase mean of the detrended series)
    val resid = f.map(_.getDouble(3))
    resid.indices.groupBy(_ % 126).values.foreach { is =>
      assert(math.abs(is.map(resid).sum / is.size) < 1e-9)
    }
  }

  test("dropNa removes warmup rows only") {
    val dropped = FeatureBuilder.build(bars, dropNa = true)
    assert(dropped.where(col("ret_20").isNull).isEmpty)
    assert(dropped.count() === bars.count() - 2 * 20)
  }

  test("buildFast parity: bit-exact gated columns, ulp-close moments, identical null patterns") {
    val spark2 = spark
    import spark2.implicits._
    val in = bars.select("ticker", "date", "close", "high", "low")
    val plain = FeatureBuilder.build(in, dropNa = false)
    // 8 partitions over 2×200 rows: key runs SPLIT across partitions, so
    // the halo replay path is exercised, not just the fresh-key path
    val fast = FeatureBuilder.buildFast(in, dropNa = false)
    assert(plain.columns.sorted.sameElements(fast.columns.sorted))

    val cols = plain.columns.sorted
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.head, cols.tail: _*)
      .orderBy("ticker", "date").collect()
    val p = rowsOf(plain)
    val f = rowsOf(fast)
    assert(p.length === f.length)

    val exact = Set("ticker", "date", "close", "high", "low",
      "ret_1", "close_lag_1", "close_lag_5", "close_lag_10", "close_lag_20",
      "ret_5", "ret_10", "ret_20", "diff_1", "diff_5", "gap_run_len",
      "drawdown_60", "max_drawdown_60", "cvar_95_60", "true_range",
      "xsec_rank_ret5", "is_month_end", "is_quarter_end")
    // vol_regime is NOT in the guaranteed-exact set: it buckets
    // roll_std_20 (ulp-close, not bit-equal, between the two forms)
    // against percentile_approx tercile cuts over that same column — a
    // std landing exactly ON a cut can legitimately flip the bucket by
    // one. A mismatch is accepted only when it is exactly that: adjacent
    // buckets AND the row's std within relative 2e-7 of a tercile cut
    // (recomputed here from the plain frame, the same
    // percentile_approx(…, 1e4) call finish() uses).
    val volCuts: Map[String, Seq[Double]] = plain.groupBy("ticker")
      .agg(percentile_approx(col("roll_std_20"),
        typedLit(Seq(1.0 / 3, 2.0 / 3)), lit(10000)).as("cuts"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val stdIdx = cols.indexOf("roll_std_20")
    val tickerIdx = cols.indexOf("ticker")
    p.zip(f).zipWithIndex.foreach { case ((pr, fr), ri) =>
      cols.zipWithIndex.foreach { case (c, ci) =>
        val ctx = s"row $ri col $c"
        assert(pr.isNullAt(ci) === fr.isNullAt(ci), s"null pattern @ $ctx")
        if (!pr.isNullAt(ci)) {
          (pr.get(ci), fr.get(ci)) match {
            case (a: Double, b: Double) =>
              if (exact(c)) assert(
                java.lang.Double.compare(a, b) == 0, s"$ctx: $a vs $b")
              else {
                // moments: exact-decimal sums vs frame-order double sums
                assert(a.isNaN === b.isNaN, s"NaN @ $ctx: $a vs $b")
                if (!a.isNaN)
                  assert(math.abs(a - b) <=
                    1e-7 * math.max(1.0, math.max(a.abs, b.abs)),
                    s"$ctx: $a vs $b")
              }
            case (a: Int, b: Int) if c == "vol_regime" && a != b =>
              val std = pr.getDouble(stdIdx)
              val cutsT = volCuts(pr.getString(tickerIdx))
              // 2e-7: the row's std and the recomputed cut can EACH sit
              // up to rel 1e-7 from their fast-path twins (ulp drift
              // compounds), so a legitimate flip can show plain-std vs
              // plain-cut distance up to ~2e-7
              val nearCut = cutsT.exists(cut =>
                math.abs(std - cut) <= 2e-7 * math.max(1.0, std.abs))
              assert(math.abs(a - b) == 1 && nearCut,
                s"$ctx: bucket $a vs $b with std=$std not at a cut $cutsT")
            case (a, b) => assert(a === b, s"$ctx: $a vs $b")
          }
        }
      }
    }
  }

  test("buildFast parity on constant closes: std exactly 0, skew exactly NULL") {
    val spark2 = spark
    import spark2.implicits._
    val flat = (0 until 80).map(i =>
      ("FLAT", Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        50.0, 51.0, 49.0))
      .toDF("ticker", "date", "close", "high", "low")
    val plain = FeatureBuilder.build(flat, dropNa = false)
      .orderBy("date").select("roll_std_20", "roll_skew_20", "cvar_95_60").collect()
    val fast = FeatureBuilder.buildFast(flat, dropNa = false)
      .orderBy("date").select("roll_std_20", "roll_skew_20", "cvar_95_60").collect()
    plain.zip(fast).zipWithIndex.foreach { case ((pr, fr), i) =>
      assert(pr.isNullAt(0) === fr.isNullAt(0), s"std null @ $i")
      if (!pr.isNullAt(0))
        assert(java.lang.Double.compare(
          pr.getDouble(0), fr.getDouble(0)) == 0, s"std @ $i")
      // constant frame ⇒ m2 = 0 ⇒ Spark 4 skewness is NULL on both sides
      assert(pr.isNullAt(1) && fr.isNullAt(1), s"skew null @ $i")
      assert(pr.isNullAt(2) === fr.isNullAt(2), s"cvar null @ $i")
      if (!pr.isNullAt(2)) assert(pr.getDouble(2) === fr.getDouble(2))
    }
  }

  test("buildFast dropNa keeps exactly the plain surviving row set") {
    val in = bars.select("ticker", "date", "close", "high", "low")
    val a = FeatureBuilder.build(in, dropNa = true)
      .select("ticker", "date").collect().map(_.toString).sorted
    val b = FeatureBuilder.buildFast(in, dropNa = true)
      .select("ticker", "date").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("macro as-of merge is causal (no future macro leaks)") {
    val spark2 = spark
    import spark2.implicits._
    val macroDf = Seq(
      (Timestamp.valueOf("2024-01-05 00:00:00"), 1.0),
      (Timestamp.valueOf("2024-01-20 00:00:00"), 2.0),
      (Timestamp.valueOf("2030-01-01 00:00:00"), 99.0)) // beyond data → clipped
      .toDF("date", "rate")
    val merged = FeatureBuilder.mergeMacroAsOf(bars, macroDf, Seq("rate"))
    assert(merged.where(col("date") < "2024-01-05" && col("rate").isNotNull).isEmpty)
    assert(merged.where(col("date").between("2024-01-05", "2024-01-19 23:59:59")
      && col("rate") =!= 1.0).isEmpty)
    assert(merged.where(col("date") >= "2024-01-20" && col("rate") =!= 2.0).isEmpty)
    assert(merged.where(col("rate") === 99.0).isEmpty)
    assert(merged.count() === bars.count())
  }
}
