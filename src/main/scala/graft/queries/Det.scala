package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic floating-point aggregation helpers.
  *
  * Double summation is order-dependent, and Spark (partition-parallel,
  * AQE-rearranged) will not sum in the same order as the DuckDB oracle —
  * or even as its own previous run. Routing sums through a fixed-scale
  * decimal makes them exact and order-independent on BOTH engines, so the
  * driver's value-hash compare is stable. Cast back to double at the end.
  *
  * Oracle-side equivalents (DuckDB):
  *   dsum(x)  = CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
  *   davg(x)  = CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)
  *   dstddev  = explicit moment formula over decimal sums
  *
  * KNOWN LATENT HAZARD — double→decimal quantization ties. Casting a
  * COMPUTED double (a ratio, product, or difference of averages) to a
  * fixed-scale decimal asks each engine to round the value's trailing
  * decimal digit, and Spark and DuckDB reach that digit through
  * different paths; on a value whose scaled fraction sits within an ulp
  * of .5 they can disagree by one last-digit unit (bit q83 at sf0.001 in
  * round 11). RAW testdata columns are safe — they sit ON the decimal
  * grid (≤6 dp), as do their squares at scale 12 — so dsum/davg/dstddev
  * over raw columns are exact. For computed doubles, the established
  * remedy (q83/q84) is engine-invariant quantization:
  *   floor(x·scale + 0.5)  summed as DECIMAL(38,0), divided by scale —
  * pure IEEE arithmetic, identical in every engine. Pick `scale` so the
  * largest quantum stays below ~9e18 (Spark's floor returns BIGINT and
  * saturates: 1e18-scaled O(1)-magnitude squares overflowed in q84 —
  * use 1e12 for O(1) returns, 1e6 for price-scale values). Convert a
  * site only WITH its oracle mirror, and re-verify at both SFs.
  */
object Det {
  private val dec = DecimalType(38, 6)
  private val dec12 = DecimalType(38, 12)

  /** Order-independent SUM(double) — exact decimal accumulation. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Order-independent AVG(double): double division of exact sum by count. */
  def davg(c: Column): Column = sum(c.cast(dec)).cast("double") / count(c)

  /** Order-independent sample stddev via exact decimal moments.
    * sqrt((n*Σx² − (Σx)²) / (n(n−1))) computed in double at the end. */
  def dstddev(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = sum(c.cast(dec)).cast("double")
    val sx2 = sum((c * c).cast(dec12)).cast("double")
    when(n > 1, sqrt(greatest((n * sx2 - sx * sx) / (n * (n - lit(1.0))), lit(0.0))))
  }

  /** Order-independent sample variance (same moments as dstddev). */
  def dvariance(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = sum(c.cast(dec)).cast("double")
    val sx2 = sum((c * c).cast(dec12)).cast("double")
    when(n > 1, greatest((n * sx2 - sx * sx) / (n * (n - lit(1.0))), lit(0.0)))
  }

  /** Higher-precision variants for small-magnitude values (returns). */
  def dsum12(c: Column): Column = sum(c.cast(dec12)).cast("double")
  def davg12(c: Column): Column = sum(c.cast(dec12)).cast("double") / count(c)

  def dstddev12(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = sum(c.cast(dec12)).cast("double")
    val sx2 = sum((c * c).cast(DecimalType(38, 18))).cast("double")
    when(n > 1, sqrt(greatest((n * sx2 - sx * sx) / (n * (n - lit(1.0))), lit(0.0))))
  }

  import org.apache.spark.sql.expressions.WindowSpec

  /** Window variants — exact decimal accumulation inside the frame. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(dec)).over(w).cast("double")

  def davgOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(dec)).over(w).cast("double") / count(c).over(w)

  def dstddevOver(c: Column, w: WindowSpec): Column = {
    val n = count(c).over(w).cast("double")
    val sx = sum(c.cast(dec)).over(w).cast("double")
    val sx2 = sum((c * c).cast(dec12)).over(w).cast("double")
    when(n > 1, sqrt(greatest((n * sx2 - sx * sx) / (n * (n - lit(1.0))), lit(0.0))))
  }

  /** SQL snippets for oracle strings. */
  def sqlSum(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
  def sqlAvg(x: String): String = s"(${sqlSum(x)} / COUNT($x))"
  def sqlSum12(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(38,12))) AS DOUBLE)"
  def sqlAvg12(x: String): String = s"(${sqlSum12(x)} / COUNT($x))"
  def sqlSum18(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(38,18))) AS DOUBLE)"
  def sqlStddev12(x: String): String = {
    val n = s"CAST(COUNT($x) AS DOUBLE)"
    val sx = sqlSum12(x)
    val sx2 = sqlSum18(s"($x)*($x)")
    s"CASE WHEN COUNT($x) > 1 THEN sqrt(greatest(($n*$sx2 - $sx*$sx)/($n*($n-1.0)), 0.0)) END"
  }
  def sqlStddev(x: String): String = {
    val n = s"CAST(COUNT($x) AS DOUBLE)"
    val sx = sqlSum(x)
    val sx2 = sqlSum12(s"($x)*($x)")
    s"CASE WHEN COUNT($x) > 1 THEN sqrt(greatest(($n*$sx2 - $sx*$sx)/($n*($n-1.0)), 0.0)) END"
  }
}
