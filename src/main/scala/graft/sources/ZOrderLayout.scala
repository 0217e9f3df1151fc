package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) key arithmetic: pure codegen'd integer shift/mask
  * Column expressions, no UDF.
  *
  * The key interleaves the bits of two 16-bit coordinates so that rows
  * close in BOTH dimensions get numerically close keys. Sorting a table
  * by the key therefore bounds every output file's min/max range in
  * every interleaved dimension at once — which is exactly what
  * parquet's footer stats need for scan pruning on EITHER column. A
  * single-column sort gives perfect pruning on one dimension and none
  * on the other; the Z-curve trades a constant factor on each for
  * useful pruning on all (the `OPTIMIZE ZORDER` layout idea from the
  * lakehouse engines, rebuilt on plain parquet).
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative LONG column into the even
    * bit positions of a 32-bit result — the standard 4-step magic-mask
    * sequence (each step doubles the gap between occupied bits). All
    * ops are 64-bit integer shifts/AND/OR: exact, engine-independent,
    * whole-stage-codegen'd. */
  def spread16(c: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
        x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
      }

  /** 32-bit Morton key of two 16-bit coordinates (`x` in even bits,
    * `y` in odd bits). */
  def interleave2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Linear 16-bit quantizer with clamping: lo → 0, hi → 65535,
    * interior points by `floor((v − lo) · 65535.0 / (hi − lo))`. The
    * interior path is three IEEE double ops in fixed order, so an
    * oracle replaying the same expression gets bit-identical buckets;
    * callers pass values exact in double (longs ≤ 2^53, or doubles).
    * Out-of-range values (bounds from a sample rather than a full
    * scan) clamp to the edge buckets instead of wrapping. Null values
    * propagate to a null key. */
  def quant16(v: Column, lo: Column, hi: Column): Column =
    when(v <= lo, lit(0L))
      .when(v >= hi, lit(65535L))
      .otherwise(floor((v - lo) * lit(65535.0) / (hi - lo)))
}

/** Write a DataFrame laid out along the Z-curve of two numeric columns.
  *
  * Scale design: ONE extra aggregate pass computes the quantizer bounds
  * (or pass precomputed/sampled `bounds` to skip it — clamping makes
  * approximate bounds safe), then `repartitionByRange` on the key
  * splits the curve into `numFiles` contiguous segments (range
  * boundaries come from Spark's reservoir sample — no global sort) and
  * each task writes one locally-sorted file. Every file then covers a
  * bounded rectangle of (dimX, dimY) space, so a reader's filter on
  * either column skips most files/row-groups via footer min/max stats.
  */
object ZOrderLayout {

  final case class Bounds(xLo: Double, xHi: Double, yLo: Double, yHi: Double)

  /** The input frame plus a `keyCol` Morton key over (dimX, dimY). */
  def withZKey(df: DataFrame, dimX: String, dimY: String, keyCol: String,
      bounds: Option[Bounds] = None): DataFrame = {
    val b = bounds.getOrElse {
      val r = df.agg(
        min(col(dimX).cast("double")), max(col(dimX).cast("double")),
        min(col(dimY).cast("double")), max(col(dimY).cast("double"))).head()
      Bounds(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    df.withColumn(keyCol, ZOrder.interleave2(
      ZOrder.quant16(col(dimX).cast("double"), lit(b.xLo), lit(b.xHi)),
      ZOrder.quant16(col(dimY).cast("double"), lit(b.yLo), lit(b.yHi))))
  }

  /** Z-order `df` on (dimX, dimY) into `numFiles` parquet files under
    * `path`. The key is layout-only and is dropped before the write. */
  def write(df: DataFrame, dimX: String, dimY: String, path: String,
      numFiles: Int, bounds: Option[Bounds] = None): Unit =
    withZKey(df, dimX, dimY, "__zkey", bounds)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
}
