package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.ChunkedWindow

/** ChunkedWindow must be bit-identical to the plain per-key Window it
  * replaces — same grid-exact quantization (Det.qpowsumOver for the
  * higher moments), exact prefix-sum arithmetic — while distributing
  * each key across many chunks. chunkSize is forced
  * tiny here so every code path (halo duplication, chunk-boundary lag,
  * key start/end, empty frames) is exercised across chunk borders.
  */
class ChunkedWindowSpec extends AnyFunSuite with TestSpark {

  private def mkDf(rows: Seq[(String, Long, Long, Double)]) = {
    val s = spark; import s.implicits._
    s.createDataset(rows).toDF("k", "t", "seq", "x")
  }

  private lazy val df = {
    val rng = new scala.util.Random(7)
    // ragged keys (31 / 257 / 1000 rows), shuffled input order, duplicate
    // timestamps (ties broken by seq), values spanning magnitudes
    val rows = for {
      (k, n) <- Seq(("A", 31), ("B", 257), ("C", 1000))
      i <- 0 until n
    } yield (k, (i / 3).toLong, i.toLong, (rng.nextDouble() - 0.3) * math.pow(10, rng.nextInt(4)))
    mkDf(rng.shuffle(rows)).cache()
  }

  test("moments over [-19, 0] match the plain window exactly, across chunk borders") {
    val s = spark; import s.implicits._
    val got = ChunkedWindow
      .rollingMoments(df, "k", "t", "seq", "x", lo = -19, hi = 0, numPartitions = 7)
      .toDF()
      .select($"key", $"seq", $"prev", $"n", $"s1", $"s2", $"s3")
    val w = Window.partitionBy($"k").orderBy($"t", $"seq")
    val w20 = w.rowsBetween(-19, 0)
    val want = df.select($"k".as("key"), $"seq",
      lag($"x", 1).over(w).as("prev"),
      count($"x").over(w20).as("n"),
      sum($"x".cast("decimal(38,6)")).over(w20).cast("double").as("s1"),
      Det.qpowsumOver($"x", 1e6, 2, w20).as("s2"),
      Det.qpowsumOver($"x", 1e4, 3, w20).as("s3"))
    assert(got.count() === df.count())
    // exceptAll in BOTH directions: any value drift (even 1 ulp) fails
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("strictly-past frame [-20, -1]: empty frames are null, lag crosses chunks") {
    val s = spark; import s.implicits._
    val got = ChunkedWindow
      .rollingMoments(df, "k", "t", "seq", "x", lo = -20, hi = -1, numPartitions = 9)
      .toDF()
      .select($"key", $"seq", $"prev", $"n", $"s1", $"s2")
    val w = Window.partitionBy($"k").orderBy($"t", $"seq")
    val f = w.rowsBetween(-20, -1)
    val want = df.select($"k".as("key"), $"seq",
      lag($"x", 1).over(w).as("prev"),
      count($"x").over(f).as("n"),
      sum($"x".cast("decimal(38,6)")).over(f).cast("double").as("s1"),
      Det.qpowsumOver($"x", 1e6, 2, f).as("s2"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // the first row of every key really is the empty-frame case
    val firsts = got.where($"seq" === 0)
    assert(firsts.count() === 3)
    assert(firsts.where($"n" =!= 0 || $"s1".isNotNull || $"prev".isNotNull).count() === 0)
  }

  test("null x rows match plain-window semantics (count skips, sums skip, lag passes null through)") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    // ~1 in 4 null, a key starting with nulls, and an ALL-null key
    val rows: Seq[(String, Long, Long, Option[Double])] =
      (for {
        (k, n) <- Seq(("A", 67), ("B", 301))
        i <- 0 until n
      } yield (k, (i / 3).toLong, i.toLong,
        if (rng.nextInt(4) == 0) None else Some(rng.nextDouble() * 50 - 10))) ++
        Seq(("C", 0L, 0L, None), ("C", 1L, 1L, None), ("C", 2L, 2L, Some(5.0))) ++
        (0 until 25).map(i => ("D", i.toLong, i.toLong, None: Option[Double]))
    val ndf = s.createDataset(rng.shuffle(rows)).toDF("k", "t", "seq", "x").cache()

    val got = ChunkedWindow
      .rollingMoments(ndf, "k", "t", "seq", "x", lo = -9, hi = 0, numPartitions = 7)
      .toDF()
      .select($"key", $"seq", $"x", $"prev", $"n", $"s1", $"s2", $"s3")
    val w = Window.partitionBy($"k").orderBy($"t", $"seq")
    val f = w.rowsBetween(-9, 0)
    val want = ndf.select($"k".as("key"), $"seq", $"x",
      lag($"x", 1).over(w).as("prev"),
      count($"x").over(f).as("n"),
      sum($"x".cast("decimal(38,6)")).over(f).cast("double").as("s1"),
      Det.qpowsumOver($"x", 1e6, 2, f).as("s2"),
      Det.qpowsumOver($"x", 1e4, 3, f).as("s3"))
    assert(got.count() === ndf.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("single-row and shorter-than-halo keys survive") {
    val s = spark; import s.implicits._
    val tiny = mkDf(Seq(("X", 0L, 0L, 2.5), ("Y", 0L, 0L, 1.0), ("Y", 1L, 1L, 3.0)))
    val got = ChunkedWindow
      .rollingMoments(tiny, "k", "t", "seq", "x", lo = -19, hi = 0, numPartitions = 7)
      .toDF().orderBy("key", "seq")
      .select($"key", $"n", $"s1").as[(String, Long, Option[Double])].collect()
    assert(got.toSeq === Seq(("X", 1L, Some(2.5)), ("Y", 1L, Some(1.0)), ("Y", 2L, Some(4.0))))
  }
}
