package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketedStoreSpec extends AnyFunSuite with TestSpark {

  test("same-bucketed tables join with ZERO Exchange; unbucketed join shuffles") {
    val s = spark; import s.implicits._
    val bars = (1 to 2000).map(i => (s"T${i % 37}", i.toLong, i * 1.5))
      .toDF("ticker", "seq", "price")
    val dims = (0 until 37).map(i => (s"T$i", s"sector${i % 5}"))
      .toDF("ticker", "sector")

    BucketedStore.writeBucketed(bars, "bk_bars", buckets = 8, keyCols = Seq("ticker"))
    BucketedStore.writeBucketed(dims, "bk_dims", buckets = 8, keyCols = Seq("ticker"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: the point is the BUCKETED join topology
    // (at real scale both sides are facts too big to broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.bucketedJoin(spark, "bk_bars", "bk_dims", Seq("ticker"))
      assert(BucketedStore.isShuffleFree(joined),
        "bucketed join must plan without Exchange")
      assert(joined.count() === 2000)
      // correctness: same rows as the plain (shuffling) join
      val plain = bars.join(dims, Seq("ticker"))
      assert(joined.select("ticker", "seq", "price", "sector").exceptAll(plain).count() === 0)
      assert(plain.exceptAll(joined.select("ticker", "seq", "price", "sector")).count() === 0)
      // a bucketed aggregation on the key is also shuffle-free
      val agg = spark.table("bk_bars").groupBy($"ticker").agg(count(lit(1)))
      assert(BucketedStore.isShuffleFree(agg))
      // the control: joining the raw (unbucketed) frames DOES shuffle
      assert(!BucketedStore.isShuffleFree(bars.join(dims, Seq("ticker"))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_bars")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
    }
  }
}
