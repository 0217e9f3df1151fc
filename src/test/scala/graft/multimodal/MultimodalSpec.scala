package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite with TestSpark {

  private lazy val media = {
    val spark2 = spark
    import spark2.implicits._
    (0L until 100L).map(i =>
        (i, if (i % 2 == 0) "image" else "audio",
          Array.tabulate[Byte]((i % 37 + 3).toInt)(j => ((i * 31 + j) % 251).toByte)))
      .toDF("media_id", "kind", "content")
  }

  test("describe yields deterministic typed metadata per blob") {
    val meta = MultimodalPipeline.describe(media).collect()
    assert(meta.length === 100)
    val again = MultimodalPipeline.describe(media).collect()
    assert(meta.sortBy(_.mediaId).zip(again.sortBy(_.mediaId))
      .forall { case (a, b) => a == b })
    meta.foreach { m =>
      assert(m.nBytes >= 3 && m.width >= 64 && m.height >= 64)
      assert(m.sha.length === 64)
    }
  }

  test("feature extraction produces normalized fixed-size vectors") {
    val f = MultimodalPipeline.extractFeatures(media, dim = 16).collect()
    assert(f.length === 100 && f.forall(_.ok))
    f.foreach { r =>
      assert(r.features.length === 16)
      assert(math.abs(r.features.sum - 1f) < 1e-4)
    }
  }
}
