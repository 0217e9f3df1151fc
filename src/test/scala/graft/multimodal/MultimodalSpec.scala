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

  test("resize plan preserves aspect ratio and never upscales") {
    val r = MultimodalPipeline.resizePlan(media, maxW = 128, maxH = 96).collect()
    assert(r.length === 100)
    r.foreach { m =>
      assert(m.outWidth <= 128 && m.outHeight <= 96)
      assert(m.scale <= 1.0 && m.scale > 0)
      // aspect preserved within rounding
      val inAr = m.width.toDouble / m.height
      val outAr = m.outWidth.toDouble / m.outHeight
      assert(math.abs(inAr - outAr) / inAr < 0.05, s"$m")
    }
  }

  test("frame sampling explodes each blob into n deterministic frames, offsets ordered") {
    val frames = MultimodalPipeline.frameSample(media, n = 4).collect()
    assert(frames.length === 400)
    val byId = frames.groupBy(_.mediaId)
    assert(byId.size === 100)
    byId.values.foreach { fs =>
      val sorted = fs.sortBy(_.frameIdx)
      assert(sorted.map(_.frameIdx).toSeq === Seq(0, 1, 2, 3))
      assert(sorted.map(_.offsetMs).toSeq === sorted.map(_.offsetMs).sorted.toSeq)
      sorted.foreach(f => assert(f.features.length === 16))
    }
    // deterministic across runs
    val again = MultimodalPipeline.frameSample(media, n = 4).collect()
    assert(frames.sortBy(f => (f.mediaId, f.frameIdx))
      .zip(again.sortBy(f => (f.mediaId, f.frameIdx)))
      .forall { case (a, b) => a.mediaId == b.mediaId &&
        a.frameIdx == b.frameIdx && a.offsetMs == b.offsetMs &&
        a.features.sameElements(b.features) })
  }
}
