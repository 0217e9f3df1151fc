package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media travel
  * as opaque `binary` columns with typed metadata, and per-batch decode /
  * feature-extraction runs inside `mapPartitions` so each task touches a
  * contiguous batch of blobs (the JVM analog of `mapInPandas` batches).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder.decode]] derives deterministic fake
  * dimensions/features from the bytes. The Spark-side contract — schema,
  * partitioning, batch shape, failure isolation — is real and tested.
  *
  * Scale design: blobs never pass through a shuffle (decode is a narrow
  * map); feature vectors (small) are what downstream joins/ANN consume.
  * Partition sizing for 100 TB of media comes from
  * spark.sql.files.maxPartitionBytes on the blob store, not from here.
  */
object MultimodalPipeline {

  final case class MediaMeta(mediaId: Long, kind: String, nBytes: Int,
      width: Int, height: Int, sha: String)
  final case class MediaFeatures(mediaId: Long, kind: String,
      features: Array[Float], ok: Boolean)

  /** Deterministic stand-in for an image/audio decoder. */
  object StubDecoder {
    /** ??? in spirit: a real build links an actual codec here. */
    def decode(bytes: Array[Byte]): (Int, Int) = {
      // fake dimensions derived from content so tests are deterministic
      val h = java.util.Arrays.hashCode(bytes)
      (64 + math.abs(h % 512), 64 + math.abs((h >> 9) % 512))
    }

    /** Fixed-size feature vector (byte histogram, L1-normalized) — the
      * stand-in for an embedding model, deterministic and content-based. */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val hist = new Array[Float](dim)
      bytes.foreach(b => hist((b & 0xff) % dim) += 1f)
      val total = math.max(1f, bytes.length.toFloat)
      hist.map(_ / total)
    }
  }

  /** Attach typed metadata to a (mediaId, kind, content:binary) frame. */
  def describe(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("kind").as[String],
        col("content").as[Array[Byte]])
      .mapPartitions(_.map { case (id, kind, bytes) =>
        val (w, h) = StubDecoder.decode(bytes)
        MediaMeta(id, kind, bytes.length, w, h,
          java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).map("%02x".format(_)).mkString)
      })
  }

  final case class ResizedMeta(mediaId: Long, width: Int, height: Int,
      outWidth: Int, outHeight: Int, scale: Double)
  final case class Frame(mediaId: Long, frameIdx: Int, offsetMs: Long,
      features: Array[Float])

  /** Resize planning: aspect-preserving fit into (maxW, maxH). The
    * pixel transform is the stubbed codec step; the plumbing — per-blob
    * dims in, output dims + scale factor out, one narrow map — is what
    * a real resize kernel plugs into. */
  def resizePlan(media: DataFrame, maxW: Int = 224, maxH: Int = 224): Dataset[ResizedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("content").as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h) = StubDecoder.decode(bytes)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        ResizedMeta(id, w, h,
          math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt), scale)
      })
  }

  /** Frame sampling: one video blob → `n` evenly spaced frames, each
    * with its own feature vector (the 1-row → N-rows generator shape;
    * real decoders replace the stub's deterministic per-frame slices).
    * Frames of one video stay in one task — no shuffle of blob bytes. */
  def frameSample(media: DataFrame, n: Int = 4, dim: Int = 16,
      durationMsOf: Int => Long = _ => 60000L): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(n > 0)
    media.select(col("media_id").as[Long], col("content").as[Array[Byte]])
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val dur = durationMsOf(bytes.length)
        (0 until n).iterator.map { i =>
          // stub "frame": a deterministic slice of the blob per index
          val from = if (bytes.isEmpty) 0 else (bytes.length.toLong * i / n).toInt
          val until = if (bytes.isEmpty) 0 else (bytes.length.toLong * (i + 1) / n).toInt
          val frameBytes = java.util.Arrays.copyOfRange(bytes, from, math.max(from, until))
          Frame(id, i, dur * i / n, StubDecoder.features(frameBytes, dim))
        }
      })
  }

  /** Batch feature extraction with per-row failure isolation (a corrupt
    * blob yields ok=false instead of failing the task). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("kind").as[String],
        col("content").as[Array[Byte]])
      .mapPartitions(_.map { case (id, kind, bytes) =>
        try MediaFeatures(id, kind, StubDecoder.features(bytes, dim), ok = true)
        catch { case _: Exception =>
          MediaFeatures(id, kind, Array.fill(dim)(0f), ok = false)
        }
      })
  }
}
