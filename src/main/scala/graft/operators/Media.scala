package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2C).
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The decode step is a deterministic STUB (this container has no
  * image/audio codecs): `DecoderStub.decode` derives plausible
  * metadata from the byte payload alone. The Spark-side plumbing —
  * schema, typed Dataset, per-partition batch decode — is real and
  * is what carries over to a production decoder.
  */
object Media {

  /** An ingested media file: opaque payload + source metadata. */
  final case class MediaFile(media_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata (what a real codec would return). */
  final case class MediaMeta(media_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, dur_ms: Long)

  /** Deterministic fake decoder — stands in for `???` (libjpeg/ffmpeg
    * etc. unavailable here). A real implementation swaps only this
    * object; the pipeline around it is unchanged.
    */
  object DecoderStub {
    def decode(f: MediaFile): MediaMeta = {
      val n = f.payload.length.toLong
      val (w, h, d) = f.media_type match {
        case "image" => ((16 + n % 640).toInt, (16 + (n * 7) % 480).toInt, 0L)
        case "audio" => (0, 0, n * 40)
        case _       => ((16 + n % 640).toInt, (16 + (n * 7) % 480).toInt, n * 40)
      }
      MediaMeta(f.media_id, f.media_type, n, w, h, d)
    }
  }

  /** Build a media table from documents: payload = utf-8 bytes of the
    * text (deterministic fake binary), media_type cycles by id.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaFile]
  }

  /** Batch decode: per-partition iteration (where a real decoder would
    * amortize codec init per partition, the mapPartitions shape the
    * brief's mapInPandas corresponds to in Scala).
    */
  def decodeAll(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      // codec initialization would happen once per partition here
      it.map(DecoderStub.decode)
    }
  }

  /** A resized image derivative: payload + target dims. Resize itself
    * is the deterministic stub (real impl = libvips/thumbnailer swap).
    */
  final case class ResizedMedia(media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Resize stub: keeps aspect via the stub-decoded dims, "payload" is
    * a deterministic truncation (a real resizer swaps this body only;
    * partitioning/schema/batching stay as-is).
    */
  def resizeAll(files: Dataset[MediaFile], maxSide: Int): Dataset[ResizedMedia] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        val m = DecoderStub.decode(f)
        val scale = if (math.max(m.width, m.height) <= maxSide) 1.0
          else maxSide.toDouble / math.max(m.width, m.height)
        val w = math.max(1, (m.width * scale).toInt)
        val h = math.max(1, (m.height * scale).toInt)
        ResizedMedia(f.media_id, w, h, f.payload.take(math.max(1, w * h / 8)))
      }
    }
  }

  /** A feature-extracted media row: unit-norm float embedding (what a
    * vision/audio encoder would emit), ready for the ANN operators.
    */
  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Feature extraction: per-partition batch encode (model weights
    * would load once per partition — the mapInPandas batch shape).
    * The encoder is the deterministic stub: a 64-d unit vector from a
    * rolling hash of the payload bytes. Output plugs directly into
    * Similarity.cosineTopK / cosineNearDupPairs — the media → embed →
    * ANN-index pipeline end to end.
    */
  def extractFeatures(files: Dataset[MediaFile], dim: Int = 64): Dataset[MediaEmbedding] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      // encoder/model initialization would happen once per partition here
      it.map { f =>
        val v = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < f.payload.length) {
          h = h * 31 + (f.payload(i) & 0xff)
          // sum + modulo in Long: i + (h & 0x7fffffff) overflows Int for
          // large payloads, yielding a negative bucket index
          v(((i + (h & 0x7fffffffL)) % dim).toInt) += ((h % 1000L) / 1000.0f - 0.5f)
          i += 1
        }
        var n2 = 0.0
        var d = 0
        while (d < dim) { n2 += v(d).toDouble * v(d); d += 1 }
        val inv = if (n2 == 0) 0.0f else (1.0 / math.sqrt(n2)).toFloat
        d = 0
        while (d < dim) { v(d) *= inv; d += 1 }
        MediaEmbedding(f.media_id, v)
      }
    }
  }

  /** One sampled frame: every `everyMs` of stub-decoded duration.
    * Frame bytes are a deterministic slice (real impl = ffmpeg seek).
    */
  final case class Frame(media_id: Long, frame_idx: Int, t_ms: Long, frame: Array[Byte])

  def sampleFrames(files: Dataset[MediaFile], everyMs: Long): Dataset[Frame] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.flatMap { f =>
      val m = DecoderStub.decode(f)
      if (m.dur_ms <= 0) Iterator.empty
      else (0L until m.dur_ms by everyMs).iterator.zipWithIndex.map { case (t, i) =>
        val off = (t % math.max(1, f.payload.length)).toInt
        Frame(f.media_id, i, t, f.payload.slice(off, math.min(off + 16, f.payload.length)))
      }
    }
  }
}
