package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side machinery — schema, partitioning, per-partition batch
  * shape (`Dataset.mapPartitions`, the JVM analog of `mapInPandas`) — is
  * real and tested. The actual byte decoding is STUBBED with a
  * deterministic fake ([[StubCodec]]) because no image/audio codec
  * libraries exist in this container; swap `StubCodec` for a real decoder
  * (e.g. javax.imageio / ffmpeg bindings) without touching the dataflow.
  */
object Multimodal {

  /** Typed media row: payload is opaque bytes + kind-specific metadata. */
  case class Media(media_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int, sample_rate: Int,
                   duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
                   features: Array[Float])

  val Kinds = Seq("image", "audio", "video")

  /** Deterministic synthetic media derived from the `documents` table
    * (payload = UTF-8 bytes of the text, kind = doc_id mod 3) so every
    * scale factor has a stable multimodal fixture. */
  def fromDocuments(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Kinds), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      lit(16000).cast("int").as("sample_rate"),
      (length(col("text")) * 10).cast("long").as("duration_ms"))
      .as[Media]
  }

  /** STUB codec: deterministic fake "decode" producing a dim-sized float
    * feature vector from a rolling hash of the payload bytes. A real
    * implementation decodes pixels/samples here; everything around it
    * (batching, schema, null-free contract) is production-shaped. */
  object StubCodec extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 1125899906842597L // large prime seed
      var i = 0
      while (i < payload.length) {
        acc = acc * 31 + payload(i)
        out(math.floorMod(i, dim).toInt) += (math.floorMod(acc, 1000L) / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** Feature extraction over partition-sized batches — the mapInPandas
    * shape: one iterator in, one iterator out, no per-row UDF dispatch. */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          StubCodec.features(m.payload, dim))
      }
    }
  }

  /** Frame sampling for video rows: one frame every `everyMs`, each frame
    * "decoded" (stub) from the payload slice — the explode-shaped stage. */
  def sampleFrames(media: Dataset[Media], everyMs: Long = 1000L,
                   dim: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { batch =>
      batch.flatMap { m =>
        val n = math.max(1, (m.duration_ms / everyMs).toInt)
        (0 until n).iterator.map { f =>
          val start = math.min(f * m.payload.length / n, m.payload.length)
          val end = math.min((f + 1) * m.payload.length / n, m.payload.length)
          Frame(m.media_id, f, f * everyMs,
            StubCodec.features(java.util.Arrays.copyOfRange(m.payload, start, end), dim))
        }
      }
    }
  }

  /** Metadata-level resize (a real impl would also transform pixels in
    * the payload via the codec). */
  def resize(media: Dataset[Media], maxW: Int, maxH: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxW && m.height <= maxH) m
      else {
        val scale = math.min(maxW.toDouble / m.width, maxH.toDouble / m.height)
        m.copy(width = (m.width * scale).toInt, height = (m.height * scale).toInt)
      }
    }
  }
}
