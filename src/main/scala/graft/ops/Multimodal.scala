package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side machinery — schema, partitioning, per-partition batch
  * shape (`Dataset.mapPartitions`, the JVM analog of `mapInPandas`) — is
  * real and tested. IMAGE decoding is real too ([[ImageCodec]],
  * `javax.imageio`: pixel histogram features, pixel-level resize);
  * audio/video decoding is STUBBED with a deterministic fake
  * ([[StubCodec]], also the fallback for undecodable image bytes)
  * because no audio/video codec libraries exist in this container —
  * swap it for e.g. ffmpeg bindings without touching the dataflow.
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

  case class MediaHash(media_id: Long, phash: String)

  /** One decode-audit verdict: `reason` ∈ ok | truncated_image |
    * not_an_image; `width` is the DECODED pixel width (0 when
    * quarantined) — proof the real codec ran, not a metadata echo. */
  case class DecodeAudit(media_id: Long, reason: String, width: Int)

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  /** Decode-or-quarantine over (media_id, payload): decodable payloads
    * report their true pixel width; undecodable ones route to a reason
    * — a PNG signature that fails to decode is a TRUNCATED image (a
    * transfer/storage fault worth alerting on), anything else is not
    * an image at all (a misrouted row). Per-partition map, no shuffle:
    * the audit aggregates downstream however the caller groups it. */
  def decodeAudit(media: DataFrame): Dataset[DecodeAudit] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        ImageCodec.decode(payload) match {
          case Some(img) => DecodeAudit(id, "ok", img.getWidth)
          case None =>
            val magic = payload.length >= PngMagic.length &&
              PngMagic.indices.forall(i => payload(i) == PngMagic(i))
            DecodeAudit(id, if (magic) "truncated_image" else "not_an_image", 0)
        }
      })
  }

  val Kinds = Seq("image", "audio", "video")

  /** THE fixture id→kind mapping (doc_id mod 3) — single definition
    * shared by [[fromDocuments]] and the file-ingest query (m04), so
    * the mapping can't silently diverge between producer and reader. */
  def kindOf(id: Column): Column =
    element_at(typedLit(Kinds), (id % 3 + 1).cast("int"))

  /** Deterministic synthetic media derived from the `documents` table
    * (payload = UTF-8 bytes of the text, kind = doc_id mod 3) so every
    * scale factor has a stable multimodal fixture. */
  def fromDocuments(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      kindOf(col("doc_id")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      lit(16000).cast("int").as("sample_rate"),
      (length(col("text")) * 10).cast("long").as("duration_ms"))
      .as[Media]
  }

  /** REAL image codec via `javax.imageio` (JDK built-in, no external
    * deps): decodes PNG/JPEG/BMP/GIF payloads to pixels and derives a
    * `dim`-bin normalized grayscale histogram as the feature vector.
    * Returns None for undecodable bytes so callers can fall back to
    * [[StubCodec]] — on the synthetic text-byte fixtures every payload
    * falls back (outputs stay deterministic/oracle-safe), while real
    * image bytes take the genuine decode path (MultimodalSpec feeds
    * generated PNGs through it). Audio/video stay stubbed: no codec
    * libraries exist in this container. */
  object ImageCodec extends Serializable {
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch {
        // NonFatal, not just IOException: javax.imageio throws
        // RuntimeExceptions (IndexOutOfBounds, IllegalArgument, CMM…) on
        // truncated/malformed images, and the contract here is
        // "undecodable → None → stub fallback", never a dead task
        case scala.util.control.NonFatal(_) => None
      }

    def features(payload: Array[Byte], dim: Int): Option[Array[Float]] =
      decode(payload).map { img =>
        val hist = new Array[Float](dim)
        val w = img.getWidth
        val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            hist(gray * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < dim) { hist(i) /= n; i += 1 }
        hist
      }

    /** Deterministic tiny PNG for fixtures/staging: dims are id-derived
      * ((id%16+8) × (id%12+8)) so an oracle can predict the DECODED
      * width without seeing the bytes; pixel values only need to be
      * stable within a JVM (the decode path re-derives everything the
      * queries assert). */
    def pngBytes(id: Long): Array[Byte] = {
      val w = (id % 16 + 8).toInt
      val h = (id % 12 + 8).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((((id + x + y) % 255).toInt) << 16) | 0x8040)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Perceptual average-hash over DECODED PIXELS: an 8×8 grid of
      * grayscale cell means, bit = cell mean > image mean, row-major —
      * 64 chars of '0'/'1'. Near-identical images (recompression,
      * small edits, brightness-preserving noise) land within a few
      * bits; unrelated images differ in ~32. None when the payload
      * doesn't decode (callers fall back to [[Multimodal.byteAHash]],
      * the same construction over raw bytes). */
    def phash(payload: Array[Byte]): Option[String] =
      decode(payload).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val cy = ((y.toLong * 8) / h).toInt
          var x = 0
          while (x < w) {
            val cx = ((x.toLong * 8) / w).toInt
            val rgb = img.getRGB(x, y)
            val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            val cell = cy * 8 + cx
            sums(cell) += gray
            counts(cell) += 1
            total += gray
            x += 1
          }
          y += 1
        }
        aHashBits(sums, counts, total, w.toLong * h)
      }

    /** Pixel-level resize + PNG re-encode (area-preserving smooth
      * scale). None when the payload doesn't decode. */
    def resized(payload: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
      decode(payload).map { img =>
        val out = new java.awt.image.BufferedImage(
          newW, newH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, newW, newH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
  }

  /** STUB codec for formats with no decoder in this container (audio,
    * video; also the image fallback for undecodable bytes): a
    * deterministic fake producing a dim-sized float feature vector from
    * a rolling hash of the payload bytes. Everything around it
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

  /** The pluggable decode seam: a per-kind feature codec. `None` means
    * "these bytes are not decodable by this codec" and the caller falls
    * back to the deterministic [[StubCodec]] — the same contract
    * [[ImageCodec]] already implements. Implementations ship to
    * executors inside task closures, hence `Serializable`. */
  trait FeatureCodec extends Serializable {
    def features(payload: Array[Byte], dim: Int): Option[Array[Float]]
  }

  /** kind → codec registry. Ships with the real image codec wired in;
    * a deployment with actual audio/video libraries registers them here
    * and EVERY dataflow stage (m01 features, m02, m03 frame sampling)
    * picks them up with zero dataflow changes — the claim the
    * [[StubCodec]] scaladoc makes, proven by MultimodalSpec with a fake
    * "real" audio codec. ConcurrentHashMap because registration may
    * race with a running query's plan-time snapshot; each action sees
    * an immutable snapshot taken at execution time. */
  private val codecRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, FeatureCodec]()
  codecRegistry.put("image", new FeatureCodec {
    def features(payload: Array[Byte], dim: Int): Option[Array[Float]] =
      ImageCodec.features(payload, dim)
  })

  /** Register `codec` for `kind`, returning the codec it replaced (so a
    * test — or a staged rollout — can restore the previous binding). */
  def registerCodec(kind: String, codec: FeatureCodec): Option[FeatureCodec] =
    Option(codecRegistry.put(kind, codec))

  /** Remove the binding for `kind` (back to pure stub). */
  def unregisterCodec(kind: String): Option[FeatureCodec] =
    Option(codecRegistry.remove(kind))

  /** Immutable snapshot for task closures: the Java map itself must not
    * ship to executors (mutation visibility is undefined mid-job). */
  private def codecSnapshot(): Map[String, FeatureCodec] = {
    val b = Map.newBuilder[String, FeatureCodec]
    codecRegistry.forEach((k, v) => b += (k -> v))
    b.result()
  }

  /** Feature extraction over partition-sized batches — the mapInPandas
    * shape: one iterator in, one iterator out, no per-row UDF dispatch.
    * Each kind's registered [[FeatureCodec]] decodes when it can
    * (image ships real — `javax.imageio`); undecodable bytes and
    * unregistered kinds take the deterministic [[StubCodec]]. */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val codecs = codecSnapshot()
    media.mapPartitions { batch =>
      batch.map { m =>
        val feats = codecs.get(m.kind).flatMap(_.features(m.payload, dim))
          .getOrElse(StubCodec.features(m.payload, dim))
        MediaFeatures(m.media_id, m.kind, m.payload.length, feats)
      }
    }
  }

  /** Frame sampling for video rows: one frame every `everyMs`, each
    * frame decoded from the payload slice by the registered "video"
    * codec (the stub, until a real one is registered) — the
    * explode-shaped stage. */
  def sampleFrames(media: Dataset[Media], everyMs: Long = 1000L,
                   dim: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    val codecs = codecSnapshot()
    media.filter(_.kind == "video").mapPartitions { batch =>
      batch.flatMap { m =>
        val n = math.max(1, (m.duration_ms / everyMs).toInt)
        (0 until n).iterator.map { f =>
          val start = math.min(f * m.payload.length / n, m.payload.length)
          val end = math.min((f + 1) * m.payload.length / n, m.payload.length)
          val slice = java.util.Arrays.copyOfRange(m.payload, start, end)
          Frame(m.media_id, f, f * everyMs,
            codecs.get(m.kind).flatMap(_.features(slice, dim))
              .getOrElse(StubCodec.features(slice, dim)))
        }
      }
    }
  }

  /** Resize: aspect-preserving fit into maxW × maxH. Decodable image
    * payloads are resized at the PIXEL level and re-encoded (real
    * transform via [[ImageCodec.resized]]); everything else updates
    * metadata only (the honest stub for codec-less formats). */
  def resize(media: Dataset[Media], maxW: Int, maxH: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxW && m.height <= maxH) m
      else {
        val scale = math.min(maxW.toDouble / m.width, maxH.toDouble / m.height)
        val nw = math.max(1, (m.width * scale).toInt)
        val nh = math.max(1, (m.height * scale).toInt)
        val payload =
          if (m.kind == "image")
            ImageCodec.resized(m.payload, nw, nh).getOrElse(m.payload)
          else m.payload
        m.copy(width = nw, height = nh, payload = payload)
      }
    }
  }

  /** Average-hash over RAW BYTES: 64 equal blocks (block of byte j =
    * j·64 div n), block mean > payload mean → '1'. The same
    * construction as [[ImageCodec.phash]] with bytes standing in for
    * pixels — the deterministic fallback for payloads with no decoder,
    * and (unlike pixel decoding) SQL-expressible, which is what lets
    * m06 be oracle-checked on the synthetic fixture while the real
    * pixel path is spec-tested on generated PNGs. Empty blocks
    * (payloads shorter than 64 bytes) read as mean 0. */
  def byteAHash(payload: Array[Byte]): String = {
    val n = payload.length
    if (n == 0) return "0" * 64
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < n) {
      val blk = ((j.toLong * 64) / n).toInt
      val b = payload(j) & 0xff
      sums(blk) += b
      counts(blk) += 1
      total += b
      j += 1
    }
    aHashBits(sums, counts, total, n.toLong)
  }

  /** The shared bit rule for both aHash variants ([[ImageCodec.phash]]
    * pixels, [[byteAHash]] bytes): bin mean > global mean → '1', empty
    * bins read as mean 0. ONE definition so the documented
    * interchangeability of the two paths can't silently diverge. */
  private def aHashBits(sums: Array[Long], counts: Array[Long],
                        total: Long, n: Long): String = {
    val gmean = total.toDouble / n
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) {
      val m = if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i)
      sb.append(if (m > gmean) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Bit disagreement between two equal-length hash strings. */
  def hamming(a: String, b: String): Int = {
    require(a.length == b.length, s"hash lengths differ: ${a.length}/${b.length}")
    var d = 0
    var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  /** Perceptual hash per media row (m06): decoded-pixel aHash for
    * decodable images, [[byteAHash]] otherwise — same batched
    * mapPartitions shape as [[extractFeatures]]. Near-dup media pair
    * generation over these hashes is [[phashNearDupPairs]]. */
  def perceptualHashes(media: Dataset[Media]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val h =
        if (m.kind == "image")
          ImageCodec.phash(m.payload).getOrElse(byteAHash(m.payload))
        else byteAHash(m.payload)
      MediaHash(m.media_id, h)
    })
  }

  /** Near-dup media pairs over perceptual hashes — the d04 pigeonhole
    * banding applied to the 64-bit aHash: the hash splits into 4
    * 16-char bit-bands, any pair within Hamming distance ≤ 3 collides
    * on at least one band (guaranteed recall, not probabilistic), the
    * band equality self-join generates candidates, and an exact
    * Hamming verify ≤ `maxHamming` cuts them. `hashes` is
    * (media_id, phash) as produced by [[perceptualHashes]]; the
    * 16-bit band keys keep buckets ~n/2^16 at corpus scale, with
    * `maxBucket` capping degenerate regions (all-black thumbnails,
    * empty payloads — the phash analogue of boilerplate). Hamming is
    * computed word-wise (conv → xor → bit_count, codegen'd), not
    * per-character. Requires `maxHamming < 4` — past the pigeonhole
    * guarantee the band join silently loses recall. */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
                        maxBucket: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"4-band pigeonhole guarantees recall only for maxHamming < 4, got $maxHamming")
    import org.apache.spark.sql.functions._
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        substring(col("phash"), b * 16 + 1, 16).as("key"))
    }: _*)
    val banded = Dedup.capBuckets(
      hashes.select(col("media_id"), col("phash"),
        explode(bandStructs).as("bk"))
        .select(col("media_id"), col("phash"),
          col("bk.band").as("band"), col("bk.key").as("key")),
      Seq("band", "key"), maxBucket)
    val a = banded.select(col("media_id").as("id_a"),
      col("phash").as("ph_a"), col("band"), col("key"))
    val b = banded.select(col("media_id").as("id_b"),
      col("phash").as("ph_b"), col("band"), col("key"))
    def word(c: org.apache.spark.sql.Column, i: Int) =
      conv(substring(c, i * 16 + 1, 16), 2, 10).cast("long")
    val hamming = (0 until 4).map { i =>
      bit_count(word(col("ph_a"), i).bitwiseXOR(word(col("ph_b"), i)))
    }.reduce(_ + _).cast("int")
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      // filter BEFORE distinct, as d04: survivors pay the dedup shuffle
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
