package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal binary-column plumbing: schema, determinism, batch shape.
  * Image decode is REAL (javax.imageio via Multimodal.ImageCodec) and
  * exercised with generated PNGs below; audio/video decode is a
  * documented stub — see Multimodal.StubCodec. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory PNG: w×h horizontal gray gradient. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 255) / math.max(w - 1, 1)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val sf = "/root/testdata/sf0.001"
  private lazy val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))

  test("media schema: binary payload + typed metadata, kinds partitioned") {
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName == "binary")
    val kinds = df.select("kind").distinct().as[String].collect().sorted
    assert(kinds.toSeq == Seq("audio", "image", "video"))
    // payload round-trips the source text bytes
    val row = df.filter(col("media_id") === 0)
      .join(Tables.load(spark, sf, "documents"), col("media_id") === col("doc_id"))
      .select(decode(col("payload"), "UTF-8"), col("text")).head
    assert(row.getString(0) == row.getString(1))
  }

  test("feature extraction is deterministic, fixed-dim, batch-shaped") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == 16))
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq, s"nondeterministic for ${a.media_id}")
    }
    // features depend on payload: different docs → different features
    assert(f1.map(_.features.toSeq).distinct.length > f1.length / 2)
  }

  test("real PNG payloads take the javax.imageio decode path (histogram features)") {
    val png = pngBytes(64, 32)
    val rows = Seq(
      Multimodal.Media(1L, "image", png, 64, 32, 0, 0L),
      Multimodal.Media(2L, "image", "not an image".getBytes, 10, 10, 0, 0L),
      Multimodal.Media(3L, "audio", png, 0, 0, 16000, 100L)).toDS()
    val feats = Multimodal.extractFeatures(rows, dim = 16)
      .collect().map(f => f.media_id -> f).toMap
    // decoded histogram: normalized (sums to 1), spread across gray bins
    val hist = feats(1L).features
    assert(math.abs(hist.sum - 1f) < 1e-3, s"histogram not normalized: ${hist.sum}")
    assert(hist.count(_ > 0f) >= 8, "gradient should fill most gray bins")
    // undecodable image bytes fall back to the deterministic stub
    assert(feats(2L).features.toSeq ==
      Multimodal.StubCodec.features("not an image".getBytes, 16).toSeq)
    // a corrupt-but-plausible image (real PNG header, garbage body) must
    // also fall back, not kill the task. This JRE surfaces such cases as
    // IIOException; the NonFatal catch in decode() additionally guards
    // the version/codec-dependent RuntimeException escapes (IndexOutOf
    // Bounds/IllegalArgument/CMM) that crafted bytes can't trigger
    // deterministically here.
    val corrupt = pngBytes(8, 8).take(40) ++ Array.fill[Byte](64)(0x7f)
    assert(Multimodal.ImageCodec.decode(corrupt).isEmpty)
    assert(Multimodal.ImageCodec.features(corrupt, 16).isEmpty)
    // audio ignores the decodable payload: stays on the stub path
    assert(feats(3L).features.toSeq == Multimodal.StubCodec.features(png, 16).toSeq)
  }

  test("resize transforms decodable image pixels, not just metadata") {
    val png = pngBytes(64, 32)
    val rows = Seq(Multimodal.Media(1L, "image", png, 64, 32, 0, 0L)).toDS()
    val out = Multimodal.resize(rows, maxW = 32, maxH = 32).collect()(0)
    assert(out.width == 32 && out.height == 16)
    val img = Multimodal.ImageCodec.decode(out.payload).get
    assert(img.getWidth == 32 && img.getHeight == 16) // payload re-encoded
    // still a gradient after bilinear scale: left edge darker than right
    val left = img.getRGB(0, 8) & 0xff
    val right = img.getRGB(31, 8) & 0xff
    assert(left < right)
  }

  test("frame sampling: only videos, ~1 frame per second of duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    val videos = media.filter(_.kind == "video").collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet == videos.map(_.media_id).toSet)
    videos.foreach { v =>
      val expected = math.max(1, (v.duration_ms / 1000L).toInt)
      assert(byId(v.media_id).length == expected)
      assert(byId(v.media_id).map(_.frame_idx).sorted.toSeq == (0 until expected))
    }
  }

  test("resize caps dimensions preserving aspect ratio") {
    val resized = Multimodal.resize(media, 100, 100).collect()
    resized.foreach { m =>
      assert(m.width <= 100 && m.height <= 100)
      assert(m.width > 0 && m.height > 0)
    }
  }

  test("perceptual hash: real pixels — edits land near, different images far") {
    // structured deterministic images: left-dark/right-light vs
    // top-dark/bottom-light differ in ~half the cells; a lightly-edited
    // copy (one corner cell nudged, mean-preserving) stays within a few
    def img(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = pix(x, y) & 0xff
        b.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos)
      bos.toByteArray
    }
    val leftRight = img(64, 64)((x, _) => if (x < 32) 20 else 220)
    val leftRightEdit = img(64, 64)((x, y) =>
      if (x < 8 && y < 8) 220 else if (x < 32) 20 else 220)
    val topBottom = img(64, 64)((_, y) => if (y < 32) 20 else 220)
    val Some(h1) = Multimodal.ImageCodec.phash(leftRight)
    val Some(h1e) = Multimodal.ImageCodec.phash(leftRightEdit)
    val Some(h2) = Multimodal.ImageCodec.phash(topBottom)
    assert(h1.length == 64 && h1.forall(c => c == '0' || c == '1'))
    // identical bytes → identical hash; re-encode at same pixels too
    assert(Multimodal.ImageCodec.phash(img(64, 64)((x, _) => if (x < 32) 20 else 220))
      .contains(h1))
    assert(Multimodal.hamming(h1, h1e) <= 4,
      s"light edit moved ${Multimodal.hamming(h1, h1e)} bits")
    assert(Multimodal.hamming(h1, h2) >= 16,
      s"different images only ${Multimodal.hamming(h1, h2)} bits apart")
  }

  test("byteAHash: deterministic, 64 bits, short payloads pad with zero blocks") {
    val h = Multimodal.byteAHash("abcdefgh".getBytes("UTF-8") ++ Array.fill(120)('z'.toByte))
    assert(h.length == 64 && h.forall(c => c == '0' || c == '1'))
    // a payload shorter than 64 bytes still yields 64 bits
    val short = Multimodal.byteAHash("abc".getBytes("UTF-8"))
    assert(short.length == 64)
    assert(Multimodal.byteAHash(Array.emptyByteArray) == "0" * 64)
    // undecodable "image" payloads fall back to byteAHash in the Dataset path
    import spark.implicits._
    val m = Seq(Multimodal.Media(9L, "image", "not an image".getBytes, 1, 1, 0, 0L)).toDS()
    val out = Multimodal.perceptualHashes(m).collect()
    assert(out.head.phash == Multimodal.byteAHash("not an image".getBytes))
  }
}
