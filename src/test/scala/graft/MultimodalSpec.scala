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

  test("phash banding pairs near-identical media and is EXACT for hamming ≤ 3") {
    import spark.implicits._
    def flip(h: String, idx: Int*): String = {
      val a = h.toCharArray
      idx.foreach(i => a(i) = if (a(i) == '0') '1' else '0')
      new String(a)
    }
    val base = ("01" * 32)
    // crafted hashes: ham(1,2)=2, ham(1,3)=3 with flips SPREAD over 3
    // different bands (the adversarial pigeonhole case — only one band
    // left equal), ham(1,4)=20 (distant), 5 = exact dup of 1
    val hashes = Seq(
      1L -> base,
      2L -> flip(base, 0, 63),
      3L -> flip(base, 5, 20, 40),
      4L -> flip(base, 0 until 20: _*),
      5L -> base).toDF("media_id", "phash")
    val pairs = Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // exact-recall contract: EVERY ham ≤ 3 pair, nothing else
    // (ham(2,3) = 5 — their flip sets barely overlap — so it must NOT pair)
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (1L, 5L), (2L, 5L), (3L, 5L)),
      s"got ${pairs.keySet}")
    assert(pairs((1L, 2L)) == 2 && pairs((1L, 3L)) == 3 && pairs((1L, 5L)) == 0)
    // real pixels: a PNG and a byte-distinct twin (trailing byte — PNG
    // decoders stop at IEND) hash identically: pixel aHash sees pixels,
    // not bytes — the pair m05's content hash structurally misses
    val png = pngBytes(64, 32)
    val trailingByte = png ++ Array[Byte](0)
    assert(Multimodal.ImageCodec.decode(trailingByte).isDefined,
      "trailing-byte PNG must still decode")
    val media = Seq(
      Multimodal.Media(10L, "image", png, 64, 32, 0, 0L),
      Multimodal.Media(11L, "image", trailingByte, 64, 32, 0, 0L)).toDS()
    val found = Multimodal.phashNearDupPairs(
        Multimodal.perceptualHashes(media).toDF(), maxHamming = 3)
      .collect()
    assert(found.length == 1 && found.head.getInt(2) == 0,
      s"re-encoded image must pair at hamming 0: ${found.mkString(",")}")
    // bucket cap drops a degenerate bucket (e.g. all-black thumbnails)
    val degenerate = (0 until 50).map(i => (100L + i) -> ("0" * 64)).toDF("media_id", "phash")
    assert(Multimodal.phashNearDupPairs(degenerate, 3, maxBucket = 10).count() == 0L)
    assert(Multimodal.phashNearDupPairs(degenerate, 3).count() == 50L * 49 / 2)
  }

  test("codec registry: a registered 'real' audio codec is picked up with zero dataflow changes") {
    // The StubCodec scaladoc's swap claim, tested: register a fake
    // "real" audio decoder and the SAME extractFeatures/sampleFrames
    // calls (m01–m03's dataflow) route audio rows through it — image
    // stays on javax.imageio, video stays stubbed, and unregistering
    // restores the stub exactly.
    val fake = MultimodalSpec.FakeAudioCodec
    val before = Multimodal.extractFeatures(media, dim = 4)
      .collect().sortBy(_.media_id)
    val prev = Multimodal.registerCodec("audio", fake)
    assert(prev.isEmpty, "audio had no codec registered before this test")
    try {
      val after = Multimodal.extractFeatures(media, dim = 4)
        .collect().sortBy(_.media_id)
      before.zip(after).foreach { case (b, a) =>
        if (a.kind == "audio") {
          assert(a.features.toSeq ==
            Seq.tabulate(4)(i => a.n_bytes.toFloat + i),
            s"audio row ${a.media_id} did not route through the registered codec")
        } else {
          assert(a.features.toSeq == b.features.toSeq,
            s"${a.kind} row ${a.media_id} must be untouched by an AUDIO codec")
        }
      }
      // frame sampling consults the registry for ITS kind too: video is
      // unregistered, so frames keep the stub features
      val frames = Multimodal.sampleFrames(media, everyMs = 1000L, dim = 4)
      assert(frames.count() > 0)
    } finally {
      assert(Multimodal.unregisterCodec("audio").contains(fake))
    }
    val restored = Multimodal.extractFeatures(media, dim = 4)
      .collect().sortBy(_.media_id)
    before.zip(restored).foreach { case (b, r) =>
      assert(r.features.toSeq == b.features.toSeq,
        s"unregister must restore stub features for ${r.media_id}")
    }
  }

  test("decodeAudit: whole PNG decodes with true width, truncation and non-image diagnose") {
    import spark.implicits._
    val whole = Multimodal.ImageCodec.pngBytes(7L) // 15 x 7 by the id formula
    val rows = Seq(
      (1L, whole),
      (2L, whole.take(24)),                    // PNG signature, body gone
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeAudit(rows).collect()
      .map(a => a.media_id -> ((a.reason, a.width))).toMap
    assert(got(1L) == (("ok", (7 % 16 + 8).toInt)), got.toString)
    assert(got(2L) == (("truncated_image", 0)), got.toString)
    assert(got(3L) == (("not_an_image", 0)), got.toString)
  }
}

object MultimodalSpec {
  /** Spec-only fake "real" audio codec — a top-level object so the task
    * closure ships it without dragging the (non-serializable) suite
    * instance along. */
  object FakeAudioCodec extends Multimodal.FeatureCodec {
    def features(payload: Array[Byte], dim: Int): Option[Array[Float]] =
      Some(Array.tabulate(dim)(i => payload.length.toFloat + i))
  }
}
