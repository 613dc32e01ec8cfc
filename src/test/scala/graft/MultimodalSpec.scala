package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal binary-column plumbing: schema, determinism, batch shape.
  * (Decode itself is a documented stub — see Multimodal.StubCodec.) */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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
}
