package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup}

/** The composed curation pipeline: stage counts are monotone, the output
  * is free of exact and detected near duplicates, and the language-
  * partitioned write lands pruned directories. */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("curate: monotone stage counts, no remaining dups") {
    val docs = Tables.load(spark, sf, "documents")
    val c = Curation.curate(docs)
    val (curated, report) = (c.frame, c.report)
    val byStage = report.map(r => r.stage -> r.n_docs).toMap
    assert(byStage("input") == 500)
    assert(byStage("quality_filtered") <= byStage("input"))
    assert(byStage("exact_deduped") <= byStage("quality_filtered"))
    assert(byStage("near_deduped") <= byStage("exact_deduped"))
    assert(byStage("near_deduped") > 0)
    // near-dup stage actually removed something (fixture has near-dups)
    assert(byStage("near_deduped") < byStage("exact_deduped"))

    val out = curated.cache()
    assert(out.count() == byStage("near_deduped"))
    // no exact dups survive
    assert(out.select("text").distinct().count() == out.count())
    // no detected near-dup pair has both members surviving
    val pairs = Dedup.minhashNearDups(out.select("doc_id", "text"),
      "doc_id", "text", n = 3, threshold = 0.5)
    assert(pairs.count() == 0, "near-dup pair survived curation")
    c.release() // intermediate caches dropped once consumed
  }

  test("curateTo: language-partitioned parquet layout") {
    val dir = Files.createTempDirectory("graft_curated").toString
    val report = Curation.curateTo(Tables.load(spark, sf, "documents"), dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("pred_lang=")))
    val back = spark.read.parquet(dir)
    assert(back.count() == report.last.n_docs)
    // partition pruning works on the curated output
    val en = back.filter(col("pred_lang") === "en")
    assert(en.count() > 0)
  }
}
