package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit =
    Seq(CurationPipeline.PairsTable, CurationPipeline.CuratedTable)
      .foreach(t => graft.plans.Catalog.dropIfExists(spark, t))

  private def docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  test("curation run collapses planted fuzzy family and reports zero skips on a sane corpus") {
    val fam = docs.filter($"doc_id" === 0)
    val planted = docs
      .unionByName(fam.select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" tail one")).as("text")))
    val report = CurationPipeline.run(spark, planted, jaccardThreshold = 0.5)
    assert(report.ok)
    assert(report.metrics("docs_in") == planted.count())
    assert(report.metrics("skipped_buckets_minhash") == 0L,
      s"unexpected skips: ${report.metrics}")
    assert(report.metrics("docs_removed") >= 1L) // the planted copy (and corpus's own dups)
    assert(report.metrics("docs_kept") + report.metrics("docs_removed") == report.metrics("docs_in"))
    val kept = spark.table(CurationPipeline.CuratedTable)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(100000L))
  }

  test("degenerate identical corpus: cap triggers, run still succeeds, skips are REPORTED") {
    val one = docs.filter($"doc_id" === 0).select("text").head().getString(0)
    val degenerate = spark.range(3000)
      .select($"id".as("doc_id"), lit(one).as("text"))
    val report = CurationPipeline.run(spark, degenerate, maxBucketSize = 100)
    assert(report.ok)
    assert(report.metrics("skipped_buckets_minhash") > 0L,
      s"cap did not report: ${report.metrics}")
    assert(report.metrics("skipped_bucket_members_minhash") >= 3000L)
    assert(report.metrics("near_dup_pairs") == 0L) // capped buckets emit no pairs
  }
}
