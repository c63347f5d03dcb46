package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Components, TextDedup}
import graft.plans.Catalog

/** LLM-corpus curation as a [[Runner]] pipeline: near-dup pair mining →
  * cluster decisions → curated publish, with the capped-bucket SKIP
  * METRICS in the run's metric map.
  *
  * The near-dup candidate generators bound per-bucket work by dropping
  * degenerate buckets past `maxBucketSize` — at 100 TB that cap WILL
  * trigger (boilerplate families, empty text), and "observable" must
  * mean "in the PipelineReport a operator reads anyway", not "available
  * if you think to run the side query". Stages follow the reference's
  * orchestration discipline (ReferencePipeline): state travels through
  * catalog tables and the metric map, never closures over DataFrames.
  */
object CurationPipeline {

  val PairsTable = "doc_neardup_pairs"
  val CuratedTable = "documents_curated"

  def run(spark: SparkSession, docs: DataFrame,
          jaccardThreshold: Double = 0.8,
          maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
          notify: PipelineReport => Unit = _ => ()): PipelineReport = {
    val stages = Seq(
      Stage("near_dup_pairs") { _ =>
        // one banding pass feeds BOTH the pairs and the skip metric —
        // the cap must never truncate silently, and observing it must
        // not re-hash the corpus
        val (pairs, skippedBuckets) = TextDedup.nearDupPairsAndSkipsMinhash(docs,
          jaccardThreshold = jaccardThreshold, maxBucketSize = maxBucketSize)
        Catalog.overwriteTable(pairs, PairsTable)
        val skipped = skippedBuckets
          .agg(count(lit(1)).as("buckets"),
            coalesce(sum("member_count"), lit(0L)).as("members")).head()
        Map(
          "near_dup_pairs" -> spark.table(PairsTable).count(),
          "skipped_buckets_minhash" -> skipped.getLong(0),
          "skipped_bucket_members_minhash" -> skipped.getLong(1))
      },
      Stage("dedup_decisions") { m =>
        val losers = Components.connectedComponents(spark.table(PairsTable))
          .filter(col("id") =!= col("component"))
          .select(col("id").as("doc_id"))
        val curated = docs.join(losers, Seq("doc_id"), "left_anti")
        // reader-facing tier: atomic versioned publish
        Catalog.ctasOverwrite(curated, CuratedTable)
        val kept = spark.table(CuratedTable).count()
        // docs_in travels via the metric map (XCom discipline) — no
        // second corpus count
        Map("docs_kept" -> kept, "docs_removed" -> (m("docs_in") - kept))
      })
    new Runner(stages, RetryPolicy(retries = 1), notify).run(Map("docs_in" -> docs.count()))
  }
}
