package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.TextDedup
import graft.plans.Catalog

/** The MEDIA ingest treadmill — the third modality's production shape,
  * completing the triad next to [[CurationPipeline.ingestBatch]] (docs)
  * and [[VectorPipeline.ingestBatch]] (embeddings): each new media
  * crawl slice reconciles against the STORED perceptual-hash index of
  * the curated tier ([[Multimodal.phashAgainst]] — tier bytes are
  * NEVER re-decoded; at 100 TB of media, decode is the cost that must
  * be paid exactly once per asset), and only the surviving assets plus
  * their 4-chunk phash index rows are appended.
  *
  * First call bootstraps: the batch self-dedups batch-globally (the
  * same code path with an EMPTY tier index — cross candidates vanish,
  * the in-batch closure is exactly [[Multimodal.phashDedup]]) and
  * becomes the tier. Batch media_ids must be fresh and monotone (the
  * treadmill ingest discipline shared with docs/vectors); under it the
  * running tier equals batch-global perceptual dedup over all slices
  * so far (phashAgainst's documented convergence contract).
  *
  * Plan shape per batch: ONE decode pass builds the batch index
  * ([[Multimodal.phashIndex]], pinned); reconcile, the survivor index
  * (a semi-join of that pin — never a second decode), and the skip
  * metrics all read the pin; publish appends tier + index through
  * [[Catalog.insertAppendOnce]] (retry-exposed multi-table publish —
  * converges to exactly-once under partial visibility). Capped cross
  * buckets are counted and REPORTED in the metric map
  * ([[Multimodal.skippedPhashBucketsAgainst]]) — the cap never
  * truncates silently. */
object MediaPipeline {

  val TierTable = "media_tier"
  val PhashIndexTable = "media_phash_index"
  val BatchSurvivorsTable = "media_batch_survivors"
  val BatchIndexTable = "media_batch_index"

  /** Ingest one media slice: reconcile against the stored phash index,
    * publish survivors + their index rows. Returns the stage report
    * with batch_in/batch_kept/batch_dropped/skipped_cross_buckets/
    * skipped_batch_buckets/tier_media_after metrics. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, maxHamming: Int = 3,
                  grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  notify: PipelineReport => Unit = _ => ()): PipelineReport = {
    val stages = Seq(
      Stage("probe_tier") { _ =>
        Map("tier_media" -> (if (Catalog.tableExists(spark, TierTable))
          spark.table(TierTable).count() else 0L))
      },
      Stage("incremental_phash_dedup") { m =>
        // the ONE decode pass of the whole batch lifecycle
        val bIdx = Multimodal.phashIndex(batch, grid).localCheckpoint(true)
        try {
          val tierIdx =
            if (m("tier_media") > 0L) spark.table(PhashIndexTable)
            else bIdx.limit(0) // empty tier: reconcile degenerates to in-batch dedup
          val survivors = Multimodal.phashAgainst(batch, tierIdx, maxHamming, grid,
            maxBucketSize, batchIndex = Some(bIdx))
          Catalog.overwriteTable(survivors, BatchSurvivorsTable)
          // survivor index rows come from the PIN, never a second decode
          Catalog.overwriteTable(
            bIdx.join(spark.table(BatchSurvivorsTable).select("media_id"),
              Seq("media_id"), "left_semi"),
            BatchIndexTable)
          val kept = spark.table(BatchSurvivorsTable).count()
          Map("batch_kept" -> kept, "batch_dropped" -> (m("batch_in") - kept),
            "skipped_cross_buckets" ->
              Multimodal.skippedPhashBucketsAgainst(bIdx, tierIdx, maxBucketSize).count(),
            "skipped_batch_buckets" ->
              Multimodal.skippedPhashBucketsFromIndex(bIdx, maxBucketSize).count())
        } finally {
          // everything reading the pin (scratch tables, both skip
          // metrics) has materialized above — release it NOW, or a
          // long-lived treadmill session accumulates one eagerly-pinned
          // RDD per batch (the BpeSpec pin-leak discipline)
          Catalog.releasePin(bIdx)
        }
      },
      Stage("publish_batch") { _ =>
        val survivors = spark.table(BatchSurvivorsTable)
        val idx = spark.table(BatchIndexTable)
        if (!Catalog.tableExists(spark, TierTable)) {
          Catalog.ensureTable(spark, TierTable, survivors.schema)
          Catalog.ensureTable(spark, PhashIndexTable, idx.schema)
        }
        // idempotent multi-table publish under a retrying Runner
        Catalog.insertAppendOnce(spark, TierTable, survivors, "media_id")
        Catalog.insertAppendOnce(spark, PhashIndexTable, idx, "media_id")
        Map("tier_media_after" -> spark.table(TierTable).count())
      })
    new Runner(stages, RetryPolicy(retries = 1), notify).run(Map("batch_in" -> batch.count()))
  }

  /** The media treadmill as a STREAM: a checkpointed file source over a
    * PARQUET landing layout (binary payloads make parquet the natural
    * landing format where docs/vectors land as JSON) drives
    * [[ingestBatch]] once per micro-batch via foreachBatch. The
    * checkpoint dedups FILES (a restart resumes at the first
    * undiscovered slice); the stored phash index dedups CONTENT, so a
    * redelivered asset cannot re-enter the tier either way.
    * Trigger.AvailableNow drains everything landed and stops — the
    * scheduled-batch deployment shape. */
  def streamIngest(spark: SparkSession, landingDir: String, checkpointDir: String,
                   maxHamming: Int = 3,
                   grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                   maxBucketSize: Int = TextDedup.DefaultMaxBucketSize)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(Multimodal.MediaSchema)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // the CurationPipeline.streamIngest cache-coherence discipline:
        // run the WHOLE treadmill on the micro-batch's session clone
        // (scratch overwrites refresh the WRITING session's relation
        // cache; mixing sessions in one plan splits it), and pin the
        // batch — the stages fire several actions over it and an
        // unpersisted micro-batch re-reads the landing files for each.
        val pinned = batch.toDF().persist()
        val r = try ingestBatch(batch.sparkSession, pinned, maxHamming, grid, maxBucketSize)
        finally pinned.unpersist(blocking = false)
        require(r.ok, s"media ingestBatch failed in micro-batch $id: " +
          r.stages.filterNot(_.ok).map(s => s"${s.stage}: ${s.error.getOrElse("?")}").mkString("; "))
        // ...and the OUTER session must drop ITS cached listings of the
        // published tables (the clone's refreshes don't reach it).
        Seq(TierTable, PhashIndexTable)
          .foreach(t => if (Catalog.tableExists(spark, t)) spark.catalog.refreshTable(t))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Drop every treadmill table — a fresh-tier reset for self-contained
    * runs (the stream gate query and specs). */
  def resetTreadmill(spark: SparkSession): Unit =
    Seq(TierTable, PhashIndexTable, BatchSurvivorsTable, BatchIndexTable)
      .foreach(Catalog.dropIfExists(spark, _))
}
