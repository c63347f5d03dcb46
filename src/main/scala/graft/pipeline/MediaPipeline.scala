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
  val CaptionsTable = "media_captions"
  val BatchSurvivorsTable = "media_batch_survivors"
  val BatchIndexTable = "media_batch_index"
  val BatchComponentsTable = "media_batch_components"
  val BatchCaptionsTable = "media_batch_captions"

  /** Ingest one media slice: reconcile against the stored phash index,
    * publish survivors + their index rows. Returns the stage report
    * with batch_in/batch_kept/batch_dropped/skipped_cross_buckets/
    * skipped_batch_buckets/tier_media_after metrics.
    *
    * With `captions` (media_id, caption, score — the batch's caption
    * candidates), the treadmill also maintains the RUNNING keep-best
    * caption artifact ([[CaptionsTable]]): each candidate attributes to
    * its asset's component canonical via the SAME reconcile closure
    * the dedup used (one closure per batch, staged —
    * [[Multimodal.captionKeepBestAgainst]] folds it with the stored
    * winners, touched canonicals only), and the publish MERGEs the new
    * winner rows through the atomic view flip. The fold is exact
    * (keep-best is an associative min, dropped_count adds): the
    * running artifact equals batch-global [[Multimodal.captionKeepBest]]
    * over every asset + caption ingested so far — EXCEPT when a batch
    * asset BRIDGES two previously-independent tier components, which
    * batch-global replay would merge; bridges are counted in the
    * `bridged_components` metric, never silent. The fold is also
    * REPLAY-SAFE under foreachBatch's at-least-once redelivery: winner
    * rows carry a `folded_max_id` stamp (max candidate id folded, on
    * the same atomic merge), and a batch whose candidate ids sit at or
    * below the global stamp folds as a no-op (`caption_replay_skipped`
    * metric) instead of double-counting into dropped_count. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, maxHamming: Int = 3,
                  grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  captions: Option[DataFrame] = None,
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
          // ONE closure feeds the survivor derivation, the caption
          // attribution, and the bridge metric
          val comps = Multimodal.phashReconcileComponents(bIdx, tierIdx,
            maxHamming, maxBucketSize)
          Catalog.overwriteTable(comps, BatchComponentsTable)
          Catalog.overwriteTable(
            Multimodal.phashAgainstFromComponents(batch,
              spark.table(BatchComponentsTable), tierIdx),
            BatchSurvivorsTable)
          // survivor index rows come from the PIN, never a second decode
          Catalog.overwriteTable(
            bIdx.join(spark.table(BatchSurvivorsTable).select("media_id"),
              Seq("media_id"), "left_semi"),
            BatchIndexTable)
          val kept = spark.table(BatchSurvivorsTable).count()
          val bridged = spark.table(BatchComponentsTable)
            .join(tierIdx.select(col("media_id").as("id")).distinct(), Seq("id"), "left_semi")
            .groupBy("component").agg(count(lit(1)).as("__n"))
            .filter(col("__n") >= 2).count()
          Map("batch_kept" -> kept, "batch_dropped" -> (m("batch_in") - kept),
            "bridged_components" -> bridged,
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
      }) ++
      (captions match {
        case None => Seq.empty[Stage]
        case Some(caps) => Seq(
          Stage("caption_reconcile") { _ =>
            import spark.implicits._
            val stored =
              if (Catalog.tableExists(spark, CaptionsTable)) spark.table(CaptionsTable)
              else Seq.empty[(Long, String, Long, Option[Double], Long, Long)]
                .toDF("media_id", "kept_caption", "kept_from", "kept_score",
                  "dropped_count", "folded_max_id")
            // REPLAY GUARD: the fold is exact under stage retry (the
            // publish re-merges the same winner rows) but foreachBatch
            // is at-least-once — a redelivered batch would fold its
            // candidates a SECOND time against the already-merged
            // winners, inflating dropped_count. Ids are fresh+monotone
            // across batches, so each fold stamps its touched rows with
            // the batch's max candidate id (`folded_max_id`, riding the
            // SAME atomic merge — no commit window between artifact and
            // ledger), and candidates at or below the global stamp are
            // a redelivery: excluded, the fold degenerates to a no-op.
            val watermark = stored
              .agg(coalesce(max("folded_max_id"), lit(Long.MinValue)))
              .head().getLong(0)
            val named = caps.filter(col("caption").isNotNull)
            val cands = named.filter(col("media_id") > watermark)
            val batchMax = cands.agg(max("media_id")).head()
            Catalog.overwriteTable(
              Multimodal.captionKeepBestAgainst(
                spark.table(BatchComponentsTable), stored.drop("folded_max_id"), cands)
                .withColumn("folded_max_id",
                  lit(if (batchMax.isNullAt(0)) Long.MinValue else batchMax.getLong(0))),
              BatchCaptionsTable)
            val touched = spark.table(BatchCaptionsTable).count()
            Map("caption_components_touched" -> touched,
              "caption_candidates" -> named.count(),
              "caption_replay_skipped" -> (named.count() - cands.count()))
          })
      }) ++
      Seq(
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
        if (captions.nonEmpty) {
          // MERGE through the atomic view flip — naturally idempotent
          // under retry (the same winner rows upsert to the same state)
          val winners = spark.table(BatchCaptionsTable)
          if (!Catalog.tableExists(spark, CaptionsTable))
            Catalog.ctasOverwrite(winners, CaptionsTable)
          else Catalog.mergeInto(spark, CaptionsTable, winners, Seq("media_id"))
        }
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
  /** With `captioned = true` the landing rows carry two extra nullable
    * columns (caption STRING, score DOUBLE) — a crawl delivers the
    * asset and its caption together, so ONE landing stream feeds both
    * artifacts; each micro-batch splits into assets and caption
    * candidates and the caption keep-best artifact updates in the same
    * exactly-once drain. */
  def streamIngest(spark: SparkSession, landingDir: String, checkpointDir: String,
                   maxHamming: Int = 3,
                   grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                   maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                   captioned: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema =
      if (!captioned) Multimodal.MediaSchema
      else org.apache.spark.sql.types.StructType(Multimodal.MediaSchema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("caption",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType)))
    spark.readStream
      .schema(schema)
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
        val r = try {
          val assets =
            if (captioned) pinned.drop("caption", "score") else pinned
          val caps =
            if (captioned) Some(pinned.select("media_id", "caption", "score"))
            else None
          ingestBatch(batch.sparkSession, assets, maxHamming, grid, maxBucketSize, caps)
        } finally pinned.unpersist(blocking = false)
        require(r.ok, s"media ingestBatch failed in micro-batch $id: " +
          r.stages.filterNot(_.ok).map(s => s"${s.stage}: ${s.error.getOrElse("?")}").mkString("; "))
        // ...and the OUTER session must drop ITS cached listings of the
        // published tables (the clone's refreshes don't reach it).
        Seq(TierTable, PhashIndexTable, CaptionsTable)
          .foreach(t => if (Catalog.tableExists(spark, t)) spark.catalog.refreshTable(t))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Drop every treadmill table — a fresh-tier reset for self-contained
    * runs (the stream gate query and specs). */
  def resetTreadmill(spark: SparkSession): Unit =
    Seq(TierTable, PhashIndexTable, CaptionsTable, BatchSurvivorsTable,
      BatchIndexTable, BatchComponentsTable, BatchCaptionsTable)
      .foreach(Catalog.dropIfExists(spark, _))
}
