package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.TextDedup
import graft.plans.Catalog

/** The VIDEO ingest treadmill — the FOURTH incremental modality,
  * completing the set next to docs ([[CurationPipeline.ingestBatch]]),
  * embeddings ([[VectorPipeline.ingestBatch]]) and still-media assets
  * ([[MediaPipeline.ingestBatch]]): each new crawl slice of sampled
  * FRAMES decodes exactly once into per-video frame-hash sets
  * ([[Multimodal.frameHashes]]), reconciles against the STORED
  * frame-hash index of the curated tier ([[Multimodal.videoAgainst]] —
  * tier frames are NEVER re-decoded; the index carries each tier
  * video's distinct hash set, which is both the candidate bucketing
  * structure and the verification payload), and only the surviving
  * videos plus their index rows are appended.
  *
  * First call bootstraps: the batch self-dedups batch-globally (the
  * same code path with an EMPTY tier index — cross candidates vanish,
  * the in-batch closure is exactly [[Multimodal.videoDedup]]) and
  * becomes the tier. Ingest discipline: batch video_ids must be fresh
  * and monotone, and a video's frames must all land WITHIN one slice
  * (a video split across drains would reconcile its first fragment as
  * the tier copy — the per-video analog of the docs treadmill's
  * whole-document rule). Under it the running tier equals batch-global
  * [[Multimodal.videoDedup]] over all slices so far.
  *
  * Plan shape per batch: ONE decode pass ([[Multimodal.frameHashes]],
  * pinned) → the batch index pin ([[Multimodal.videoIndex]]);
  * reconcile, the survivor index (a semi-join of the pin — never a
  * second decode), and both skip metrics all read the pins; publish
  * appends tier + index through [[Catalog.insertAppendOnce]]. Capped
  * frame-hash buckets are counted and REPORTED in the metric map —
  * the cap never truncates silently. */
object VideoPipeline {

  val TierTable = "video_tier"                 // (video_id, frame_hashes)
  val FrameIndexTable = "video_frame_index"    // (video_id, frame_hash)
  val CaptionsTable = "video_captions"
  val BatchSurvivorsTable = "video_batch_survivors"
  val BatchIndexTable = "video_batch_index"
  val BatchComponentsTable = "video_batch_components"
  val BatchCaptionsTable = "video_batch_captions"

  /** Ingest one slice of sampled frames: decode once, reconcile against
    * the stored frame-hash index, publish surviving videos + their
    * index rows. Returns the stage report with batch_frames/batch_in/
    * batch_kept/batch_dropped/skipped_cross_buckets/
    * skipped_batch_buckets/tier_videos_after metrics.
    *
    * With `captions` (video_id, caption, score) the treadmill also
    * maintains the RUNNING keep-best caption artifact
    * ([[CaptionsTable]]) — the [[MediaPipeline]] caption fold on the
    * video closure: each candidate attributes to its video's component
    * canonical via the SAME reconcile closure the dedup used,
    * [[Multimodal.captionKeepBestAgainst]] folds it with the stored
    * winners (touched canonicals only; keep-best is an associative
    * min, so the artifact equals batch-global keep-best over every
    * caption ever ingested), and the publish MERGEs through the atomic
    * flip. Bridges are counted in `bridged_components`, never silent;
    * redelivered batches fold as a no-op via the `folded_max_id`
    * watermark stamp ([[MediaPipeline.ingestBatch]]'s replay guard
    * verbatim, `caption_replay_skipped` metric). */
  def ingestBatch(spark: SparkSession, frames: DataFrame,
                  jaccardThreshold: Double = 0.9, containThreshold: Double = 0.9,
                  grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  captions: Option[DataFrame] = None,
                  notify: PipelineReport => Unit = _ => ()): PipelineReport = {
    val stages = Seq(
      Stage("probe_tier") { _ =>
        Map("tier_videos" -> (if (Catalog.tableExists(spark, TierTable))
          spark.table(TierTable).count() else 0L))
      },
      Stage("incremental_video_dedup") { m =>
        // the ONE decode pass of the whole batch lifecycle
        val bVids = Multimodal.frameHashes(frames, grid).localCheckpoint(true)
        try {
          val bIdx = Multimodal.videoIndex(bVids).localCheckpoint(true)
          try {
            val tierIdx =
              if (m("tier_videos") > 0L) spark.table(FrameIndexTable)
              else bIdx.limit(0) // empty tier: reconcile = in-batch dedup
            // ONE closure feeds the survivor derivation, the caption
            // attribution, and the bridge metric
            val comps = Multimodal.videoReconcileComponents(bVids, bIdx, tierIdx,
              jaccardThreshold, containThreshold, maxBucketSize)
            Catalog.overwriteTable(comps, BatchComponentsTable)
            Catalog.overwriteTable(
              Multimodal.videoAgainstFromComponents(bVids,
                spark.table(BatchComponentsTable), tierIdx),
              BatchSurvivorsTable)
            // survivor index rows come from the PIN, never a re-decode
            Catalog.overwriteTable(
              bIdx.join(spark.table(BatchSurvivorsTable).select("video_id"),
                Seq("video_id"), "left_semi"),
              BatchIndexTable)
            val in = bVids.count()
            val kept = spark.table(BatchSurvivorsTable).count()
            val bridged = spark.table(BatchComponentsTable)
              .join(tierIdx.select(col("video_id").as("id")).distinct(),
                Seq("id"), "left_semi")
              .groupBy("component").agg(count(lit(1)).as("__n"))
              .filter(col("__n") >= 2).count()
            Map("batch_in" -> in, "batch_kept" -> kept,
              "batch_dropped" -> (in - kept),
              "bridged_components" -> bridged,
              "skipped_cross_buckets" ->
                Multimodal.skippedVideoBucketsAgainst(bIdx, tierIdx, maxBucketSize).count(),
              "skipped_batch_buckets" ->
                Multimodal.skippedVideoBucketsFromIndex(bIdx, maxBucketSize).count())
          } finally Catalog.releasePin(bIdx)
        } finally Catalog.releasePin(bVids)
        // both pins release HERE — everything reading them (scratch
        // tables, counts, skip metrics) materialized above, so a
        // long-lived treadmill session never accumulates per-batch pins
      }) ++
      (captions match {
        case None => Seq.empty[Stage]
        case Some(caps) => Seq(
          Stage("caption_reconcile") { _ =>
            import spark.implicits._
            // the media fold verbatim, on the video id space (rename
            // in, rename out — ONE keep-best implementation)
            val stored =
              if (Catalog.tableExists(spark, CaptionsTable))
                spark.table(CaptionsTable).withColumnRenamed("video_id", "media_id")
              else Seq.empty[(Long, String, Long, Option[Double], Long, Long)]
                .toDF("media_id", "kept_caption", "kept_from", "kept_score",
                  "dropped_count", "folded_max_id")
            // REPLAY GUARD (the MediaPipeline watermark verbatim): ids
            // are fresh+monotone, each fold stamps its touched rows with
            // the batch's max candidate id riding the SAME atomic merge,
            // and candidates at or below the global stamp are a
            // foreachBatch redelivery — excluded, the fold is a no-op.
            val watermark = stored
              .agg(coalesce(max("folded_max_id"), lit(Long.MinValue)))
              .head().getLong(0)
            val named = caps.filter(col("caption").isNotNull)
            val cands = named.filter(col("video_id") > watermark)
            val batchMax = cands.agg(max("video_id")).head()
            Catalog.overwriteTable(
              Multimodal.captionKeepBestAgainst(
                spark.table(BatchComponentsTable), stored.drop("folded_max_id"),
                cands.withColumnRenamed("video_id", "media_id"))
                .withColumn("folded_max_id",
                  lit(if (batchMax.isNullAt(0)) Long.MinValue else batchMax.getLong(0)))
                .withColumnRenamed("media_id", "video_id"),
              BatchCaptionsTable)
            Map("caption_components_touched" -> spark.table(BatchCaptionsTable).count(),
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
          Catalog.ensureTable(spark, FrameIndexTable, idx.schema)
        }
        // idempotent multi-table publish under a retrying Runner
        Catalog.insertAppendOnce(spark, TierTable, survivors, "video_id")
        Catalog.insertAppendOnce(spark, FrameIndexTable, idx, "video_id")
        if (captions.nonEmpty) {
          val winners = spark.table(BatchCaptionsTable)
          if (!Catalog.tableExists(spark, CaptionsTable))
            Catalog.ctasOverwrite(winners, CaptionsTable)
          else Catalog.mergeInto(spark, CaptionsTable, winners, Seq("video_id"))
        }
        Map("tier_videos_after" -> spark.table(TierTable).count())
      })
    new Runner(stages, RetryPolicy(retries = 1), notify)
      .run(Map("batch_frames" -> frames.count()))
  }

  /** The video treadmill as a STREAM: a checkpointed file source over a
    * PARQUET frame landing ([[Multimodal.VideoFrameSchema]] — binary
    * frame payloads make parquet the natural landing format, the
    * [[MediaPipeline.streamIngest]] argument) drives [[ingestBatch]]
    * once per micro-batch via foreachBatch. The checkpoint dedups
    * FILES (a restart resumes at the first undiscovered slice); the
    * stored frame-hash index dedups CONTENT, so a redelivered video
    * cannot re-enter the tier either way. Trigger.AvailableNow drains
    * everything landed and stops — the scheduled-batch deployment
    * shape. Frame files must respect the whole-video landing
    * discipline (see the object doc). */
  /** With `captioned = true` the frame landing rows carry two extra
    * nullable columns (caption STRING, score DOUBLE); the video's
    * caption rides its FIRST frame row (frame_no = 0) — one landing
    * stream feeds both artifacts, the [[MediaPipeline.streamIngest]]
    * convention one level up. */
  def streamIngest(spark: SparkSession, landingDir: String, checkpointDir: String,
                   jaccardThreshold: Double = 0.9, containThreshold: Double = 0.9,
                   grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                   maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                   captioned: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema =
      if (!captioned) Multimodal.VideoFrameSchema
      else org.apache.spark.sql.types.StructType(Multimodal.VideoFrameSchema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("caption",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType)))
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // the session-clone cache-coherence discipline (see
        // CurationPipeline.streamIngest): the whole treadmill runs on
        // the micro-batch's session clone, the batch pins across the
        // stages' several actions, and the OUTER session refreshes its
        // cached listings of the published tables afterwards.
        val pinned = batch.toDF().persist()
        val r = try {
          val frames =
            if (captioned) pinned.drop("caption", "score") else pinned
          val caps =
            if (captioned) Some(pinned.filter(col("frame_no") === 0)
              .select("video_id", "caption", "score"))
            else None
          ingestBatch(batch.sparkSession, frames, jaccardThreshold,
            containThreshold, grid, maxBucketSize, caps)
        } finally pinned.unpersist(blocking = false)
        require(r.ok, s"video ingestBatch failed in micro-batch $id: " +
          r.stages.filterNot(_.ok).map(s => s"${s.stage}: ${s.error.getOrElse("?")}").mkString("; "))
        Seq(TierTable, FrameIndexTable, CaptionsTable)
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
    Seq(TierTable, FrameIndexTable, CaptionsTable, BatchSurvivorsTable,
      BatchIndexTable, BatchComponentsTable, BatchCaptionsTable)
      .foreach(Catalog.dropIfExists(spark, _))
}
