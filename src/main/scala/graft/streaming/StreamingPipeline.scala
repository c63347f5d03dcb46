package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{DataQuality, EventOps}
import graft.pipeline.{PipelineReport, RetryPolicy, Runner, Stage}
import graft.plans.Catalog
import graft.sources.JsonIngest

/** The whole reference system as ONE streaming program (SURVEY §3.1/3.2
  * "Spark re-expression"): a checkpointed stream over the Firehose
  * landing layout whose every micro-batch runs the batch pipeline —
  * raw-tier append, dedup insert into the curated tier, summary
  * refresh, DQ gate — through the stage [[Runner]] (retries, metrics,
  * notification).
  *
  * Delivery: the checkpoint dedups input files (exactly-once source);
  * the anti-join dedups rows (defense in depth — a lost checkpoint or a
  * re-landed file cannot duplicate the curated tier, proven in
  * StreamIngestSpec). `raw_data` remains at-least-once by design — the
  * reference's own semantics (FORCE=TRUE; SURVEY §7.5#4).
  */
object StreamingPipeline {

  val RawTable = "raw_data"
  val EventsTable = "events_curated"
  val SummaryTable = "daily_event_summary"

  /** Every Nth batch re-runs the DQ gate over the FULL curated tier as
    * a scheduled audit; all other batches gate only their own delta
    * (uniqueness of the delta vs the tier is already enforced by the
    * anti-join itself). */
  val FullAuditEvery = 100L

  /** The incremental summary plan for one batch: aggregate the batch,
    * then merge with the published summary — count/min/max are
    * decomposable, so (old summary ∪ batch delta) re-aggregated equals
    * the full recompute over all of raw_data, at O(|batch| + |summary|)
    * cost instead of O(history). Reading the current summary while
    * ctasOverwrite publishes the next is safe: the read is pinned to
    * the previous version directory, the write lands in a fresh one.
    *
    * Documented divergence from the reference's CTAS recompute: each
    * batch merges into the summary EXACTLY ONCE (the publish is tagged
    * per (run, batch); the checkpoint's offset log pins a replayed
    * batch to the same file set, so tag == content — which also makes
    * IMMUTABLE landing files a hard precondition: editing a landed
    * file in place breaks the file source's own replay semantics AND
    * would pin a replayed batch's summary to the pre-edit snapshot;
    * Firehose-style landing is append-only by construction). A batch that
    * fails mid-run and replays re-appends raw_data (at-least-once, the
    * reference's own semantics) but does NOT re-merge the summary —
    * the summary counts true events once, where the reference's
    * recompute would have counted raw's failure-duplicates. Proven in
    * StreamingPipelineSpec's replay test. */
  private[streaming] def mergedSummary(spark: SparkSession, batchRaw: DataFrame): DataFrame = {
    val delta = EventOps.dailySummary(batchRaw.withColumnRenamed("event_timestamp", "ts"))
    if (!Catalog.tableExists(spark, SummaryTable)) delta
    else spark.table(SummaryTable).unionByName(delta)
      .groupBy("event_date", "event_type")
      .agg(sum("event_count").as("event_count"),
        min("first_event").as("first_event"),
        max("last_event").as("last_event"))
  }

  /** Starts the continuous ingest; drain synchronously with
    * `.awaitTermination()` (AvailableNow) or leave running. Each batch
    * report reaches `notify`. */
  def start(
      spark: SparkSession,
      landingRoot: String,
      checkpointDir: String,
      notify: PipelineReport => Unit = _ => (),
      source: graft.sources.EventSource = graft.sources.FileEventSource()): StreamingQuery = {
    // Checkpoint-scoped run id, PERSISTED IN the checkpoint: a restart
    // over the same checkpoint reuses it, so an uncommitted batch
    // replayed after a crash carries the SAME publish tag and cannot
    // double-merge the summary; a fresh or lost checkpoint mints a new
    // id, so its batches (which also re-append raw — at-least-once by
    // design) merge again, keeping summary == aggregate(raw).
    val runId = {
      val p = new org.apache.hadoop.fs.Path(checkpointDir, "graft_run_id")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val existing =
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          // a crash mid-write can leave a truncated file — treat as absent
          try Some(scala.io.Source.fromInputStream(in).mkString.trim).filter(_.nonEmpty)
          finally in.close()
        }
      existing.getOrElse {
        val id = java.util.UUID.randomUUID().toString.take(8)
        // write-temp-then-rename: the id file appears atomically or not
        // at all, never half-written
        val tmp = new org.apache.hadoop.fs.Path(checkpointDir, "graft_run_id.tmp")
        val out = fs.create(tmp, true)
        try out.write(id.getBytes("UTF-8")) finally out.close()
        fs.delete(p, false)
        fs.rename(tmp, p)
        id
      }
    }
    StreamIngest.runAvailableNow(
      source.stream(spark, landingRoot), checkpointDir,
      (batch, batchId) => { runBatch(spark, batch, batchId, notify, runId); () })
  }

  /** The anti-join build side for one batch, pruned to the batch's own
    * event-date range ([[EventOps.boundedDedupTarget]]; the immutable
    * append-only landing — already a hard precondition of the replay
    * semantics above — is what makes the batch's own range sufficient).
    * A same-id row with a DIFFERENT timestamp is id reuse, not
    * re-delivery — outside the reference's delivery model; the scheduled
    * full-tier audit (FullAuditEvery) still surfaces it as a DQ
    * violation. */
  private[streaming] def dedupTarget(spark: SparkSession, staging: DataFrame): DataFrame =
    EventOps.boundedDedupTarget(spark.table(EventsTable), staging)

  private[streaming] def runBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      notify: PipelineReport => Unit,
      runId: String = "run"): PipelineReport = {
    val stages = Seq(
      Stage("load_raw") { _ =>
        val parsed = batch.filter(col("event_id").isNotNull)
        val raw = EventOps.withAuditColumns(
          parsed.select("event_id", "event_timestamp", "event_type", "user_id"))
        if (!Catalog.tableExists(spark, RawTable))
          Catalog.ensureTable(spark, RawTable, raw.schema)
        Map(
          "records_processed" -> Catalog.insertAppend(spark, RawTable, raw),
          "corrupt_rows" -> JsonIngest.corruptCount(batch))
      },
      Stage("dedup_insert") { _ =>
        // deterministic pick: evaluate_dq re-derives this exact set, so
        // the row chosen per key must not depend on evaluation order.
        // Persisted across the date-range peek and the insert — the
        // window dedup would otherwise execute twice per batch.
        val staging = EventOps.dedupDeterministic(
          batch.filter(col("event_id").isNotNull)
            .select("event_id", "event_timestamp", "event_type", "user_id"))
          .withColumn("event_date", to_date(col("event_timestamp")))
          .persist()
        try {
          val curated = EventOps.withAuditColumns(staging)
          if (!Catalog.tableExists(spark, EventsTable))
            Catalog.ensureTablePartitioned(spark, EventsTable, curated.schema, "event_date")
          val inserted = EventOps.withAuditColumns(
            EventOps.dedupInsert(staging, dedupTarget(spark, staging)))
          Map("inserted_rows" -> Catalog.insertAppend(spark, EventsTable, inserted))
        } finally staging.unpersist()
      },
      Stage("refresh_summary") { _ =>
        // incremental: NO full raw_data rescan per batch (the reference's
        // CTAS-recompute semantics survive as the same final state; the
        // full recompute remains available as Catalog.ctasOverwrite of
        // EventOps.dailySummary(raw) for compaction/backfill)
        val batchRaw = batch.filter(col("event_id").isNotNull)
          .select("event_id", "event_timestamp", "event_type", "user_id")
        // tagged by (run, batch): a stage RETRY after the merged
        // snapshot was written re-flips to it instead of merging the
        // delta twice; a new query run gets fresh tags
        Catalog.ctasOverwrite(mergedSummary(spark, batchRaw), SummaryTable,
          tag = Some(s"${runId}_b$batchId"))
        Map("summary_rows" -> spark.table(SummaryTable).count())
      },
      Stage("evaluate_dq") { _ =>
        // gate the DELTA (O(batch)): the reference gates the POST-dedup
        // tier, so the scoped analog is the batch as offered for
        // insertion (after the DETERMINISTIC dedup — the same rows
        // dedup_insert offered, not an independent arbitrary pick;
        // intra-batch re-delivery is legitimate at-least-once input,
        // not a DQ failure); tier-level uniqueness is structural
        // (anti-join)
        val staged = EventOps.dedupDeterministic(
          batch.filter(col("event_id").isNotNull)
            .select("event_id", "event_timestamp", "event_type", "user_id"))
        val r = DataQuality.gate(staged,
          required = Seq("event_id", "event_timestamp", "event_type", "user_id"))
        // scheduled audit: periodically re-assert the invariant over the
        // whole curated tier (defense in depth, O(history) by design)
        val audited = batchId % FullAuditEvery == 0L
        if (audited)
          DataQuality.gate(spark.table(EventsTable),
            required = Seq("event_id", "event_timestamp", "event_type", "user_id"))
        Map("duplicate_count" -> r.duplicateCount, "incomplete_count" -> r.incompleteCount,
          "full_audit" -> (if (audited) 1L else 0L))
      })
    new Runner(stages, RetryPolicy(retries = 1), notify).run(Map("batch_id" -> batchId))
  }
}
