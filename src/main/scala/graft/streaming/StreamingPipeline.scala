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

  /** Starts the continuous ingest; drain synchronously with
    * `.awaitTermination()` (AvailableNow) or leave running. Each batch
    * report reaches `notify`. */
  def start(
      spark: SparkSession,
      landingRoot: String,
      checkpointDir: String,
      notify: PipelineReport => Unit = _ => ()): StreamingQuery =
    StreamIngest.runAvailableNow(
      StreamIngest.stream(spark, landingRoot), checkpointDir,
      (batch, batchId) => { runBatch(spark, batch, batchId, notify); () })

  private[streaming] def runBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      notify: PipelineReport => Unit): PipelineReport = {
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
        val staging = batch.filter(col("event_id").isNotNull)
          .select("event_id", "event_timestamp", "event_type", "user_id")
          .dropDuplicates("event_id")
        val curated = EventOps.withAuditColumns(staging)
        if (!Catalog.tableExists(spark, EventsTable))
          Catalog.ensureTable(spark, EventsTable, curated.schema)
        val inserted = EventOps.withAuditColumns(
          EventOps.dedupInsert(staging, spark.table(EventsTable)))
        Map("inserted_rows" -> Catalog.insertAppend(spark, EventsTable, inserted))
      },
      Stage("refresh_summary") { _ =>
        Catalog.ctasOverwrite(
          EventOps.dailySummary(spark.table(RawTable).withColumnRenamed("event_timestamp", "ts")),
          SummaryTable)
        Map("summary_rows" -> spark.table(SummaryTable).count())
      },
      Stage("evaluate_dq") { _ =>
        val r = DataQuality.gate(spark.table(EventsTable),
          required = Seq("event_id", "event_timestamp", "event_type", "user_id"))
        Map("duplicate_count" -> r.duplicateCount, "incomplete_count" -> r.incompleteCount)
      })
    new Runner(stages, RetryPolicy(retries = 1), notify).run(Map("batch_id" -> batchId))
  }
}
