package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.pipeline.PipelineReport
import graft.sources.{EventGenerator, PartitionedJsonSink}

class StreamingPipelineSpec extends SparkSpec with BeforeAndAfterEach {

  override def beforeEach(): Unit =
    Seq(StreamingPipeline.RawTable, StreamingPipeline.EventsTable, StreamingPipeline.SummaryTable)
      .foreach(t => graft.plans.Catalog.dropIfExists(spark, t))

  test("continuous ingest: raw append, curated dedup, summary refresh, DQ gate per batch") {
    val root = Files.createTempDirectory("graft_sp").toString
    val cp = Files.createTempDirectory("graft_spcp").toString
    var reports = List.empty[PipelineReport]

    PartitionedJsonSink.write(EventGenerator.events(spark, 100, seed = 41, startEpochSeconds = 1735689600L), root)
    StreamingPipeline.start(spark, root, cp, r => reports ::= r).awaitTermination(120000)

    assert(reports.nonEmpty && reports.forall(_.ok))
    assert(spark.table(StreamingPipeline.RawTable).count() == 100L)
    assert(spark.table(StreamingPipeline.EventsTable).count() == 100L)
    val summarized = spark.table(StreamingPipeline.SummaryTable)
      .agg(org.apache.spark.sql.functions.sum("event_count")).head().getLong(0)
    assert(summarized == 100L)
    assert(reports.head.metrics("duplicate_count") == 0L)

    // land a second hour + RE-LAND the first (duplicate files): raw grows
    // at-least-once, curated stays exactly-once, gate still green
    PartitionedJsonSink.write(EventGenerator.events(spark, 50, seed = 43, startEpochSeconds = 1735689600L + 3600), root)
    PartitionedJsonSink.write(EventGenerator.events(spark, 100, seed = 41, startEpochSeconds = 1735689600L), root)
    StreamingPipeline.start(spark, root, cp, r => reports ::= r).awaitTermination(120000)

    assert(reports.head.ok)
    assert(spark.table(StreamingPipeline.RawTable).count() == 250L) // 100 + 50 + re-landed 100
    assert(spark.table(StreamingPipeline.EventsTable).count() == 150L) // deduped
    assert(reports.head.metrics("duplicate_count") == 0L && reports.head.metrics("incomplete_count") == 0L)

    // the incremental summary equals the full recompute over raw_data
    // (counts INCLUDE raw-tier duplicates — reference semantics)
    val summarizedAll = spark.table(StreamingPipeline.SummaryTable)
      .agg(org.apache.spark.sql.functions.sum("event_count")).head().getLong(0)
    assert(summarizedAll == 250L, s"incremental summary drifted: $summarizedAll")
  }

  test("per-batch summary merge reads the batch + the published summary, never all of raw_data") {
    import org.apache.spark.sql.functions._
    val batchRaw = graft.sources.EventGenerator.events(spark, 10, seed = 7)
      .select(col("event_id").cast("string").as("event_id"),
        col("event_timestamp"), col("event_type"), col("user_id").cast("string").as("user_id"))
    val plan = StreamingPipeline.mergedSummary(spark, batchRaw)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains(StreamingPipeline.RawTable),
      s"summary refresh still scans the raw tier:\n$plan")
  }
}
