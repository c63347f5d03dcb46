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

  test("a failed batch's replay re-publishes the SAME summary snapshot — no double merge") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_replay").toString
    val cp = Files.createTempDirectory("graft_replaycp").toString
    PartitionedJsonSink.write(EventGenerator.events(spark, 20, seed = 77, startEpochSeconds = 1735689600L), root)
    // poison the landing with an INCOMPLETE record (missing event_type):
    // load_raw and refresh_summary process it, evaluate_dq then fails
    // the batch, so it never commits and replays on restart
    val bad = """{"event_id":"bad-1","event_timestamp":"2025-01-01T00:00:30.000000","user_id":"user_9"}"""
    val hour = graft.sources.PartitionedJsonSink.hourPath(root, java.time.LocalDateTime.of(2025, 1, 1, 0, 0))
    val gz = new java.io.FileOutputStream(s"$hour/poison.json.gz")
    val z = new java.util.zip.GZIPOutputStream(gz)
    z.write((bad + "\n").getBytes("UTF-8")); z.close()

    def runOnce(): Unit = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.start(spark, root, cp).awaitTermination(120000)
    }
    def summaryTotal: Long = spark.table(StreamingPipeline.SummaryTable)
      .agg(sum("event_count")).head().getLong(0)

    runOnce() // batch 0 fails at evaluate_dq, uncommitted
    val rawAfter1 = spark.table(StreamingPipeline.RawTable).count()
    val sumAfter1 = summaryTotal
    assert(sumAfter1 == 21L, s"summary after first attempt: $sumAfter1") // 20 good + 1 incomplete

    runOnce() // replay of the SAME uncommitted batch (same run id, same tag)
    assert(spark.table(StreamingPipeline.RawTable).count() == rawAfter1 * 2,
      "raw tier is at-least-once by design — the replay must re-append")
    assert(summaryTotal == sumAfter1,
      s"replayed batch double-merged the summary: ${summaryTotal} vs $sumAfter1")
  }

  test("dedup anti-join build side prunes to the batch's event-date partitions") {
    import org.apache.spark.sql.functions._
    def wire(n: Long, seed: Long, start: Long) =
      EventGenerator.events(spark, n, seed, start)
        .select(col("event_id").cast("string").as("event_id"), col("event_timestamp"),
          col("event_type"), col("user_id").cast("string").as("user_id"),
          lit(null).cast("string").as("raw_data"))
    // two separate days land in the curated tier
    StreamingPipeline.runBatch(spark,
      wire(30, 1, 1735689600L).unionByName(wire(30, 2, 1735689600L + 86400)), 1L, _ => ())
    assert(spark.table(StreamingPipeline.EventsTable).count() == 60L)

    // a batch touching only day 2 must build its anti-join against day 2 only
    val staging = wire(10, 2, 1735689600L + 86400)
      .select("event_id", "event_timestamp", "event_type", "user_id")
      .withColumn("event_date", to_date(col("event_timestamp")))
    val target = StreamingPipeline.dedupTarget(spark, staging)
    val dates = target.select(countDistinct(col("event_date"))).head().getLong(0)
    assert(dates == 1L, s"build side read $dates dates, expected 1")

    val scans = target.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      s"tier scan carries no partition filters:\n${target.queryExecution.executedPlan}")

    // an empty batch builds against nothing at all
    assert(StreamingPipeline.dedupTarget(spark, staging.limit(0)).count() == 0L)
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
