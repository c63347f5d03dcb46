package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.pipeline.PipelineReport
import graft.sources.{EventGenerator, PartitionedJsonSink}

class StreamingPipelineSpec extends SparkSpec with BeforeAndAfterEach {

  override def beforeEach(): Unit =
    Seq(StreamingPipeline.RawTable, StreamingPipeline.EventsTable, StreamingPipeline.SummaryTable)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

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
  }
}
