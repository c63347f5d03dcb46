package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.pipeline.{PipelineFailedException, ReferencePipeline}
import graft.streaming.StreamingPipeline

/** The ingest seam: pipelines must run unchanged against an injected
  * transport — the binding point a Kinesis/Kafka connector would use. */
class EventSourceSpec extends SparkSpec with BeforeAndAfterEach {

  override def beforeEach(): Unit =
    Seq(ReferencePipeline.RawTable, ReferencePipeline.StagingTable,
      ReferencePipeline.EventsTable, ReferencePipeline.SummaryTable)
      .foreach(t => graft.plans.Catalog.dropIfExists(spark, t))

  /** Staging-shaped rows from decoded wire lines (what any transport
    * implementation must produce). */
  private def asStaging(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("device_id", lit(null).cast("string"))
      .withColumn("app_version", lit(null).cast("string"))
      .withColumn("os_version", lit(null).cast("string"))
      .withColumn("ip_address", lit(null).cast("string"))
      .withColumn("location", lit(null).cast("string"))
      .withColumn("raw_data", lit(null).cast("string"))

  test("path B runs end-to-end against an injected batch source") {
    val batch = asStaging(JsonIngest.decode(
      EventGenerator.jsonLines(EventGenerator.events(spark, 40, seed = 71))))
    val fake = new EventSource {
      override def available(s: SparkSession, scope: String): Boolean = true
      override def readBatch(s: SparkSession, scope: String): DataFrame = batch
      override def stream(s: SparkSession, scope: String): DataFrame =
        throw new UnsupportedOperationException("batch-only fake")
    }
    val r = ReferencePipeline.pathB(spark, "fake://any-scope", source = fake)
    assert(r.ok && r.metrics("staged_rows") == 40L && r.metrics("inserted_rows") == 40L)
    assert(spark.table(ReferencePipeline.EventsTable).count() == 40L)
  }

  test("QueueEventSource: path B end-to-end; duplicate delivery reconciled by dedup") {
    import spark.implicits._
    val q = new QueueEventSource()
    val lines = EventGenerator.jsonLines(EventGenerator.events(spark, 60, seed = 77))
      .as[String].collect().toSeq
    q.publish("stream/events", lines)

    val r1 = ReferencePipeline.pathB(spark, "stream/events", source = q)
    assert(r1.ok && r1.metrics("staged_rows") == 60L && r1.metrics("inserted_rows") == 60L)
    assert(q.pending("stream/events") == 0)

    // at-least-once delivery: the SAME lines arrive again; the batch
    // stages them but the target-side anti-join inserts none
    q.publish("stream/events", lines)
    val r2 = ReferencePipeline.pathB(spark, "stream/events", source = q)
    assert(r2.ok && r2.metrics("staged_rows") == 60L && r2.metrics("inserted_rows") == 0L)
    assert(spark.table(ReferencePipeline.EventsTable).count() == 60L)

    // drained queue: the sensor stage must refuse the run
    val ex = intercept[PipelineFailedException](
      ReferencePipeline.pathB(spark, "stream/events", source = q))
    assert(ex.report.stages.head.stage == "check_data_availability")
  }

  test("QueueEventSource: path A consumes one get_records batch per run") {
    import spark.implicits._
    val q = new QueueEventSource(recordsPerBatch = 30)
    val lines = EventGenerator.jsonLines(EventGenerator.events(spark, 50, seed = 79))
      .as[String].collect().toSeq
    q.publish("stream/raw", lines)

    // batch cap: first run drains 30, second run the remaining 20
    val r1 = ReferencePipeline.pathA(spark, q.rawBatch(spark, "stream/raw"))
    assert(r1.ok && r1.metrics("records_processed") == 30L)
    val r2 = ReferencePipeline.pathA(spark, q.rawBatch(spark, "stream/raw"))
    assert(r2.ok && r2.metrics("records_processed") == 20L)
    assert(spark.table(ReferencePipeline.RawTable).count() == 50L)
    assert(q.pending("stream/raw") == 0)
  }

  test("QueueEventSource: corrupt lines land in raw_data exactly like the file scan") {
    val q = new QueueEventSource()
    q.publish("stream/bad", Seq(
      """{"event_id":"e-1","event_timestamp":"2025-01-01T00:00:00.000000","event_type":"view","user_id":"u1","data":{"product_id":"p","price":1.0}}""",
      "{not json at all",
      "", // blank: skipped, not a record
      "null")) // JSON literal null: skipped, not a record
    val staged = q.readBatch(spark, "stream/bad").collect()
    assert(staged.length == 2)
    val byId = staged.map(r => Option(r.getAs[String]("event_id"))).toSet
    assert(byId == Set(Some("e-1"), None))
    assert(staged.count(r => r.getAs[String]("raw_data") != null) == 1)
  }

  test("QueueEventSource: streaming pipeline runs against the queue's stream()") {
    import spark.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft_qes_cp").toString
    val q = new QueueEventSource()
    val lines = EventGenerator.jsonLines(EventGenerator.events(spark, 25, seed = 83))
      .as[String].collect().toSeq
    q.publish("stream/s", lines)
    StreamingPipeline.start(spark, "stream/s", cp, source = q).awaitTermination(120000)
    assert(spark.table(StreamingPipeline.RawTable).count() == 25L)
    assert(spark.table(StreamingPipeline.EventsTable).count() == 25L)
  }

  test("streaming pipeline runs against an injected stream source (memory transport)") {
    import spark.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft_es_cp").toString
    val lines = EventGenerator.jsonLines(EventGenerator.events(spark, 25, seed = 73))
      .as[String].collect().toSeq
    val ms = MemoryStream[String](spark)
    ms.addData(lines)
    val fake = new EventSource {
      override def available(s: SparkSession, scope: String): Boolean = true
      override def readBatch(s: SparkSession, scope: String): DataFrame =
        throw new UnsupportedOperationException("stream-only fake")
      override def stream(s: SparkSession, scope: String): DataFrame =
        asStaging(JsonIngest.decode(ms.toDF()))
    }
    StreamingPipeline.start(spark, "fake://topic", cp, source = fake).awaitTermination(120000)
    assert(spark.table(StreamingPipeline.RawTable).count() == 25L)
    assert(spark.table(StreamingPipeline.EventsTable).count() == 25L)
  }
}
