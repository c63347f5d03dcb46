package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.pipeline.ReferencePipeline
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
