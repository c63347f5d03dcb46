package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The second [[EventSource]] implementation: an embedded in-memory
  * queue transport, proving the ingest seam is not file-shaped. Scopes
  * are independent named streams (the Kinesis stream / Kafka topic
  * analog); records are raw JSON wire lines.
  *
  * Semantics mirror the reference's Kinesis consumer
  * (`scripts/kinesis_to_snowflake.py:135-151`): each [[readBatch]] is
  * ONE `get_records` call — it drains at most `recordsPerBatch`
  * records per run. Where the reference discards `NextShardIterator`
  * (re-reading TRIM_HORIZON every run), this source keeps a committed
  * offset per scope, the behavior a checkpointed connector gives;
  * duplicate DELIVERY (the at-least-once reality) is modeled by
  * publishing the same lines again, and reconciled downstream by the
  * pipelines' target-side dedup, exactly as in production.
  *
  * A real Kinesis/Kafka binding replaces the queue with
  * `spark.readStream.format("kinesis"|"kafka")` and the offset map
  * with the connector's checkpoint; the staging decode
  * ([[JsonIngest.stagingProject]]) is shared verbatim.
  *
  * Driver-side state is the queue itself, so this transport is for
  * tests/embedded use, not 100 TB ingest — the SEAM it exercises
  * (decode projection, pipeline stages, offset commit) is the
  * scale-path code; only the transport is toy.
  */
final class QueueEventSource(recordsPerBatch: Int = 10000) extends EventSource {

  private val queues = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
  private val committed = mutable.Map.empty[String, Int]
  private val streams = mutable.Map.empty[String, MemoryStream[String]]

  /** Producer side (`put_record` analog). Lines reach both the batch
    * queue and any active stream over the scope. */
  def publish(scope: String, lines: Seq[String]): Unit = synchronized {
    queues.getOrElseUpdate(scope, mutable.ArrayBuffer.empty) ++= lines
    streams.get(scope).foreach(_.addData(lines))
  }

  /** Records published but not yet drained by [[readBatch]]. */
  def pending(scope: String): Int = synchronized {
    queues.get(scope).map(_.size - committed.getOrElse(scope, 0)).getOrElse(0)
  }

  override def available(spark: SparkSession, scope: String): Boolean =
    pending(scope) > 0

  /** One `get_records` batch from the committed offset, decoded to
    * staging rows; commits the offset eagerly (the slice is snapshotted
    * driver-side, so the returned frame is stable however often the
    * downstream plan evaluates it). */
  override def readBatch(spark: SparkSession, scope: String): DataFrame =
    JsonIngest.stagingProject(rawBatch(spark, scope))

  /** The un-decoded rendition of [[readBatch]] (one batch of wire
    * lines, offset committed) — what path A's load stage consumes. */
  def rawBatch(spark: SparkSession, scope: String): DataFrame = {
    val slice = synchronized {
      val q = queues.getOrElse(scope, mutable.ArrayBuffer.empty)
      val from = committed.getOrElse(scope, 0)
      val s = q.slice(from, from + recordsPerBatch).toSeq
      committed(scope) = from + s.size
      s
    }
    import spark.implicits._
    slice.toDF("value")
  }

  /** Unbounded micro-batch stream over the scope: everything already
    * published replays from the horizon, later [[publish]] calls flow
    * into subsequent micro-batches. */
  override def stream(spark: SparkSession, scope: String): DataFrame = {
    val ms = synchronized {
      streams.getOrElseUpdate(scope, {
        implicit val enc: org.apache.spark.sql.Encoder[String] =
          org.apache.spark.sql.Encoders.STRING
        val m = MemoryStream[String](spark)
        queues.get(scope).filter(_.nonEmpty).foreach(q => m.addData(q.toSeq))
        m
      })
    }
    JsonIngest.stagingProject(ms.toDF())
  }
}
