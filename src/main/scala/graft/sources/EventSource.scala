package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ingest seam (SURVEY §7.4 "hide behind trait"): everything the
  * pipelines need from an event transport, so the engine is not wired
  * to any one source.
  *
  * `scope` identifies a unit of input in source terms — a landed hour
  * partition (file source), a stream/topic name (Kinesis/Kafka), a
  * shard range. All three methods must yield [[JsonIngest.StagingSchema]]
  * rows: parsed envelope + open-envelope extras + the corrupt-record
  * column.
  *
  * Binding a real stream transport: a Kinesis implementation maps the
  * reference consumer (`scripts/kinesis_to_snowflake.py:24-43` —
  * `get_shard_iterator` + `get_records` + per-record `json.loads`) to
  * `spark.readStream.format("kinesis"|"kafka")` with the connector on
  * the classpath, then `JsonIngest.decode(raw, "value")` plus the
  * staging extras; checkpointing replaces the reference's discarded
  * `NextShardIterator` (SURVEY §2.6 O1). Offline, [[FileEventSource]]
  * has identical micro-batch semantics.
  */
trait EventSource {

  /** S7: does `scope` currently hold data? (the sensor probe). */
  def available(spark: SparkSession, scope: String): Boolean

  /** S6: one batch scan of `scope` (the COPY-into-staging semantics). */
  def readBatch(spark: SparkSession, scope: String): DataFrame

  /** S2: unbounded micro-batch stream over `scope`. */
  def stream(spark: SparkSession, scope: String): DataFrame
}

/** The offline transport: Firehose-style hour-partitioned gzip JSON on
  * a filesystem, PERMISSIVE-parsed (O9). */
final case class FileEventSource(
    maxFilesPerTrigger: Option[Int] = None,
    maxFileAge: Option[String] = None) extends EventSource {

  override def available(spark: SparkSession, scope: String): Boolean =
    JsonIngest.partitionAvailable(spark, scope)

  override def readBatch(spark: SparkSession, scope: String): DataFrame =
    JsonIngest.readJson(spark, scope)

  override def stream(spark: SparkSession, scope: String): DataFrame =
    graft.streaming.StreamIngest.stream(spark, scope, maxFilesPerTrigger, maxFileAge)
}
