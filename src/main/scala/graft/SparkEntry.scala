package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{DataQuality, EventOps}
import graft.sources.{JsonIngest, PartitionedJsonSink}
import graft.streaming.StreamIngest

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * scale-path extension), expressed as a declarative Spark plan over
  * the driver's parquet tables. [[oracleSql]] carries the equivalent
  * DuckDB SQL for the hash-compare gate.
  *
  * Determinism rules used throughout (so Spark and DuckDB hash-match):
  *  - every result is totally ordered by an ORDER BY on output columns;
  *  - timestamps are TIMESTAMP_NTZ end-to-end (Tables.load converts the
  *    source nanos under a UTC session), so both engines see the same
  *    naive values;
  *  - order-sensitive double aggregates are either avoided or rounded;
  *  - no wall-clock audit columns in compared output (SURVEY §7.5#3).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventOps.dailySummary(Tables.load(spark, "/root/testdata/sf0.001", "events"))
      .orderBy("event_date", "event_type")

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "events")

  // ---------------------------------------------------------------
  // Reference surface (SURVEY §2). Dedup fixtures are built by
  // unioning slices of `events` with itself, per FIXTURES.md §B —
  // `event_id` is unique in the source table.
  // ---------------------------------------------------------------

  /** Staging batch with intra-batch duplicates: events with id%7<3
    * plus a second copy of the id%7==0 slice. */
  private def stagingFixture(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    e.filter(col("event_id") % 7 < 3).unionAll(e.filter(col("event_id") % 7 === 0))
  }

  /** Already-loaded target tier: the id%3==0 slice. */
  private def targetFixture(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).filter(col("event_id") % 3 === 0)

  private val referenceQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P3+P6+P10: user_events view — filter + projection + JSON path
    "ref_user_events" -> ((s, dir) =>
      EventOps.userEvents(ev(s, dir)).orderBy("event_id")),

    // A1+P7: daily_event_summary — group-by multi-agg over raw tier
    "ref_daily_summary" -> ((s, dir) =>
      EventOps.dailySummary(ev(s, dir)).orderBy("event_date", "event_type")),

    // J1+P4: idempotent dedup insert — anti-join staging vs target
    "ref_dedup_insert" -> ((s, dir) =>
      EventOps.dedupInsert(stagingFixture(s, dir), targetFixture(s, dir))
        .orderBy("event_id")),

    // A2: duplicate detection — GROUP BY key HAVING COUNT(*)>1
    "ref_dq_duplicates" -> ((s, dir) =>
      DataQuality.duplicateKeys(stagingFixture(s, dir)).orderBy("event_id")),

    // A3+P5: completeness check over synthesized NULLs
    "ref_dq_incomplete" -> ((s, dir) => {
      val staged = ev(s, dir).select(
        col("event_id"),
        nullif(col("event_type"), lit("error")).as("event_type"),
        when(col("user_id") % 97 === 0, lit(null)).otherwise(col("user_id")).as("user_id"),
        col("ts"))
      DataQuality.incompleteRows(staged, Seq("event_id", "event_type", "user_id", "ts"))
        .agg(count(lit(1)).as("incomplete_count"))
    }),

    // P2: staging superset projection (open envelope, extras NULL)
    "ref_staging_projection" -> ((s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        col("ts").as("event_timestamp"),
        col("event_type"),
        col("user_id"),
        col("value"),
        col("props").as("payload"),
        lit(null).cast("string").as("device_id"),
        lit(null).cast("string").as("app_version"))
        .orderBy("event_id")),

    // S3+P9: wire-format roundtrip — to_json the envelope, from_json it
    // back; identity against the source proves decode fidelity incl.
    // microsecond NTZ timestamps.
    "ref_json_roundtrip" -> ((s, dir) => {
      val opts = Map("timestampNTZFormat" -> JsonIngest.TsFormat)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampNTZType),
        StructField("event_type", StringType), StructField("user_id", LongType)))
      ev(s, dir)
        .select(to_json(struct(col("event_id"), col("ts"), col("event_type"), col("user_id")), opts).as("value"))
        .select(from_json(col("value"), schema, opts).as("e")).select("e.*")
        .orderBy("event_id")
    }),

    // P11: Firehose partition-prefix templating
    "ref_partition_template" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(date_format(col("ts"), "'year='yyyy'/month='MM'/day='dd'/hour='HH").as("partition_path"))
        .agg(count(lit(1)).as("n"))
        .orderBy("partition_path")),

    // O4: tumbling-window aggregation (batch form of the streaming agg)
    "ref_hourly_window" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts").cast("timestamp"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("event_count"))
        .select(
          col("window.start").cast("timestamp_ntz").as("window_start"),
          col("window.end").cast("timestamp_ntz").as("window_end"),
          col("event_type"), col("event_count"))
        .orderBy("window_start", "event_type")),

    // A4: running count per key (the client-side counter, made relational)
    "ref_running_count" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .select(col("event_id"), col("event_type"), count(lit(1)).over(w).as("running_count"))
        .orderBy("event_id")
    }),

    // S5+S6: land a slice as hour-partitioned gzip JSON, PERMISSIVE-read
    // it back partition-discovered, count per partition.
    "ref_ingest_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_ingest").toString
      val subset = ev(s, dir).filter(col("event_id") % 11 === 0)
        .select(col("event_id"), col("ts").as("event_timestamp"), col("event_type"), col("user_id"))
      PartitionedJsonSink.write(subset, tmp)
      JsonIngest.readJson(s, tmp)
        .groupBy(col("year").cast("int").as("year"), col("month").cast("int").as("month"),
          col("day").cast("int").as("day"), col("hour").cast("int").as("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy("year", "month", "day", "hour")
    }),

    // S2+O1/O2/O4: stream the landed layout with AvailableNow and check
    // the streaming windowed aggregate against the batch oracle —
    // stream/batch consistency is the whole point of the micro-batch model.
    "stream_hourly_counts" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_stream_q").toString
      val cp = Files.createTempDirectory("graft_stream_cp").toString
      val subset = ev(s, dir).filter(col("event_id") % 13 === 0)
        .select(col("event_id").cast("string").as("event_id"), col("ts").as("event_timestamp"),
          col("event_type"), col("user_id").cast("string").as("user_id"))
      PartitionedJsonSink.write(subset, tmp)
      val q = StreamIngest.windowedCounts(StreamIngest.stream(s, tmp))
        .writeStream.format("memory").queryName("stream_hourly_counts")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .start()
      q.awaitTermination(300000)
      s.table("stream_hourly_counts")
        .select("window_start", "window_end", "event_type", "event_count", "first_event", "last_event")
        .orderBy("window_start", "event_type")
    }),

    // C1/C2/C5 + S9/S11: the pipeline's transform chain — staging dedup,
    // anti-join insert, curated union, summary refresh — as one plan.
    "ref_pipeline_summary" -> ((s, dir) => {
      val staging = stagingFixture(s, dir).dropDuplicates("event_id")
      val target = targetFixture(s, dir)
      val curated = target.unionByName(EventOps.dedupInsert(staging, target))
      EventOps.dailySummary(curated).orderBy("event_date", "event_type")
    })
  )

  private val referenceOracles: Map[String, String] = Map(
    "ref_user_events" ->
      """SELECT event_id, ts AS event_timestamp, user_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
        |       value AS price
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "ref_daily_summary" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       COUNT(*) AS event_count, MIN(ts) AS first_event, MAX(ts) AS last_event
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ref_dedup_insert" ->
      """WITH staging AS (
        |  SELECT * FROM events WHERE event_id % 7 < 3
        |  UNION ALL SELECT * FROM events WHERE event_id % 7 = 0
        |)
        |SELECT s.* FROM staging s
        |WHERE s.event_id IS NOT NULL
        |  AND s.event_id NOT IN (SELECT event_id FROM events WHERE event_id % 3 = 0)
        |ORDER BY event_id""".stripMargin,

    "ref_dq_duplicates" ->
      """WITH staging AS (
        |  SELECT * FROM events WHERE event_id % 7 < 3
        |  UNION ALL SELECT * FROM events WHERE event_id % 7 = 0
        |)
        |SELECT event_id, COUNT(*) AS dup_count FROM staging
        |GROUP BY event_id HAVING COUNT(*) > 1 ORDER BY event_id""".stripMargin,

    "ref_dq_incomplete" ->
      """WITH staged AS (
        |  SELECT event_id, NULLIF(event_type, 'error') AS event_type,
        |         CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END AS user_id, ts
        |  FROM events)
        |SELECT COUNT(*) AS incomplete_count FROM staged
        |WHERE event_id IS NULL OR event_type IS NULL OR user_id IS NULL OR ts IS NULL""".stripMargin,

    "ref_staging_projection" ->
      """SELECT event_id, ts AS event_timestamp, event_type, user_id, value,
        |       props AS payload,
        |       CAST(NULL AS VARCHAR) AS device_id,
        |       CAST(NULL AS VARCHAR) AS app_version
        |FROM events ORDER BY event_id""".stripMargin,

    "ref_json_roundtrip" ->
      "SELECT event_id, ts, event_type, user_id FROM events ORDER BY event_id",

    "ref_partition_template" ->
      """SELECT strftime(ts, 'year=%Y/month=%m/day=%d/hour=%H') AS partition_path,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "ref_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type, COUNT(*) AS event_count
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,

    "ref_running_count" ->
      """SELECT event_id, event_type,
        |       COUNT(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_count
        |FROM events ORDER BY event_id""".stripMargin,

    "ref_ingest_roundtrip" ->
      """SELECT CAST(EXTRACT(year FROM ts) AS INT) AS year,
        |       CAST(EXTRACT(month FROM ts) AS INT) AS month,
        |       CAST(EXTRACT(day FROM ts) AS INT) AS day,
        |       CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
        |       COUNT(*) AS n
        |FROM events WHERE event_id % 11 = 0
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,

    "stream_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type, COUNT(*) AS event_count,
        |       MIN(ts) AS first_event, MAX(ts) AS last_event
        |FROM events WHERE event_id % 13 = 0
        |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,

    "ref_pipeline_summary" ->
      """WITH staging AS (
        |  SELECT DISTINCT * FROM (
        |    SELECT * FROM events WHERE event_id % 7 < 3
        |    UNION ALL SELECT * FROM events WHERE event_id % 7 = 0)
        |), target AS (
        |  SELECT * FROM events WHERE event_id % 3 = 0
        |), curated AS (
        |  SELECT * FROM target
        |  UNION ALL
        |  SELECT * FROM staging s
        |  WHERE s.event_id IS NOT NULL
        |    AND s.event_id NOT IN (SELECT event_id FROM target)
        |)
        |SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       COUNT(*) AS event_count, MIN(ts) AS first_event, MAX(ts) AS last_event
        |FROM curated GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    referenceQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    referenceOracles
}
