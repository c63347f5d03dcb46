package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, EventOps}

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
        .orderBy("event_id"))
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
        |FROM events ORDER BY event_id""".stripMargin
  )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    referenceQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    referenceOracles
}
