package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hour-partitioned gzip-JSON landing sink (SURVEY §2 S5, P11) — the
  * Firehose layout: `raw/year=YYYY/month=MM/day=DD/hour=HH/` gzip parts
  * (`terraform/main.tf:191-213`: 5 MB/300 s buffers, GZIP, Hive-style
  * prefix).
  *
  * Partition columns are derived from the event timestamp and written
  * Hive-style, so Catalyst partition-prunes any later scan of the
  * layout for free. Zero-padded month/day/hour match both Firehose's
  * `!{timestamp:MM}` templating and the DAG's `%m` formatting
  * (`airflow/dags/snowflake_data_pipeline.py:54`), keeping writer and
  * reader path grammars identical.
  */
object PartitionedJsonSink {

  /** Adds the four partition columns (zero-padded strings). */
  def withHourPartitions(df: DataFrame, tsCol: String = "event_timestamp"): DataFrame =
    df.withColumn("year", date_format(col(tsCol), "yyyy"))
      .withColumn("month", date_format(col(tsCol), "MM"))
      .withColumn("day", date_format(col(tsCol), "dd"))
      .withColumn("hour", date_format(col(tsCol), "HH"))

  /** S5: land `df` as gzip JSON under the Firehose layout.
    *
    * Rows are shuffled onto their hour partition before the write, so
    * each hour directory gets ONE writer file instead of one per
    * (task × hour) — a 32-task write across 720 busy hours would
    * otherwise emit up to 23 k small files. (At the test SFs each hour
    * holds only ~13 rows, so wall-time there is file-count-bound either
    * way; the repartition is for hours with real volume.)
    * The partition count is pinned (not left to AQE): `repartition(cols)`
    * without an explicit N is AQE-coalescible, and on a small batch AQE
    * collapses the shuffle to ONE writer task that then creates every
    * hour directory serially — measured 3× slower (9.5 s vs 2.9 s for a
    * 720-dir write) than keeping `spark.sql.shuffle.partitions` writers.
    * Directory/file creation is metadata work that scales with writer
    * *concurrency*, not bytes, so the writer count must track the
    * cluster, not the shuffle's byte size.
    * `maxRecordsPerFile` is the Firehose buffer-size analog (O3): it
    * re-splits an oversized hour into bounded files. */
  def write(df: DataFrame, root: String, tsCol: String = "event_timestamp",
            maxRecordsPerFile: Long = 5000000L): Unit =
    withHourPartitions(df, tsCol)
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("year"), col("month"), col("day"), col("hour"))
      .write
      .partitionBy("year", "month", "day", "hour")
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .option("timestampNTZFormat", JsonIngest.TsFormat)
      .mode("append")
      .json(root)

  /** P11: the hour-partition path for a given wall-clock hour — the
    * DAG's `year=%Y/month=%m/day=%d/hour=%H` template. */
  def hourPath(root: String, t: LocalDateTime): String =
    f"$root/year=${t.getYear}%04d/month=${t.getMonthValue}%02d/day=${t.getDayOfMonth}%02d/hour=${t.getHour}%02d"
}
