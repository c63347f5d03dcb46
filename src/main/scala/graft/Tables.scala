package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — schema comes from the footer, and
  * Catalyst pushes filters/projections into the scan. Nothing is
  * cached here: callers decide lifetime, and at 100 TB a scan with
  * pushed filters beats a stale cache.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark
    // only reads via the nanosAsLong legacy conf (set by GraftSession,
    // the single session factory Verify/Bench/tests build on). The
    // values are µs-resolution; `div` is integer division (Column./ is
    // DOUBLE division and 1.7e18 ns exceeds double's 2^53 mantissa —
    // rounding there cost round 1 every timestamp by 1 µs). The cast to
    // TimestampNTZType (session tz is UTC, so the instant is preserved
    // bit-exactly) matches the reference's TIMESTAMP_NTZ semantics and
    // makes written parquet isAdjustedToUTC=false — the same naive
    // timestamps the DuckDB oracle computes from the source table.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else df
  }

  /** Register every table as a temp view so `spark.sql` queries can
    * name them like the DuckDB oracle does. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
