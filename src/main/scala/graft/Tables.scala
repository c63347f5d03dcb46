package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // only reads via the nanosAsLong legacy conf (set in GraftSession /
    // Verify / Bench). The values are µs-resolution, so converting the
    // long nanos to a microsecond TimestampType is exact.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
    else df
  }

  /** Register every table as a temp view so `spark.sql` queries can
    * name them like the DuckDB oracle does. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
