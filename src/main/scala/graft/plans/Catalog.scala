package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** DDL surface (SURVEY §2 S8/S9/S10/S11) over the session catalog.
  *
  * The reference's warehouse objects and their Spark renditions:
  *  - `CREATE TABLE IF NOT EXISTS` (`sql/create_snowflake_tables.sql:8-15`,
  *    `airflow/dags/snowflake_data_pipeline.py:73-97`) → idempotent DDL
  *    against the session catalog, parquet provider;
  *  - `CREATE OR REPLACE TABLE ... AS SELECT` full refresh
  *    (`sql/create_snowflake_tables.sql:31-39`) → overwrite saveAsTable;
  *  - `CREATE OR REPLACE VIEW` (`sql/create_snowflake_tables.sql:18-28`)
  *    → catalog temp view (resolved by Catalyst's analyzer at read);
  *  - `INSERT ... SELECT` append (`airflow/dags/snowflake_data_pipeline.py:115-143`)
  *    → by-name append into the existing table.
  *
  * Tables are parquet under `spark.sql.warehouse.dir`; on a cluster the
  * same calls bind to whatever catalog the session carries — nothing
  * here assumes local mode.
  */
object Catalog {

  /** S8: idempotent CREATE TABLE. */
  def ensureTable(spark: SparkSession, name: String, schema: StructType): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) USING PARQUET")

  /** S9: CTAS full refresh — rebuild the table from the query result. */
  def ctasOverwrite(df: DataFrame, name: String): Unit = {
    df.write.mode("overwrite").option("overwriteSchema", "true").saveAsTable(name)
    df.sparkSession.catalog.refreshTable(name)
  }

  /** S10: CREATE OR REPLACE VIEW. */
  def createOrReplaceView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** S11: INSERT INTO ... SELECT, by name (positions in the reference's
    * column list are by-name too). Returns rows appended. */
  def insertAppend(spark: SparkSession, name: String, df: DataFrame): Long = {
    val cols = spark.table(name).columns
    // cache across the count + write so the input plan (often a dedup
    // anti-join) executes once, not twice
    val aligned = df.select(cols.map(df.col): _*).persist()
    try {
      val n = aligned.count()
      aligned.write.mode("append").saveAsTable(name)
      // The write may run on a DIFFERENT session than readers (foreachBatch
      // hands out a micro-batch session clone): drop `spark`'s cached
      // relation so its next read sees the new files.
      spark.catalog.refreshTable(name)
      n
    } finally aligned.unpersist()
  }

  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Bucketed + sorted table for co-located joins: both sides of an
    * equi-join bucketed on the same key with the same bucket count join
    * with NO shuffle (SortMergeJoin reads matching buckets directly).
    * This is the 100 TB shape for the curated `events` tier — the
    * hourly dedup anti-join then never re-shuffles the multi-TB target,
    * only the incoming batch. */
  def ctasBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("overwriteSchema", "true")
      .saveAsTable(name)
}
