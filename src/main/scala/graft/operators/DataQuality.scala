package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's data-quality gate (SURVEY §2 A2/A3/C5), as a
  * library: `airflow/dags/snowflake_data_pipeline.py:152-202` runs a
  * duplicate-count and an incomplete-row-count query per batch and
  * fails the run if either is non-zero.
  *
  * Both checks are single-pass aggregates. At scale the duplicate
  * check is one shuffle on the key with map-side partial counts; the
  * completeness check is a scan-local filter+count (no shuffle at
  * all — Catalyst plans it as partial counts merged on the driver).
  */
object DataQuality {

  final case class Report(duplicateCount: Long, incompleteCount: Long) {
    def ok: Boolean = duplicateCount == 0L && incompleteCount == 0L
  }

  /** Rows sharing a key value (snowflake_data_pipeline.py:156-162):
    * `GROUP BY key HAVING COUNT(*) > 1`, then the number of such keys. */
  def duplicateKeys(df: DataFrame, key: String = "event_id"): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("dup_count")).filter(col("dup_count") > 1)

  def duplicateCount(df: DataFrame, key: String = "event_id"): Long =
    duplicateKeys(df, key).count()

  /** Completeness (snowflake_data_pipeline.py:164-170): rows where any
    * required column is NULL. */
  def incompleteRows(df: DataFrame, required: Seq[String]): DataFrame =
    df.filter(required.map(col(_).isNull).reduce(_ || _))

  def incompleteCount(df: DataFrame, required: Seq[String]): Long =
    incompleteRows(df, required).count()

  def report(df: DataFrame, key: String, required: Seq[String]): Report =
    Report(duplicateCount(df, key), incompleteCount(df, required))

  /** The gate (snowflake_data_pipeline.py:181-202): raises on
    * violation, mirroring the reference's ValueError. */
  def gate(df: DataFrame, key: String = "event_id",
           required: Seq[String] = Seq("event_id", "ts", "event_type", "user_id")): Report = {
    val r = report(df, key, required)
    require(r.ok,
      s"Data quality check failed: duplicates=${r.duplicateCount}, incomplete=${r.incompleteCount}")
    r
  }
}
