package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: collapse a keyed change feed into
  * versioned dimension rows with effective-time ranges — the history
  * table a warehouse keeps next to the MERGE upsert's "current" view
  * (the reference's Snowflake tier holds only current rows; SCD2 is the
  * standard companion contract).
  *
  * Scale: both windows partition by the dimension key — the shuffle is
  * one hash exchange on the key, each task handles whole keys, and no
  * unpartitioned window ever sees the feed. Skewed keys (one entity
  * with millions of updates) are the caller's salting decision; typical
  * dimension feeds are uniform.
  */
object Scd2 {

  /** Versioned history from a change feed: a new version opens at every
    * row whose tracked attributes differ (null-safely) from the
    * previous row of the same key in `(ts, tieBreak)` order; each
    * version carries `effective_from` (its opening row's timestamp),
    * `effective_to` (the next version's `effective_from`, NULL for the
    * open version) and `is_current`.
    *
    * `tieBreak` must make the per-key order total (a unique event id) —
    * otherwise "previous row" is engine-defined and the history is
    * nondeterministic. The opening row's tie-break value is kept in the
    * output (as `open_<tieBreak>`): attrs can repeat at one timestamp
    * (A,B,A at the same ts opens two A-versions tying on every other
    * column), so without it the history has no total order. */
  def history(feed: DataFrame, key: String, attrs: Seq[String],
              ts: String, tieBreak: String): DataFrame = {
    val ordered = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val attrStruct = struct(attrs.map(col): _*)
    val opens = feed
      .withColumn("__changed", !(attrStruct <=> lag(attrStruct, 1).over(ordered)))
      .filter(col("__changed"))
    opens.select(col(key) +: attrs.map(col) :+ col(ts).as("effective_from")
        :+ col(tieBreak).as(s"open_$tieBreak"): _*)
      .withColumn("effective_to",
        lead(col("effective_from"), 1).over(
          Window.partitionBy(col(key)).orderBy(col("effective_from"), col(s"open_$tieBreak"))))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
