package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark's built-ins lack, composed
  * Spark-first rather than via a custom physical operator: for every
  * left row, attach the LATEST right row with `right.ts <= left.ts`
  * sharing the key (the time-series "most recent state at event time"
  * join; left-join semantics — no prior right row → NULL payload).
  *
  * Shape: tag both sides, union, and run `last(payload, ignoreNulls)`
  * over a (key)-partitioned window ordered by (ts, side) — right rows
  * sort BEFORE left rows at equal timestamps, so ties match (>=
  * semantics, like DuckDB/kdb ASOF). ONE hash shuffle on the key and a
  * per-key sort; no range cross-product ever materializes, which is
  * what makes this survive 100 TB where an inequality theta-join
  * (BroadcastNestedLoop) would not.
  *
  * Right rows should be unique per (key, ts); at equal (key, ts) the
  * window picks the last by `tieBreak` (pass a unique right column for
  * determinism).
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      suffix: String = "_right",
      tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val outPayload = payload.map(p => p + suffix)

    val lSide = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .select(Seq(col(key), col(ts), col("__side"), col("__tie"),
        struct(leftCols.map(col): _*).as("__l")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p + suffix)): _*)

    val rSide = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      .select(Seq(col(key), col(ts), col("__side"), col("__tie"),
        lit(null).cast(lSide.schema("__l").dataType).as("__l")) ++
        payload.map(p => col(p).as(p + suffix)): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .select(Seq(col("__side"), col("__l")) ++
        outPayload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("__side") === 1)

    matched.select(leftCols.map(c => col(s"__l.$c").as(c)) ++ outPayload.map(col): _*)
  }
}
