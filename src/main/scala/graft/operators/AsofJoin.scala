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
  * Shape: tag both sides, union, and run `last(payloadStruct,
  * ignoreNulls)`
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

    // The whole right payload travels as ONE nullable struct: a right
    // row contributes a non-null struct even when individual payload
    // values are NULL, so last(ignoreNulls) lands on the MATCHED row
    // (never skipping back to an older row's value) and multi-column
    // payloads can never mix values from different right rows.
    val lSide = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", tieBreak.map(c => lit(null).cast(right.schema(c).dataType))
        .getOrElse(lit(null).cast("long")))
      .select(col(key), col(ts), col("__side"), col("__tie"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(
          org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))).as("__p"))

    // tie-break orders by the RAW column (any orderable type) — a
    // lossy cast here would silently defeat the determinism the
    // parameter exists for (e.g. a string id casting to NULL long)
    val rSide = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieBreak.map(col).getOrElse(lit(0L)))
      .select(col(key), col(ts), col("__side"), col("__tie"),
        lit(null).cast(lSide.schema("__l").dataType).as("__l"),
        struct(payload.map(col): _*).as("__p"))

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .select(col("__side"), col("__l"),
        last(col("__p"), ignoreNulls = true).over(w).as("__p"))
      .filter(col("__side") === 1)

    matched.select(leftCols.map(c => col(s"__l.$c").as(c)) ++
      payload.zip(outPayload).map { case (p, o) => col(s"__p.$p").as(o) }: _*)
  }
}
