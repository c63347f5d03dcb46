package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — an operator Spark's built-ins lack, composed
  * Spark-first rather than via a custom physical operator: for every
  * left row, attach the nearest right row sharing the key at-or-before
  * (backward) / at-or-after (forward) the left timestamp, optionally
  * only within a `tolerance` interval (the feature-store point-in-time
  * lookup contract; left-join semantics — no qualifying right row →
  * NULL payload).
  *
  * Shape: tag both sides, union, and run `last(payloadStruct,
  * ignoreNulls)` over a (key)-partitioned window ordered by
  * (ts, side) — right rows sort BEFORE left rows at equal timestamps,
  * so ties match (>= / <= inclusive, like DuckDB/kdb ASOF); forward
  * simply reverses the time order. ONE hash shuffle on the key and a
  * per-key sort; no range cross-product ever materializes, which is
  * what makes this survive 100 TB where an inequality theta-join
  * (BroadcastNestedLoop) would not. Tolerance is a post-match filter on
  * the matched row's own timestamp (carried inside the payload
  * struct): the nearest match overall is the nearest within the window
  * whenever one exists, so no second pass is needed.
  *
  * Right rows should be unique per (key, ts); at equal (key, ts) the
  * tie-break picks the LARGEST `tieBreak` value backward and the
  * SMALLEST forward — i.e. the row nearest the left row from the
  * matching direction's point of view (pass a unique right column for
  * determinism).
  */
object AsofJoin {

  /** Latest right row with `right.ts <= left.ts` (within `tolerance`
    * before, when given). */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      suffix: String = "_right",
      tieBreak: Option[String] = None,
      tolerance: Option[String] = None): DataFrame =
    asofImpl(left, right, key, ts, payload, suffix, tieBreak, tolerance, forward = false)

  /** Earliest right row with `right.ts >= left.ts` (within `tolerance`
    * after, when given). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      suffix: String = "_right",
      tieBreak: Option[String] = None,
      tolerance: Option[String] = None): DataFrame =
    asofImpl(left, right, key, ts, payload, suffix, tieBreak, tolerance, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      suffix: String,
      tieBreak: Option[String],
      tolerance: Option[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val outPayload = payload.map(p => p + suffix)

    // The whole right payload travels as ONE nullable struct (plus the
    // matched row's own ts as __rts, for the tolerance filter): a right
    // row contributes a non-null struct even when individual payload
    // values are NULL, so last(ignoreNulls) lands on the MATCHED row
    // (never skipping back to an older row's value) and multi-column
    // payloads can never mix values from different right rows.
    val pStructType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)) :+
        org.apache.spark.sql.types.StructField("__rts", right.schema(ts).dataType))

    val lSide = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", tieBreak.map(c => lit(null).cast(right.schema(c).dataType))
        .getOrElse(lit(null).cast("long")))
      .select(col(key), col(ts), col("__side"), col("__tie"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(pStructType).as("__p"))

    // tie-break orders by the RAW column (any orderable type) — a
    // lossy cast here would silently defeat the determinism the
    // parameter exists for (e.g. a string id casting to NULL long)
    val rSide = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieBreak.map(col).getOrElse(lit(0L)))
      .select(col(key), col(ts), col("__side"), col("__tie"),
        lit(null).cast(lSide.schema("__l").dataType).as("__l"),
        struct(payload.map(col) :+ col(ts).as("__rts"): _*).as("__p"))

    // backward: time asc, rights before lefts at equal ts, tie asc →
    // last-seen right = latest prior, largest tie.
    // forward: time DESC (so "preceding" = at-or-after), rights still
    // first within an instant, tie DESC → last-seen right = earliest
    // following, smallest tie.
    val ordering: Seq[Column] =
      if (forward) Seq(col(ts).desc, col("__side"), col("__tie").desc)
      else Seq(col(ts), col("__side"), col("__tie"))
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .select(col("__side"), col("__l"),
        last(col("__p"), ignoreNulls = true).over(w).as("__p"))
      .filter(col("__side") === 1)

    // tolerance: the nearest match must sit within the interval on the
    // matching side; outside → NULL payload (same as no match)
    val gated = tolerance match {
      case None => matched
      case Some(tol) =>
        val lts = col(s"__l.$ts")
        val rts = col("__p.__rts")
        val ok =
          if (forward) rts <= lts + expr(s"INTERVAL $tol")
          else rts >= lts - expr(s"INTERVAL $tol")
        matched.withColumn("__p", when(ok, col("__p")))
    }

    gated.select(leftCols.map(c => col(s"__l.$c").as(c)) ++
      payload.zip(outPayload).map { case (p, o) => col(s"__p.$p").as(o) }: _*)
  }
}
