package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: project an irregular event stream onto a
  * regular per-key calendar grid and forward-fill gaps with the last
  * observation (LOCF) — "what was the most recent known value on every
  * day" for dashboards, feature snapshots, and state-at-time tables.
  *
  * Scale shape: the daily pre-aggregate partial-combines map-side; the
  * per-key grid is a row-local `sequence` explode (one row per key ×
  * day — the OUTPUT size, nothing larger is ever materialized); the
  * fill is one key-partitioned window over that grid. No unpartitioned
  * step anywhere, so a 10⁹-key corpus spreads evenly.
  */
object Resample {

  /** Daily grid per key spanning that key's own [first, last] observed
    * day, with `max(value)` per observed day (an order-free daily
    * reducer keeps the gate exact) forward-filled across gap days.
    * Emits (key, day, day_value, value_ffill): `day_value` is NULL on
    * gap days, `value_ffill` carries the last observation. */
  def dailyFfill(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val daily = df.groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(max(col(value)).as("day_value"))
    val grid = daily.groupBy(col(key))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col(key),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(key, "day"), "left")
      .withColumn("value_ffill", last(col("day_value"), ignoreNulls = true).over(w))
  }

  /** Trailing `windowDays`-row moving average of the daily value sum
    * per key — the smoothing/trend primitive (7-day active-user lines,
    * rolling revenue) on top of the same daily pre-aggregate.
    *
    * Numeric discipline: the daily sum and the sliding frame sum are
    * DECIMAL(38,12) — exact and addition-order-free, so the result is
    * identical under Spark's partial aggregation, DuckDB's segment-tree
    * sliding frames, and any task order. Only the final mean is a
    * (single, correctly-rounded) double division. A double sliding sum
    * would be none of those things.
    *
    * Scale shape: the window partitions by key over the ALREADY
    * day-aggregated frame (≤ one row per key × day), so frame size is
    * `windowDays` rows regardless of event volume underneath. */
  def movingAverage(df: DataFrame, key: String, ts: String, value: String,
                    windowDays: Int = 7): DataFrame = {
    val daily = df.filter(col(value).isNotNull)
      .groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(sum(col(value).cast("decimal(38,12)")).as("day_sum"),
        count(lit(1)).as("day_n"))
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    daily
      .withColumn("win_sum", sum(col("day_sum")).over(w))
      .withColumn("win_n", sum(col("day_n")).over(w))
      .select(col(key), col("day"),
        round(col("day_sum").cast("double"), 6).as("day_sum"),
        round(col("win_sum").cast("double") / col("win_n"), 6).as("moving_avg"))
  }
}
