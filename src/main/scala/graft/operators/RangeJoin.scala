package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points joined to the intervals containing
  * them — composed Spark-first: a plain inequality join would plan a
  * nested loop (O(n·m)); instead both sides are bucketed on time so
  * candidates meet through an EQUI-join and the exact containment
  * filter runs only within buckets.
  *
  * Each interval explodes into every bucket it covers; each point
  * belongs to exactly ONE bucket, so every qualifying (point, interval)
  * pair meets exactly once — no post-join dedup. Shuffle volume is
  * |points| + Σ interval spans/bucketWidth; pick `bucketWidthSec` near
  * the typical interval length so intervals explode into O(1) buckets.
  */
object RangeJoin {

  /** Left = point rows (`ptCol` timestamp), right = interval rows
    * (`[startCol, endCol)` timestamps), equi-keys joined alongside the
    * containment. Inclusive start, exclusive end. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String],
      bucketWidthSec: Long = 3600L): DataFrame = {
    // bucket at MICROSECOND resolution: epoch-second truncation would
    // drop the final bucket of any interval whose end has fractional
    // seconds and whose floor-second lands on a bucket boundary,
    // silently losing points in the trailing sub-second window
    val b = lit(bucketWidthSec * 1000000L)
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))

    // explicit aliases: both inputs often descend from the same scan
    // (self-joins), and df(col) disambiguation alone can degrade to a
    // trivially-true predicate under lineage changes
    val p = points.withColumn("__bucket", floor(micros(ptCol) / b)).alias("__rj_p")
    val i = intervals
      .withColumn("__bucket",
        explode(sequence(floor(micros(startCol) / b),
          // end is exclusive: an interval ending exactly on a bucket
          // boundary does not reach into the next bucket
          floor((micros(endCol) - 1) / b))))
      .alias("__rj_i")

    def pc(c: String) = col(s"__rj_p.$c")
    def ic(c: String) = col(s"__rj_i.$c")
    p.join(i, keys.map(k => pc(k) === ic(k)).reduce(_ && _) && pc("__bucket") === ic("__bucket"))
      .filter(pc(ptCol) >= ic(startCol) && pc(ptCol) < ic(endCol))
      .select(points.columns.map(pc) ++
        intervals.columns.filterNot(keys.contains).map(ic): _*)
  }
}
