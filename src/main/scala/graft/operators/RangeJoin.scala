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
    val b = lit(bucketWidthSec)
    def epoch(c: String) = col(c).cast("timestamp").cast("long")

    val p = points.withColumn("__bucket", floor(epoch(ptCol) / b))
    val i = intervals
      .withColumn("__bucket",
        explode(sequence(floor(epoch(startCol) / b),
          // end is exclusive: an interval ending exactly on a bucket
          // boundary does not reach into the next bucket
          floor((epoch(endCol) - 1) / b))))

    val joined = p
      .join(i, keys.map(k => p(k) === i(k)).reduce(_ && _) && p("__bucket") === i("__bucket"))
      .filter(p(ptCol) >= i(startCol) && p(ptCol) < i(endCol))
    (keys.map(i(_)) :+ i("__bucket") :+ p("__bucket"))
      .foldLeft(joined)((d, c) => d.drop(c))
  }
}
