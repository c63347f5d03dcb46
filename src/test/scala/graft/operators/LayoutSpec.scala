package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bit-interleave on the driver (plain Scala), the oracle
    * for the Column rendition. */
  private def zRef(xs: Seq[Long], bits: Int): Long = {
    val cap = (1L << bits) - 1
    var z = 0L
    for ((x, j) <- xs.zipWithIndex; i <- 0 until bits) {
      val c = math.min(math.max(x, 0L), cap)
      z |= ((c >> i) & 1L) << (i * xs.length + j)
    }
    z
  }

  test("zValue matches the driver-side interleave on a value sweep") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (1L, 65535L), (70000L, -5L) /* clamps */ )
    val got = cases.toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), bits = 16).as("z"))
      .as[Long].collect()
    val want = cases.map { case (x, y) => zRef(Seq(x, y), 16) }
    assert(got.toSeq == want)
  }

  test("zValue is monotone in each dimension when the others are fixed") {
    val df = (0L until 64L).map(x => (x, 7L)).toDF("x", "y")
      .select($"x", Layout.zValue(Seq($"x", $"y"), bits = 8).as("z"))
      .orderBy("x").as[(Long, Long)].collect()
    assert(df.sliding(2).forall { case Array(a, b) => a._2 < b._2 })
  }

  test("clusterByZ yields non-overlapping per-partition z-ranges") {
    val df = (0 until 2000).map(i => (i.toLong % 37, (i * 17L) % 53)).toDF("x", "y")
    val clustered = Layout.clusterByZ(df, Seq($"x", $"y"), bits = 8, partitions = 8)
    // recompute the key on the clustered output and check each
    // partition holds one contiguous, disjoint z-range
    val ranges = clustered
      .withColumn("__z", Layout.zValue(Seq($"x", $"y"), bits = 8))
      .withColumn("__p", spark_partition_id())
      .groupBy("__p").agg(min("__z").as("lo"), max("__z").as("hi"), count(lit(1)).as("n"))
      .orderBy("lo")
      .as[(Int, Long, Long, Long)].collect()
    assert(ranges.map(_._4).sum == 2000L)
    assert(ranges.sliding(2).forall {
      case Array(a, b) => a._3 <= b._2
      case _ => true
    }, s"overlapping z-ranges: ${ranges.mkString(", ")}")
  }

  test("plan: zValue is a pure projection — codegen'd, no shuffle, no UDF") {
    val df = spark.range(100).select($"id".as("x"), ($"id" * 3).as("y"))
    val plan = df.select(Layout.zValue(Seq($"x", $"y"), 16).as("z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython")
      && !plan.contains("ScalaUDF"), s"z-value must stay in the projection:\n$plan")
    // "*(1)" is plan-toString's WholeStageCodegen stage marker
    assert(plan.contains("*(1) Project"), s"z-value must codegen:\n$plan")
  }

  test("zValue rejects dim/bit combinations that overflow a long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq($"x", $"y", $"w", $"v"), bits = 16)
    }
  }
}
