package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

class CompactionSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def afterAll(): Unit =
    Seq("cmp_t1", "cmp_t2").foreach(t => Catalog.dropIfExists(spark, t))

  test("compact rewrites a fragmented tier to the size-targeted file count, data intact") {
    val dir = Files.createTempDirectory("graft_cmp").toString
    spark.range(50000L).select($"id", ($"id" % 97).as("k"))
      .repartition(64).write.mode("overwrite").parquet(dir)
    val (files0, bytes0) = Compaction.measure(spark, dir)
    assert(files0 == 64)

    // target a quarter of the tier per file → 4 output files
    val report = Compaction.compact(spark, dir, "cmp_t1", targetBytes = bytes0 / 4 + 1)
    assert(report.beforeFiles == 64 && report.beforeBytes == bytes0)
    assert(report.afterFiles == 4)
    val out = spark.table("cmp_t1")
    assert(out.count() == 50000L)
    assert(out.agg(sum("id")).head().getLong(0) == (0L until 50000L).sum)
    // the published version really has the reported file count
    assert(out.select(input_file_name()).distinct().count() == 4)
  }

  test("compactClustered keeps non-overlapping sort ranges across output files") {
    val dir = Files.createTempDirectory("graft_cmpc").toString
    spark.range(20000L).select(($"id" * 2654435761L % 100000L).as("k"), $"id")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val (_, bytes0) = Compaction.measure(spark, dir)
    val report = Compaction.compactClustered(spark, dir, "cmp_t2", Seq("k"),
      targetBytes = bytes0 / 4 + 1)
    assert(report.afterFiles == 4)
    val ranges = spark.table("cmp_t2")
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .orderBy("lo")
      .as[(String, Long, Long, Long)].collect()
    assert(ranges.map(_._4).sum == 20000L)
    assert(ranges.sliding(2).forall {
      case Array(a, b) => a._3 <= b._2
      case _ => true
    }, s"overlapping file ranges: ${ranges.map(r => (r._2, r._3)).mkString(", ")}")
  }
}
