package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join and spreads the hot key") {
    // 10k rows of one hot key + a long tail
    val left = spark.range(10000).select(
      when($"id" < 9000, lit(7L)).otherwise($"id").as("k"), $"id".as("payload"))
    val right = Seq((7L, "hot"), (9500L, "tail"), (42L, "missing-left")).toDF("k", "name")

    val plain = left.join(right, Seq("k"), "inner")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)

    // the hot key's rows really land on several reducers
    val spread = Skew.saltedJoin(left, right, "k", 8)
      .withColumn("pid", spark_partition_id())
      .filter($"k" === 7L).select(countDistinct("pid")).head().getLong(0)
    assert(spread > 1L, s"hot key still on one partition")
  }

  test("right/full outer joins are rejected (replication would fabricate rows)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](Skew.saltedJoin(df, df, "k", 4, "right_outer"))
    intercept[IllegalArgumentException](Skew.saltedJoin(df, df, "k", 4, "full"))
  }

  test("left joins preserve unmatched rows under salting") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val right = Seq((1L, "x")).toDF("k", "name")
    val out = Skew.saltedJoin(left, right, "k", 4, "left")
    assert(out.count() == 2L)
    assert(out.filter($"k" === 2L && $"name".isNull).count() == 1L)
  }

  test("saltedStats equals the direct group-by for every salt factor") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10000L)
      .select(($"id" % 3).cast("string").as("k"),
        when($"id" % 7 === 0, lit(null)).otherwise($"id".cast("double") / 13).as("v"))
    val direct = df.groupBy("k")
      .agg(count($"v").as("value_count"), min($"v").as("value_min"), max($"v").as("value_max"))
      .orderBy("k").collect().toSeq
    for (sf <- Seq(1, 2, 8, 31)) {
      val salted = Skew.saltedStats(df, Seq("k"), "v", sf).orderBy("k").collect().toSeq
      assert(salted == direct, s"saltFactor=$sf diverges")
    }
  }
}
