package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the higher-order fold bit-for-bit on real embeddings") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
      Similarity.dot($"embedding", $"embedding").as("native"),
      Similarity.dotHof($"embedding", $"embedding").as("hof"))
    assert(both.filter($"native" =!= $"hof" || $"native".isNull).count() == 0)
  }

  test("null array or null element yields null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))

    val withNullElem = spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d")
    assert(withNullElem.head().isNullAt(0))
  }

  test("vec_dot is callable from SQL via the session extension") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .head().getDouble(0)
    assert(r == 4.0)
  }

  test("scoring runs inside whole-stage codegen") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = e.select(Similarity.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" star prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), s"no codegen span:\n$plan")
  }
}
