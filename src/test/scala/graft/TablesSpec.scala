package graft

import org.apache.spark.sql.types.TimestampNTZType

class TablesSpec extends SparkSpec {

  test("events.ts converts nanos to exact TIMESTAMP_NTZ micros") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() > 0)
    assert(df.filter(df("ts").isNull).count() == 0)
  }

  test("driver smoke contract: entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registerAll exposes every driver table as a temp view") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT COUNT(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql("SELECT COUNT(*) FROM documents").head().getLong(0) > 0)
    assert(spark.sql("SELECT COUNT(*) FROM embeddings").head().getLong(0) > 0)
  }
}
