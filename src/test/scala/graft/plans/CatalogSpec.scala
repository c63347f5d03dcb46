package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.operators.EventOps

class CatalogSpec extends SparkSpec with BeforeAndAfterAll {

  override def afterAll(): Unit =
    Seq("cat_t1", "cat_view_src", "ev_bucketed", "staging_bucketed")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("ensureTable is idempotent; insertAppend aligns by name") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS cat_t1")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Catalog.ensureTable(spark, "cat_t1", df.schema)
    Catalog.ensureTable(spark, "cat_t1", df.schema) // second call is a no-op
    // reversed column order still lands correctly
    assert(Catalog.insertAppend(spark, "cat_t1", df.select("v", "id")) == 2L)
    assert(spark.table("cat_t1").filter($"id" === 1L && $"v" === "a").count() == 1L)
  }

  test("bucketed curated tier joins without re-shuffling the target") {
    import spark.implicits._
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    Catalog.ctasBucketed(events.filter($"event_id" % 3 === 0), "ev_bucketed", "event_id", 8)
    Catalog.ctasBucketed(events.filter($"event_id" % 7 < 3), "staging_bucketed", "event_id", 8)

    val target = spark.table("ev_bucketed")
    val staging = spark.table("staging_bucketed")
    val inserted = EventOps.dedupInsert(staging, target)

    // correctness unchanged vs the unbucketed plan
    val expected = EventOps.dedupInsert(
      events.filter($"event_id" % 7 < 3), events.filter($"event_id" % 3 === 0)).count()
    assert(inserted.count() == expected)

    // with broadcast off, the join must be a SortMergeJoin with NO
    // shuffle on either bucketed side (bucket layout == join keys)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = EventOps.dedupInsert(staging, target)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
