package graft.operators

import graft.{SparkSpec, Tables}

class AnalyticsSpec extends SparkSpec {

  private def t(name: String) = Tables.load(spark, "/root/testdata/sf0.001", name)

  test("pricing summary groups are complete and counts partition the filtered scan") {
    import org.apache.spark.sql.functions._
    val out = Analytics.pricingSummary(t("lineitem"))
    val total = out.agg(sum("count_order")).head().getLong(0)
    val expected = t("lineitem").filter(col("l_shipdate") <= lit("1998-09-01")).count()
    assert(total == expected)
    assert(out.count() == 6) // A/N/R x F/O
  }

  test("multi-way join plans broadcast the dimensions, never cartesian") {
    val q5 = Analytics.localSupplierVolume(
      t("region"), t("nation"), t("customer"), t("orders"), t("lineitem"), t("supplier"))
    val plan = q5.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cartesian in plan:\n$plan")
  }

  test("top order per customer: one row per customer, max price, deterministic ties") {
    import org.apache.spark.sql.functions._
    val out = Analytics.topOrderPerCustomer(t("customer"), t("orders"))
    assert(out.groupBy("c_custkey").count().filter(col("count") > 1).count() == 0)
    // spot-check: the reported price is the customer's max
    val maxes = t("orders").groupBy("o_custkey").agg(max("o_totalprice").as("m"))
    val joined = out.join(maxes, out("c_custkey") === maxes("o_custkey"))
      .filter(col("top_order_price").cast("double") =!= col("m"))
    assert(joined.count() == 0)
  }
}
