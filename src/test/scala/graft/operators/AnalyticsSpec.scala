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

  test("forecastRevenue: exact decimal sum matching a driver replay; filters pushed to scan") {
    import org.apache.spark.sql.functions._
    val out = Analytics.forecastRevenue(t("lineitem")).head()
    val rows = t("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").cast("decimal(8,4)").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .select(col("l_extendedprice").cast("decimal(12,4)").as("p"),
        col("l_discount").cast("decimal(8,4)").as("d"))
      .collect()
    val expected = rows.map(r =>
      r.getDecimal(0).multiply(r.getDecimal(1))).reduce(_ add _)
    assert(math.abs(out.getDouble(0) -
      expected.setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()) < 1e-9)
    // the three conjunctive filters must reach the parquet scan
    val plan = Analytics.forecastRevenue(t("lineitem"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"filters not pushed:\n$plan")
  }

  test("multi-way join plans broadcast the dimensions, never cartesian") {
    val q5 = Analytics.localSupplierVolume(
      t("region"), t("nation"), t("customer"), t("orders"), t("lineitem"), t("supplier"))
    val plan = q5.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cartesian in plan:\n$plan")
  }

  test("volumeShipping: only crossing pairs of the two nations, dims broadcast") {
    import org.apache.spark.sql.functions._
    val out = Analytics.volumeShipping(
      t("nation"), t("customer"), t("orders"), t("lineitem"), t("supplier"))
    val pairs = out.select("supp_nation", "cust_nation").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))),
      s"unexpected pairs: $pairs")
    assert(out.filter(col("l_year") < 1995 || col("l_year") > 1998).count() == 0)
    val plan = out.queryExecution.executedPlan.toString
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

  test("min-cost supplier: ties survive, type filter applies, min spans all suppliers") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val part = Seq((1L, "widget", "STANDARD"), (2L, "gadget", "PROMO"))
      .toDF("p_partkey", "p_name", "p_type")
    val supplier = Seq((10L, "S10", 0), (11L, "S11", 0), (12L, "S12", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0, "N0"), (1, "N1")).toDF("n_nationkey", "n_name")
    // part 1: suppliers 10 and 11 tie at unit cost 2.0; supplier 12
    // higher. part 2 (PROMO) is filtered out despite a cheap supplier.
    val lineitem = Seq(
      (1L, 10L, 10.0, 5.0), (1L, 10L, 40.0, 10.0), // min 2.0
      (1L, 11L, 20.0, 10.0),                       // 2.0 (tie)
      (1L, 12L, 30.0, 10.0),                       // 3.0
      (2L, 12L, 1.0, 1.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val out = Analytics.minCostSupplier(part, supplier, nation, lineitem)
      .orderBy("p_partkey", "s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(5)))
    assert(out.toList == List((1L, 10L, 2.0), (1L, 11L, 2.0)))
  }

  test("pricingCube: four grouping sets reconcile — detail rolls up to subtotals and grand total") {
    import org.apache.spark.sql.functions._
    val out = Analytics.pricingCube(t("lineitem")).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap
    val detail = out.filter { case ((a, b), _) => a.isDefined && b.isDefined }
    val flagTot = out.filter { case ((a, b), _) => a.isDefined && b.isEmpty }
    val statTot = out.filter { case ((a, b), _) => a.isEmpty && b.isDefined }
    val grand = out((None, None))
    assert(detail.size == 6 && flagTot.size == 3 && statTot.size == 2)
    assert(detail.values.sum == grand, "detail cells partition the grand total")
    assert(flagTot.values.sum == grand && statTot.values.sum == grand)
    flagTot.foreach { case ((Some(f), _), n) =>
      assert(detail.collect { case ((Some(a), _), c) if a == f => c }.sum == n)
    case _ => }
    assert(grand == t("lineitem").count())
    // one aggregate pass: the cube is an Expand feeding a hash
    // aggregate, not a union of four scans
    val plan = Analytics.pricingCube(t("lineitem")).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "cube should compile to Expand + single aggregate")
    assert(!plan.toLowerCase.contains("union"), "cube must not scan the fact table four times")
  }
}
