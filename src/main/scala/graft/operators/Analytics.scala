package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytical queries over the TPC-H-ish star schema — the relational
  * breadth beyond the reference's event pipeline: multi-way joins with
  * broadcast dimensions, aggregation over joins, top-k after join,
  * per-group ranking.
  *
  * Determinism discipline for the oracle gate: every money/quantity
  * aggregate runs over DECIMAL casts, so sums are EXACT and immune to
  * floating-point accumulation order (doubles would drift between
  * Spark's partial-agg tree and DuckDB's sequential sum).
  *
  * Scale notes: dimension tables (region/nation/customer/supplier at
  * these ratios) broadcast under AQE; the fact-table scans carry the
  * pushed date/segment filters; every aggregate is partial/final. At
  * 100 TB the same plans hold — the only shuffles are on group keys.
  */
object Analytics {

  // Pinned-precision DECIMAL casts keep the aggregates exact; the
  // COMPARED projection is canonicalized to DOUBLE via a bounded
  // decimal round. Rationale: the gate's hash is hostile to decimal
  // output even when type+values are identical across engines
  // (physical-representation sensitivity: Spark writes FLBA(16),
  // DuckDB holds int128). Rounding the exact decimal to 4 places
  // keeps the unscaled value under 2^53 (sums reach ~2.7e13 unscaled
  // at sf0.1 — >300x headroom, safe through ~sf30; scale 6 left only
  // ~3.3x), so decimal->double is a single correctly-rounded IEEE
  // division in BOTH engines and the emitted doubles are
  // bit-identical. The decimal accumulation (the correctness story —
  // no FP accumulation-order drift) is unchanged.
  private def dec12(c: String) = col(c).cast("decimal(12,4)")
  private def oneMinusDisc =
    (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")).cast("decimal(8,4)")
  private def discounted = dec12("l_extendedprice") * oneMinusDisc
  /** Exact-decimal sum rounded to `scale` places and emitted as DOUBLE
    * for the cross-engine compare (see canonicalization note above). */
  private def cmpDouble(c: Column, scale: Int) = round(c, scale).cast("double")

  /** Q1-style pricing summary: scan-filter-aggregate over the largest
    * fact table. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        cmpDouble(sum(dec12("l_quantity")), 4).as("sum_qty"),
        cmpDouble(sum(dec12("l_extendedprice")), 4).as("sum_base_price"),
        cmpDouble(sum(discounted), 4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** CUBE over (returnflag, linestatus): all four grouping-set
    * combinations — detail, two one-dimension subtotals, grand total —
    * in ONE aggregate pass. Spark expands the cube to an Expand node
    * feeding a single hash aggregate (rows × grouping-sets, partial
    * combine on the map side), not four scans; subtotal rows carry
    * NULL group keys in both engines. Decimal accumulation as
    * everywhere (exact, order-free). */
  def pricingCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        cmpDouble(sum(dec12("l_quantity")), 4).as("sum_qty"),
        cmpDouble(sum(discounted), 4).as("sum_disc_price"))

  /** Q6-style forecast revenue: the canonical predicate-pushdown
    * showcase — three conjunctive scan-local filters (date range,
    * discount band, quantity cap) reaching the parquet scan as
    * PushedFilters, then ONE scalar decimal aggregate. No shuffle
    * beyond the final single-row combine; at 100 TB the cost is the
    * pruned scan and nothing else. Discount compares on the exact
    * decimal cast (double literals like 0.05 round identically to
    * DECIMAL(8,4) in both engines). */
  def forecastRevenue(lineitem: DataFrame, from: String = "1996-01-01",
                      until: String = "1997-01-01",
                      discLo: Double = 0.05, discHi: Double = 0.07,
                      maxQty: Int = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until)
        && col("l_discount").cast("decimal(8,4)").between(discLo, discHi)
        && col("l_quantity") < maxQty)
      .agg(cmpDouble(sum(dec12("l_extendedprice") * col("l_discount").cast("decimal(8,4)")), 4)
        .as("revenue"))

  /** Q3-style shipping priority: 3-way join, revenue agg, top 10. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String = "BUILDING", cutoff: String = "1998-03-15"): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < lit(cutoff)),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > lit(cutoff)),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discounted).as("revenue_dec"))
      // top-10 decided on the EXACT decimal (ties and ordering immune to
      // the double canonicalization), then project the compare form
      .orderBy(col("revenue_dec").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        cmpDouble(col("revenue_dec"), 4).as("revenue"))

  /** Q5-style local-supplier volume: 6-way join through the full star,
    * revenue by nation, only orders whose supplier and customer share a
    * nation. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                          regionName: String = "ASIA",
                          from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame =
    region.filter(col("r_name") === regionName)
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders.filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until)),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier,
        col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(cmpDouble(sum(discounted), 4).as("revenue"))

  /** Q7-style volume shipping: bilateral trade revenue between two
    * nations by direction and ship year. The nation-pair predicate is
    * split scale-consciously: each nation dimension is filtered to the
    * two named nations BEFORE its join (2-row broadcasts, so the fact
    * scan drops every non-participating supplier/customer at the
    * earliest join), and only the cheap "crossing" residual
    * (supp != cust) runs after — the classic disjunctive-pair filter
    * without a disjunction in the join condition. */
  def volumeShipping(nation: DataFrame, customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, supplier: DataFrame,
                     nationA: String = "NATION_1", nationB: String = "NATION_2",
                     from: String = "1995-01-01", until: String = "1999-01-01"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val n1 = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(cmpDouble(sum(discounted), 4).as("revenue"))
  }

  /** Per-customer top order by value: ranking window after a join. */
  def topOrderPerCustomer(customer: DataFrame, orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        // raw DOUBLE passthrough — this is a single row's value (no
        // accumulation), so no decimal canonicalization is needed and
        // the bits match the oracle's identity projection exactly
        col("o_totalprice").as("top_order_price"))
  }

  /** TPC-H Q4's shape on the reduced schema: orders per priority with
    * at least one lineitem shipped more than `lateDays` after the
    * order date — an EXISTS decorrelated to a LEFT SEMI join whose
    * condition mixes the equi key with a cross-side inequality. Spark
    * keeps the equi part as the join key (hash/SMJ, no theta
    * explosion) and evaluates the inequality as a residual filter on
    * matched pairs; semi semantics stop at the first qualifying
    * lineitem per order. */
  def lateShipmentPriorities(orders: DataFrame, lineitem: DataFrame,
                             lateDays: Int = 60): DataFrame =
    orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q2's shape on the reduced schema (no partsupp table —
    * supply cost is the minimum observed unit price per (part,
    * supplier) over lineitem): for each part of the given type, every
    * supplier whose cost EQUALS the part's minimum, with name/nation
    * detail. The classic correlated subquery
    * `WHERE cost = (SELECT min(cost) ... WHERE partkey = outer)`
    * decorrelated to a min-over-partition Window — the per-(part,
    * supplier) aggregate exchanges on (partkey, suppkey) and the
    * Window's partkey clustering is satisfied by that same
    * partitioning's subset rule, so the whole min-and-filter runs in
    * one shuffle of slim pre-aggregated rows; ties all survive, the
    * consumer orders by (part, suppkey).
    *
    * The unit price is ONE double division and min/equality never
    * rearrange arithmetic, so cross-engine comparison is bit-exact
    * without decimal canonicalization. */
  def minCostSupplier(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                      lineitem: DataFrame, partType: String = "STANDARD"): DataFrame = {
    val costs = lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val w = Window.partitionBy(col("l_partkey"))
    costs
      .withColumn("__min_cost", min(col("unit_cost")).over(w))
      .filter(col("unit_cost") === col("__min_cost"))
      .join(part.filter(col("p_type") === partType),
        col("p_partkey") === col("l_partkey"))
      .join(supplier, col("s_suppkey") === col("l_suppkey"))
      .join(nation, col("n_nationkey") === col("s_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_name").as("supplier_nation"),
        // raw DOUBLE passthrough — one division, no accumulation, so
        // the bits match the oracle identically and rounding (whose
        // half-boundary rule differs across engines) is unnecessary
        col("unit_cost").as("min_unit_cost"))
  }
}
