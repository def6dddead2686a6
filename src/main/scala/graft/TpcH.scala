package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The TPC-H 22-query suite, adapted to the fixture's TPC-H-ish schema
  * (TESTDATA.md) and registered as first-class oracle queries — the
  * standard proof that a query engine is actually general: multi-join
  * ordering, correlated subqueries (EXISTS / NOT EXISTS / scalar),
  * decimal aggregates, grouped HAVING, and top-k all end-to-end.
  *
  * Schema adaptations (the fixture has no partsupp and fewer columns;
  * every query keeps its reference STRUCTURE — same join graph, same
  * subquery shape, same aggregate skeleton):
  *  - `supply` stands in for partsupp: one row per (l_partkey,
  *    l_suppkey) pair observed in lineitem, ps_supplycost = cheapest
  *    observed line price, ps_availqty = total quantity ever shipped
  *    (derived, deterministic, identical on the oracle side);
  *  - o_orderpriority stands in for o_shippriority (Q3) and the
  *    comment-filters (Q13); l_returnflag stands in for l_shipmode
  *    (Q12); "late" = l_shipdate > o_orderdate + K days stands in for
  *    the commitdate/receiptdate comparisons (Q4/Q12/Q21);
  *  - Q22's country code is c_nationkey % 10 (no phone column) and
  *    its anti-join is "no orders since 2000" (every fixture customer
  *    has at least one order ever);
  *  - date windows shifted into the fixture's 1995–2001 span.
  *
  * Determinism follows the house rules (SparkEntry scaladoc): sums in
  * exact DECIMAL then one final DOUBLE cast, identical aliases both
  * sides, total ORDER BY including tie-break keys before any LIMIT.
  * Products cast to DECIMAL(18,k) only where the TRUE value has ≤ k
  * decimals (2-dec price × 2-dec discount × …), so both engines round
  * the same on-grid value — the established safe pattern.
  *
  * Scale shape: every join is an equi-join Catalyst can reorder; the
  * dimension sides (region/nation/supplier/part) broadcast under AQE;
  * the correlated subqueries compile to semi/anti joins (no per-row
  * re-execution); `supply` is one map-side-combinable groupBy of
  * lineitem. Ref behavior source: the reference's analytics queries
  * are plain star-joins + aggregations (e.g. `bp-scala-api-ingestions/
  * PSS WHI (XML)/Tables.scala` join/agg chains) — this suite is the
  * standard superset of those shapes.
  */
object TpcH {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def dec(p: Int, sc: Int) = DecimalType(p, sc)

  /** Derived partsupp stand-in (see object scaladoc). ps_availqty is
    * integral by construction (sum of integral quantities), so the
    * double→long cast agrees between Spark (truncate) and DuckDB
    * (round). */
  private def supply(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice")).as("ps_supplycost"),
        sum(col("l_quantity").cast(dec(18, 2))).cast("double").cast("long")
          .as("ps_availqty"))

  /** Matching WITH-clause for the oracle side. */
  private val SupplySql =
    """supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    min(l_extendedprice) AS ps_supplycost,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS BIGINT) AS ps_availqty
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  private def discPrice = // l_extendedprice·(1−l_discount), exact 4-dec
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec(18, 4))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q1: pricing summary report — full column set (q1_agg keeps the
    // abridged flagship version)
    "q_tpch_01" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec(18, 2))).cast("double")
            .as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).cast(dec(18, 6))).cast("double")
            .as("sum_charge"),
          (sum(col("l_quantity").cast(dec(18, 2))).cast("double")
            / count(lit(1))).as("avg_qty"),
          (sum(col("l_extendedprice").cast(dec(18, 2))).cast("double")
            / count(lit(1))).as("avg_price"),
          (sum(col("l_discount").cast(dec(18, 2))).cast("double")
            / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q2: minimum-cost supplier — correlated MIN subquery as an
    // aggregate + equality join back (Catalyst's decorrelation shape)
    "q_tpch_02" -> ((s, dir) => {
      val eu = t(s, dir, "supplier")
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").where(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"),
          col("n_name"))
      val cand = t(s, dir, "part")
        .where(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
        .join(supply(s, dir), col("p_partkey") === col("ps_partkey"))
        .join(eu, col("ps_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_acctbal"),
          col("s_name"), col("n_name"), col("ps_supplycost"))
      val mn = cand.groupBy(col("p_partkey").as("m_partkey"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      cand.join(mn, col("p_partkey") === col("m_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q3: shipping-priority top-10 unshipped orders
    "q_tpch_03" -> ((s, dir) => {
      t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders")
          .where(col("o_orderdate") < to_timestamp(lit("1997-03-15"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .where(col("l_shipdate") > to_timestamp(lit("1997-03-15"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q4: order-priority checking — EXISTS(late line) as a semi join
    "q_tpch_04" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_orderdate") >= to_timestamp(lit("1996-07-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-10-01")))
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q5: local-supplier volume (the full Q5 with region filter and
    // the c_nationkey = s_nationkey locality condition)
    "q_tpch_05" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q6: forecasting-revenue-change — pure pushed-down scan filter
    "q_tpch_06" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast(dec(18, 4)))
          .cast("double").as("revenue"))
    }),

    // Q7: volume shipping between two nations, by direction and year
    "q_tpch_07" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem")
          .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q8: national market share within a region/part-type slice
    "q_tpch_08" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_reg"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
      val zero = lit(0).cast(dec(18, 4))
      t(s, dir, "part").where(col("p_type") === "ECONOMY")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders")
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("n1_key"))
        .join(t(s, dir, "region").where(col("r_name") === "AMERICA"),
          col("n1_reg") === col("r_regionkey"))
        .join(n2, col("s_nationkey") === col("n2_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("nation") === "NATION_5", discPrice)
            .otherwise(zero)).cast("double")
          / sum(discPrice).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9: product-type profit, supply-cost from the derived relation
    // (cost·qty·0.01 has ≤4 true decimals: 2-dec price × integral qty
    // × 1/100 — on-grid for the DECIMAL(18,4) cast)
    "q_tpch_09" -> ((s, dir) => {
      val amount = discPrice -
        (col("ps_supplycost") * col("l_quantity") * lit(0.01)).cast(dec(18, 4))
      t(s, dir, "part").where(col("p_name").like("%red%"))
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(supply(s, dir), col("ps_suppkey") === col("l_suppkey") &&
          col("ps_partkey") === col("l_partkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q10: returned-item reporting — top-20 customers by lost revenue
    "q_tpch_10" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .where(col("o_orderdate") >= to_timestamp(lit("1996-10-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").where(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q11: important-stock identification — grouped value vs a scalar
    // fraction of the total; value·1000 > total keeps the comparison
    // in exact decimal on both engines (no double rounding)
    "q_tpch_11" -> ((s, dir) => {
      val nat = supply(s, dir)
        .join(t(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation").where(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
      val v = nat.groupBy(col("ps_partkey"))
        .agg(sum((col("ps_supplycost") * col("ps_availqty")).cast(dec(18, 2)))
          .cast(dec(38, 2)).as("value"))
      val tot = v.agg(sum(col("value")).cast(dec(38, 2)).as("total"))
      v.crossJoin(tot) // 1-row scalar attach
        .where(col("value") * lit(1000) > col("total"))
        .select(col("ps_partkey"), col("value").cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // Q12: shipping-mode priority split (returnflag stands in for
    // shipmode; late = shipped >30 days after ordering)
    "q_tpch_12" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // Q13: customer order-count distribution — outer join with an
    // ON-clause filter, double aggregation
    "q_tpch_13" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .where(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14: promotion effect — conditional-aggregate percentage
    "q_tpch_14" -> ((s, dir) => {
      val zero = lit(0).cast(dec(18, 4))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1996-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-10-01")))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0)
          * sum(when(col("p_type") === "PROMO", discPrice).otherwise(zero))
            .cast("double")
          / sum(discPrice).cast("double")).as("promo_revenue"))
    }),

    // Q15: top supplier — revenue view + scalar MAX equality (compared
    // in exact decimal BEFORE the output's double cast)
    "q_tpch_15" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(discPrice).as("total_revenue"))
      val mx = revenue.agg(max(col("total_revenue")).as("max_revenue"))
      t(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .crossJoin(mx) // 1-row scalar attach
        .where(col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16: parts/supplier relationship — NOT IN as an anti join,
    // count(DISTINCT) over the survivors
    "q_tpch_16" -> ((s, dir) => {
      supply(s, dir)
        .join(t(s, dir, "supplier").where(col("s_acctbal") < 0)
            .select(col("s_suppkey")),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, dir, "part")
            .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "MEDIUM" &&
              col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9)),
          col("p_partkey") === col("ps_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q17: small-quantity-order revenue — correlated per-part AVG as
    // an aggregate join (avg derived sum-decimal / count: exact
    // operands, identical IEEE division both engines)
    "q_tpch_17" -> ((s, dir) => {
      val pa = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("a_partkey"))
        .agg((sum(col("l_quantity").cast(dec(18, 2))).cast("double")
          / count(lit(1))).as("avg_qty"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part")
            .where(col("p_brand") === "Brand#3" && col("p_type") === "SMALL"),
          col("p_partkey") === col("l_partkey"))
        .join(pa, col("a_partkey") === col("l_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast(dec(18, 2))).cast("double")
          / lit(7.0)).as("avg_yearly"))
    }),

    // Q18: large-volume customers — grouped HAVING via semi join
    "q_tpch_18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(sum(col("l_quantity").cast(dec(18, 2))).as("o_qty"))
        .where(col("o_qty") > 300)
        .select(col("b_orderkey"))
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("b_orderkey"), "left_semi")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast(dec(18, 2))).cast("double")
          .as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),

    // Q19: discounted revenue — three OR'd brand/size/quantity bands
    "q_tpch_19" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 30))
        .agg(sum(discPrice).cast("double").as("revenue"))
    }),

    // Q20: potential-part-promotion — nested IN subqueries as joins;
    // availqty > half the window's shipped quantity
    "q_tpch_20" -> ((s, dir) => {
      val yr = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(dec(18, 2))).cast("double")
          .as("year_qty"))
      val qual = supply(s, dir)
        .join(t(s, dir, "part").where(col("p_name").like("red%"))
          .select(col("p_partkey")),
          col("ps_partkey") === col("p_partkey"))
        .join(yr, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .where(col("ps_availqty") > lit(0.5) * col("year_qty"))
        .select(col("ps_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(qual, col("s_suppkey") === col("ps_suppkey"))
        .join(t(s, dir, "nation").where(col("n_name") === "NATION_7"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"))
        .orderBy(col("s_name"))
    }),

    // Q21: suppliers-who-kept-orders-waiting — EXISTS + NOT EXISTS
    // over lineitem self-references as semi + anti joins
    "q_tpch_21" -> ((s, dir) => {
      val l1 = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("k1_orderkey"),
          col("l_suppkey").as("k1_suppkey"), col("o_orderdate").as("k1_odate"))
      val l2 = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k2_orderkey"),
          col("l_suppkey").as("k2_suppkey"))
      val l3 = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k3_orderkey"),
          col("l_suppkey").as("k3_suppkey"), col("l_shipdate").as("k3_ship"))
      l1
        .join(l2, col("k2_orderkey") === col("k1_orderkey") &&
          col("k2_suppkey") =!= col("k1_suppkey"), "left_semi")
        .join(l3, col("k3_orderkey") === col("k1_orderkey") &&
          col("k3_suppkey") =!= col("k1_suppkey") &&
          col("k3_ship") > col("k1_odate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .join(t(s, dir, "supplier"), col("k1_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation").where(col("n_name") === "NATION_4"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q22: global sales opportunity — scalar AVG subquery + anti join
    // (country code = c_nationkey % 10; "dormant" = no orders since
    // 2000, see object scaladoc)
    "q_tpch_22" -> ((s, dir) => {
      val pos = t(s, dir, "customer")
        .where((col("c_nationkey") % 10).isin(1, 3, 5, 7, 9))
        .select((col("c_nationkey") % 10).cast("string").as("cntrycode"),
          col("c_acctbal"), col("c_custkey"))
      val avgBal = pos.where(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(dec(18, 2))).cast("double")
          / count(lit(1))).as("ab"))
      pos.crossJoin(avgBal) // 1-row scalar attach
        .where(col("c_acctbal") > col("ab"))
        .join(t(s, dir, "orders")
            .where(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
            .select(col("o_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(dec(18, 2))).cast("double")
            .as("totacctbal"))
        .orderBy(col("cntrycode"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_tpch_01" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_02" ->
      s"""WITH $SupplySql,
         |eu AS (SELECT s_suppkey, s_acctbal, s_name, n_name
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
         |cand AS (SELECT p_partkey, p_name, s_acctbal, s_name, n_name, ps_supplycost
         |  FROM part JOIN supply ON p_partkey = ps_partkey
         |  JOIN eu ON ps_suppkey = s_suppkey
         |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'),
         |mn AS (SELECT p_partkey AS m_partkey, min(ps_supplycost) AS min_cost
         |  FROM cand GROUP BY p_partkey)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
         |FROM cand JOIN mn ON p_partkey = m_partkey AND ps_supplycost = min_cost
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q_tpch_03" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_04" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_05" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_06" ->
      """SELECT CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_tpch_07" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice*(1-l_discount) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_08" ->
      """SELECT o_year,
        | CAST(sum(CASE WHEN nation = 'NATION_5' THEN CAST(volume AS DECIMAL(18,4))
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        | / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |    l_extendedprice*(1-l_discount) AS volume, n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_tpch_09" ->
      s"""WITH $SupplySql
         |SELECT nation, o_year,
         | CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
         |FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |    CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
         |      - CAST(ps_supplycost*l_quantity*0.01 AS DECIMAL(18,4)) AS amount
         |  FROM part JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN supply ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%') profit
         |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_10" ->
      """SELECT c_custkey, c_name,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_11" ->
      s"""WITH $SupplySql,
         |nat AS (SELECT ps_partkey, ps_supplycost, ps_availqty
         |  FROM supply JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
         |v AS (SELECT ps_partkey,
         |    CAST(sum(CAST(ps_supplycost*ps_availqty AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value
         |  FROM nat GROUP BY ps_partkey),
         |tot AS (SELECT CAST(sum(value) AS DECIMAL(38,2)) AS total FROM v)
         |SELECT ps_partkey, CAST(value AS DOUBLE) AS value
         |FROM v, tot WHERE value * 1000 > total
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q_tpch_12" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_tpch_13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_14" ->
      """SELECT 100.0
        | * CAST(sum(CASE WHEN p_type = 'PROMO'
        |     THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        | / CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,

    "q_tpch_15" ->
      """WITH revenue AS (SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_16" ->
      s"""WITH $SupplySql
         |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM supply JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
         |  AND p_size IN (1,14,23,45,19,3,36,9)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_17" ->
      """WITH pa AS (SELECT l_partkey AS a_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN pa ON a_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        |  AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "q_tpch_18" ->
      """WITH big AS (SELECT l_orderkey AS b_orderkey
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT b_orderkey FROM big)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,

    "q_tpch_19" ->
      """SELECT CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity >= 1 AND l_quantity <= 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity >= 10 AND l_quantity <= 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    "q_tpch_20" ->
      s"""WITH $SupplySql,
         |yr AS (SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS year_qty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY l_partkey, l_suppkey),
         |red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
         |qual AS (SELECT DISTINCT ps_suppkey
         |  FROM supply JOIN red ON ps_partkey = p_partkey
         |  JOIN yr ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |  WHERE ps_availqty > 0.5 * year_qty)
         |SELECT s_name FROM supplier JOIN qual ON s_suppkey = ps_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_7'
         |ORDER BY s_name""".stripMargin,

    "q_tpch_21" ->
      """WITH l1 AS (SELECT l_orderkey AS k1_orderkey,
        |    l_suppkey AS k1_suppkey, o_orderdate AS k1_odate
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM l1 JOIN supplier ON k1_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_4'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = k1_orderkey AND l2.l_suppkey <> k1_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = k1_orderkey AND l3.l_suppkey <> k1_suppkey
        |      AND l3.l_shipdate > k1_odate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q_tpch_22" ->
      """WITH pos AS (SELECT CAST(c_nationkey % 10 AS VARCHAR) AS cntrycode,
        |    c_acctbal, c_custkey
        |  FROM customer WHERE c_nationkey % 10 IN (1,3,5,7,9)),
        |avg_bal AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS ab
        |  FROM pos WHERE c_acctbal > 0.0)
        |SELECT cntrycode, count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM pos, avg_bal
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
  )
}
