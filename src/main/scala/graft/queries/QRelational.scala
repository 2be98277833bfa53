package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** SparkEntry query family (split from the single-file inventory
  * in round 14 — same query names, same bodies; SparkEntry
  * assembles the full map and the driver contract). */
private[graft] object QRelational {


  val relational: Seq[(String, Q)] = Seq(
    "q_scan_filter" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") <  ts("1997-01-01 00:00:00") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n")),
      Some("""SELECT CAST(round(sum(CAST(round(l_extendedprice*l_discount, 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    "q1_agg" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
             moneySum(col("l_extendedprice")).as("sum_base_price"),
             moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
             round(avg("l_quantity"), 4).as("avg_qty"),
             round(avg("l_discount"), 4).as("avg_disc"),
             count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       round(sum(l_quantity),2) AS sum_qty,
             |       CAST(round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS sum_base_price,
             |       CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS sum_disc_price,
             |       round(avg(l_quantity),4) AS avg_qty,
             |       round(avg(l_discount),4) AS avg_disc,
             |       CAST(count(*) AS BIGINT) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q3_join_topk" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
        val l = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey")
          .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey=o_custkey
             |              JOIN lineitem ON l_orderkey=o_orderkey
             |WHERE c_mktsegment='BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
             |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    "q5_multi_join" -> Q(
      (s, d) => {
        val dims = Tables.supplier(s, d)
          .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
                col("n_regionkey") === col("r_regionkey"))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                  col("o_orderdate") <  ts("1997-01-01 00:00:00"))
        Tables.lineitem(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(dims),
                col("l_suppkey") === col("s_suppkey") &&
                col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey=o_custkey
             |              JOIN lineitem ON l_orderkey=o_orderkey
             |              JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
             |              JOIN nation ON s_nationkey=n_nationkey
             |              JOIN region ON n_regionkey=r_regionkey
             |WHERE r_name='ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    "q7_year_volume" -> Q(
      (s, d) => {
        val n = Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_3", "NATION_7"))
        Tables.lineitem(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
          .orderBy("n_name", "l_year")
      },
      Some("""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |       CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS volume
             |FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
             |              JOIN nation ON s_nationkey=n_nationkey
             |WHERE n_name IN ('NATION_3','NATION_7')
             |GROUP BY n_name, l_year ORDER BY n_name, l_year""".stripMargin)),

    "q12_cond_agg" -> Q(
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
                col("l_shipdate") <  ts("1998-01-01 00:00:00"))
        .groupBy("l_linestatus")
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
               .otherwise(0)).as("high_line_count"),
             sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
               .otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey=l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    "q14_promo_ratio" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= ts("1997-09-01 00:00:00") &&
                col("l_shipdate") <  ts("1997-10-01 00:00:00"))
        .agg(round(
          moneySumRaw(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(0.0)) * 100.0 /
          moneySumRaw(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("promo_revenue")),
      Some("""SELECT round(
             |  sum(CAST(round(CASE WHEN p_type = 'PROMO'
             |      THEN l_extendedprice*(1-l_discount) ELSE 0.0 END, 4)
             |      AS DECIMAL(20,4))) * 100.0 /
             |  sum(CAST(round(l_extendedprice*(1-l_discount), 4)
             |      AS DECIMAL(20,4))), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey=p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin)),

    "q19_disjunct" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
           col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
           col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
           col("l_quantity").between(20, 30)))
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n")),
      Some("""SELECT CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lineitem JOIN part ON l_partkey=p_partkey
             |WHERE (p_brand='Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand='Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand='Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    "q_semi_anti" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).select(col("o_custkey"))
        val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        withOrders.agg(count(lit(1)).as("n_with"))
          .crossJoin(withoutOrders.agg(count(lit(1)).as("n_without")))
      },
      Some("""SELECT
             |  (SELECT CAST(count(*) AS BIGINT) FROM customer
             |   WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with,
             |  (SELECT CAST(count(*) AS BIGINT) FROM customer
             |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without""".stripMargin)),

    "q17_avg_subquery" -> Q(
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val avgQty = l.groupBy(col("l_partkey").as("ap"))
          .agg((avg("l_quantity") * 0.5).as("half_avg"))
        l.join(broadcast(avgQty), col("l_partkey") === col("ap"))
          .filter(col("l_quantity") < col("half_avg"))
          .agg(round(moneySumRaw(col("l_extendedprice")) / 7.0, 2).cast("double").as("avg_yearly"),
               count(lit(1)).as("n"))
      },
      Some("""SELECT round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))) / 7.0, 2) AS avg_yearly,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS ap, avg(l_quantity) * 0.5 AS half_avg
             |      FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.ap
             |WHERE l.l_quantity < a.half_avg""".stripMargin)),

    "q_distinct_agg" -> Q(
      (s, d) => Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(countDistinct(col("s_suppkey")).as("n_supp"),
             round(sum("s_acctbal"), 2).as("total_bal"))
        .orderBy("n_name"),
      Some("""SELECT n_name, CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_supp,
             |       round(sum(s_acctbal), 2) AS total_bal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // approx sketch: HLL internals differ per engine, so the raw
    // estimate can't be value-oracled — instead the ERROR-BOUND
    // DECISION is: both engines emit the exact distinct count plus a
    // within-5% boolean (Spark derives it from its HLL++ estimate at
    // rsd=0.02; the oracle's TRUE is the spec the sketch must meet).
    // The estimate itself stays spec-asserted in RelationalSpec.
    "q_approx_distinct" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
             countDistinct(col("l_orderkey")).as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx_orders") - col("n_exact"))
            <= col("n_exact") * 0.05).as("within_5pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
             |       TRUE AS within_5pct
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXISTS/semi-join shape (TPC-H Q4): orders with at least one
    // late-shipped lineitem, counted by priority
    "q4_priority_exists" -> Q(
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
             |FROM orders WHERE EXISTS (
             |  SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey
             |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // returned-item revenue ranking (TPC-H Q10 shape)
    "q10_returns" -> Q(
      (s, d) => Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, n_name,
             |       CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
             |              JOIN customer ON o_custkey=c_custkey
             |              JOIN nation ON c_nationkey=n_nationkey
             |WHERE l_returnflag='R'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // distinct-supplier counts per brand/type (TPC-H Q16 shape;
    // partsupp emulated by lineitem's (partkey, suppkey) pairs)
    "q16_supplier_cnt" -> Q(
      (s, d) => Tables.part(s, d).filter(col("p_brand") =!= "Brand#45")
        .join(Tables.lineitem(s, d).select("l_partkey", "l_suppkey"),
          col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type")),
      Some("""SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM part JOIN lineitem ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#45'
             |GROUP BY p_brand, p_type
             |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin)),

    // large-volume orders (TPC-H Q18 shape: HAVING-subquery + join)
    "q18_big_orders" -> Q(
      (s, d) => {
        val big = Tables.lineitem(s, d).groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sq")).filter(col("sq") > 250)
        big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("total_price"),
            round(col("sq"), 2).as("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, round(o_totalprice,2) AS total_price,
             |       round(sq,2) AS sum_qty
             |FROM (SELECT l_orderkey, sum(l_quantity) AS sq FROM lineitem
             |      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
             |JOIN orders ON l_orderkey=o_orderkey
             |JOIN customer ON o_custkey=c_custkey
             |ORDER BY sum_qty DESC, o_orderkey LIMIT 20""".stripMargin)),

    // ROLLUP subtotals + grand total
    "agg_rollup" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |       coalesce(l_linestatus, 'ALL') AS ls,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity),2) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // national market share per ship-year (TPC-H Q8 shape: ratio of
    // conditional to total revenue inside one aggregation)
    "q8_market_share" -> Q(
      (s, d) => {
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        Tables.lineitem(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(
            moneySumRaw(when(col("n_name") === "NATION_3", rev).otherwise(0.0))
              / moneySumRaw(rev), 6).cast("double").as("share"))
          .orderBy("l_year")
      },
      Some("""SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |       round(sum(CAST(round(CASE WHEN n_name = 'NATION_3'
             |                      THEN l_extendedprice*(1-l_discount)
             |                      ELSE 0.0 END, 4) AS DECIMAL(20,4))) /
             |             sum(CAST(round(l_extendedprice*(1-l_discount), 4)
             |                 AS DECIMAL(20,4))), 6) AS share
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |              JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY l_year ORDER BY l_year""".stripMargin)),

    // period-over-period growth: nation×year revenue (one hash agg)
    // then lag() inside the per-nation partition — the window input is
    // the AGGREGATED frame (|nations|·|years| rows), never the fact
    // table, so the lag partition is bounded by the year range
    "q_yoy_growth" -> Q(
      (s, d) => {
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        val w = Window.partitionBy("n_name").orderBy("l_year")
        Tables.lineitem(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(moneySum(rev).as("revenue"))
          .withColumn("prev", lag("revenue", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("n_name"), col("l_year"), col("revenue"),
                  round((col("revenue") - col("prev")) / col("prev"), 4).as("yoy"))
          .orderBy("n_name", "l_year")
      },
      Some("""WITH r AS (
             |  SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |         CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |                JOIN nation ON s_nationkey = n_nationkey
             |  GROUP BY n_name, l_year),
             |g AS (SELECT n_name, l_year, revenue,
             |             lag(revenue) OVER (PARTITION BY n_name ORDER BY l_year) AS prev
             |      FROM r)
             |SELECT n_name, l_year, revenue,
             |       round((revenue - prev) / prev, 4) AS yoy
             |FROM g WHERE prev IS NOT NULL
             |ORDER BY n_name, l_year""".stripMargin)),

    // left outer join with null-aware counting: customers with zero
    // orders survive into the 0 bucket
    "q_outer_join" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders"),
      Some("""SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers FROM (
             |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey)
             |GROUP BY n_orders ORDER BY n_orders""".stripMargin)),

    // set operators: INTERSECT / EXCEPT / UNION over yearly customer
    // cohorts
    "q_set_ops" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
        def cohort(y: String) = o
          .filter(col("o_orderdate") >= ts(s"$y-01-01 00:00:00") &&
                  col("o_orderdate") < ts(s"${y.toInt + 1}-01-01 00:00:00"))
          .select("o_custkey").distinct()
        val c96 = cohort("1996"); val c97 = cohort("1997")
        c96.intersect(c97).agg(count(lit(1)).as("n_both"))
          .crossJoin(c96.except(c97).agg(count(lit(1)).as("n_only96")))
          .crossJoin(c96.union(c97).distinct().agg(count(lit(1)).as("n_union")))
      },
      Some("""WITH c96 AS (SELECT DISTINCT o_custkey FROM orders
             |             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |               AND o_orderdate < TIMESTAMP '1997-01-01'),
             |c97 AS (SELECT DISTINCT o_custkey FROM orders
             |        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |          AND o_orderdate < TIMESTAMP '1998-01-01')
             |SELECT
             |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM c96 INTERSECT SELECT * FROM c97)) AS n_both,
             |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c97)) AS n_only96,
             |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM c96 UNION SELECT * FROM c97)) AS n_union""".stripMargin)),

    // time-series gap filling: dense per-user hour spine (sequence +
    // left join), zero-filled counts — µs hours both sides
    "ts_gap_fill" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("user_id") < 3)
          .select(col("user_id"), expr("ts DIV 1000 DIV 3600000000").as("hour"))
        val counts = ev.groupBy("user_id", "hour").agg(count(lit(1)).as("cnt"))
        val span = ev.groupBy("user_id").agg(min("hour").as("h0"), max("hour").as("h1"))
        span.select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
          .join(counts, Seq("user_id", "hour"), "left")
          .select(col("user_id"), col("hour"), coalesce(col("cnt"), lit(0L)).as("n"))
          .orderBy("user_id", "hour")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour
             |           FROM events WHERE user_id < 3),
             |c AS (SELECT user_id, hour, CAST(count(*) AS BIGINT) AS cnt
             |      FROM e GROUP BY user_id, hour),
             |s AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
             |      FROM e GROUP BY user_id),
             |h AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM s)
             |SELECT h.user_id, h.hour, coalesce(cnt, 0) AS n
             |FROM h LEFT JOIN c ON h.user_id = c.user_id AND h.hour = c.hour
             |ORDER BY h.user_id, h.hour""".stripMargin)),

    // above-average holders with no orders (TPC-H Q22 shape:
    // uncorrelated avg subquery + anti join)
    "q22_no_orders" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("ab"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("ab"))
          .join(Tables.orders(s, d).select(col("o_custkey")),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             |       round(sum(c_acctbal), 2) AS total_bal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // forecast revenue change (TPC-H Q6: pure filter + agg, the
    // pushdown-everything query)
    "q6_forecast" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1997-01-01 00:00:00") &&
                col("l_discount").between(0.02, 0.04) &&
                col("l_quantity") < 24)
        .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue")),
      Some("""SELECT CAST(round(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin)),

    // customer order-count distribution (TPC-H Q13: outer join →
    // two-level aggregation)
    "q13_cust_dist" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
             |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // top supplier by revenue window (TPC-H Q15: agg view + global
    // max as a broadcast 1-row frame — never a global sort)
    "q15_top_supplier" -> Q(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                  col("l_shipdate") < ts("1996-04-01 00:00:00"))
          .groupBy(col("l_suppkey"))
          .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("total_revenue"))
        rev.crossJoin(broadcast(rev.agg(max("total_revenue").as("mr"))))
          .filter(col("total_revenue") === col("mr"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey, CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // waiting-supplier shape (TPC-H Q21: per-order EXISTS another
    // supplier + NOT EXISTS another supplier matching the predicate;
    // returnflag stands in for the missing commit/receipt dates)
    "q21_shape" -> Q(
      (s, d) => {
        // EXISTS(other supplier) + NOT EXISTS(other R-supplier) folds
        // into ONE per-order aggregate: an R-lineitem waits iff its
        // order has >1 distinct supplier and exactly 1 distinct
        // R-supplier (necessarily this one) — 1 agg + 1 join instead
        // of two distinct self-joins (the naive 2×semi/anti plan
        // measured 3.6 s at sf0.1; this shape is the map-side-combinable
        // form that scales)
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_returnflag")
        // two-level agg instead of countDistinct×2: no Expand, both
        // levels map-side combinable, shared (orderkey) shuffle prefix
        val perOrder = li.groupBy("l_orderkey", "l_suppkey")
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"), sum("has_r").as("n_supp_r"))
          .filter(col("n_supp") > 1 && col("n_supp_r") === 1)
          .select("l_orderkey")
        li.filter(col("l_returnflag") === "R")
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
          .join(perOrder, "l_orderkey")
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      // oracle in the same per-order-aggregate derivation as the
      // engine (EXISTS(other supplier) = n_supp > 1; NOT EXISTS(other
      // R-supplier) = exactly one distinct R-supplier, necessarily
      // this row's): the literal correlated-EXISTS form is quadratic
      // in the hot order's line count — the round-17 skewed flush's
      // 29%-hot l_orderkey put DuckDB's mark-join residual at ~5.2M²
      // pair evaluations and it ground for 15+ min before being
      // killed (same escape class as the attribution/episode pair
      // oracles)
      Some("""WITH po AS (
             |  SELECT l_orderkey FROM (
             |    SELECT l_orderkey, l_suppkey,
             |           max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
             |    FROM lineitem GROUP BY 1, 2)
             |  GROUP BY l_orderkey
             |  HAVING count(*) > 1 AND sum(has_r) = 1)
             |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |JOIN po ON po.l_orderkey = l1.l_orderkey
             |WHERE l1.l_returnflag = 'R'
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin)),

    // min-cost supplier per part within a region (TPC-H Q2 shape:
    // correlated-min subquery). This dataset has no partsupp, so the
    // supply relation is emulated from lineitem's observed
    // (part, supplier) unit prices. cost = MIN over per-row ROUNDED
    // unit prices — a plain min of values both engines compute
    // identically per row, so the min-equality join below is exact
    // (never a min over an order-dependent double sum). The per-part
    // min is a second groupBy on the already-aggregated sc frame
    // (|parts|·|suppliers-per-part| rows), then an equi-join back —
    // both sides shuffle on partkey so AQE can co-locate them; at
    // 100 TB the fact scan is the only big input and it is aggregated
    // before any join
    "q2_min_cost" -> Q(
      (s, d) => {
        val sc = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_extendedprice") / col("l_quantity"), 4).as("unit"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("l_partkey", "l_suppkey").agg(min("unit").as("cost"))
        // r17: per-part min as a window on the (l_partkey) exchange the
        // old min-aggregate needed anyway — the self-join re-ran the
        // whole lineitem⨝supplier⨝nation⨝region subtree a second time
        // (Catalyst does not dedup common subtrees across a join).
        // min over doubles is order-exact; the filter keeps exactly the
        // join's (cost = min_cost) rows.
        val wp = Window.partitionBy("l_partkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        sc.withColumn("min_cost", min("cost").over(wp))
          .filter(col("cost") === col("min_cost"))
          .join(Tables.part(s, d).filter(col("p_size") === 11),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            round(col("s_acctbal"), 2).as("acctbal"), col("cost"))
          .orderBy(col("acctbal").desc, col("s_name"), col("p_partkey"))
          .limit(20)
      },
      Some("""WITH sc AS (
             |  SELECT l_partkey, l_suppkey,
             |         min(round(l_extendedprice / l_quantity, 4)) AS cost
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |                JOIN nation ON s_nationkey = n_nationkey
             |                JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'ASIA'
             |  GROUP BY l_partkey, l_suppkey)
             |SELECT p_partkey, p_name, s_name, round(s_acctbal,2) AS acctbal, cost
             |FROM sc JOIN part ON l_partkey = p_partkey
             |        JOIN supplier ON l_suppkey = s_suppkey
             |WHERE p_size = 11
             |  AND cost = (SELECT min(cost) FROM sc sc2
             |              WHERE sc2.l_partkey = sc.l_partkey)
             |ORDER BY acctbal DESC, s_name, p_partkey LIMIT 20""".stripMargin)),

    // product-line profit per nation per year (TPC-H Q9 shape:
    // name-substring part filter + 4-way join + two-level group key;
    // p_retailprice·qty·0.6 stands in for the missing ps_supplycost).
    // The part filter is applied BEFORE the join so only matching
    // partkeys reach the shuffle; nation broadcast; one hash agg
    "q9_profit" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("widget"))
            .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("o_year"))
        // per-row profit term rounded to 4 then summed EXACTLY as
        // decimal: a double sum's last-ulp merge-order noise flipped
        // the 2dp round at one sf0.001 group (507905.465 boundary) —
        // identical rounded addends + exact decimal addition make the
        // group total engine- and order-invariant
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            - col("p_retailprice") * col("l_quantity") * lit(0.6), 4)
            .cast("decimal(20,4)")), 2)
          .cast("double").as("profit"))
        .orderBy(col("n_name"), col("o_year").desc),
      Some("""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
             |       CAST(round(sum(CAST(round(l_extendedprice*(1-l_discount)
             |                 - p_retailprice*l_quantity*0.6, 4)
             |                 AS DECIMAL(20,4))), 2) AS DOUBLE) AS profit
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |              JOIN supplier ON l_suppkey = s_suppkey
             |              JOIN nation ON s_nationkey = n_nationkey
             |WHERE p_name LIKE '%widget%'
             |GROUP BY n_name, o_year
             |ORDER BY n_name, o_year DESC""".stripMargin)),

    // important-stock value ranking (TPC-H Q11 shape: per-part value
    // restricted to one nation's suppliers, kept only when above a
    // fraction of the TOTAL value — an uncorrelated scalar subquery).
    // The total is the 1-row re-aggregation of the per-part frame,
    // broadcast back; the fact table is aggregated before the
    // threshold compare, so the scalar subquery costs one extra
    // reduce over |parts| rows, not a second fact scan
    "q11_important_stock" -> Q(
      (s, d) => {
        val v = Tables.lineitem(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("l_partkey")
          .agg(moneySum(col("l_extendedprice")).as("part_value"))
        v.crossJoin(broadcast(v.agg(sum("part_value").as("tot"))))
          .filter(col("part_value") > col("tot") * lit(0.001))
          .select(col("l_partkey").as("partkey"), col("part_value"))
          .orderBy(col("part_value").desc, col("partkey"))
      },
      Some("""WITH v AS (
             |  SELECT l_partkey, CAST(round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2) AS DOUBLE) AS part_value
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |                JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name = 'NATION_7'
             |  GROUP BY l_partkey)
             |SELECT l_partkey AS partkey, part_value
             |FROM v WHERE part_value > (SELECT sum(part_value) FROM v) * 0.001
             |ORDER BY part_value DESC, partkey""".stripMargin)),

    // dominant-share suppliers of promoted parts (TPC-H Q20 shape:
    // nested aggregate subquery feeding a semi-join; availqty>½·qty
    // becomes "this supplier shipped >30% of the part's 1997 volume"
    // since there is no partsupp). Both aggregates share the same
    // filtered 1997 scan and the same partkey shuffle prefix;
    // l_quantity is integral so the sums are exact in double and the
    // 0.3·tq compare is bit-identical across engines
    "q20_part_promotion" -> Q(
      (s, d) => {
        val li97 = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
                  col("l_shipdate") < ts("1998-01-01 00:00:00"))
          .select("l_partkey", "l_suppkey", "l_quantity")
        val byPS = li97.groupBy("l_partkey", "l_suppkey")
          .agg(sum("l_quantity").as("sq"))
        val byP = li97.groupBy(col("l_partkey").as("tp_partkey"))
          .agg(sum("l_quantity").as("tq"))
        val qual = byPS.join(byP, col("l_partkey") === col("tp_partkey"))
          .join(Tables.part(s, d).filter(col("p_name").startsWith("small"))
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .filter(col("sq") > col("tq") * lit(0.3))
          .select("l_suppkey").distinct()
        Tables.supplier(s, d)
          .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select("s_name", "n_name")
          .orderBy("s_name")
      },
      Some("""WITH li97 AS (
             |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1998-01-01'),
             |ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
             |       FROM li97 GROUP BY 1, 2),
             |pt AS (SELECT l_partkey, sum(l_quantity) AS tq FROM li97 GROUP BY 1)
             |SELECT s_name, n_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_suppkey IN (
             |  SELECT ps.l_suppkey FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
             |  JOIN part ON ps.l_partkey = p_partkey
             |  WHERE p_name LIKE 'small%' AND ps.sq > pt.tq * 0.3)
             |ORDER BY s_name""".stripMargin)),

    // analytic-window breadth: lead/lag/percent_rank/cume_dist per
    // customer order history (partitioned — never global). The order
    // keys carry the unique o_orderkey tiebreaker, so rank ≡
    // row_number and percent_rank/cume_dist are EXACTLY (rn−1)/(n−1)
    // and rn/n — and their 4dp display rides the exact-integer
    // half-up idiom ⌊(2·p·scale + q) DIV (2q)⌋/scale instead of
    // round(double): the skewed sf3 flush (zipf s=1.5) made the
    // o_custkey<50 head a 3.4M-row partition, where round(cume_dist)
    // landed on the .00005 double boundary 21 times and Spark's
    // shortest-string round disagreed with DuckDB's binary-value
    // round — the same class the sf1 flush caught on keep_ratio.
    "win_analytics" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val w2 = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
        val wn = Window.partitionBy("o_custkey")
        Tables.orders(s, d).filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            row_number().over(w2).cast("long").as("rn"),
            count(lit(1)).over(wn).as("n"))
          .select(col("o_custkey"), col("o_orderkey"),
            col("prev_price"), col("next_price"),
            when(col("n") === 1, lit(0.0)).otherwise(
              expr("CAST(((rn - 1) * 20000 + (n - 1)) DIV ((n - 1) * 2) AS DOUBLE)")
                / 10000.0).as("pr"),
            (expr("CAST((rn * 20000 + n) DIV (n * 2) AS DOUBLE)") / 10000.0)
              .as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""WITH base AS (
             |  SELECT o_custkey, o_orderkey,
             |    lag(o_totalprice, 1) OVER w1 AS prev_price,
             |    lead(o_totalprice, 1) OVER w1 AS next_price,
             |    row_number() OVER w2 AS rn,
             |    count(*) OVER (PARTITION BY o_custkey) AS n
             |  FROM orders WHERE o_custkey < 50
             |  WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |         w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey))
             |SELECT o_custkey, o_orderkey, prev_price, next_price,
             |  CASE WHEN n = 1 THEN 0.0 ELSE
             |    CAST(((rn - 1) * 20000 + (n - 1)) // ((n - 1) * 2) AS DOUBLE)
             |      / 10000.0 END AS pr,
             |  CAST((rn * 20000 + n) // (n * 2) AS DOUBLE) / 10000.0 AS cd
             |FROM base
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // explicit GROUPING SETS with grouping_id disambiguation
    "agg_grouping_sets" -> Q(
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_li_gs")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |       CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                |       CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
                |       CAST(count(*) AS BIGINT) AS n,
                |       round(sum(l_quantity), 2) AS qty
                |FROM graft_li_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
             |       CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
             |       CAST(count(*) AS BIGINT) AS n,
             |       round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)),

    // PIVOT with explicit values (no distinct-collect job — the
    // scale-safe pivot) vs conditional-aggregation oracle
    "agg_pivot" -> Q(
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(s, d).groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // CUBE over two dims
    // total rides the engine-wide moneySum DECIMAL discipline: the
    // sf3 flush caught the raw double sum's merge-order noise landing
    // the cube's grand-total row (4.5M terms) on a 2dp boundary
    "agg_cube" -> Q(
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
                col("n"), col("total"))
        .orderBy("st", "pri"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
             |       coalesce(o_orderpriority, 'ALL') AS pri,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(round(sum(CAST(round(o_totalprice, 4) AS DECIMAL(20,4))), 2)
             |            AS DOUBLE) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY st, pri""".stripMargin)),

    // sliding-frame window aggregate (7-row moving average per user);
    // µs timestamps both sides (see ev_asof_join)
    "win_moving_avg" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ats"), col("event_id")).rowsBetween(-6, 0)
        Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"),
                  expr("ts DIV 1000").as("ats"), col("value"))
          .withColumn("mavg", round(avg("value").over(w), 4))
          .select("user_id", "event_id", "ats", "mavg")
          .orderBy("user_id", "ats", "event_id")
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ats,
             |       round(avg(value) OVER (
             |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mavg
             |FROM events WHERE user_id < 5
             |ORDER BY user_id, ats, event_id""".stripMargin)),

    // RANGE window frame (peers by value, not row count): running
    // 1h-lookback sum per user — µs timestamps both sides
    "win_range_frame" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ats"))
          .rangeBetween(-3600000000L, 0)
        Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"),
                  expr("ts DIV 1000").as("ats"), col("value"))
          .withColumn("hr_sum", round(sum("value").over(w), 4))
          .select("user_id", "event_id", "ats", "hr_sum")
          .orderBy("user_id", "ats", "event_id")
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ats,
             |       round(sum(value) OVER (
             |         PARTITION BY user_id ORDER BY epoch_us(ts)
             |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS hr_sum
             |FROM events WHERE user_id < 5
             |ORDER BY user_id, ats, event_id""".stripMargin)),

    // ntile quartiles over a global ordering — scale path: a global
    // window would sort the whole table in ONE task; instead rank via
    // the range-partitioned distributed sort (ops/Ranking.scala) and
    // derive the quartile arithmetically from (rank, n).
    "win_ntile" -> Q(
      (s, d) => {
        val cust = Tables.customer(s, d).select("c_acctbal", "c_custkey")
        val n = cust.count()
        graft.ops.Ranking
          .withGlobalRank(cust, "rank", col("c_acctbal").desc, col("c_custkey"))
          .withColumn("quartile", graft.ops.Ranking.ntileFromRank("rank", n, 4))
          .groupBy("quartile")
          .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
          .orderBy("quartile")
      },
      Some("""SELECT quartile, CAST(count(*) AS BIGINT) AS n,
             |       round(avg(c_acctbal), 4) AS avg_bal
             |FROM (SELECT c_acctbal, ntile(4) OVER (
             |        ORDER BY c_acctbal DESC, c_custkey) AS quartile
             |      FROM customer)
             |GROUP BY quartile ORDER BY quartile""".stripMargin)),

    // top-n per group via the bounded TopK partial aggregate — the
    // same operator that powers batched ANN, on a relational column
    "top2_per_nation" -> Q(
      (s, d) => {
        val agg = graft.ops.TopK.topk(2)
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(agg(col("s_acctbal"), col("s_suppkey")).as("top"))
          .select(col("n_name"), posexplode(col("top")))
          .select(col("n_name"), col("col.id").as("s_suppkey"),
                  col("col.score").as("acctbal"),
                  (col("pos") + 1).cast("long").as("rnk"))
          .orderBy("n_name", "rnk")
      },
      Some("""SELECT n_name, s_suppkey, acctbal, rnk FROM (
             |  SELECT n_name, s_suppkey, s_acctbal AS acctbal,
             |         CAST(row_number() OVER (PARTITION BY n_name
             |           ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rnk
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
             |WHERE rnk <= 2 ORDER BY n_name, rnk""".stripMargin)),

    // exact interpolated percentiles per group (events.value)
    "stat_percentiles" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             expr("percentile(value, array(0.5D, 0.95D))").as("ps"))
        .select(col("event_type"), col("n"),
                round(element_at(col("ps"), 1), 4).as("p50"),
                round(element_at(col("ps"), 2), 4).as("p95"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       round(quantile_cont(value, 0.5), 4) AS p50,
             |       round(quantile_cont(value, 0.95), 4) AS p95
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // salted two-phase aggregation: identical result to a plain
    // groupBy (the oracle), but hot keys fan out over 16 salt
    // buckets in phase 1 — the skew-safe shape for power-law keys
    "agg_salted_hot" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"), pmod(col("event_id"), lit(16)).as("salt"))
        .agg(count(lit(1)).as("c"), sum("value").as("sv"))
        .groupBy("event_type")
        .agg(sum("c").as("n"), round(sum("sv"), 4).as("sum_value"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       round(sum(value), 4) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q_window_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        Tables.part(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
          .select("p_brand", "p_partkey", "rn")
          .orderBy("p_brand", "rn")
      },
      Some("""SELECT p_brand, p_partkey, rn FROM (
             |  SELECT p_brand, p_partkey,
             |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) WHERE rn <= 2 ORDER BY p_brand, rn""".stripMargin)),

    // skyline / Pareto frontier over (min p_retailprice, max p_size):
    // the quadratic NOT-EXISTS definition reformulates as a LINEAR
    // staircase scan — collapse to per-price max size, running max
    // over strictly-cheaper prices, keep prices whose max beats it,
    // then one equi-join recovers the tied part rows. The only global
    // window runs over DISTINCT prices (bounded by the price-grid
    // domain, cents not rows — the stat_gini value-level argument);
    // the oracle IS the quadratic NOT EXISTS, proving the staircase
    // loses nothing.
    "q_skyline" -> Q(
      (s, d) => {
        val parts = Tables.part(s, d)
          .select("p_partkey", "p_retailprice", "p_size")
        val byPrice = parts.groupBy("p_retailprice")
          .agg(max("p_size").as("smax"))
        val w = Window.orderBy("p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = byPrice
          .withColumn("m", max("smax").over(w))
          .filter(col("m").isNull || col("smax") > col("m"))
          .select("p_retailprice", "smax")
        parts.join(broadcast(frontier), "p_retailprice")
          .filter(col("p_size") === col("smax"))
          .select("p_partkey", "p_retailprice", "p_size")
          .orderBy("p_partkey")
      },
      // ORACLE SCALE IDIOM (sf10 flush): the NOT EXISTS dominance
      // spec decorrelates to an O(n²) mark join — 4e12 comparisons
      // over 2M parts at sf10. The oracle now mirrors the engine's
      // n·log·n frontier: per-price-level max size, running max over
      // strictly-cheaper levels (exclusive frame), survivors are the
      // level maxima that strictly exceed it. Identical semantics
      // incl. ties (equal (price,size) duplicates all survive;
      // same-price smaller-size rows are dominated) — hash-green at
      // sf0.01/sf0.1 against the same dumps the quadratic spec
      // matched.
      Some("""WITH lv AS (SELECT p_retailprice AS pr, max(p_size) AS smax
             |            FROM part GROUP BY 1),
             |rm AS (SELECT pr, smax,
             |              max(smax) OVER (ORDER BY pr
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runlt
             |       FROM lv),
             |sk AS (SELECT pr, smax FROM rm WHERE runlt IS NULL OR smax > runlt)
             |SELECT p_partkey, p_retailprice, p_size
             |FROM part JOIN sk ON p_retailprice = sk.pr AND p_size = sk.smax
             |ORDER BY p_partkey""".stripMargin)),

    // market-basket pair mining with A-Priori pruning: restrict to
    // FREQUENT items (item support ≥ 20 orders) BEFORE the per-order
    // self-join — the candidate-pair explosion runs over frequent
    // items only, the monotonicity argument that makes pair mining
    // tractable at catalog scale (an infrequent item can never be in
    // a frequent pair, so pruning loses nothing). Baskets larger than
    // BasketCap frequent items are EXCLUDED before pairing: one
    // pathological giant order is quadratic, and a 100+-item "basket"
    // is a crawler/bot artifact, not co-purchase signal (TPC-H
    // baskets are ≤7 lines — the cap never binds on honest data and
    // is mirrored in the oracle). The basket list is checkpointed
    // (read by the frequency agg AND both join sides); pairs need
    // n_both ≥ 2; report = top-20 by lift, ordered on the ROUNDED
    // value so a boundary pair cannot flip engines.
    "q_basket_pairs" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey").distinct()
          .localCheckpoint(eager = false)
        val freq = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 20)
        val fli = li.join(freq.select("l_partkey"), Seq("l_partkey"), "left_semi")
        // ONE grouped pass per order, size-gated BEFORE the pair
        // explode: the quadratic risk in basket mining is the C(n,2)
        // pair fan-out, which the cap bounds at C(cap,2); the grouped
        // list itself is linear in ONE order's size (order-bounded,
        // not corpus-bounded — unlike the LSH buckets, which needed
        // the TopK buffer because a bucket can hold the whole corpus)
        // r17: generate each unordered pair ONCE (posexplode + strict-
        // suffix slice → C(n,2) rows) instead of the n² explode×explode
        // + value filter — half the generated rows and array copies,
        // all codegen (no interpreted HOF lambda — the cdc-kernel
        // lesson). Basket items are distinct, so (least, greatest) of a
        // position-pair enumerates exactly the value-ordered pairs the
        // old filter kept; the grouped counts are identical integers.
        val pc = fli.groupBy("l_orderkey")
          .agg(collect_list("l_partkey").as("ps"))
          .filter(size(col("ps")).between(2, QDsl.BasketCap))
          .select(posexplode(col("ps")).as(Seq("i", "pa")), col("ps"))
          .select(col("pa"), explode(slice(col("ps"), col("i") + 2,
            greatest(size(col("ps")) - col("i") - 1, lit(0)))).as("pb"))
          .select(least(col("pa"), col("pb")).as("pa"),
                  greatest(col("pa"), col("pb")).as("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
          .filter(col("n_both") >= 2)
        val no = li.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_orders"))
        pc.join(broadcast(freq.toDF("pa", "n_a")), "pa")
          .join(broadcast(freq.toDF("pb", "n_b")), "pb")
          .crossJoin(broadcast(no))
          .select(col("pa"), col("pb"), col("n_both"),
            round(col("n_both") / col("n_orders").cast("double"), 6).as("support"),
            round(col("n_both").cast("double") * col("n_orders")
              / (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
          .orderBy(col("lift").desc, col("pa"), col("pb")).limit(20)
      },
      Some(s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |freq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
             |         FROM li GROUP BY l_partkey HAVING count(*) >= 20),
             |fli AS MATERIALIZED (SELECT li.* FROM li JOIN freq USING (l_partkey)),
             |ok AS (SELECT l_orderkey FROM fli GROUP BY 1
             |       HAVING count(*) <= ${QDsl.BasketCap}),
             |bli AS (SELECT fli.* FROM fli JOIN ok USING (l_orderkey)),
             |pc AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             |              CAST(count(*) AS BIGINT) AS n_both
             |       FROM bli a JOIN bli b
             |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |       GROUP BY pa, pb HAVING count(*) >= 2),
             |no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li)
             |SELECT pa, pb, n_both,
             |       round(n_both / CAST(n_orders AS DOUBLE), 6) AS support,
             |       round(CAST(n_both AS DOUBLE) * n_orders
             |             / (CAST(fa.c AS DOUBLE) * fb.c), 4) AS lift
             |FROM pc JOIN freq fa ON fa.l_partkey = pa
             |        JOIN freq fb ON fb.l_partkey = pb, no
             |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin)),

    // cohort LTV curve: customers cohorted by first-order month,
    // cumulative revenue per customer tracked over the first 6 months
    // of life — the "is newer acquisition worth less?" table. Orders
    // collapse to month grain in the ONE checkpointed pass (read by
    // cohort assignment AND revenue rollup); the customer-keyed join
    // carries the fact table once, cohort sizes broadcast back, and
    // the cumulative window runs on the |cohorts|×|ages| frame.
    // Per-cell revenue rounds to 6 BEFORE the running sum so both
    // engines accumulate identical cells.
    "q_ltv_cohort" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"),
            col("o_totalprice"))
          .localCheckpoint(eager = false)
        val first = o.groupBy("o_custkey").agg(min("m").as("m0"))
        val sizes = first.groupBy("m0").agg(count(lit(1)).as("n_cust"))
        // revenue sums as exact DECIMAL (the engine-wide moneySum
        // discipline): a plain double sum's merge-order noise landed
        // the 4dp ltv round on a boundary at sf0.1 (456325.0353 vs
        // .0352). The per-customer ltv then rounds in INTEGER
        // micro-units — round(cum/n, 4) as ⌊(2·cum·10⁴ + n)/(2n)⌋ —
        // because even with an exact cumulative, rounding the float
        // quotient diverges on .5 boundaries (Spark's round rides
        // BigDecimal.valueOf's shortest-string repr, DuckDB rounds
        // the binary value). Float appears only at display, as
        // exact_int/10⁴ — bit-identical on both engines.
        val rev = o.join(first, "o_custkey")
          .groupBy(col("m0"), (col("m") - col("m0")).as("age"))
          .agg(sum(round(col("o_totalprice"), 4).cast("decimal(20,4)")).as("rev"))
        val wC = Window.partitionBy("m0").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rev.join(broadcast(sizes), "m0")
          .withColumn("cum_rev", sum("rev").over(wC))
          .filter(col("age") <= 6)
          .select(col("m0").as("cohort_m"), col("age"), col("n_cust"),
            expr("CAST((CAST(cum_rev * 10000 AS BIGINT) * 2 + n_cust) " +
              "DIV (n_cust * 2) AS DOUBLE) / 10000.0").as("ltv"))
          .orderBy("cohort_m", "age")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |                  year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |                  o_totalprice
             |           FROM orders),
             |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey),
             |sz AS (SELECT m0, CAST(count(*) AS BIGINT) AS n_cust FROM f GROUP BY m0),
             |rev AS (SELECT m0, m - m0 AS age,
             |               sum(CAST(round(o_totalprice, 4) AS DECIMAL(20,4))) AS rev
             |        FROM o JOIN f USING (o_custkey) GROUP BY m0, age),
             |c AS (SELECT m0, age, rev,
             |             sum(rev) OVER (PARTITION BY m0 ORDER BY age
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
             |      FROM rev)
             |SELECT m0 AS cohort_m, age, n_cust,
             |       CAST((CAST(cum_rev * 10000 AS BIGINT) * 2 + n_cust)
             |            // (n_cust * 2) AS DOUBLE) / 10000.0 AS ltv
             |FROM c JOIN sz USING (m0) WHERE age <= 6
             |ORDER BY cohort_m, age""".stripMargin)),

    // open-order backlog series: orders opened minus orders fully
    // shipped, cumulated by month — the fulfillment-health curve.
    // Both sides collapse to month grain first (per-order max
    // shipdate = fulfillment month needs ONE lineitem rollup); the
    // full-outer month join and both running sums operate on the
    // |months|-row frame only.
    "q_order_backlog" -> Q(
      (s, d) => {
        val om = Tables.orders(s, d)
          .select((year(col("o_orderdate")) * 12
            + month(col("o_orderdate"))).cast("long").as("m"))
          .groupBy("m").agg(count(lit(1)).as("opened"))
        val fm = Tables.lineitem(s, d)
          .groupBy("l_orderkey").agg(max("l_shipdate").as("fd"))
          .select((year(col("fd")) * 12 + month(col("fd"))).cast("long").as("m"))
          .groupBy("m").agg(count(lit(1)).as("fulfilled"))
        val w = Window.orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        om.join(fm, Seq("m"), "full_outer")
          .na.fill(0L, Seq("opened", "fulfilled"))
          .withColumn("backlog",
            sum(col("opened") - col("fulfilled")).over(w))
          .select("m", "opened", "fulfilled", "backlog")
          .orderBy("m")
      },
      Some("""WITH om AS (SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |                   CAST(count(*) AS BIGINT) AS opened
             |            FROM orders GROUP BY m),
             |fo AS (SELECT l_orderkey, max(l_shipdate) AS fd FROM lineitem
             |       GROUP BY l_orderkey),
             |fm AS (SELECT year(fd) * 12 + month(fd) AS m,
             |              CAST(count(*) AS BIGINT) AS fulfilled
             |       FROM fo GROUP BY m)
             |SELECT m, coalesce(opened, 0) AS opened,
             |       coalesce(fulfilled, 0) AS fulfilled,
             |       CAST(sum(coalesce(opened, 0) - coalesce(fulfilled, 0))
             |         OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
             |               AND CURRENT ROW) AS BIGINT) AS backlog
             |FROM om FULL OUTER JOIN fm USING (m)
             |ORDER BY m""".stripMargin)))

  // regrouped from the round-named inventory files in round 15
  // (pure move — same query names, same bodies)
  val relationalR: Seq[(String, Q)] = Seq(
    // new-vs-returning revenue decomposition per month: each order
    // credited to 'new' iff its month is the customer's first — the
    // growth-accounting split for ORDERS (ev_growth_accounting covers
    // events). Per-customer first month is one hash aggregate joined
    // back on the scaling key; exact DECIMAL money sums.
    "q_new_vs_returning" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val o = Tables.orders(s, d).select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"),
            // integer cents: money sums must be order-invariant
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .localCheckpoint(eager = false) // first-month pass + credit pass
        val first = o.groupBy("o_custkey").agg(min("m").as("m0"))
        o.join(first, "o_custkey")
          .groupBy("m")
          .agg(
            sum(when(col("m") === col("m0"), col("cents"))
              .otherwise(0L).cast(dec)).as("nc"),
            sum(when(col("m") =!= col("m0"), col("cents"))
              .otherwise(0L).cast(dec)).as("rc"),
            countDistinct(when(col("m") === col("m0"), col("o_custkey")))
              .as("new_cust"),
            countDistinct(when(col("m") =!= col("m0"), col("o_custkey")))
              .as("ret_cust"))
          .select(col("m"),
            round(col("nc").cast("double") / 100, 2).as("new_rev"),
            round(col("rc").cast("double") / 100, 2).as("ret_rev"),
            col("new_cust"), col("ret_cust"),
            round(col("nc").cast("double")
              / (col("nc") + col("rc")).cast("double"), 4).as("new_share"))
          .orderBy("m")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |                  year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |           FROM orders),
             |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey)
             |SELECT m,
             |       round(CAST(sum(CASE WHEN m = m0 THEN cents ELSE 0 END) AS DOUBLE) / 100, 2) AS new_rev,
             |       round(CAST(sum(CASE WHEN m <> m0 THEN cents ELSE 0 END) AS DOUBLE) / 100, 2) AS ret_rev,
             |       CAST(count(DISTINCT CASE WHEN m = m0 THEN o_custkey END) AS BIGINT) AS new_cust,
             |       CAST(count(DISTINCT CASE WHEN m <> m0 THEN o_custkey END) AS BIGINT) AS ret_cust,
             |       round(CAST(sum(CASE WHEN m = m0 THEN cents ELSE 0 END) AS DOUBLE)
             |             / CAST(sum(cents) AS DOUBLE), 4) AS new_share
             |FROM o JOIN f USING (o_custkey)
             |GROUP BY m ORDER BY m""".stripMargin)),

    // order-to-ship lag SLA per month: mean and EXACT p95 of
    // (l_shipdate − o_orderdate) days — the fulfillment dashboard's
    // core line. The p95 is an order statistic walked over the
    // (month, lag) HISTOGRAM (lag is day-bounded — values, never
    // rows, the stat_mwu discipline), so the window input stays
    // ≤|lag domain| rows per month at any fact scale.
    "q_ship_lag" -> Q(
      (s, d) => {
        val j = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select(
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag"))
        val h = j.groupBy("m", "lag").agg(count(lit(1)).as("cnt"))
        // r17: totals ride the SAME per-month exchange as the cumsum
        // (guide §2.4 — two operations keyed the same way share one
        // exchange): the unordered full-partition window computes
        // n/sl beside the ordered cumulative window, replacing the
        // checkpoint + separate aggregate + broadcast join-back.
        // Integer sums — bit-identical per month either way.
        val wm = Window.partitionBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wc = Window.partitionBy("m").orderBy("lag")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // cum FIRST: the ordered window establishes the (m, lag) sort;
        // the unordered full-partition windows then reuse it (planned
        // after, they'd otherwise insert a second per-month sort)
        h.withColumn("cum", sum("cnt").over(wc))
          .withColumn("n", sum("cnt").over(wm))
          .withColumn("sl", sum(col("lag") * col("cnt")).over(wm))
          .filter(col("cum") >= ceil(col("n") * 0.95).cast("long"))
          .groupBy("m")
          .agg(max("n").as("n"),
            round(max(col("sl").cast("double") / col("n")), 4).as("avg_lag_days"),
            min("lag").as("p95_lag_days"))
          .orderBy("m")
      },
      Some("""WITH j AS (
             |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |         date_diff('day', CAST(o_orderdate AS DATE),
             |                   CAST(l_shipdate AS DATE)) AS lag
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |h AS (SELECT m, lag, CAST(count(*) AS BIGINT) AS cnt
             |      FROM j GROUP BY 1, 2),
             |t AS (SELECT m, CAST(sum(cnt) AS BIGINT) AS n,
             |             CAST(sum(lag * cnt) AS BIGINT) AS sl
             |      FROM h GROUP BY m),
             |c AS (SELECT h.*, sum(cnt) OVER (PARTITION BY m ORDER BY lag
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM h)
             |SELECT m, max(n) AS n,
             |       round(max(CAST(sl AS DOUBLE) / n), 4) AS avg_lag_days,
             |       CAST(min(lag) AS BIGINT) AS p95_lag_days
             |FROM c JOIN t USING (m)
             |WHERE cum >= ceil(n * 0.95)
             |GROUP BY m ORDER BY m""".stripMargin)),

    // basket-size distribution: lines-per-order histogram with order
    // share — the ops-planning shape behind picking batch sizes and
    // the q_basket_pairs quadratic bound (pair work grows with the
    // square of THIS tail). Two hash aggregates; output bounded by
    // max basket size.
    "q_basket_size_dist" -> Q(
      (s, d) => {
        val sizes = Tables.lineitem(s, d)
          .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
          .groupBy("k").agg(count(lit(1)).as("n_orders"))
          .localCheckpoint(eager = false) // share denominator + rows
        val tot = sizes.agg(sum("n_orders").as("t"))
        sizes.crossJoin(broadcast(tot))
          .select(col("k").as("lines_per_order"), col("n_orders"),
            round(col("n_orders").cast("double") / col("t"), 6).as("share"))
          .orderBy("lines_per_order")
      },
      Some("""WITH s AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
             |           FROM lineitem GROUP BY l_orderkey),
             |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_orders FROM s GROUP BY k),
             |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM h)
             |SELECT k AS lines_per_order, n_orders,
             |       round(CAST(n_orders AS DOUBLE) / t, 6) AS share
             |FROM h, t ORDER BY lines_per_order""".stripMargin)),

    // join-key skew profiler: frequency-distribution stats of the
    // fact table's join keys (max/median/p99 key multiplicity, top-1
    // key share) — the numbers that decide salting vs AQE skew-join
    // BEFORE a 100-TB shuffle hits one reducer. The percentile walks
    // the key-frequency table (|distinct keys| rows, never facts);
    // one pass per audited key.
    "q_skew_profile" -> Q(
      (s, d) => {
        def profile(keyCol: String): org.apache.spark.sql.DataFrame = {
          val freq = Tables.lineitem(s, d)
            .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
          freq.agg(count(lit(1)).as("n_keys"),
              sum("c").as("n_rows"), max("c").as("max_cnt"),
              round(expr("percentile(c, 0.5D)"), 4).as("p50_cnt"),
              round(expr("percentile(c, 0.99D)"), 4).as("p99_cnt"))
            .select(lit(keyCol).as("join_key"), col("n_keys"), col("n_rows"),
              col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
              round(col("max_cnt").cast("double") / col("n_rows"), 6)
                .as("top1_share"),
              round(col("max_cnt") / col("p50_cnt"), 4).as("skew_ratio"))
        }
        profile("l_orderkey").union(profile("l_partkey"))
          .union(profile("l_suppkey")).orderBy("join_key")
      },
      Some {
        def p(k: String) =
          s"""SELECT '$k' AS join_key, CAST(count(*) AS BIGINT) AS n_keys,
             |       CAST(sum(c) AS BIGINT) AS n_rows,
             |       CAST(max(c) AS BIGINT) AS max_cnt,
             |       round(quantile_cont(c, 0.5), 4) AS p50_cnt,
             |       round(quantile_cont(c, 0.99), 4) AS p99_cnt,
             |       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
             |       round(max(c) / round(quantile_cont(c, 0.5), 4), 4) AS skew_ratio
             |FROM (SELECT $k, CAST(count(*) AS BIGINT) AS c
             |      FROM lineitem GROUP BY $k)""".stripMargin
        Seq("l_orderkey", "l_partkey", "l_suppkey").map(p)
          .mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
      })
  )
}
