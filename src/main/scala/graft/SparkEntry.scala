package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in [[queries]] has a matching DuckDB oracle in
  * [[oracleSql]] (same column names, same ordering, aggregates rounded
  * identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("vs_search_topk")(spark, "/root/testdata/sf0.001")

  private type QFn = (SparkSession, String) => DataFrame

  private final case class Q(fn: QFn, sql: Option[String])

  /** q_basket_pairs basket-size guard: orders with more than this
    * many FREQUENT items are excluded before the quadratic per-order
    * pairing (a giant basket is a bot artifact, and one is enough to
    * blow the pair join up). Far above honest basket sizes (TPC-H ≤7
    * lines/order), so capped and uncapped agree on real data —
    * spec-pinned with a synthetic giant order in RelationalSpec.
    */
  val BasketCap = 100

  /** Exact money sum: the per-row term rounds to 4dp and sums as
    * DECIMAL, so group totals are ORDER-INVARIANT — a plain double
    * sum's merge-order noise (~1e-8 on 1e5-scale revenue) lands a
    * 2dp round on a half-cent boundary roughly once per few hundred
    * grouped outputs per data generation (q9_profit at sf0.001 was
    * the observed hit). Mirrored textually in every money oracle.
    */
  private def moneySumRaw(term: Column): Column =
    sum(round(term, 4).cast("decimal(20,4)"))
  private def moneySum(term: Column): Column =
    round(moneySumRaw(term), 2).cast("double")

  // ---------------------------------------------------------------
  // Relational / analytics core (SURVEY §2 #28–31)
  // ---------------------------------------------------------------

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  private val relational: Seq[(String, Q)] = Seq(
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
      Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |WHERE l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
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
        val mc = sc.groupBy(col("l_partkey").as("mc_partkey"))
          .agg(min("cost").as("min_cost"))
        sc.join(mc, col("l_partkey") === col("mc_partkey") &&
                    col("cost") === col("min_cost"))
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
    // customer order history (partitioned — never global)
    "win_analytics" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d).filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            round(percent_rank().over(
              Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))), 4)
              .as("pr"),
            round(cume_dist().over(
              Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))), 4)
              .as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_totalprice, 1) OVER w1 AS prev_price,
             |  lead(o_totalprice, 1) OVER w1 AS next_price,
             |  round(percent_rank() OVER w2, 4) AS pr,
             |  round(cume_dist() OVER w2, 4) AS cd
             |FROM orders WHERE o_custkey < 50
             |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |       w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
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
    "agg_cube" -> Q(
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
                col("n"), col("total"))
        .orderBy("st", "pri"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
             |       coalesce(o_orderpriority, 'ALL') AS pri,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice),2) AS total
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
      Some("""SELECT p_partkey, p_retailprice, p_size FROM part a
             |WHERE NOT EXISTS (SELECT 1 FROM part b
             |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
             |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
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
        val pc = fli.groupBy("l_orderkey")
          .agg(collect_list("l_partkey").as("ps"))
          .filter(size(col("ps")).between(2, SparkEntry.BasketCap))
          .select(explode(col("ps")).as("pa"), col("ps"))
          .select(col("pa"), explode(col("ps")).as("pb"))
          .filter(col("pa") < col("pb"))
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
             |       HAVING count(*) <= ${SparkEntry.BasketCap}),
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
        val rev = o.join(first, "o_custkey")
          .groupBy(col("m0"), (col("m") - col("m0")).as("age"))
          .agg(round(sum("o_totalprice"), 6).as("rev"))
        val wC = Window.partitionBy("m0").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rev.join(broadcast(sizes), "m0")
          .withColumn("cum_rev", sum("rev").over(wC))
          .filter(col("age") <= 6)
          .select(col("m0").as("cohort_m"), col("age"), col("n_cust"),
            round(col("cum_rev") / col("n_cust"), 4).as("ltv"))
          .orderBy("cohort_m", "age")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |                  year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |                  o_totalprice
             |           FROM orders),
             |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey),
             |sz AS (SELECT m0, CAST(count(*) AS BIGINT) AS n_cust FROM f GROUP BY m0),
             |rev AS (SELECT m0, m - m0 AS age, round(sum(o_totalprice), 6) AS rev
             |        FROM o JOIN f USING (o_custkey) GROUP BY m0, age),
             |c AS (SELECT m0, age, rev,
             |             sum(rev) OVER (PARTITION BY m0 ORDER BY age
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
             |      FROM rev)
             |SELECT m0 AS cohort_m, age, n_cust,
             |       round(cum_rev / n_cust, 4) AS ltv
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

  // ---------------------------------------------------------------
  // Events: sessionize + tumbling windows (SURVEY §2 #32–33)
  // ---------------------------------------------------------------

  /** Unrolled PageRank iterations as chained CTEs (DuckDB's recursive
    * CTEs reject aggregates in the recursive term, so the fixed
    * iteration count is spelled out — mirrors graph_pagerank's loop
    * term-for-term, including the coalesce for no-inbound nodes).
    */
  private def pagerankIterSql(iters: Int): String = (1 to iters).map { k =>
    s"""it$k AS (SELECT n.t, 0.15 / nn.nn + 0.85 * coalesce(
       |  (SELECT sum(e.p * i.r) FROM e JOIN it${k - 1} i ON i.t = e.src
       |   WHERE e.dst = n.t), 0) AS r
       |  FROM nodes n, nn)""".stripMargin
  }.mkString(",\n")

  /** Unrolled Markov power-iteration steps as chained CTEs (same
    * recursive-CTE restriction as pagerankIterSql) — mirrors
    * ev_stationary's loop term-for-term, including the per-round
    * round-to-7 that pins the trajectory across engines.
    */
  private def stationaryIterSql(iters: Int): String = (1 to iters).map { k =>
    s"""v$k AS (SELECT c.to_type AS state, round(sum(c.p * v${k - 1}.v), 7) AS v
       |  FROM cells c JOIN v${k - 1} ON v${k - 1}.state = c.from_type
       |  GROUP BY c.to_type)""".stripMargin
  }.mkString(",\n")

  /** Shared DuckDB CTE prefix for the near-dup edge graph (canonical
    * da < db pairs from 5-char-shingle Jaccard over doc_id < lim) —
    * the SAME edge set `Dedup.ngramJaccard(docsUnder(_, _, lim), 5,
    * thr)` builds, so every graph oracle starts from identical edges.
    */
  private def dupEdgesSql(lim: Int, thr: Double): String =
    s"""s AS (
       |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, s"doc_id < $lim")}),
       |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
       |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
       |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
       |e0 AS MATERIALIZED (SELECT da, db FROM (
       |    SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
       |    FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
       |  WHERE j >= $thr)""".stripMargin

  /** Unrolled BFS frontier expansions as chained CTEs — mirrors
    * graph_bfs's fixed-round loop exactly (expand the previous
    * round's frontier through nbr, drop already-visited nodes).
    */
  private def bfsIterSql(rounds: Int): String = (1 to rounds).map { k =>
    // MATERIALIZED: each round reads the previous twice (frontier +
    // visited filter) — inlining would re-expand the edge build
    s"""d$k AS MATERIALIZED (
       |  SELECT v, depth FROM d${k - 1}
       |  UNION ALL
       |  SELECT DISTINCT nbr.n AS v, CAST($k AS BIGINT) AS depth
       |  FROM nbr JOIN d${k - 1} f ON f.v = nbr.v AND f.depth = ${k - 1}
       |  WHERE nbr.n NOT IN (SELECT v FROM d${k - 1}))""".stripMargin
  }.mkString(",\n")

  /** Unrolled k-core peeling rounds as chained CTEs — mirrors
    * graph_kcore's fixed-round loop exactly (degree filter then
    * edge restriction to surviving endpoints, per round).
    */
  private def kcoreIterSql(rounds: Int, k: Int): String = (1 to rounds).map { r =>
    // MATERIALIZED: each round reads the previous twice — inlined
    // CTEs would re-expand the base shingle join 4^rounds times
    s"""k$r AS MATERIALIZED (SELECT v FROM (SELECT da AS v FROM e${r - 1}
       |                 UNION ALL SELECT db AS v FROM e${r - 1})
       |  GROUP BY v HAVING count(*) >= $k),
       |e$r AS MATERIALIZED (SELECT da, db FROM e${r - 1}
       |  WHERE da IN (SELECT v FROM k$r) AND db IN (SELECT v FROM k$r))"""
      .stripMargin
  }.mkString(",\n")

  /** Unrolled eigenvector-centrality power-iteration rounds as chained
    * CTEs (same recursive-CTE restriction as pagerankIterSql) — each
    * round is a neighbor-sum then an L1 renormalization, per-round
    * round-to-7 pinning the trajectory across engines; mirrors
    * graph_eigencentrality's loop term-for-term.
    */
  private def eigenIterSql(iters: Int): String = (1 to iters).map { k =>
    s"""r$k AS (SELECT nbr.v AS v, sum(x${k - 1}.c) AS raw
       |  FROM nbr JOIN x${k - 1} ON x${k - 1}.v = nbr.n GROUP BY nbr.v),
       |x$k AS (SELECT v, round(raw / (SELECT sum(raw) FROM r$k), 7) AS c
       |  FROM r$k)""".stripMargin
  }.mkString(",\n")

  /** Unrolled Katz-centrality rounds x ← 1 + α·A·x as chained CTEs —
    * mirrors graph_katz's loop exactly (neighbor sum, damp by α, add
    * the constant injection, round to 7 per round). No normalization:
    * α = 0.1 is far below 1/λmax on the sparse dup graph, so the
    * series converges and the fixed point is the Katz vector.
    */
  private def katzIterSql(iters: Int, alpha: Double): String =
    (1 to iters).map { k =>
      s"""x$k AS MATERIALIZED (SELECT n.v,
         |  round(1.0 + $alpha * coalesce(s.sm, 0), 7) AS c
         |  FROM nodes n LEFT JOIN (
         |    SELECT nbr.v, sum(x${k - 1}.c) AS sm
         |    FROM nbr JOIN x${k - 1} ON x${k - 1}.v = nbr.n
         |    GROUP BY nbr.v) s ON s.v = n.v)""".stripMargin
    }.mkString(",\n")

  /** Unrolled MULTI-source BFS frontier expansions (closeness) as
    * chained CTEs — bfsIterSql keyed by (src, nd): every node is a
    * source, the pair table is bounded by |V|² of the bounded dup
    * subgraph, never by document rows.
    */
  private def closeIterSql(rounds: Int): String = (1 to rounds).map { k =>
    s"""c$k AS MATERIALIZED (
       |  SELECT src, nd, depth FROM c${k - 1}
       |  UNION ALL
       |  SELECT DISTINCT f.src, nbr.n AS nd, CAST($k AS BIGINT) AS depth
       |  FROM c${k - 1} f JOIN nbr ON nbr.v = f.nd
       |  WHERE f.depth = ${k - 1}
       |    AND NOT EXISTS (SELECT 1 FROM c${k - 1} p
       |                    WHERE p.src = f.src AND p.nd = nbr.n))""".stripMargin
  }.mkString(",\n")

  /** Unrolled power-iteration rounds v ← C·v / ‖C·v‖₁ over the 64×64
    * covariance CELL table as chained CTEs — the top-eigenvalue twin
    * of eigenIterSql on the embedding covariance instead of the dup
    * graph; abs() in the normalizer because eigenvector components of
    * a covariance matrix carry sign.
    */
  private def covPowIterSql(iters: Int, cells: String = "cells",
                            p: String = ""): String = (1 to iters).map { k =>
    s"""${p}r$k AS MATERIALIZED (SELECT $cells.a AS i, sum($cells.cv * ${p}v${k - 1}.x) AS raw
       |  FROM $cells JOIN ${p}v${k - 1} ON ${p}v${k - 1}.i = $cells.b GROUP BY $cells.a),
       |${p}v$k AS MATERIALIZED (SELECT i,
       |  round(raw / nullif((SELECT sum(abs(raw)) FROM ${p}r$k), 0), 7) AS x
       |  FROM ${p}r$k)""".stripMargin
  }.mkString(",\n")

  /** Transition-cell table shared by the Markov family
    * (ev_transitions / ev_stationary / graph_pagerank): the per-user
    * lead()-over-fact window is the dominant cost of all three — and
    * round-9's one super-linear scale edge (1.60× at an 80M-event
    * doubling, all from the redundant per-query fact sort). One pass
    * per (SparkContext, dir) now materializes the
    * ≤(|types|+1)×(|types|+1) cell counts eagerly (the
    * clusterLabelsShared idiom); the family becomes projections over
    * the tiny checkpointed frame. Rows with to_type NULL are RETAINED
    * (each user's last event) so `distinct from_type` reproduces
    * `SELECT DISTINCT event_type FROM events` exactly — pagerank's
    * node set must include types that never transition out.
    */
  private val cellCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.SparkContext, String), DataFrame]

  private def transitionCells(s: SparkSession, d: String): DataFrame =
    cellCache.getOrElseUpdate((s.sparkContext, d), {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead("event_type", 1).over(w))
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
    })

  private val eventsQ: Seq[(String, Q)] = Seq(
    // `ts` is read as epoch-nanos Long (Tables.events) — gap and window
    // arithmetic is exact integer math on both engines.
    "ev_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
             |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    "ev_json_extract" -> Q(
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "ev_error_rate" -> Q(
      (s, d) => {
        val isErr = when(col("event_type") === "error", 1).otherwise(0)
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum(isErr).as("n_errors"))
          .filter(col("n_events") >= 20)
          .withColumn("err_rate",
            round(col("n_errors") * lit(1.0) / col("n_events"), 4))
          .orderBy(col("err_rate").desc, col("user_id"))
          .limit(5)
      },
      Some("""SELECT user_id, n_events, n_errors,
             |       round(n_errors * 1.0 / n_events, 4) AS err_rate FROM (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
             |  FROM events GROUP BY user_id HAVING count(*) >= 20)
             |ORDER BY err_rate DESC, user_id LIMIT 5""".stripMargin)),

    // as-of join: each error event matched to the latest click at or
    // before it (per user) — union + one ordered window pass, no
    // inequality join (graft.ops.Joins.asofJoin)
    "ev_asof_join" -> Q(
      (s, d) => {
        // µs resolution both sides: DuckDB truncates the nanos parquet
        // to µs TIMESTAMP, so the oracle can't see sub-µs digits
        val ev = Tables.events(s, d)
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ats"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts DIV 1000").as("bts"), col("event_id"))
          .groupBy("user_id", "bts").agg(max("event_id").as("click_id"))
        graft.ops.Joins.asofJoin(errs, clicks, Seq("user_id"), "ats", "bts")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_err"),
               count(col("asof.bts")).as("n_matched"),
               sum(col("ats") - col("asof.bts")).as("sum_lag_us"))
          .orderBy("user_id")
      },
      Some("""WITH a AS (SELECT user_id, event_id, epoch_us(ts) AS ats
             |           FROM events WHERE event_type = 'error'),
             |b AS (SELECT user_id, epoch_us(ts) AS bts, max(event_id) AS click_id
             |      FROM events WHERE event_type = 'click' GROUP BY user_id, bts),
             |j AS (SELECT a.user_id, a.ats, b.bts
             |      FROM a ASOF LEFT JOIN b
             |        ON a.user_id = b.user_id AND a.ats >= b.bts)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_err,
             |       CAST(count(bts) AS BIGINT) AS n_matched,
             |       CAST(sum(ats - bts) AS BIGINT) AS sum_lag_us
             |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // range join: clicks attributed to the 5-minute window before each
    // purchase — bucketed equi-join, not a nested-loop BETWEEN join
    // (graft.ops.Joins.rangeJoinBucketed)
    "ev_range_join" -> Q(
      (s, d) => {
        // µs resolution both sides (see ev_asof_join)
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts DIV 1000").as("cts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
                  (expr("ts DIV 1000") - lit(300000000L)).as("st"),
                  expr("ts DIV 1000").as("en"))
        val pairs = graft.ops.Joins.rangeJoinBucketed(
          clicks, purch, Seq("user_id"), "cts", "st", "en", 300000000L)
        val pu = purch.groupBy("user_id").agg(count(lit(1)).as("n_purch"))
        val pp = pairs.groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"), countDistinct("pid").as("n_purch_matched"))
        pu.join(pp, Seq("user_id"), "left")
          .select(col("user_id"), col("n_purch"),
                  coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
                  coalesce(col("n_purch_matched"), lit(0L)).as("n_purch_matched"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, epoch_us(ts) AS cts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pts
             |      FROM events WHERE event_type = 'purchase'),
             |pairs AS (SELECT p.user_id, p.pid FROM p JOIN c
             |          ON p.user_id = c.user_id
             |         AND c.cts BETWEEN p.pts - 300000000 AND p.pts),
             |pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch
             |       FROM p GROUP BY user_id),
             |pp AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
             |              CAST(count(DISTINCT pid) AS BIGINT) AS n_purch_matched
             |       FROM pairs GROUP BY user_id)
             |SELECT pu.user_id, n_purch, coalesce(n_pairs, 0) AS n_pairs,
             |       coalesce(n_purch_matched, 0) AS n_purch_matched
             |FROM pu LEFT JOIN pp ON pu.user_id = pp.user_id
             |ORDER BY pu.user_id""".stripMargin)),

    // ordered string aggregation (deterministic: sorted before join)
    "q_string_agg" -> Q(
      (s, d) => Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .filter(col("s_acctbal") > 9000)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
             array_join(sort_array(collect_list(col("s_name"))), ",").as("names"))
        .orderBy("n_name"),
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             |       string_agg(s_name, ',' ORDER BY s_name) AS names
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_acctbal > 9000
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // correlation / covariance per group
    "stat_corr" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
             round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             |       round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // z-score outlier counting per event type (3σ rule)
    // robust outliers: median absolute deviation (3×MAD rule) —
    // immune to the heavy tail that inflates stddev in ev_outliers;
    // med/mad rounded to 6 BEFORE the comparison so the boundary
    // test is bit-identical in both engines
    "stat_mad" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val med = ev.groupBy(col("event_type").as("et"))
          .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
        val mad = ev.join(broadcast(med), col("event_type") === col("et"))
          .select(col("event_type").as("et2"), abs(col("value") - col("med")).as("dev"))
          .groupBy("et2")
          .agg(round(expr("percentile(dev, 0.5D)"), 6).as("mad"))
        ev.join(broadcast(med), col("event_type") === col("et"))
          .join(broadcast(mad), col("event_type") === col("et2"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("med").as("med"), max("mad").as("mad"),
               sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
                 .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (SELECT event_type AS et, round(quantile_cont(value, 0.5), 6) AS med
             |             FROM events GROUP BY event_type),
             |mad AS (SELECT event_type AS et2, round(quantile_cont(abs(value - med), 0.5), 6) AS mad
             |        FROM events JOIN med ON event_type = et GROUP BY event_type)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(med) AS med, max(mad) AS mad,
             |       CAST(sum(CASE WHEN abs(value - med) > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM events JOIN med ON event_type = et JOIN mad ON event_type = et2
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // mergeable approximate-quantile sketch (deterministic KLL/MRL
    // compactors, ops/QuantileSketch.scala): the sketch shuffles
    // O(k·log(n/k)) values per partition instead of sorting the group.
    // The oracled subset is bounded (≤ k values per group), where the
    // sketch is provably EXACT under any partitioning and matches
    // DuckDB quantile_disc bit-for-bit — the ev_heavy_hitters pattern;
    // the rank-error bound under real compaction is property-tested
    // (QuantileSketchPropSpec)
    "stat_approx_quantiles" -> Q(
      (s, d) => {
        val qagg = graft.ops.QuantileSketch.approxQuantiles(
          1024, Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        Tables.events(s, d).filter(col("user_id") < 40)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), qagg(col("value")).as("qs"))
          .select(col("event_type"), col("n"),
            element_at(col("qs"), 1).as("q10"),
            element_at(col("qs"), 2).as("q25"),
            element_at(col("qs"), 3).as("q50"),
            element_at(col("qs"), 4).as("q75"),
            element_at(col("qs"), 5).as("q90"),
            element_at(col("qs"), 6).as("q99"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       quantile_disc(value, 0.1) AS q10,
             |       quantile_disc(value, 0.25) AS q25,
             |       quantile_disc(value, 0.5) AS q50,
             |       quantile_disc(value, 0.75) AS q75,
             |       quantile_disc(value, 0.9) AS q90,
             |       quantile_disc(value, 0.99) AS q99
             |FROM events WHERE user_id < 40
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // OHLC resampling: 1h bars per event type (open/close by first/
    // last event in the bar, ties broken by event_id; per-bar windows
    // are bounded, never global)
    "ts_ohlc" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"), col("event_id"),
                  expr("ts DIV 1000").as("ats"))
          .withColumn("bucket", expr("ats DIV 3600000000"))
        val wo = Window.partitionBy("event_type", "bucket")
          .orderBy(col("ats"), col("event_id"))
        val wc = Window.partitionBy("event_type", "bucket")
          .orderBy(col("ats").desc, col("event_id").desc)
        ev.withColumn("ro", row_number().over(wo))
          .withColumn("rc", row_number().over(wc))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"),
               max(when(col("ro") === 1, col("value"))).as("open"),
               round(max("value"), 4).as("high"),
               round(min("value"), 4).as("low"),
               max(when(col("rc") === 1, col("value"))).as("close"))
          .orderBy("event_type", "bucket")
      },
      Some("""SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
             |       max(CASE WHEN ro = 1 THEN value END) AS open,
             |       round(max(value), 4) AS high, round(min(value), 4) AS low,
             |       max(CASE WHEN rc = 1 THEN value END) AS close
             |FROM (
             |  SELECT event_type, value, epoch_us(ts) // 3600000000 AS bucket,
             |         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
             |                            ORDER BY epoch_us(ts), event_id) AS ro,
             |         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
             |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rc
             |  FROM events)
             |GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin)),

    "ev_outliers" -> Q(
      (s, d) => {
        val stats = Tables.events(s, d).groupBy(col("event_type").as("et"))
          .agg(avg("value").as("mu"), stddev("value").as("sd"))
        Tables.events(s, d)
          .join(broadcast(stats), col("event_type") === col("et"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               sum(when(abs((col("value") - col("mu")) / col("sd")) > 3, 1L)
                 .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH stats AS (SELECT event_type AS et, avg(value) AS mu, stddev_samp(value) AS sd
             |               FROM events GROUP BY event_type)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN abs((value - mu) / sd) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM events JOIN stats ON event_type = et
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // fixed-width histogram of a measure column (20 × 25-unit bins)
    "ev_histogram" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(least(floor(col("value") / 25.0), lit(19.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("bin"),
      Some("""SELECT CAST(least(floor(value / 25.0), 19.0) AS BIGINT) AS bin,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY bin ORDER BY bin""".stripMargin)),

    // heavy hitters via a mergeable Space-Saving sketch: m counters
    // per map task, m rows per partition through the shuffle — the
    // 100 TB answer to "top tokens" without grouping every distinct
    // key. Oracled on the bounded event_type domain, where m exceeds
    // the true distinct count and the sketch is provably exact
    // (err = 0); the N/m frequency + error-bound guarantees on a
    // genuinely-sketched domain are covered by HeavyHittersSpec.
    "ev_heavy_hitters" -> Q(
      (s, d) => Tables.events(s, d)
        .agg(graft.ops.HeavyHitters.heavyHitters(64)(col("event_type")).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key").as("key"), col("h.count").as("count"),
          col("h.err").as("err"))
        .orderBy(col("count").desc, col("key")),
      Some("""SELECT event_type AS key, CAST(count(*) AS BIGINT) AS count,
             |       CAST(0 AS BIGINT) AS err
             |FROM events GROUP BY event_type
             |ORDER BY count DESC, key""".stripMargin)),

    // ordered funnel: signup → first click after signup → first
    // purchase after that click, per user (µs both sides)
    "ev_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ats"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ats").as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ats") >= col("t1"))
          .groupBy("user_id").agg(min("ats").as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ats") >= col("t2"))
          .groupBy("user_id").agg(min("ats").as("t3"))
        s1.agg(count(lit(1)).as("n_signup"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click_after")))
          .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ats FROM events),
             |s1 AS (SELECT user_id, min(ats) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (SELECT ev.user_id, min(ats) AS t2 FROM ev JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND ats >= t1 GROUP BY ev.user_id),
             |s3 AS (SELECT ev.user_id, min(ats) AS t3 FROM ev JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND ats >= t2 GROUP BY ev.user_id)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_after,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_after""".stripMargin)),

    // cohort retention: users active in their first day who return in
    // any of days 2..7 (µs days both sides)
    "ev_retention" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
        val d0 = ev.groupBy("user_id").agg(min("day").as("day0"))
        val ret = ev.join(d0, "user_id")
          .filter(col("day") > col("day0") && col("day") <= col("day0") + 7)
          .select("user_id").distinct()
        d0.agg(count(lit(1)).as("n_users"))
          .crossJoin(ret.agg(count(lit(1)).as("n_retained")))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
             |d0 AS (SELECT user_id, min(day) AS day0 FROM ev GROUP BY user_id),
             |ret AS (SELECT DISTINCT ev.user_id FROM ev JOIN d0 USING (user_id)
             |        WHERE day > day0 AND day <= day0 + 7)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d0) AS n_users,
             |       (SELECT CAST(count(*) AS BIGINT) FROM ret) AS n_retained""".stripMargin)),

    // bounded-lookback EWMA per user (the streaming-safe form of
    // exponential smoothing): 8 explicit lag terms with weights
    // α(1-α)^k, α=0.5, normalized over the lags actually present.
    // A truly recursive EWMA is order-dependent and non-mergeable;
    // the bounded form is a fixed-size window expression — per-user
    // partitions, 8-row frames, identical left-associated arithmetic
    // on both engines
    "ev_ewma_bounded" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val terms = (0 to 7).map { k =>
          val lv = if (k == 0) col("value") else lag(col("value"), k).over(w)
          val wk = lit(0.5 * math.pow(0.5, k))
          (when(lv.isNotNull, lv * wk).otherwise(lit(0.0)),
           when(lv.isNotNull, wk).otherwise(lit(0.0)))
        }
        val num = terms.map(_._1).reduceLeft(_ + _)
        val den = terms.map(_._2).reduceLeft(_ + _)
        // all-lags-null (e.g. a user whose every value is NULL) makes
        // den 0 → NULL the smoothed value on both engines instead of
        // inheriting a 0/0 convention
        ev.withColumn("ewma",
            when(den === 0, lit(null).cast("double")).otherwise(round(num / den, 4)))
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"), round(col("value"), 4).as("v"),
                  col("ewma"))
          .orderBy("user_id", "event_id")
      },
      Some {
        val lags = (0 to 7).map { k =>
          val lv = if (k == 0) "value"
                   else s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
          (s"l$k", lv, 0.5 * math.pow(0.5, k))
        }
        val defs = lags.map { case (n, e, _) => s"$e AS $n" }.mkString(", ")
        val num = lags.map { case (n, _, w) => s"CASE WHEN $n IS NOT NULL THEN $n * $w ELSE 0.0 END" }
          .mkString(" + ")
        val den = lags.map { case (n, _, w) => s"CASE WHEN $n IS NOT NULL THEN $w ELSE 0.0 END" }
          .mkString(" + ")
        s"""SELECT user_id, event_id, round(value, 4) AS v,
           |       CASE WHEN ($den) = 0 THEN NULL
           |            ELSE round(($num) / ($den), 4) END AS ewma
           |FROM (SELECT user_id, event_id, value, $defs FROM events)
           |WHERE user_id < 20
           |ORDER BY user_id, event_id""".stripMargin
      }),

    // event-type transition matrix (Markov chain over each user's
    // ordered event stream): lead() inside the per-user partition is
    // bounded by session length; transition probabilities come from a
    // broadcast per-from_type total join, NOT a global window — the
    // counts table is |event_type|² rows regardless of corpus size
    "ev_transitions" -> Q(
      (s, d) => {
        // derives from the shared transitionCells materialization:
        // zero fact scans here — the lead() pass ran once per process
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
        pairs.join(broadcast(totals), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
                  round(col("n") / col("tot"), 4).as("p"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY from_type)
             |SELECT from_type, to_type, n, round(n * 1.0 / tot, 4) AS p
             |FROM cnt JOIN tot USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // higher-moment distribution stats (skewness / excess kurtosis)
    // per group, computed from raw power sums in ONE hash aggregate —
    // the formulas are written identically on both sides so the
    // engines agree bit-for-bit after rounding (built-in skewness()
    // differs between engines on sample-vs-population convention)
    "stat_moments" -> Q(
      (s, d) => {
        // TWO-PASS centered moments: a per-type mean (tiny broadcast)
        // then sums of (v − μ)^k. Raw power sums cancel catastrophically
        // on large-mean data (Σv⁴ − 4μΣv³ + … subtracts huge nearly-
        // equal terms); the centered form keeps every addend small, so
        // the 4-decimal round is stable under Spark's nondeterministic
        // partial-agg order. The broadcast μ is ROUNDED to 6 so both
        // engines center on the identical value. Zero-variance guard:
        // a constant group NULLs skew/kurt on both engines rather than
        // surfacing either's divide-by-zero convention.
        val ev = Tables.events(s, d)
        val mus = ev.groupBy("event_type")
          .agg(round(sum("value") / count(lit(1)), 6).as("mu"))
        val vr = col("m2s") / col("n")
        ev.join(broadcast(mus), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"), max("mu").as("mu"),
               sum(pow(col("value") - col("mu"), 2)).as("m2s"),
               sum(pow(col("value") - col("mu"), 3)).as("m3s"),
               sum(pow(col("value") - col("mu"), 4)).as("m4s"))
          .select(col("event_type"), col("n").cast("long").as("n_rows"),
                  round(col("mu"), 4).as("mean"),
                  round(vr, 4).as("var_pop"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(
                    round((col("m3s") / col("n")) / pow(vr, 1.5), 4)).as("skew"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(
                    round((col("m4s") / col("n")) / pow(vr, 2) - lit(3), 4)).as("kurt"))
          .orderBy("event_type")
      },
      Some("""WITH mus AS (
             |  SELECT event_type, round(sum(value) / count(*), 6) AS mu
             |  FROM events GROUP BY event_type),
             |cm AS (
             |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n, max(mu) AS mu,
             |         sum(pow(value - mu, 2)) AS m2s,
             |         sum(pow(value - mu, 3)) AS m3s,
             |         sum(pow(value - mu, 4)) AS m4s
             |  FROM events JOIN mus USING (event_type)
             |  GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n_rows,
             |       round(mu, 4) AS mean,
             |       round(m2s / n, 4) AS var_pop,
             |       CASE WHEN m2s / n <= 0 THEN NULL ELSE
             |         round((m3s / n) / pow(m2s / n, 1.5), 4) END AS skew,
             |       CASE WHEN m2s / n <= 0 THEN NULL ELSE
             |         round((m4s / n) / pow(m2s / n, 2) - 3, 4) END AS kurt
             |FROM cm ORDER BY event_type""".stripMargin)),

    // winsorized robust aggregation: per-type p01/p99 cutoffs as ONE
    // tiny aggregate broadcast back (the text_ccnet_bins shape on the
    // measure axis), values clipped map-side — the outlier-tolerant
    // mean a metrics pipeline reports next to the raw one. Cutoffs
    // rounded to 6 before the comparison so an interpolation ulp
    // can't flip a boundary row on one engine only
    "ev_winsorize" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cuts = ev.groupBy("event_type")
          .agg(expr("percentile(value, array(0.01D, 0.99D))").as("ps"))
          .select(col("event_type"), round(element_at(col("ps"), 1), 6).as("lo"),
                  round(element_at(col("ps"), 2), 6).as("hi"))
        // NULL measurements stay NULL: least/greatest SKIP nulls on
        // both engines, so an unguarded clip would impute hi for a
        // missing value and silently inflate mean_wins
        ev.join(broadcast(cuts), "event_type")
          .select(col("event_type"), col("value"),
                  when(col("value").isNull, lit(null).cast("double"))
                    .otherwise(greatest(least(col("value"), col("hi")), col("lo")))
                    .as("wv"),
                  when(col("value") < col("lo") || col("value") > col("hi"), 1)
                    .otherwise(0).as("clipped"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("clipped").as("n_clipped"),
               round(avg("value"), 4).as("mean_raw"),
               round(avg("wv"), 4).as("mean_wins"))
          .orderBy("event_type")
      },
      Some("""WITH cuts AS (
             |  SELECT event_type, round(quantile_cont(value, 0.01), 6) AS lo,
             |         round(quantile_cont(value, 0.99), 6) AS hi
             |  FROM events GROUP BY event_type)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
             |       round(avg(value), 4) AS mean_raw,
             |       round(avg(CASE WHEN value IS NULL THEN NULL
             |                 ELSE greatest(least(value, hi), lo) END), 4) AS mean_wins
             |FROM events JOIN cuts USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // last-touch attribution: every purchase credited to the campaign
    // (props.k mod 10) of the user's latest click at or before it —
    // one RUNNING per-user window (last(...ignoreNulls) over an
    // incremental frame, O(1) per row in WindowExec), then a tiny
    // groupBy; no self-join, no inequality join
    "ev_attribution" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
                  col("value"),
                  get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("lck",
            last(when(col("event_type") === "click", col("k")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .select(coalesce(pmod(col("lck"), lit(10)), lit(-1L)).as("campaign"),
                  col("value"))
          .groupBy("campaign")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("revenue"))
          .orderBy("campaign")
      },
      Some("""WITH a AS (
             |  SELECT event_type, value,
             |         last_value(CASE WHEN event_type = 'click'
             |                    THEN json_extract_string(props, '$.k')::BIGINT END
             |                    IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lck
             |  FROM events)
             |SELECT coalesce(((lck % 10) + 10) % 10, -1) AS campaign,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS revenue
             |FROM a WHERE event_type = 'purchase'
             |GROUP BY campaign ORDER BY campaign""".stripMargin)),

    // RFM segmentation: per-user purchase frequency/monetary rolled
    // into quintile scores against GLOBAL cutoffs computed as one
    // 1-row aggregate and broadcast (the text_ccnet_bins idiom on the
    // user axis); recency reported as average days-since-last-purchase
    // per segment. Cutoffs rounded to 6 so an interpolation ulp can't
    // move a user across a quintile edge on one engine only
    "ev_rfm" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val mx = ev.agg(max("ts").as("mts"))
        // a user whose every purchase value is NULL has m = NULL and
        // would fall through all quintile predicates to otherwise(5) —
        // exclude unknown-revenue users instead of mis-ranking them top
        val pur = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("f"), round(sum("value"), 6).as("m"),
               max("ts").as("uts"))
          .filter(col("m").isNotNull)
        val cuts = pur.agg(
            expr("percentile(f, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fc"),
            expr("percentile(m, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mc"))
          .select((1 to 4).flatMap(k => Seq(
            round(element_at(col("fc"), k), 6).as(s"fc$k"),
            round(element_at(col("mc"), k), 6).as(s"mc$k"))): _*)
        def score(v: Column, p: String): Column =
          when(v <= col(p + "1"), 1).when(v <= col(p + "2"), 2)
            .when(v <= col(p + "3"), 3).when(v <= col(p + "4"), 4).otherwise(5)
        pur.crossJoin(broadcast(cuts)).crossJoin(broadcast(mx))
          .select(score(col("f"), "fc").as("fscore"),
                  score(col("m"), "mc").as("mscore"),
                  expr("(mts - uts) DIV 86400000000000").as("rdays"))
          .groupBy("fscore", "mscore")
          .agg(count(lit(1)).as("n_users"),
               round(avg("rdays"), 2).as("avg_recency_days"))
          .orderBy("fscore", "mscore")
      },
      Some("""WITH pur AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS f,
             |         round(sum(value), 6) AS m, max(epoch_ns(ts)) AS uts
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
             |  HAVING sum(value) IS NOT NULL),
             |mx AS (SELECT max(epoch_ns(ts)) AS mts FROM events),
             |cuts AS (SELECT round(quantile_cont(f, 0.2), 6) AS fc1,
             |                round(quantile_cont(f, 0.4), 6) AS fc2,
             |                round(quantile_cont(f, 0.6), 6) AS fc3,
             |                round(quantile_cont(f, 0.8), 6) AS fc4,
             |                round(quantile_cont(m, 0.2), 6) AS mc1,
             |                round(quantile_cont(m, 0.4), 6) AS mc2,
             |                round(quantile_cont(m, 0.6), 6) AS mc3,
             |                round(quantile_cont(m, 0.8), 6) AS mc4
             |         FROM pur)
             |SELECT fscore, mscore, CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(rdays), 2) AS avg_recency_days
             |FROM (
             |  SELECT CASE WHEN f <= fc1 THEN 1 WHEN f <= fc2 THEN 2
             |              WHEN f <= fc3 THEN 3 WHEN f <= fc4 THEN 4 ELSE 5 END AS fscore,
             |         CASE WHEN m <= mc1 THEN 1 WHEN m <= mc2 THEN 2
             |              WHEN m <= mc3 THEN 3 WHEN m <= mc4 THEN 4 ELSE 5 END AS mscore,
             |         (mts - uts) // 86400000000000 AS rdays
             |  FROM pur, cuts, mx)
             |GROUP BY fscore, mscore ORDER BY fscore, mscore""".stripMargin)),

    // Benford first-digit audit (fraud/data-quality screen): leading
    // digit via floor(v / 10^floor(log10 v)) — exact for powers of 10
    // on both engines (Java documents log10(10^n) = n; glibc is
    // correctly rounded) — vs the Benford expectation log10(1 + 1/d),
    // with the per-digit chi-square contribution. One hash agg + a
    // 1-row broadcast total; 9 output rows
    "ev_benford" -> Q(
      (s, d) => {
        // NaN > 0 is TRUE on both engines, and DuckDB errors on
        // CAST(NaN AS BIGINT) — screen NaN out explicitly
        val pos = Tables.events(s, d)
          .filter(col("value") > 0 && !isnan(col("value")))
          .select(floor(col("value") / pow(lit(10.0), floor(log10(col("value")))))
            .cast("long").as("digit"))
        val tot = pos.agg(count(lit(1)).cast("double").as("n"))
        val expP = round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
        pos.groupBy("digit").agg(count(lit(1)).as("obs"))
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("obs"),
            round(col("obs") / col("n"), 4).as("obs_p"), expP.as("exp_p"),
            round(col("n") * pow(col("obs") / col("n") - expP, 2) / expP, 4)
              .as("chi2_term"))
          .orderBy("digit")
      },
      Some("""WITH pos AS (
             |  SELECT CAST(floor(value / pow(10.0, floor(log10(value)))) AS BIGINT) AS digit
             |  FROM events WHERE value > 0 AND NOT isnan(value)),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pos)
             |SELECT digit, CAST(count(*) AS BIGINT) AS obs,
             |       round(count(*) / n, 4) AS obs_p,
             |       round(log10(1.0 + 1.0 / digit), 6) AS exp_p,
             |       round(n * pow(count(*) / n - round(log10(1.0 + 1.0 / digit), 6), 2)
             |             / round(log10(1.0 + 1.0 / digit), 6), 4) AS chi2_term
             |FROM pos, tot GROUP BY digit, n ORDER BY digit""".stripMargin)),

    // DAU / rolling-7-day WAU: daily active users from one distinct
    // agg; the weekly window is NOT a sliding distinct (not
    // decomposable) but a bounded 7-way fan-out of the (day, user)
    // DISTINCT pairs — each pair contributes to 7 target days, then
    // one distinct agg per target day. Shuffle scales with active
    // (day, user) pairs, never raw events
    "ev_dau_wau" -> Q(
      (s, d) => {
        val du = Tables.events(s, d)
          .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
          .distinct()
        // du is already distinct on (day, user): dau is a plain count
        // (no second distinct expand); only the wau branch needs
        // countDistinct because the fan-out duplicates users across
        // target days
        val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = du
          .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
                  col("user_id"))
          .groupBy("day").agg(countDistinct("user_id").as("wau"))
        dau.join(wau, "day").orderBy("day")
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
             |  FROM events),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |        FROM du GROUP BY day),
             |fan AS (SELECT CAST(unnest(generate_series(day, day + 6)) AS BIGINT) AS day,
             |               user_id
             |        FROM du),
             |wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |        FROM fan GROUP BY day)
             |SELECT day, dau, wau FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    // Pareto concentration: what share of all events comes from the
    // top-decile users — the skew audit that motivates every salted
    // aggregation in this engine. Cutoff = one 1-row percentile
    // aggregate broadcast back (rounded to 6, the quintile idiom)
    "ev_pareto" -> Q(
      (s, d) => {
        val cnt = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("n"))
        val cut = cnt.agg(round(expr("percentile(n, 0.9D)"), 6).as("c"),
                          sum("n").as("tot"), count(lit(1)).as("n_users"))
        cnt.crossJoin(broadcast(cut))
          .groupBy("c", "tot", "n_users")
          .agg(sum(when(col("n") >= col("c"), col("n")).otherwise(0L)).as("te"),
               sum(when(col("n") >= col("c"), 1L).otherwise(0L)).as("top_users"))
          .select(col("n_users"), col("top_users"),
                  round(col("te") / col("tot").cast("double"), 4).as("top_share"),
                  round(col("c"), 4).as("p90_cut"))
      },
      Some("""WITH cnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |             FROM events GROUP BY user_id),
             |cut AS (SELECT round(quantile_cont(n, 0.9), 6) AS c,
             |               CAST(sum(n) AS BIGINT) AS tot,
             |               CAST(count(*) AS BIGINT) AS n_users FROM cnt)
             |SELECT n_users,
             |       CAST(sum(CASE WHEN n >= c THEN 1 ELSE 0 END) AS BIGINT) AS top_users,
             |       round(sum(CASE WHEN n >= c THEN n ELSE 0 END)
             |             / CAST(tot AS DOUBLE), 4) AS top_share,
             |       round(c, 4) AS p90_cut
             |FROM cnt, cut GROUP BY n_users, c, tot""".stripMargin)),

    // signup→purchase conversion latency: first event of each type per
    // user (two tiny per-user aggs), then hour-latency percentiles —
    // the funnel-timing complement to ev_funnel's ordering counts
    "ev_conversion_lag" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        def firstOf(t: String, as: String) = ev
          .filter(col("event_type") === t)
          .groupBy("user_id").agg(min("ts").as(as))
        firstOf("signup", "su").join(firstOf("purchase", "pu"), "user_id")
          .filter(col("pu") >= col("su"))
          .select(((col("pu") - col("su")) / lit(3600000000000.0)).as("h"))
          .agg(count(lit(1)).as("n_converted"),
               expr("percentile(h, array(0.5D, 0.9D))").as("ps"))
          .select(col("n_converted"),
                  round(element_at(col("ps"), 1), 4).as("p50_h"),
                  round(element_at(col("ps"), 2), 4).as("p90_h"))
      },
      Some("""WITH su AS (SELECT user_id, min(epoch_ns(ts)) AS su
             |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |pu AS (SELECT user_id, min(epoch_ns(ts)) AS pu
             |       FROM events WHERE event_type = 'purchase' GROUP BY user_id),
             |h AS (SELECT (pu - su) / 3600000000000.0 AS h
             |      FROM su JOIN pu USING (user_id) WHERE pu >= su)
             |SELECT CAST(count(*) AS BIGINT) AS n_converted,
             |       round(quantile_cont(h, 0.5), 4) AS p50_h,
             |       round(quantile_cont(h, 0.9), 4) AS p90_h
             |FROM h""".stripMargin)),

    "ev_window_agg" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("hour_bucket", expr("ts DIV 3600000000000"))
        .groupBy("hour_bucket", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("hour_bucket", "event_type"),
      Some("""SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket, event_type,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value),4) AS sum_value
             |FROM events GROUP BY hour_bucket, event_type
             |ORDER BY hour_bucket, event_type""".stripMargin)),

    // throttle-style debounce: an event is dropped when it arrives
    // within 5 s of the PREVIOUS RAW event of the same (user, type) —
    // one lag over the per-key window, exact integer nanos on both
    // engines. The dedup a clickstream pipeline runs before counting.
    "ev_debounce" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("kept",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(5000000000L), 1L).otherwise(0L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_raw"), sum("kept").as("n_kept"))
          .orderBy("event_type")
      },
      Some("""WITH k AS (
             |  SELECT event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 5000000000
             |              THEN 1 ELSE 0 END AS kept
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
             |       CAST(sum(kept) AS BIGINT) AS n_kept
             |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // top-10 session path prefixes: sessionize (gap>30min), take each
    // session's first 3 event types in (ts, event_id) order, count
    // paths. The per-session slice is bounded (3) and the path
    // vocabulary ≤ |types|^3, so the final agg is tiny at any scale;
    // sort_array on the collected (ts,event_id,type) structs makes
    // the slice deterministic where collect_list alone is not.
    "ev_session_paths" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1).otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .select(array_join(
            expr("transform(slice(evs, 1, 3), x -> x.event_type)"), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(10)
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |r AS (SELECT user_id, session_id, event_type,
             |             row_number() OVER (PARTITION BY user_id, session_id
             |                                ORDER BY ts, event_id) AS rn
             |      FROM s),
             |p AS (SELECT user_id, session_id,
             |             string_agg(event_type, '>' ORDER BY rn) AS path
             |      FROM r WHERE rn <= 3 GROUP BY user_id, session_id)
             |SELECT path, CAST(count(*) AS BIGINT) AS n
             |FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // full weekly cohort retention triangle (generalizes the single
    // 7-day cell of ev_retention): cohort week = first active week,
    // one row per (cohort, week offset). Active set is distinct
    // (user, week) BEFORE the join, so shuffle ∝ active pairs; cohort
    // sizes are a tiny broadcast frame.
    "ev_cohort_triangle" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000 DIV 7").as("wk"))
        val c0 = ev.groupBy("user_id").agg(min("wk").as("w0"))
        val sz = c0.groupBy("w0").agg(count(lit(1)).as("n_cohort"))
        ev.distinct().join(c0, "user_id")
          .groupBy(col("w0"), (col("wk") - col("w0")).as("wk_off"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sz), "w0")
          .select(col("w0"), col("wk_off"), col("n_active"),
            round(col("n_active") / col("n_cohort"), 4).as("pct"))
          .orderBy("w0", "wk_off")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS wk FROM events),
             |c0 AS (SELECT user_id, min(wk) AS w0 FROM ev GROUP BY user_id),
             |sz AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_cohort FROM c0 GROUP BY w0),
             |act AS (SELECT w0, wk - w0 AS wk_off, CAST(count(*) AS BIGINT) AS n_active
             |        FROM (SELECT DISTINCT user_id, wk FROM ev) du JOIN c0 USING (user_id)
             |        GROUP BY w0, wk_off)
             |SELECT w0, wk_off, n_active, round(n_active * 1.0 / n_cohort, 4) AS pct
             |FROM act JOIN sz USING (w0) ORDER BY w0, wk_off""".stripMargin)),

    // seasonal-baseline anomaly detection: the 3σ rule of ev_outliers
    // but against a PER-HOUR-OF-DAY profile per type (≤ 24·|types|
    // rows, broadcast), so a nightly lull doesn't mask a daytime
    // spike. The profile is one agg over the facts; flagging is a
    // broadcast join — two passes, no windows.
    "ts_seasonal" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("hod", expr("(ts DIV 3600000000000) % 24"))
        val prof = ev.groupBy(col("event_type").as("et"), col("hod").as("h"))
          .agg(avg("value").as("mu"), stddev("value").as("sd"))
        ev.join(broadcast(prof), col("event_type") === col("et") && col("hod") === col("h"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               sum(when(abs((col("value") - col("mu")) / col("sd")) > 3, 1L)
                 .otherwise(0L)).as("n_anom"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, value,
             |                  (epoch_ns(ts) // 3600000000000) % 24 AS hod
             |           FROM events),
             |prof AS (SELECT event_type AS et, hod AS h, avg(value) AS mu,
             |                stddev_samp(value) AS sd
             |         FROM e GROUP BY et, h)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN abs((value - mu) / sd) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
             |FROM e JOIN prof ON event_type = et AND hod = h
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // association rules over per-user event-type sets: support /
    // confidence / lift for every ordered type pair. The self-join is
    // on user_id over the DISTINCT (user, type) table, so per-user
    // fan-out is bounded by |types| choose 2 and the partial agg
    // collapses to ≤ |types|² groups map-side; totals broadcast.
    // Lift's n_a·n_b product goes through double — at 1e9 users a
    // long×long product would wrap.
    "ev_assoc_rules" -> Q(
      (s, d) => {
        val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
        val nu = ut.select("user_id").distinct().agg(count(lit(1)).as("n_users"))
        val pair = ut.toDF("user_id", "ta").join(ut.toDF("user_id", "tb"), "user_id")
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_both"))
        val cnt = ut.groupBy("event_type").agg(count(lit(1)).as("c"))
        pair.join(broadcast(cnt.toDF("ta", "n_a")), "ta")
          .join(broadcast(cnt.toDF("tb", "n_b")), "tb")
          .crossJoin(broadcast(nu))
          .select(col("ta"), col("tb"), col("n_both"),
            round(col("n_both") / col("n_users"), 4).as("support"),
            round(col("n_both") / col("n_a"), 4).as("conf"),
            round(col("n_both").cast("double") * col("n_users")
              / (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
          .orderBy("ta", "tb")
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
             |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
             |pair AS (SELECT a.event_type AS ta, b.event_type AS tb,
             |                CAST(count(*) AS BIGINT) AS n_both
             |         FROM ut a JOIN ut b ON a.user_id = b.user_id
             |                           AND a.event_type < b.event_type
             |         GROUP BY ta, tb),
             |cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY event_type)
             |SELECT ta, tb, n_both,
             |       round(n_both * 1.0 / n_users, 4) AS support,
             |       round(n_both * 1.0 / ca.c, 4) AS conf,
             |       round(CAST(n_both AS DOUBLE) * n_users / (CAST(ca.c AS DOUBLE) * cb.c), 4) AS lift
             |FROM pair JOIN cnt ca ON ca.event_type = ta
             |          JOIN cnt cb ON cb.event_type = tb
             |          CROSS JOIN nu
             |ORDER BY ta, tb""".stripMargin)),

    // PageRank over the event-type transition graph, 10 fixed
    // iterations (damping 0.85, no dangling redistribution — every
    // observed type has outgoing mass here and the oracle mirrors the
    // simplification). The data-scale work is ONE distributed pass
    // building the ≤|types|²-row edge table; the power loop then runs
    // driver-side over those bounded rows (the Ann-probe bounded-
    // collect altitude) — composing 10 iterations into the plan
    // re-derives the fact-table lineage per iteration, i.e. 10 full
    // scans at 100 TB for a 5×5 matrix-vector product.
    "graph_pagerank" -> Q(
      (s, d) => {
        // edge counts AND the node set both come from the shared
        // transitionCells table (to_type-NULL rows kept there mean
        // distinct from_type = distinct event_type over all events)
        val cells0 = transitionCells(s, d)
        val cntE = cells0
          .filter(col("to_type").isNotNull && col("from_type").isNotNull)
          .select(col("from_type").as("src"), col("to_type").as("dst"), col("n"))
        val tot = cntE.groupBy("src").agg(sum("n").as("tot"))
        val edges = cntE.join(broadcast(tot), "src")
          .select(col("src"), col("dst"), (col("n") / col("tot")).as("p"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        val nodes = cells0.filter(col("from_type").isNotNull)
          .select(col("from_type")).distinct()
          .collect().map(_.getString(0)).sorted
        val nN = nodes.length
        var rank = nodes.map(t => t -> 1.0 / nN).toMap
        for (_ <- 1 to 10) {
          val inr = edges.groupBy(_._2).map { case (dst, es) =>
            dst -> es.map(e => e._3 * rank(e._1)).sum }
          rank = nodes.map(t => t -> (0.15 / nN + 0.85 * inr.getOrElse(t, 0.0))).toMap
        }
        import s.implicits._
        rank.toSeq.sortBy(_._1).toDF("t", "r0")
          .select(col("t"), round(col("r0"), 6).as("pr"))
      },
      Some(s"""WITH tr AS (
              |  SELECT event_type AS src,
              |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
              |  FROM events),
              |cnt AS (SELECT src, dst, count(*) AS n FROM tr
              |        WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
              |tot AS (SELECT src, sum(n) AS tot FROM cnt GROUP BY src),
              |e AS (SELECT src, dst, n * 1.0 / tot AS p FROM cnt JOIN tot USING (src)),
              |nodes AS (SELECT DISTINCT event_type AS t FROM events
              |          WHERE event_type IS NOT NULL),
              |nn AS (SELECT count(*) AS nn FROM nodes),
              |it0 AS (SELECT t, 1.0 / nn AS r FROM nodes, nn),
              |${pagerankIterSql(10)}
              |SELECT t, round(r, 6) AS pr FROM it10 ORDER BY t""".stripMargin)),

    // SCD type-2 interval build: collapse each user's event stream
    // into validity intervals of the current event type (the
    // dimension-history construction warehouses run nightly). Change
    // points survive a lag(type) filter; valid_to is lead(ts) over
    // the FILTERED frame — two per-user windows over one fact scan,
    // no self-join, no global sort; output ∝ type CHANGES, not events.
    // valid_to is NULL on each user's open (current) interval.
    "ev_scd2" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("pt", lag(col("event_type"), 1).over(w))
          .filter(col("pt").isNull || !(col("pt") <=> col("event_type")))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          // μs, not ns: DuckDB truncates TIMESTAMP(NANOS) to micros on
          // read, so emitted bounds must be micro-granular to compare
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("ts DIV 1000").as("valid_from"),
                  expr("valid_to DIV 1000").as("valid_to"))
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, event_type, ts,
             |         lag(event_type) OVER w AS pt,
             |         CASE WHEN lag(event_type) OVER w IS NULL THEN 1
             |              WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1
             |              ELSE 0 END AS chg
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |iv AS (
             |  SELECT user_id, event_id, event_type,
             |         epoch_ns(ts) // 1000 AS valid_from,
             |         epoch_ns(lead(ts) OVER (PARTITION BY user_id
             |                                 ORDER BY ts, event_id)) // 1000 AS valid_to
             |  FROM ch WHERE chg = 1)
             |SELECT user_id, event_id, event_type, valid_from, valid_to
             |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin)),

    // lag-k autocorrelation (k = 1..3) of the hourly event-count
    // series per type, computed on the AGGREGATED (type, hour) frame
    // (≤ |types|·|hours| rows): the facts are scanned ONCE into the
    // hourly rollup; lag alignment is an equi-join of that tiny frame
    // with itself on hour+k — no window over facts, no dense spine.
    // Hours missing from the series simply contribute no pair (the
    // irregular-sampling ACF convention).
    "ts_acf" -> Q(
      (s, d) => {
        // materialized once (the Dedup localCheckpoint idiom): both
        // sides of the lag alignment read this tiny rollup, and the
        // fact table must not be scanned twice to build it
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false)
        val a = hourly
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        // hb = h + k is an equality between a left expression and a
        // right attribute, so Catalyst keys the shuffle on it — the
        // join stays an equi-join on (type, aligned hour), never a
        // per-type cross of hours
        a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(count(lit(1)).as("n_pairs"), round(corr("c", "cb"), 4).as("acf"))
          .orderBy("event_type", "k")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |p AS (SELECT a.event_type, l.k, a.c AS ca, b.c AS cb
             |      FROM hourly a CROSS JOIN l
             |      JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k)
             |SELECT event_type, k, CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(corr(ca, cb), 4) AS acf
             |FROM p GROUP BY event_type, k ORDER BY event_type, k""".stripMargin)),

    // cross-correlation function clicks→purchases at lags −3..+3
    // days: does click volume LEAD purchase volume (positive lag) or
    // lag it — the campaign-attribution sanity check next to ts_acf.
    // Both series come out of ONE conditional grouped pass over the
    // facts (never two scans); the lag alignment is the ts_acf
    // equi-join idiom (day+k on the left keys the shuffle), on the
    // checkpointed O(days) frame.
    "ts_ccf" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"))
          .localCheckpoint(eager = false) // both sides of the alignment
        val a = daily.withColumn("k",
          explode(array((-3 to 3).map(i => lit(i.toLong)): _*)))
        val b = daily.select(col("day").as("db"), col("y").as("yb"))
        a.join(b, col("db") === col("day") + col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"), round(corr(col("x"), col("yb")), 4).as("ccf"))
          .orderBy("k")
      },
      Some("""WITH daily AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |l AS (SELECT CAST(unnest([-3, -2, -1, 0, 1, 2, 3]) AS BIGINT) AS k),
             |p AS (SELECT l.k, a.x, b.y AS yb
             |      FROM daily a CROSS JOIN l
             |      JOIN daily b ON b.day = a.day + l.k)
             |SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(corr(x, yb), 4) AS ccf
             |FROM p GROUP BY k ORDER BY k""".stripMargin)),

    // Pettitt changepoint test on the daily purchase series: the
    // rank-based (outlier-proof) "did the level shift, and when"
    // test. s_t = Σ_j sign(v_t − v_j) comes from the |days|² pair
    // frame — bounded by the CALENDAR squared (3650² ≈ 13M at a
    // 10-year retention horizon), never by corpus rows — and
    // U_t = cumsum(s_t) is the standard Pettitt recurrence. All
    // integer arithmetic until the final p-value, so both engines
    // agree bit-for-bit on K and the changepoint day.
    "ts_pettitt" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("v"))
          .localCheckpoint(eager = false) // pair frame ×2 + day count
        val st = daily.select(col("day").as("t"), col("v").as("vt"))
          .crossJoin(daily.select(col("v").as("vj")))
          .groupBy("t")
          .agg(sum(signum(col("vt") - col("vj"))).cast("long").as("s"))
        val w = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nn = daily.agg(count(lit(1)).as("n_days"))
        st.withColumn("u", sum("s").over(w))
          .withColumn("au", abs(col("u")))
          .orderBy(col("au").desc, col("t")).limit(1)
          .crossJoin(broadcast(nn))
          .select(col("n_days"), col("t").as("cp_day"), col("au").as("k_stat"),
            round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) * col("au") * col("au")
              / (col("n_days").cast("double") * col("n_days") * col("n_days")
                 + col("n_days").cast("double") * col("n_days")))), 6).as("p_value"))
      },
      Some("""WITH daily AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |s AS (SELECT a.day AS t, CAST(sum(sign(a.v - b.v)) AS BIGINT) AS s
             |      FROM daily a CROSS JOIN daily b GROUP BY a.day),
             |u AS (SELECT t, CAST(sum(s) OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u
             |      FROM s),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
             |best AS (SELECT t, abs(u) AS au FROM u ORDER BY au DESC, t LIMIT 1)
             |SELECT n_days, t AS cp_day, au AS k_stat,
             |       round(least(1.0, 2.0 * exp(-6.0 * au * au
             |         / (CAST(n_days AS DOUBLE) * n_days * n_days
             |            + CAST(n_days AS DOUBLE) * n_days))), 6) AS p_value
             |FROM best, nn""".stripMargin)),

    // longest consecutive-day activity streak per user (the
    // gaps-and-islands idiom): distinct (user, day) first — so the
    // window ranks DAYS, bounded by the calendar, never raw events —
    // then island id = day − row_number, longest island per user,
    // and a tiny histogram of streak lengths. The retention-quality
    // metric DAU counts can't see.
    "ev_streaks" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        ud.withColumn("island", col("day") - row_number().over(w))
          .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max("len").as("streak"))
          .groupBy("streak").agg(count(lit(1)).as("n_users"))
          .orderBy("streak")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
             |                   epoch_ns(ts) // 86400000000000 AS day
             |            FROM events),
             |i AS (SELECT user_id, day,
             |             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
             |      FROM ud),
             |st AS (SELECT user_id, CAST(max(len) AS BIGINT) AS streak FROM (
             |         SELECT user_id, island, count(*) AS len
             |         FROM i GROUP BY user_id, island)
             |       GROUP BY user_id)
             |SELECT streak, CAST(count(*) AS BIGINT) AS n_users
             |FROM st GROUP BY streak ORDER BY streak""".stripMargin)),

    // time-window-constrained funnel (signup → click ≤1h → purchase
    // ≤1h after the click): the product-analytics variant where each
    // step must happen within a window of the previous. Earliest-
    // qualifying-chain semantics keeps it deterministic and each step
    // is one filtered grouped-min + equi-join on user — the unbounded
    // ev_funnel plan with one extra predicate, no windows, no
    // self-join of the fact table.
    "ev_funnel_windowed" -> Q(
      (s, d) => {
        val H = 3600000000L // 1h in micros
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ats"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ats").as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ats") >= col("t1") && col("ats") <= col("t1") + H)
          .groupBy("user_id").agg(min("ats").as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ats") >= col("t2") && col("ats") <= col("t2") + H)
          .groupBy("user_id").agg(min("ats").as("t3"))
        s1.agg(count(lit(1)).as("n_signup"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click_1h")))
          .crossJoin(s3.agg(count(lit(1)).as("n_purchase_1h")))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ats FROM events),
             |s1 AS (SELECT user_id, min(ats) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (SELECT ev.user_id, min(ats) AS t2 FROM ev JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND ats >= t1 AND ats <= t1 + 3600000000
             |       GROUP BY ev.user_id),
             |s3 AS (SELECT ev.user_id, min(ats) AS t3 FROM ev JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND ats >= t2 AND ats <= t2 + 3600000000
             |       GROUP BY ev.user_id)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_1h,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_1h""".stripMargin)),

    // time-decay multi-touch attribution: every click in the hour
    // before a purchase shares the credit, weighted exp(−Δt/15min)
    // and normalized per purchase. The click×purchase pairing is the
    // bucketed range join (ops.Joins.rangeJoinBucketed — equi-join on
    // (user, time bucket) + residual predicate, never a per-user
    // cross), and the per-purchase normalizer is a grouped sum
    // re-joined on pid. Output: when do the clicks that actually
    // drive purchases happen (credit by click hour-of-day).
    "ev_attribution_decay" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("ts DIV 1000").as("ats"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ats").as("cts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
                  (col("ats") - lit(3600000000L)).as("st"),
                  (col("ats") - 1).as("en"), col("ats").as("pts"))
        val pairs = graft.ops.Joins.rangeJoinBucketed(
            clicks, purch, Seq("user_id"), "cts", "st", "en", 3600000000L)
          .withColumn("w",
            exp((col("cts") - col("pts")).cast("double") / lit(900000000.0)))
          .localCheckpoint(eager = false) // read again for the normalizer
        val tot = pairs.groupBy("pid").agg(sum("w").as("sw"))
        pairs.join(tot, "pid")
          .withColumn("credit", col("w") / col("sw"))
          .withColumn("hod", expr("(cts DIV 3600000000) % 24"))
          .groupBy("hod")
          .agg(round(sum("credit"), 4).as("credit"), count(lit(1)).as("n_pairs"))
          .orderBy("hod")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ats
             |           FROM events),
             |c AS (SELECT user_id, ats AS cts FROM ev WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS pid, ats AS pts FROM ev
             |      WHERE event_type = 'purchase'),
             |pr AS (SELECT c.user_id, pid, cts, pts,
             |              exp((cts - pts) / 900000000.0) AS w
             |       FROM c JOIN p ON c.user_id = p.user_id
             |        AND cts BETWEEN pts - 3600000000 AND pts - 1),
             |tot AS (SELECT pid, sum(w) AS sw FROM pr GROUP BY pid)
             |SELECT (cts // 3600000000) % 24 AS hod, round(sum(w / sw), 4) AS credit,
             |       CAST(count(*) AS BIGINT) AS n_pairs
             |FROM pr JOIN tot USING (pid) GROUP BY hod ORDER BY hod""".stripMargin)),

    // peak concurrent users per day: sessions (same 30-min gap as
    // ev_sessionize) become ±1 sweep-line boundaries, and the running
    // count is a TWO-PHASE prefix sum — a per-day window over that
    // day's boundaries plus a carry-in equal to the net delta of all
    // prior days (a #days-row aggregate, broadcast back). No global
    // window ever touches the boundary set, so the plan scales with
    // executors; ties at one instant order starts before ends
    // (delta DESC), making the per-day max deterministic.
    "ev_concurrency" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("sid",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(min("ts").as("st"), max("ts").as("en"))
        val bounds = sess.select(col("st").as("t"), lit(1).as("delta"))
          .unionAll(sess.select(col("en").as("t"), lit(-1).as("delta")))
          .withColumn("day", expr("t DIV 86400000000000"))
          .localCheckpoint(eager = false) // read twice: local run + carry
        val wd = Window.partitionBy("day")
          .orderBy(col("t"), col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val local = bounds.withColumn("run", sum("delta").over(wd))
        val carry = bounds.groupBy("day").agg(sum("delta").as("net"))
          .withColumn("carry",
            coalesce(sum("net").over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("day", "carry")
        local.join(broadcast(carry), "day")
          .groupBy("day")
          .agg(max(col("run") + col("carry")).as("peak"))
          .orderBy("day")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, epoch_ns(ts) AS tns,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g),
             |iv AS (SELECT user_id, sid, min(tns) AS st, max(tns) AS en
             |       FROM s GROUP BY user_id, sid),
             |b AS (SELECT st AS t, 1 AS delta FROM iv
             |      UNION ALL SELECT en, -1 FROM iv),
             |r AS (SELECT t // 86400000000000 AS day,
             |             sum(delta) OVER (ORDER BY t, delta DESC
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
             |      FROM b)
             |SELECT day, CAST(max(conc) AS BIGINT) AS peak
             |FROM r GROUP BY day ORDER BY day""".stripMargin)),

    // bot / automation detection by inter-arrival regularity: humans
    // are bursty (gap CV ≈ 1, Poisson-like — measured 0.78–1.12 on
    // this corpus), schedulers are metronomes. One user-partitioned
    // lag pass (hash-partitioned, never global) then a grouped
    // moment aggregate; the CV is rounded to 6 BEFORE the threshold
    // compare so a boundary user cannot flip on one engine's float
    // summation order only.
    "ev_bot_flags" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("gap",
            (col("ts") - lag(col("ts"), 1).over(w)) / lit(1e9))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
               avg("gap").as("m"), stddev_samp(col("gap")).as("sd"))
          .withColumn("cv", round(col("sd") / col("m"), 6))
          .filter(col("n_events") >= 50 && col("cv") < 0.85)
          .select(col("user_id"), col("n_events"),
                  round(col("m"), 3).as("mean_gap_s"), round(col("cv"), 4).as("cv"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |         (epoch_ns(ts) - lag(epoch_ns(ts)) OVER
             |            (PARTITION BY user_id ORDER BY ts, event_id)) / 1e9 AS gap
             |  FROM events),
             |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |             avg(gap) AS m, round(stddev_samp(gap) / avg(gap), 6) AS cv
             |      FROM g GROUP BY user_id)
             |SELECT user_id, n_events, round(m, 3) AS mean_gap_s, round(cv, 4) AS cv
             |FROM s WHERE n_events >= 50 AND cv < 0.85
             |ORDER BY user_id""".stripMargin)),

    // Kaplan–Meier survival of time-to-first-purchase after signup,
    // right-censored at the corpus observation end. The heavy work is
    // two per-user aggregates + one equi-join on user_id; the KM life
    // table itself is |distinct day| rows, so the cumulative windows
    // (trailing at-risk sum n_k = Σ_{j≥k}(d_j+c_j) — no global-N
    // join — and the survival product as exp of summed logs) run on
    // a days-bounded frame at ANY user count. A greatest(ε,·) floor
    // under the log makes a last-day full-event bucket read S=0 on
    // both engines instead of surfacing either's ln(0) convention.
    "ev_survival" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("su"))
          .localCheckpoint(eager = false) // reused by pu AND life: one signup scan
        val pu = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts").join(su, "user_id")
          .filter(col("ts") >= col("su"))
          .groupBy("user_id").agg(min("ts").as("pu"))
        val end = ev.agg(max("ts").as("te"))
        val life = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(expr("(coalesce(pu, te) - su) div 86400000000000").as("day"),
                  when(col("pu").isNotNull, 1L).otherwise(0L).as("e"))
          .groupBy("day")
          .agg(sum("e").as("n_event"), sum(lit(1L) - col("e")).as("n_cens"))
        val wRisk = Window.orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val wSurv = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        life
          .withColumn("n_risk", sum(col("n_event") + col("n_cens")).over(wRisk))
          .withColumn("surv", round(exp(sum(log(greatest(lit(1e-300),
            lit(1.0) - col("n_event") / col("n_risk")))).over(wSurv)), 4))
          .select("day", "n_risk", "n_event", "n_cens", "surv")
          .orderBy("day")
      },
      Some("""WITH su AS (SELECT user_id, min(epoch_ns(ts)) AS su
             |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |pu AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS pu
             |       FROM events e JOIN su ON su.user_id = e.user_id
             |       WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= su.su
             |       GROUP BY e.user_id),
             |te AS (SELECT max(epoch_ns(ts)) AS te FROM events),
             |life AS (SELECT (coalesce(pu, te) - su) // 86400000000000 AS day,
             |                CASE WHEN pu IS NULL THEN 0 ELSE 1 END AS e
             |         FROM su LEFT JOIN pu USING (user_id), te),
             |tab AS (SELECT day, CAST(sum(e) AS BIGINT) AS n_event,
             |               CAST(sum(1 - e) AS BIGINT) AS n_cens
             |        FROM life GROUP BY day),
             |rk AS (SELECT day, n_event, n_cens,
             |              CAST(sum(n_event + n_cens) OVER (ORDER BY day
             |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
             |       FROM tab)
             |SELECT day, n_risk, n_event, n_cens,
             |       round(exp(sum(ln(greatest(1e-300, 1 - n_event * 1.0 / n_risk)))
             |         OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS surv
             |FROM rk ORDER BY day""".stripMargin)),

    // Stationary distribution of the event-type Markov chain: the
    // ev_transitions row-stochastic matrix (probs rounded to 6 so
    // both engines iterate identical inputs) power-iterated 12 rounds
    // from uniform. The corpus is scanned ONCE into the checkpointed
    // |types|² cells frame; each round is then a broadcast join of
    // the |types|-row vector against it plus a tiny aggregate, so
    // iteration cost is independent of event count. Per-round
    // rounding to 7 pins the trajectory bit-for-bit across engines
    // (partial-agg summation order differs; 1e-17 assoc noise never
    // reaches the 7th decimal).
    "ev_stationary" -> Q(
      (s, d) => {
        // shares the one-per-process lead() pass with ev_transitions /
        // graph_pagerank (the round-9 super-linear edge, now amortized)
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val tot = pairs.groupBy("from_type").agg(sum("n").as("tt"))
        val cells = pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"),
                  round(col("n") / col("tt"), 6).as("p"))
          .localCheckpoint(eager = false) // read 13×, never re-scans events
        val states = cells.select("from_type").distinct()
        val kk = states.agg(count(lit(1)).as("k"))
        var v = states.crossJoin(broadcast(kk))
          .select(col("from_type").as("state"),
                  round(lit(1.0) / col("k"), 7).as("v"))
        for (_ <- 1 to 12)
          v = cells.join(broadcast(v), cells("from_type") === v("state"))
            .groupBy("to_type")
            .agg(round(sum(col("p") * col("v")), 7).as("v"))
            .withColumnRenamed("to_type", "state")
        v.select(col("state"), round(col("v"), 4).as("pi")).orderBy("state")
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, count(*) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |tot AS (SELECT from_type, sum(n) AS tt FROM cnt GROUP BY from_type),
             |cells AS (SELECT from_type, to_type, round(n * 1.0 / tt, 6) AS p
             |          FROM cnt JOIN tot USING (from_type)),
             |kk AS (SELECT count(DISTINCT from_type) AS k FROM cells),
             |v0 AS (SELECT DISTINCT from_type AS state, round(1.0 / k, 7) AS v
             |       FROM cells, kk),
             |${stationaryIterSql(12)}
             |SELECT state, round(v, 4) AS pi FROM v12 ORDER BY state""".stripMargin)),

    // CUSUM change-point scan on the per-type daily event-count
    // series: C_k = Σ_{j≤k}(cnt_j − mean) peaks at the most likely
    // level-shift day (Page's statistic without reset). The raw
    // stream collapses in ONE grouped pass; every window then runs
    // on the |types|×|days| daily frame. The per-type mean is
    // rounded to 6 BEFORE subtraction so both engines accumulate
    // identical deviations (integer counts − fixed-decimal mean →
    // the ordered cumulative sum is bit-identical); the argmax
    // tie-breaks to the earliest day.
    "ts_cusum" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // |types|×|days| rows, read 2×: ONE event scan
        val mu = daily.groupBy("event_type")
          .agg(round(avg("cnt"), 6).as("mu"), count(lit(1)).as("n_days"))
        val wc = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wr = Window.partitionBy("event_type")
          .orderBy(abs(col("cusum")).desc, col("day"))
        daily.join(broadcast(mu), "event_type")
          .withColumn("cusum", sum(col("cnt") - col("mu")).over(wc))
          .withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("n_days"),
                  col("day").as("change_day"),
                  round(abs(col("cusum")), 4).as("max_abs_cusum"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY event_type, day),
             |mu AS (SELECT event_type, round(avg(cnt), 6) AS mu,
             |              CAST(count(*) AS BIGINT) AS n_days
             |       FROM daily GROUP BY event_type),
             |cs AS (SELECT event_type, day, n_days,
             |              sum(cnt - mu) OVER (PARTITION BY event_type ORDER BY day
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
             |       FROM daily JOIN mu USING (event_type)),
             |rk AS (SELECT event_type, n_days, day, cusum,
             |              row_number() OVER (PARTITION BY event_type
             |                ORDER BY abs(cusum) DESC, day) AS rk
             |       FROM cs)
             |SELECT event_type, n_days, day AS change_day,
             |       round(abs(cusum), 4) AS max_abs_cusum
             |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // two-proportion z-test of an A/B split: arm assignment is the
    // salted content-stable hash of user_id (the Sampling idiom — the
    // assignment a real experiment framework would persist, and
    // re-runs/repartitioning never move a user between arms),
    // conversion = repeat purchaser (≥14 purchases; "any purchase"
    // saturates on this corpus — every user converts and the pooled
    // variance is 0). ONE per-user aggregate then a 2-row arm rollup
    // collapsed map-side into the single stats row — no window, no
    // join, corpus scanned once. A degenerate pool (0 or 1) NULLs z
    // on both engines rather than surfacing a divide-by-zero.
    "ev_ab_test" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 14).cast("long").as("conv"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
        users.agg(
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_t"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x_c"))
          .select(col("n_t"), col("n_c"), col("x_t"), col("x_c"),
            when(col("n_t") === 0, lit(null).cast("double"))
              .otherwise(round(col("x_t") / col("n_t").cast("double"), 4)).as("cr_t"),
            when(col("n_c") === 0, lit(null).cast("double"))
              .otherwise(round(col("x_c") / col("n_c").cast("double"), 4)).as("cr_c"),
            round((col("x_t") + col("x_c"))
              / (col("n_t") + col("n_c")).cast("double"), 6).as("pool"))
          .select(col("n_t"), col("n_c"), col("x_t"), col("x_c"),
            col("cr_t"), col("cr_c"),
            round(col("cr_t") - col("cr_c"), 4).as("lift"),
            when(col("n_t") === 0 || col("n_c") === 0 ||
                 col("pool") <= 0.0 || col("pool") >= 1.0,
                lit(null).cast("double"))
              .otherwise(round((col("x_t") / col("n_t").cast("double")
                 - col("x_c") / col("n_c").cast("double"))
                / sqrt(col("pool") * (lit(1.0) - col("pool"))
                  * (lit(1.0) / col("n_t") + lit(1.0) / col("n_c"))), 4))
              .as("z"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
             |              THEN 1 ELSE 0 END AS conv,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events GROUP BY user_id),
             |a AS (SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_t,
             |             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_c
             |      FROM u),
             |b AS (SELECT *,
             |             CASE WHEN n_t = 0 THEN NULL
             |                  ELSE round(x_t / CAST(n_t AS DOUBLE), 4) END AS cr_t,
             |             CASE WHEN n_c = 0 THEN NULL
             |                  ELSE round(x_c / CAST(n_c AS DOUBLE), 4) END AS cr_c,
             |             round((x_t + x_c) / CAST(n_t + n_c AS DOUBLE), 6) AS pool
             |      FROM a)
             |SELECT n_t, n_c, x_t, x_c, cr_t, cr_c,
             |       round(cr_t - cr_c, 4) AS lift,
             |       CASE WHEN n_t = 0 OR n_c = 0 OR pool <= 0.0 OR pool >= 1.0 THEN NULL
             |            ELSE round((x_t / CAST(n_t AS DOUBLE) - x_c / CAST(n_c AS DOUBLE))
             |             / sqrt(pool * (1.0 - pool) * (1.0 / n_t + 1.0 / n_c)), 4) END AS z
             |FROM b""".stripMargin)),

    // decile lift & cumulative gains: score users by activity volume,
    // response = any purchase — "does the score rank responders to
    // the top?" in the table a targeting/curation pipeline reads.
    // Deciles come from BROADCAST interpolated-percentile cutoffs
    // (rounded to 6 so both engines bucket identically), NEVER a
    // global ntile sort; the only window runs over the ≤10 decile
    // rows. Integer-valued scores tie heavily, so buckets are
    // unequal by construction — lift is computed against each
    // bucket's own size, which keeps the report honest under ties.
    "ev_lift_gain" -> Q(
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
               max(when(col("event_type") === "purchase", 1L)
                 .otherwise(0L)).as("resp"))
          .localCheckpoint(eager = false) // read 2×: cutoffs + bucketing
        val cuts = users.agg(expr(
          "transform(percentile(n, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)), " +
          "x -> round(x, 6))").as("bs"))
        val bucketed = users.crossJoin(broadcast(cuts))
          .withColumn("decile", lit(10) - expr(
            "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN n > b THEN 1 ELSE 0 END)"))
        val tot = bucketed.agg(sum("resp").as("tr"), count(lit(1)).as("tn"))
        val wCum = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.groupBy("decile")
          .agg(count(lit(1)).as("n_users"), sum("resp").as("resp"))
          .crossJoin(broadcast(tot))
          .withColumn("cum_resp", sum("resp").over(wCum))
          .select(col("decile"), col("n_users"),
            round(col("resp") / col("n_users").cast("double"), 4).as("resp_rate"),
            // zero-responder corpus: lift/gain undefined, NULL not ÷0
            when(col("tr") === 0, lit(null).cast("double"))
              .otherwise(round((col("resp") / col("n_users").cast("double"))
                / (col("tr") / col("tn").cast("double")), 4)).as("lift"),
            when(col("tr") === 0, lit(null).cast("double"))
              .otherwise(round(col("cum_resp") / col("tr").cast("double"), 4))
              .as("cum_gain"))
          .orderBy("decile")
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS resp
             |  FROM events GROUP BY user_id),
             |c AS (SELECT round(quantile_cont(n, 0.1), 6) AS b1, round(quantile_cont(n, 0.2), 6) AS b2,
             |             round(quantile_cont(n, 0.3), 6) AS b3, round(quantile_cont(n, 0.4), 6) AS b4,
             |             round(quantile_cont(n, 0.5), 6) AS b5, round(quantile_cont(n, 0.6), 6) AS b6,
             |             round(quantile_cont(n, 0.7), 6) AS b7, round(quantile_cont(n, 0.8), 6) AS b8,
             |             round(quantile_cont(n, 0.9), 6) AS b9
             |      FROM u),
             |bk AS (SELECT u.*, 10 - ((n > b1)::INT + (n > b2)::INT + (n > b3)::INT
             |              + (n > b4)::INT + (n > b5)::INT + (n > b6)::INT
             |              + (n > b7)::INT + (n > b8)::INT + (n > b9)::INT) AS decile
             |       FROM u, c),
             |tot AS (SELECT CAST(sum(resp) AS BIGINT) AS tr, CAST(count(*) AS BIGINT) AS tn FROM bk),
             |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(resp) AS BIGINT) AS resp
             |      FROM bk GROUP BY decile)
             |SELECT decile, n_users,
             |       round(resp / CAST(n_users AS DOUBLE), 4) AS resp_rate,
             |       CASE WHEN tr = 0 THEN NULL
             |            ELSE round((resp / CAST(n_users AS DOUBLE)) / (tr / CAST(tn AS DOUBLE)), 4) END AS lift,
             |       CASE WHEN tr = 0 THEN NULL
             |            ELSE round(sum(resp) OVER (ORDER BY decile
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / CAST(tr AS DOUBLE), 4) END AS cum_gain
             |FROM g, tot ORDER BY decile""".stripMargin)),

    // rolling-origin forecast backtest: forecast each day's count per
    // type as the trailing-7-day mean, score MAPE/RMSE/bias on every
    // day with a full window — the evaluation harness that validates
    // a capacity forecast before anyone trusts it. The stream
    // collapses in ONE grouped pass; forecast + scoring windows all
    // run on the checkpointed |types|×|days| frame. Forecasts round
    // to 6 before the error metrics so both engines score identical
    // residuals.
    "ts_backtest" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false)
        val wF = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        val wN = Window.partitionBy("event_type").orderBy("day")
        daily
          .withColumn("f", round(avg("cnt").over(wF), 6))
          .withColumn("rn", row_number().over(wN))
          .filter(col("rn") > 7)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
               round(avg(abs(col("f") - col("cnt")) / col("cnt")), 4).as("mape"),
               round(sqrt(avg(pow(col("f") - col("cnt"), 2))), 4).as("rmse"),
               round(avg(col("f") - col("cnt")), 4).as("bias"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY event_type, day),
             |f AS (SELECT event_type, day, cnt,
             |             round(avg(cnt) OVER (PARTITION BY event_type ORDER BY day
             |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 6) AS f,
             |             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
             |      FROM daily)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
             |       round(avg(abs(f - cnt) / cnt), 4) AS mape,
             |       round(sqrt(avg(pow(f - cnt, 2))), 4) AS rmse,
             |       round(avg(f - cnt), 4) AS bias
             |FROM f WHERE rn > 7 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // minimum-detectable-effect curve for the ev_ab_test design:
    // MDE(n) = (z_{α/2} + z_{power})·√(2p(1-p)/n) at α=0.05, 80%
    // power, with the baseline p measured from the corpus (rounded to
    // 6 so both engines plug in the same rate). ONE per-user pass for
    // p; the curve is an explode over the n-grid of the single
    // baseline row — the pre-experiment sizing table next to the
    // post-experiment z-test.
    "stat_mde_curve" -> Q(
      (s, d) => {
        val p = Tables.events(s, d)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 14).cast("long").as("conv"))
          .agg(round(avg("conv"), 6).as("p"))
        p.select(col("p"), explode(expr(
            "array(1000L, 5000L, 10000L, 50000L, 100000L)")).as("n_per_arm"))
          .select(col("n_per_arm"), col("p").as("baseline"),
            when(col("p").isNull || col("p") <= 0.0 || col("p") >= 1.0,
                lit(null).cast("double"))
              .otherwise(round(lit(1.96 + 0.8416)
                * sqrt(lit(2.0) * col("p") * (lit(1.0) - col("p"))
                  / col("n_per_arm")), 6)).as("mde_abs"))
          .withColumn("mde_rel",
            when(col("mde_abs").isNull, lit(null).cast("double"))
              .otherwise(round(col("mde_abs") / col("baseline"), 4)))
          .orderBy("n_per_arm")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
             |              THEN 1 ELSE 0 END AS conv
             |  FROM events GROUP BY user_id),
             |p AS (SELECT round(avg(conv), 6) AS p FROM u),
             |g AS (SELECT p, unnest([1000, 5000, 10000, 50000, 100000]) AS n_per_arm FROM p)
             |SELECT CAST(n_per_arm AS BIGINT) AS n_per_arm, p AS baseline,
             |       CASE WHEN p IS NULL OR p <= 0.0 OR p >= 1.0 THEN NULL
             |            ELSE round((1.96 + 0.8416) * sqrt(2.0 * p * (1.0 - p) / n_per_arm), 6)
             |       END AS mde_abs,
             |       CASE WHEN p IS NULL OR p <= 0.0 OR p >= 1.0 THEN NULL
             |            ELSE round(round((1.96 + 0.8416)
             |              * sqrt(2.0 * p * (1.0 - p) / n_per_arm), 6) / p, 4)
             |       END AS mde_rel
             |FROM g ORDER BY n_per_arm""".stripMargin)),

    // weekly growth accounting: every active user classified as
    // new / retained / resurrected per week via ONE per-user lag
    // pass (hash-partitioned window); churned(w) is derived as
    // active(w-1) - retained(w) by joining the tiny |weeks| rollup
    // to itself shifted one week — no second fact scan, no per-user
    // churn window. Quick ratio NULL (not ÷0) when nothing churned.
    "ev_growth_accounting" -> Q(
      (s, d) => {
        val wkAct = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 86400000000000 DIV 7").as("wk"))
          .distinct()
        val wU = Window.partitionBy("user_id").orderBy("wk")
        val classified = wkAct
          .withColumn("pw", lag("wk", 1).over(wU))
          .groupBy("wk").agg(
            count(lit(1)).as("n_active"),
            sum(when(col("pw").isNull, 1L).otherwise(0L)).as("n_new"),
            sum(when(col("pw") === col("wk") - 1, 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("pw").isNotNull && col("pw") < col("wk") - 1, 1L)
              .otherwise(0L)).as("n_resurrected"))
          .localCheckpoint(eager = false)
        val prev = classified
          .select((col("wk") + 1).as("wk"), col("n_active").as("prev_active"))
        classified.join(prev, Seq("wk"), "left")
          .withColumn("n_churned",
            coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .withColumn("quick_ratio",
            when(col("n_churned") > 0,
              round((col("n_new") + col("n_resurrected")).cast("double")
                / col("n_churned"), 4)))
          .select("wk", "n_active", "n_new", "n_retained",
            "n_resurrected", "n_churned", "quick_ratio")
          .orderBy("wk")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id,
             |                  epoch_ns(ts) // 86400000000000 // 7 AS wk
             |           FROM events),
             |c AS (SELECT user_id, wk,
             |             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS pw
             |      FROM a),
             |g AS (SELECT wk,
             |        CAST(count(*) AS BIGINT) AS n_active,
             |        CAST(sum(CASE WHEN pw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             |        CAST(sum(CASE WHEN pw = wk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             |        CAST(sum(CASE WHEN pw IS NOT NULL AND pw < wk - 1 THEN 1 ELSE 0 END)
             |          AS BIGINT) AS n_resurrected
             |      FROM c GROUP BY wk)
             |SELECT g.wk, g.n_active, g.n_new, g.n_retained, g.n_resurrected,
             |       CAST(coalesce(p.n_active, 0) - g.n_retained AS BIGINT) AS n_churned,
             |       CASE WHEN coalesce(p.n_active, 0) - g.n_retained > 0
             |            THEN round((g.n_new + g.n_resurrected) * 1.0
             |                       / (coalesce(p.n_active, 0) - g.n_retained), 4)
             |       END AS quick_ratio
             |FROM g LEFT JOIN g p ON p.wk = g.wk - 1
             |ORDER BY g.wk""".stripMargin)),

    // classical additive decomposition of the daily event count:
    // trend = centered 7-day moving average (RANGE frame on the day
    // VALUE so calendar gaps shrink the window and the full-window
    // filter drops them), seasonal = mean-centered day-of-week index
    // from the detrended full-window rows, residual = the rest. The
    // fact table collapses to |days| rows in ONE scan; every window
    // and join after that runs on that tiny frame (the 7-row
    // seasonal map broadcasts back). Detrended values average in
    // EXACT micro-unit longs (×1e6), not doubles — double summation
    // order differs between engines and flips the 6th decimal.
    "ts_decompose" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("ts DIV 86400000000000").as("day"))
          .groupBy("day").agg(count(lit(1)).cast("double").as("y"))
        val wT = Window.orderBy("day").rangeBetween(-3, 3)
        val trended = daily
          .withColumn("n_win", count(lit(1)).over(wT))
          .withColumn("trend", round(avg("y").over(wT), 6))
          .filter(col("n_win") === 7)
          .withColumn("dow", col("day") % 7)
          .withColumn("det_l",
            round((col("y") - col("trend")) * 1e6, 0).cast("long"))
          .localCheckpoint(eager = false)
        val seas = trended.groupBy("dow").agg(
          round(sum("det_l").cast("double") / count(lit(1)) / 1e6, 6)
            .as("s_raw"))
        val m = seas.agg(
          round(sum(round(col("s_raw") * 1e6, 0).cast("long")).cast("double")
            / count(lit(1)) / 1e6, 6).as("s_mean"))
        val seasAdj = seas.crossJoin(broadcast(m))
          .select(col("dow"),
            round(col("s_raw") - col("s_mean"), 6).as("seasonal"))
        trended.join(broadcast(seasAdj), "dow")
          .select(col("day"), col("dow"), col("y"), col("trend"),
            col("seasonal"),
            round(col("y") - col("trend") - col("seasonal"), 6).as("resid"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             |                      CAST(count(*) AS DOUBLE) AS y
             |               FROM events GROUP BY day),
             |t AS (SELECT day, y,
             |        count(*) OVER w AS n_win,
             |        round(avg(y) OVER w, 6) AS trend
             |      FROM daily
             |      WINDOW w AS (ORDER BY day RANGE BETWEEN 3 PRECEDING
             |                   AND 3 FOLLOWING)),
             |f AS (SELECT day, day % 7 AS dow, y, trend,
             |             CAST(round((y - trend) * 1000000) AS BIGINT) AS det_l
             |      FROM t WHERE n_win = 7),
             |sr AS (SELECT dow, round(sum(det_l) * 1.0 / count(*) / 1000000.0, 6) AS s_raw
             |       FROM f GROUP BY dow),
             |sm AS (SELECT round(sum(CAST(round(s_raw * 1000000) AS BIGINT)) * 1.0
             |                     / count(*) / 1000000.0, 6) AS s_mean FROM sr),
             |se AS (SELECT dow, round(s_raw - s_mean, 6) AS seasonal FROM sr, sm)
             |SELECT f.day, f.dow, f.y, f.trend, se.seasonal,
             |       round(f.y - f.trend - se.seasonal, 6) AS resid
             |FROM f JOIN se USING (dow)
             |ORDER BY f.day""".stripMargin)),

    // Simpson's-paradox audit: hash-parity arms compared on a
    // success rate pooled AND stratified by event_type, so a
    // confounded rollup is visible as a sign flip between the
    // `_pooled` and `_stratified` summary rows. ONE fact scan builds
    // the |types|-row stratum frame (checkpointed — the three
    // output shapes are all rollups of it); the stratified summary
    // is the (n_a+n_b)-weighted average of per-stratum ROUNDED
    // rates, so both engines combine identical cells. Empty arms
    // yield NULL rates, never ÷0.
    "ev_simpson" -> Q(
      (s, d) => {
        val base = Tables.events(s, d)
          .select(col("event_type"),
            when(col("user_id") % 2 === 0, 1).otherwise(0).as("grp_a"),
            when(col("value") > 50.0, 1L).otherwise(0L).as("succ"))
        val strata = base.groupBy("event_type").agg(
            sum(when(col("grp_a") === 1, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("grp_a") === 1, col("succ")).otherwise(0L)).as("s_a"),
            sum(when(col("grp_a") === 0, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("grp_a") === 0, col("succ")).otherwise(0L)).as("s_b"))
          .withColumn("rate_a", when(col("n_a") > 0,
            round(col("s_a").cast("double") / col("n_a"), 6)))
          .withColumn("rate_b", when(col("n_b") > 0,
            round(col("s_b").cast("double") / col("n_b"), 6)))
          .localCheckpoint(eager = false)
        val per = strata.select(col("event_type").as("scope"),
          col("n_a"), col("n_b"), col("rate_a"), col("rate_b"),
          round(col("rate_a") - col("rate_b"), 6).as("diff"))
        val pooled = strata.agg(
            sum("n_a").as("n_a"), sum("s_a").as("s_a"),
            sum("n_b").as("n_b"), sum("s_b").as("s_b"))
          .select(lit("_pooled").as("scope"), col("n_a"), col("n_b"),
            when(col("n_a") > 0,
              round(col("s_a").cast("double") / col("n_a"), 6)).as("rate_a"),
            when(col("n_b") > 0,
              round(col("s_b").cast("double") / col("n_b"), 6)).as("rate_b"))
          .withColumn("diff", round(col("rate_a") - col("rate_b"), 6))
        val stratW = strata.agg(
            sum("n_a").as("n_a"), sum("n_b").as("n_b"),
            round(sum((col("n_a") + col("n_b")) * col("rate_a"))
              / sum(col("n_a") + col("n_b")), 6).as("ra"),
            round(sum((col("n_a") + col("n_b")) * col("rate_b"))
              / sum(col("n_a") + col("n_b")), 6).as("rb"))
          .select(lit("_stratified").as("scope"), col("n_a"), col("n_b"),
            col("ra").as("rate_a"), col("rb").as("rate_b"))
          .withColumn("diff", round(col("rate_a") - col("rate_b"), 6))
        per.unionByName(pooled).unionByName(stratW).orderBy("scope")
      },
      Some("""WITH base AS (SELECT event_type,
             |                CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS grp_a,
             |                CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS succ
             |              FROM events),
             |st AS (SELECT event_type,
             |         CAST(sum(CASE WHEN grp_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |         sum(CASE WHEN grp_a = 1 THEN succ ELSE 0 END) AS s_a,
             |         CAST(sum(CASE WHEN grp_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |         sum(CASE WHEN grp_a = 0 THEN succ ELSE 0 END) AS s_b
             |       FROM base GROUP BY event_type),
             |r AS (SELECT event_type, n_a, n_b, s_a, s_b,
             |        CASE WHEN n_a > 0 THEN round(s_a * 1.0 / n_a, 6) END AS rate_a,
             |        CASE WHEN n_b > 0 THEN round(s_b * 1.0 / n_b, 6) END AS rate_b
             |      FROM st)
             |SELECT event_type AS scope, n_a, n_b, rate_a, rate_b,
             |       round(rate_a - rate_b, 6) AS diff
             |FROM r
             |UNION ALL
             |SELECT '_pooled', CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT),
             |       CASE WHEN sum(n_a) > 0 THEN round(sum(s_a) * 1.0 / sum(n_a), 6) END,
             |       CASE WHEN sum(n_b) > 0 THEN round(sum(s_b) * 1.0 / sum(n_b), 6) END,
             |       round(CASE WHEN sum(n_a) > 0 THEN round(sum(s_a) * 1.0 / sum(n_a), 6) END
             |             - CASE WHEN sum(n_b) > 0 THEN round(sum(s_b) * 1.0 / sum(n_b), 6) END, 6)
             |FROM r
             |UNION ALL
             |SELECT '_stratified', CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT),
             |       round(sum((n_a + n_b) * rate_a) / sum(n_a + n_b), 6),
             |       round(sum((n_a + n_b) * rate_b) / sum(n_a + n_b), 6),
             |       round(round(sum((n_a + n_b) * rate_a) / sum(n_a + n_b), 6)
             |             - round(sum((n_a + n_b) * rate_b) / sum(n_a + n_b), 6), 6)
             |FROM r
             |ORDER BY scope""".stripMargin)))

  // ---------------------------------------------------------------
  // Vector store: the reference's Qdrant surface (SURVEY §2 #1–12)
  // ---------------------------------------------------------------

  /** DuckDB-side cosine score identical to VectorFunctions.score. */
  private def sqlScore(v: String, q: String): String =
    s"round(list_cosine_similarity($v::DOUBLE[], $q), 6) + 0.0"

  /** Unrolled k-step greedy MMR as chained CTEs over a `cand`
    * (vec_id, sim, emb) CTE — mirrors graft.ann.Mmr.rerank's rounding
    * and id tie-breaks exactly. Caller supplies `cand` and `sel0`.
    */
  private def mmrUnrolledSql(k: Int): String = (1 to k).map { n =>
    s"""s$n AS (SELECT c.vec_id, c.sim, c.emb, $n AS rank
       |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${n - 1})
       |  ORDER BY round(0.5 * c.sim - 0.5 * coalesce(
       |    (SELECT max(round(list_cosine_similarity(c.emb, s.emb), 6)) FROM sel${n - 1} s),
       |    0.0), 6) DESC, c.vec_id
       |  LIMIT 1),
       |sel$n AS (SELECT * FROM sel${n - 1} UNION ALL SELECT * FROM s$n)"""
  }.mkString(",\n")

  /** Unrolled greedy k-center as chained CTEs over a `cand`
    * (vec_id, emb) CTE and a `sel1` single-row seed — mirrors
    * graft.ann.Coreset.kCenter's rounding and id tie-breaks exactly.
    */
  private def kcenterUnrolledSql(k: Int): String = (2 to k).map { n =>
    s"""s$n AS (SELECT c.vec_id, c.emb, $n AS rank
       |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${n - 1})
       |  ORDER BY (SELECT min(round(1.0 - list_cosine_similarity(c.emb, s.emb), 6))
       |            FROM sel${n - 1} s) DESC, c.vec_id
       |  LIMIT 1),
       |sel$n AS (SELECT * FROM sel${n - 1} UNION ALL SELECT * FROM s$n)"""
      .stripMargin
  }.mkString(",\n")

  // ---------------------------------------------------------------
  // Experimentation statistics (SURVEY §2 #277–281): the checks an
  // A/B platform runs beside ev_ab_test — assignment health (SRM),
  // causal estimates (diff-in-diff), multiple-testing control
  // (Benjamini–Hochberg), honest uncertainty (Wilson, jackknife).
  // All collapse the fact stream to O(users) or O(|types|) in ONE
  // grouped pass; every window runs on the collapsed frame.
  // ---------------------------------------------------------------

  private val experimentsQ: Seq[(String, Q)] = {
    import graft.functions.VectorFunctions.md5Long

    Seq(
    // sample-ratio-mismatch gate: the first thing to check before
    // reading ANY experiment result. Deterministic md5 arm (the
    // ev_ab_test assignment), expected 50/50; chi2 with 1 df
    // simplifies to (n_t-n_c)^2/n. Flag at the 0.001 level (10.828)
    // — SRM checks use a strict alpha because a true mismatch is a
    // pipeline bug, not noise. O(users) after one distinct.
    "ev_srm" -> Q(
      (s, d) => Tables.events(s, d)
        .select("user_id").distinct()
        .withColumn("arm",
          md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
             sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
        .select(col("n_t"), col("n_c"),
          when(col("n_t") + col("n_c") === 0, lit(null).cast("double"))
            .otherwise(round((col("n_t") - col("n_c"))
              * (col("n_t") - col("n_c"))
              / (col("n_t") + col("n_c")).cast("double"), 4)).as("chi2"),
          when(col("n_t") + col("n_c") === 0, lit(null).cast("long"))
            .otherwise(((col("n_t") - col("n_c")) * (col("n_t") - col("n_c"))
              / (col("n_t") + col("n_c")).cast("double") > 10.828)
              .cast("long")).as("srm_flag")),
      Some("""WITH u AS (
             |  SELECT DISTINCT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events),
             |a AS (SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c
             |      FROM u)
             |SELECT n_t, n_c,
             |       CASE WHEN n_t + n_c = 0 THEN NULL
             |            ELSE round((n_t - n_c) * (n_t - n_c) / CAST(n_t + n_c AS DOUBLE), 4) END AS chi2,
             |       CASE WHEN n_t + n_c = 0 THEN NULL
             |            ELSE CAST(((n_t - n_c) * (n_t - n_c) / CAST(n_t + n_c AS DOUBLE)) > 10.828 AS BIGINT)
             |       END AS srm_flag
             |FROM a""".stripMargin)),

    // difference-in-differences on a repeated cross-section: pre/post
    // split at the corpus midpoint day, md5 arm per user, outcome =
    // per-user purchase count in the period. The facts collapse ONCE
    // to the (user, day) frame (checkpointed: bounds + bucketing both
    // read it); the global cut is a broadcast single-row join, never
    // a second fact scan. DiD is computed from the ROUNDED cell
    // means so both engines difference identical values.
    "ev_diff_in_diff" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("p"))
          .localCheckpoint(eager = false) // bounds + bucketing
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val up = ud.crossJoin(broadcast(bounds))
          // div not /: Spark's long `/` is double division, which
          // would ceil the midpoint when mn+mx+1 is odd while the
          // oracle's `//` floors it
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm", "post")
          .agg(sum("p").as("p"))
        up.agg(
            sum(when(col("arm") === 1 && col("post") === 0, 1L).otherwise(0L)).as("n_t_pre"),
            sum(when(col("arm") === 1 && col("post") === 1, 1L).otherwise(0L)).as("n_t_post"),
            sum(when(col("arm") === 0 && col("post") === 0, 1L).otherwise(0L)).as("n_c_pre"),
            sum(when(col("arm") === 0 && col("post") === 1, 1L).otherwise(0L)).as("n_c_post"),
            round(avg(when(col("arm") === 1 && col("post") === 0, col("p"))), 6).as("y_t_pre"),
            round(avg(when(col("arm") === 1 && col("post") === 1, col("p"))), 6).as("y_t_post"),
            round(avg(when(col("arm") === 0 && col("post") === 0, col("p"))), 6).as("y_c_pre"),
            round(avg(when(col("arm") === 0 && col("post") === 1, col("p"))), 6).as("y_c_post"))
          .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
            col("y_t_pre"), col("y_t_post"), col("y_c_pre"), col("y_c_post"),
            round(col("y_t_post") - col("y_t_pre")
              - (col("y_c_post") - col("y_c_pre")), 6).as("did"))
      },
      Some("""WITH ud AS (
             |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
             |up AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CASE WHEN day >= (mn + mx + 1) // 2 THEN 1 ELSE 0 END AS post,
             |         CAST(sum(p) AS BIGINT) AS p
             |  FROM ud, b GROUP BY 1, 2, 3),
             |c AS (SELECT
             |  CAST(sum(CASE WHEN arm = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
             |  CAST(sum(CASE WHEN arm = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
             |  CAST(sum(CASE WHEN arm = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
             |  CAST(sum(CASE WHEN arm = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
             |  round(avg(CASE WHEN arm = 1 AND post = 0 THEN p END), 6) AS y_t_pre,
             |  round(avg(CASE WHEN arm = 1 AND post = 1 THEN p END), 6) AS y_t_post,
             |  round(avg(CASE WHEN arm = 0 AND post = 0 THEN p END), 6) AS y_c_pre,
             |  round(avg(CASE WHEN arm = 0 AND post = 1 THEN p END), 6) AS y_c_post
             |  FROM up)
             |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
             |       y_t_pre, y_t_post, y_c_pre, y_c_post,
             |       round(y_t_post - y_t_pre - (y_c_post - y_c_pre), 6) AS did
             |FROM c""".stripMargin)),

    // Benjamini–Hochberg FDR over per-metric A/B tests: one Welch z
    // per event_type (mean `value`, md5 arms), p from the
    // Abramowitz–Stegun 7.1.26 erf polynomial (identical closed-form
    // arithmetic on both engines; z is rounded to 6 BEFORE the
    // polynomial so both sides feed it the same argument). The BH
    // step-up runs on the ≤|types|-row frame: rank by p, k = max
    // rank with p <= rank/m*alpha, reject ranks <= k. One fact scan.
    "stat_fdr" -> Q(
      (s, d) => {
        val g = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")) &&
                  col("event_type").isNotNull)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("event_type")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
               avg(when(col("arm") === 1, col("value"))).as("m_t"),
               avg(when(col("arm") === 0, col("value"))).as("m_c"),
               var_samp(when(col("arm") === 1, col("value"))).as("v_t"),
               var_samp(when(col("arm") === 0, col("value"))).as("v_c"))
          .withColumn("se2", col("v_t") / col("n_t") + col("v_c") / col("n_c"))
          .withColumn("z",
            when(col("n_t") < 2 || col("n_c") < 2 || col("se2") <= 0.0,
                 lit(null).cast("double"))
              .otherwise(round((col("m_t") - col("m_c")) / sqrt(col("se2")), 6)))
          // p = 1 - erf(|z|/sqrt(2)) via A&S 7.1.26 (two-sided)
          .withColumn("x", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
          .withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("x") * col("x")), 6)))
        val m = g.filter(col("p").isNotNull)
          .select(col("event_type"), col("n_t"), col("n_c"), col("z"), col("p"))
        val wR = Window.orderBy(col("p"), col("event_type"))
        val wAll = Window.partitionBy(lit(1))
        m.withColumn("rank", row_number().over(wR))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("thr", round(col("rank") * lit(0.05) / col("m"), 6))
          .withColumn("k", max(when(col("p") <= col("thr"), col("rank"))
            .otherwise(lit(0))).over(wAll))
          .select(col("event_type"), col("n_t"), col("n_c"), col("z"), col("p"),
            col("rank").cast("long").as("rank"), col("thr"),
            (col("rank") <= col("k")).cast("long").as("reject"))
          .orderBy("rank")
      },
      Some("""WITH e AS (
             |  SELECT event_type, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value) AND event_type IS NOT NULL),
             |g AS (
             |  SELECT event_type,
             |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |         avg(CASE WHEN arm = 1 THEN value END) AS m_t,
             |         avg(CASE WHEN arm = 0 THEN value END) AS m_c,
             |         var_samp(CASE WHEN arm = 1 THEN value END) AS v_t,
             |         var_samp(CASE WHEN arm = 0 THEN value END) AS v_c
             |  FROM e GROUP BY event_type),
             |z AS (
             |  SELECT *, CASE WHEN n_t < 2 OR n_c < 2 OR v_t / n_t + v_c / n_c <= 0.0 THEN NULL
             |                 ELSE round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 6) END AS z
             |  FROM g),
             |p AS (
             |  SELECT event_type, n_t, n_c, z,
             |         CASE WHEN z IS NULL THEN NULL ELSE round(
             |           (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
             |            * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
             |             * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
             |              * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
             |               * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
             |                * 1.061405429))))
             |           * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))), 6) END AS p
             |  FROM z),
             |r AS (
             |  SELECT event_type, n_t, n_c, z, p,
             |         CAST(row_number() OVER (ORDER BY p, event_type) AS BIGINT) AS rank,
             |         count(*) OVER () AS m
             |  FROM p WHERE p IS NOT NULL),
             |t AS (
             |  SELECT *, round(rank * 0.05 / m, 6) AS thr FROM r),
             |k AS (
             |  SELECT *, max(CASE WHEN p <= thr THEN rank ELSE 0 END) OVER () AS k FROM t)
             |SELECT event_type, n_t, n_c, z, p, rank, thr,
             |       CAST(rank <= k AS BIGINT) AS reject
             |FROM k ORDER BY rank""".stripMargin)),

    // Wilson score interval per event_type: of the users who ever
    // emit the type, what share converts (any purchase), with the
    // interval that stays honest at small n and extreme rates where
    // the Wald interval collapses. The fact stream collapses ONCE to
    // per-user (conv flag, type set); explode of the per-user type
    // set replaces the second scan a distinct-pairs join would cost.
    "stat_wilson_ci" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
                 .otherwise(0L)).as("conv"),
               collect_set("event_type").as("types"))
        u.select(explode(col("types")).as("event_type"), col("conv"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), sum("conv").as("x_conv"))
          .withColumn("ph", col("x_conv") / col("n_users").cast("double"))
          .withColumn("den", lit(1.0) + lit(1.96) * lit(1.96) / col("n_users"))
          .withColumn("ctr",
            (col("ph") + lit(1.96) * lit(1.96) / (lit(2.0) * col("n_users"))) / col("den"))
          .withColumn("half",
            lit(1.96) * sqrt(col("ph") * (lit(1.0) - col("ph")) / col("n_users")
              + lit(1.96) * lit(1.96)
                / (lit(4.0) * col("n_users") * col("n_users"))) / col("den"))
          .select(col("event_type"), col("n_users"), col("x_conv"),
            round(col("ph"), 4).as("rate"),
            round(col("ctr") - col("half"), 4).as("ci_lo"),
            round(col("ctr") + col("half"), 4).as("ci_hi"))
          .orderBy("event_type")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY user_id),
             |pr AS (SELECT DISTINCT e.user_id, e.event_type FROM events e
             |       WHERE e.event_type IS NOT NULL),
             |g AS (SELECT pr.event_type, CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(u.conv) AS BIGINT) AS x_conv
             |      FROM pr JOIN u ON pr.user_id = u.user_id
             |      GROUP BY pr.event_type),
             |w AS (SELECT *, x_conv / CAST(n_users AS DOUBLE) AS ph,
             |             1.0 + 1.96 * 1.96 / n_users AS den
             |      FROM g)
             |SELECT event_type, n_users, x_conv, round(ph, 4) AS rate,
             |       round((ph + 1.96 * 1.96 / (2.0 * n_users)) / den
             |         - 1.96 * sqrt(ph * (1.0 - ph) / n_users
             |             + 1.96 * 1.96 / (4.0 * n_users * n_users)) / den, 4) AS ci_lo,
             |       round((ph + 1.96 * 1.96 / (2.0 * n_users)) / den
             |         + 1.96 * sqrt(ph * (1.0 - ph) / n_users
             |             + 1.96 * 1.96 / (4.0 * n_users * n_users)) / den, 4) AS ci_hi
             |FROM w ORDER BY event_type""".stripMargin)),

    // leave-one-user-out jackknife for a ratio-of-sums metric
    // (purchases per event): the delta-method-free SE every
    // experimentation platform needs for ratio metrics, where
    // user-level averaging is biased. NO per-user recompute pass:
    // R_(i) = (Sx-x_i)/(Sn-n_i) from broadcast totals, so the whole
    // estimator is one O(users) map + var_samp (stable central
    // moments on both engines; Σ(R_i-R̄)² = (K-1)·var_samp).
    "stat_jackknife" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
               sum(when(col("event_type") === "purchase", 1L)
                 .otherwise(0L)).as("x"))
          .localCheckpoint(eager = false) // totals + leave-one-out
        val tot = u.agg(sum("n").as("sn"), sum("x").as("sx"),
                        count(lit(1)).as("k"))
        u.crossJoin(broadcast(tot))
          .withColumn("ri",
            when(col("sn") === col("n"), lit(null).cast("double"))
              .otherwise((col("sx") - col("x"))
                / (col("sn") - col("n")).cast("double")))
          .agg(first("k").as("k"),
               round(first("sx") / first("sn").cast("double"), 6).as("r"),
               count(col("ri")).as("kk"), var_samp(col("ri")).as("v"))
          .select(col("k"),
            col("r"),
            when(col("kk") < 2, lit(null).cast("double"))
              .otherwise(round(sqrt((col("kk") - 1).cast("double")
                * (col("kk") - 1) / col("kk") * col("v")), 6)).as("se_jack"))
          .withColumn("ci_lo",
            when(col("se_jack").isNull, lit(null).cast("double"))
              .otherwise(round(col("r") - lit(1.96) * col("se_jack"), 6)))
          .withColumn("ci_hi",
            when(col("se_jack").isNull, lit(null).cast("double"))
              .otherwise(round(col("r") + lit(1.96) * col("se_jack"), 6)))
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
             |  FROM events GROUP BY user_id),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS sn, CAST(sum(x) AS BIGINT) AS sx,
             |             CAST(count(*) AS BIGINT) AS k
             |      FROM u),
             |l AS (SELECT u.*, t.sn, t.sx, t.k,
             |             CASE WHEN t.sn = u.n THEN NULL
             |                  ELSE (t.sx - u.x) / CAST(t.sn - u.n AS DOUBLE) END AS ri
             |      FROM u, t),
             |a AS (SELECT max(k) AS k, round(max(sx) / CAST(max(sn) AS DOUBLE), 6) AS r,
             |             CAST(count(ri) AS BIGINT) AS kk, var_samp(ri) AS v
             |      FROM l)
             |SELECT k, r,
             |       CASE WHEN kk < 2 THEN NULL
             |            ELSE round(sqrt(CAST(kk - 1 AS DOUBLE) * (kk - 1) / kk * v), 6) END AS se_jack,
             |       CASE WHEN kk < 2 THEN NULL
             |            ELSE round(r - 1.96 * CASE WHEN kk < 2 THEN NULL
             |              ELSE round(sqrt(CAST(kk - 1 AS DOUBLE) * (kk - 1) / kk * v), 6) END, 6) END AS ci_lo,
             |       CASE WHEN kk < 2 THEN NULL
             |            ELSE round(r + 1.96 * CASE WHEN kk < 2 THEN NULL
             |              ELSE round(sqrt(CAST(kk - 1 AS DOUBLE) * (kk - 1) / kk * v), 6) END, 6) END AS ci_hi
             |FROM a""".stripMargin)))
  }

  private val vectorStore: Seq[(String, Q)] = Seq(
    "vs_search_topk" -> Q(
      (s, d) => VectorStore.search(
        VectorStore.pointsPartitioned(s, d), userId = 2,
        qdf = VectorStore.queryVecOf(s, d, 42), limit = 10),
      Some(s"""$pointsSql,
              |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
              |SELECT vector_id, doc_id, chunk_id, title, ${sqlScore("p.embedding", "q.qv")} AS score
              |FROM points p, q WHERE p.user_id = 2
              |ORDER BY score DESC, vector_id LIMIT 10""".stripMargin)),

    // multi-tenant batched search: one query per user (vec 40+u),
    // every tenant served by ONE job — user_id equi-join + the
    // map-side-bounded TopK aggregate per user; no global sort
    "vs_search_all" -> Q(
      (s, d) => {
        val qs = Tables.embeddings(s, d)
          .filter(col("vec_id") >= 40 && col("vec_id") < 48)
          .select((col("vec_id") % 8).as("user_id"), col("embedding").as("q"))
        VectorStore.searchAll(VectorStore.pointsPartitioned(s, d), qs, 3)
      },
      Some(s"""$pointsSql,
              |q AS (SELECT vec_id % 8 AS user_id, embedding::DOUBLE[] AS qv
              |      FROM embeddings WHERE vec_id >= 40 AND vec_id < 48),
              |sc AS (SELECT p.user_id, p.vector_id,
              |              ${sqlScore("p.embedding", "q.qv")} AS score
              |       FROM points p JOIN q USING (user_id))
              |SELECT user_id, rnk, vector_id, score FROM (
              |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id
              |              ORDER BY score DESC, vector_id) AS BIGINT) AS rnk
              |  FROM sc)
              |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin)),

    // grouped search (the "search groups" API): best chunk per doc,
    // top-5 docs — per-doc bounded window, never global
    "vs_search_grouped" -> Q(
      (s, d) => VectorStore.searchGrouped(
        VectorStore.pointsPartitioned(s, d), userId = 2,
        qdf = VectorStore.queryVecOf(s, d, 42), groups = 5),
      Some(s"""$pointsSql,
              |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
              |SELECT doc_id, vector_id, chunk_id, score FROM (
              |  SELECT doc_id, vector_id, chunk_id, score,
              |         row_number() OVER (PARTITION BY doc_id
              |                            ORDER BY score DESC, vector_id) AS rn
              |  FROM (SELECT p.doc_id, p.vector_id, p.chunk_id,
              |               ${sqlScore("p.embedding", "q.qv")} AS score
              |        FROM points p, q WHERE p.user_id = 2))
              |WHERE rn = 1 ORDER BY score DESC, doc_id LIMIT 5""".stripMargin)),

    // diversified search on the collection path: the reference's
    // search_query + MMR (λ=0.5) over a top-20 pool from the user's
    // partition-pruned collection — "ten near-copy chunks" becomes
    // five relevant-but-distinct ones
    "vs_search_mmr" -> Q(
      (s, d) => {
        val pts = VectorStore.pointsPartitioned(s, d)
          .filter(col("user_id") === 2)
          .select(col("vector_id").as("vec_id"), col("embedding"))
        val q = VectorStore.queryVecOf(s, d, 42).select(col("q").as("qv"))
        graft.ann.Mmr.rerank(pts, q, 20, 5, 0.5)
          .select(col("rank"), col("vec_id").as("vector_id"), col("sim"))
      },
      Some(s"""$pointsSql,
              |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42),
              |cand AS (SELECT p.vector_id AS vec_id,
              |                ${sqlScore("p.embedding", "qv.qv")} AS sim,
              |                p.embedding::DOUBLE[] AS emb
              |         FROM points p, qv WHERE p.user_id = 2
              |         ORDER BY sim DESC, vec_id LIMIT 20),
              |sel0 AS (SELECT vec_id, sim, emb, 0 AS rank FROM cand WHERE false),
              |${mmrUnrolledSql(5)}
              |SELECT CAST(rank AS BIGINT) AS rank, vec_id AS vector_id, sim
              |FROM sel5 ORDER BY rank""".stripMargin)),

    // recommend by example (positive/negative point ids): query =
    // mean(pos) − mean(neg), association order fixed for the oracle;
    // examples excluded from results
    "vs_recommend" -> Q(
      (s, d) => VectorStore.recommend(
        VectorStore.pointsPartitioned(s, d), userId = 2,
        posIds = Seq(10L, 18L), negIds = Seq(34L), limit = 10),
      Some(s"""$pointsSql,
              |rec AS (
              |  SELECT list_transform(generate_series(1, len(a.embedding)),
              |           i -> (a.embedding[i] + b.embedding[i]) / 2.0 - c.embedding[i]) AS qv
              |  FROM (SELECT embedding FROM embeddings WHERE vec_id = 10) a,
              |       (SELECT embedding FROM embeddings WHERE vec_id = 18) b,
              |       (SELECT embedding FROM embeddings WHERE vec_id = 34) c)
              |SELECT vector_id, doc_id, ${sqlScore("p.embedding", "rec.qv")} AS score
              |FROM points p, rec
              |WHERE p.user_id = 2 AND p.vector_id NOT IN (10, 18, 34)
              |ORDER BY score DESC, vector_id LIMIT 10""".stripMargin)),

    "vs_search_threshold" -> Q(
      (s, d) => VectorStore.searchThreshold(
        VectorStore.pointsPartitioned(s, d), VectorStore.queryVecOf(s, d, 7), 0.15),
      Some(s"""$pointsSql,
              |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7)
              |SELECT * FROM (
              |  SELECT user_id, vector_id, ${sqlScore("p.embedding", "q.qv")} AS score
              |  FROM points p, q)
              |WHERE score >= 0.15 ORDER BY score DESC, vector_id""".stripMargin)),

    "vs_search_on_docs" -> Q(
      (s, d) => VectorStore.search(
        VectorStore.pointsPartitioned(s, d), userId = 2,
        qdf = VectorStore.queryVecOf(s, d, 42), limit = 5,
        docIds = Seq(10L, 26L, 42L)),
      Some(s"""$pointsSql,
              |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
              |SELECT vector_id, doc_id, chunk_id, title, ${sqlScore("p.embedding", "q.qv")} AS score
              |FROM points p, q WHERE p.user_id = 2 AND doc_id IN (10, 26, 42)
              |ORDER BY score DESC, vector_id LIMIT 5""".stripMargin)),

    "vs_scroll_collection" -> Q(
      (s, d) => VectorStore.scroll(VectorStore.pointsPartitioned(s, d), 3, 20),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title FROM points
              |WHERE user_id = 3 ORDER BY vector_id LIMIT 20""".stripMargin)),

    "vs_scroll_doc" -> Q(
      (s, d) => VectorStore.scrollDoc(VectorStore.pointsPartitioned(s, d), 7, 7, 20),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title FROM points
              |WHERE user_id = 7 AND doc_id = 7 ORDER BY vector_id LIMIT 20""".stripMargin)),

    // keyset pagination: page 2 of user 3's collection, resuming
    // after cursor vector_id = 100
    "vs_scroll_cursor" -> Q(
      (s, d) => VectorStore.scrollAfter(
        VectorStore.pointsPartitioned(s, d), 3, 100, 20),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title FROM points
              |WHERE user_id = 3 AND vector_id > 100
              |ORDER BY vector_id LIMIT 20""".stripMargin)),

    "vs_scroll_docs" -> Q(
      (s, d) => VectorStore.scrollDocs(VectorStore.pointsPartitioned(s, d), 3,
        Seq(3L, 55L, 99L), 20),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title FROM points
              |WHERE user_id = 3 AND doc_id IN (3, 55, 99)
              |ORDER BY vector_id LIMIT 20""".stripMargin)),

    "vs_delete_doc" -> Q(
      (s, d) => VectorStore.deleteDoc(VectorStore.pointsPartitioned(s, d), 1, 17)
        .agg(count(lit(1)).as("n"), sum("vector_id").as("sum_vid")),
      Some(s"""$pointsSql
              |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vector_id) AS BIGINT) AS sum_vid
              |FROM points WHERE NOT (user_id = 1 AND doc_id = 17)""".stripMargin)),

    "vs_delete_by_title" -> Q(
      (s, d) => VectorStore.deleteDocByTitle(VectorStore.pointsPartitioned(s, d), 1, "t33")
        .agg(count(lit(1)).as("n"), sum("vector_id").as("sum_vid")),
      Some(s"""$pointsSql
              |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vector_id) AS BIGINT) AS sum_vid
              |FROM points WHERE NOT (user_id = 1 AND title = 't33')""".stripMargin)),

    "vs_delete_by_ids" -> Q(
      (s, d) => VectorStore.deleteByIds(VectorStore.pointsPartitioned(s, d), 5, Seq(5L, 13L, 21L))
        .agg(count(lit(1)).as("n"), sum("vector_id").as("sum_vid")),
      Some(s"""$pointsSql
              |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vector_id) AS BIGINT) AS sum_vid
              |FROM points WHERE NOT (user_id = 5 AND vector_id IN (5, 13, 21))""".stripMargin)),

    "vs_upsert_merge" -> Q(
      (s, d) => {
        val pts = VectorStore.pointsPartitioned(s, d)
        val batch = pts.filter(col("user_id") === 2 && col("doc_id") < 20)
          .withColumn("vector_id", col("vector_id") + 10000)
          .withColumn("embedding", transform(col("embedding"), x => -x))
        VectorStore.upsert(pts, batch)
          .agg(count(lit(1)).as("n"), sum("vector_id").as("sum_vid"),
               round(sum(element_at(col("embedding"), 1).cast("double")), 4).as("s1"))
      },
      Some(s"""$pointsSql,
              |batch AS (
              |  SELECT user_id, vector_id + 10000 AS vector_id, doc_id, chunk_id, title,
              |         list_transform(embedding, x -> -x) AS embedding
              |  FROM points WHERE user_id = 2 AND doc_id < 20),
              |u AS (SELECT *, 0 AS _src FROM points UNION ALL SELECT *, 1 AS _src FROM batch),
              |m AS (SELECT *, row_number() OVER (
              |        PARTITION BY user_id, doc_id, chunk_id
              |        ORDER BY _src DESC, vector_id) AS rn FROM u)
              |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vector_id) AS BIGINT) AS sum_vid,
              |       round(sum(CAST(embedding[1] AS DOUBLE)),4) AS s1
              |FROM m WHERE rn = 1""".stripMargin)),

    "vs_update_vector" -> Q(
      (s, d) => {
        val nv = VectorStore.queryVecOf(s, d, 7)
          .select(transform(col("q"), x => -x).as("newv"))
        VectorStore.pointsPartitioned(s, d).crossJoin(broadcast(nv))
          .withColumn("embedding",
            when(col("user_id") === 2 && col("doc_id") === 42 && col("chunk_id") === 42,
                 col("newv")).otherwise(col("embedding")))
          .agg(count(lit(1)).as("n"),
               round(sum(element_at(col("embedding"), 1).cast("double")), 4).as("s1"))
      },
      Some(s"""$pointsSql
              |SELECT CAST(count(*) AS BIGINT) AS n, round(sum(CAST(e1 AS DOUBLE)),4) AS s1
              |FROM (
              |  SELECT CASE WHEN user_id = 2 AND doc_id = 42 AND chunk_id = 42
              |              THEN list_transform((SELECT embedding FROM embeddings WHERE vec_id = 7), x -> -x)[1]
              |              ELSE embedding[1] END AS e1
              |  FROM points)""".stripMargin)),

    "vs_scroll_chunk" -> Q(
      (s, d) => VectorStore.scrollChunk(VectorStore.pointsPartitioned(s, d), 7, 7, 207, 20),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title FROM points
              |WHERE user_id = 7 AND doc_id = 7 AND chunk_id = 207
              |ORDER BY vector_id LIMIT 20""".stripMargin)),

    "vs_delete_chunk" -> Q(
      (s, d) => VectorStore.deleteChunk(VectorStore.pointsPartitioned(s, d), 7, 7, 207)
        .agg(count(lit(1)).as("n"), sum("vector_id").as("sum_vid")),
      Some(s"""$pointsSql
              |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vector_id) AS BIGINT) AS sum_vid
              |FROM points WHERE NOT (user_id = 7 AND doc_id = 7 AND chunk_id = 207)""".stripMargin)),

    // delete all data in a collection (reference document_ingestor
    // :260/:277 — drop the whole user partition)
    "vs_delete_all" -> Q(
      (s, d) => VectorStore.deleteCollection(VectorStore.pointsPartitioned(s, d), 4)
        .agg(count(lit(1)).as("n"), sum("vector_id").as("sum_vid"),
             countDistinct("user_id").as("n_users")),
      Some(s"""$pointsSql
              |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vector_id) AS BIGINT) AS sum_vid,
              |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              |FROM points WHERE user_id <> 4""".stripMargin)),

    "vs_list_collections" -> Q(
      (s, d) => VectorStore.listCollections(VectorStore.pointsPartitioned(s, d)),
      Some(s"""$pointsSql
              |SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
              |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              |FROM points GROUP BY user_id ORDER BY user_id""".stripMargin)))

  // ---------------------------------------------------------------
  // Dedup family (SURVEY §2 #17–22)
  // ---------------------------------------------------------------

  private def docsUnder(s: SparkSession, d: String, lim: Int) =
    Tables.documents(s, d).filter(col("doc_id") < lim)

  private val dedup: Seq[(String, Q)] = {
    import graft.dedup.Dedup
    Seq(
      "dedup_exact" -> Q(
        (s, d) => Dedup.exact(Tables.documents(s, d)),
        Some("""SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id,
               |       CAST(count(*) AS BIGINT) AS n_dups
               |FROM documents GROUP BY h ORDER BY h""".stripMargin)),

      "dedup_ngram_jaccard" -> Q(
        (s, d) => Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25),
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db)
                |SELECT da, db, round(j, 4) AS jaccard FROM (
                |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |WHERE j >= 0.25 ORDER BY da, db""".stripMargin)),

      // exact-recall near-dup join via prefix filtering (PPJoin idea):
      // the oracle is BRUTE FORCE — passing hash-equal proves the
      // prefix filter loses nothing while joining only on rare tokens
      "dedup_prefix_filter" -> Q(
        (s, d) => Dedup.prefixFilterJaccard(docsUnder(s, d, 120), 0.7),
        Some("""WITH dt AS (
               |  SELECT DISTINCT doc_id, tok
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents WHERE doc_id < 120)),
               |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS cnt FROM dt GROUP BY doc_id),
               |i AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS ni
               |      FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
               |      GROUP BY da, db)
               |SELECT da, db, round(j, 4) AS jaccard FROM (
               |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
               |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
               |WHERE j >= 0.7 ORDER BY da, db""".stripMargin)),

      // triangle count + transitivity of the near-dup pair graph (the
      // density audit that distinguishes tight dup cliques from
      // chained false positives). Edges are the ngram-Jaccard pairs;
      // each edge is ORIENTED away from its lower-(degree, id)
      // endpoint, so every triangle has exactly one pivot and wedge
      // fan-out is O(√|E|) per vertex — hub nodes never pivot, which
      // is what keeps the wedge join alive on power-law dup graphs.
      // The oracle counts the same triangles by the naive canonical
      // three-way self-join, proving orientation loses nothing.
      "graph_triangles" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db")) // canonical: da < db, unique
            // four consumers (degrees, orientation, closure, count):
            // checkpoint so the shingle join runs ONCE, not per branch
            .localCheckpoint(eager = false)
          val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("dg"))
          val or_ = e0
            .join(broadcast(deg.select(col("v").as("da"), col("dg").as("dga"))), "da")
            .join(broadcast(deg.select(col("v").as("db"), col("dg").as("dgb"))), "db")
            .select(
              when(col("dga") < col("dgb") ||
                   (col("dga") === col("dgb") && col("da") < col("db")),
                struct(col("da").as("u"), col("db").as("w")))
                .otherwise(struct(col("db").as("u"), col("da").as("w"))).as("e"))
            .select(col("e.u").as("u"), col("e.w").as("w"))
          val wedges = or_.select(col("u"), col("w").as("v1"))
            .join(or_.select(col("u"), col("w").as("v2")), "u")
            .filter(col("v1") < col("v2"))
          val tri = wedges
            .join(e0, col("v1") === col("da") && col("v2") === col("db"))
            .agg(count(lit(1)).as("t"))
          val stats = deg.agg(count(lit(1)).as("n_nodes"),
            sum(col("dg") * (col("dg") - 1)).as("swd"))
          val ne = e0.agg(count(lit(1)).as("n_edges"))
          tri.crossJoin(broadcast(stats)).crossJoin(broadcast(ne))
            .select(col("n_nodes"), col("n_edges"), col("t").as("n_triangles"),
              when(col("swd").isNull || col("swd") === 0, lit(null).cast("double"))
                .otherwise(round(lit(6.0) * col("t") / col("swd"), 4))
                .as("transitivity"))
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
                |edges AS (SELECT da, db FROM (
                |    SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |    FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |  WHERE j >= 0.25),
                |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                |        FROM (SELECT da AS v FROM edges UNION ALL SELECT db AS v FROM edges)
                |        GROUP BY v),
                |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
                |        FROM edges e1
                |        JOIN edges e2 ON e2.da = e1.da AND e2.db > e1.db
                |        JOIN edges e3 ON e3.da = e1.db AND e3.db = e2.db),
                |st AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                |              CAST(sum(dg * (dg - 1)) AS BIGINT) AS swd FROM deg),
                |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
                |SELECT n_nodes, n_edges, t AS n_triangles,
                |       CASE WHEN swd IS NULL OR swd = 0 THEN NULL
                |            ELSE round(6.0 * t / swd, 4) END AS transitivity
                |FROM tri, st, ne""".stripMargin)),

      // 2-core of the near-dup graph by 6 unrolled peeling rounds:
      // drop degree-<2 nodes, recompute, repeat — the standard
      // "strip the chains, keep the cliques" pass that separates
      // true dup clusters from chained false positives before
      // canonical-doc election. Each round is one degree aggregate +
      // two semi-joins on that round's CHECKPOINTED edge frame (the
      // shingle join runs once; rounds never rescan the corpus), so
      // a round costs O(|E_t|) shuffle — and |E_t| only shrinks.
      // Fixed rounds, not to-convergence: both engines run the same
      // 6 (the oracle unrolls them), so results match even if a long
      // chain is still mid-peel. Output = surviving nodes with their
      // in-core degree.
      "graph_kcore" -> Q(
        (s, d) => {
          var edges = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false)
          for (_ <- 1 to 6) {
            val keep = edges
              .select(explode(array(col("da"), col("db"))).as("v"))
              .groupBy("v").agg(count(lit(1)).as("dg"))
              .filter(col("dg") >= 2).select("v")
            edges = edges
              .join(keep.withColumnRenamed("v", "da"), Seq("da"), "left_semi")
              .join(keep.withColumnRenamed("v", "db"), Seq("db"), "left_semi")
              .localCheckpoint(eager = false) // read twice next round
          }
          edges.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("core_deg"))
            .orderBy("v")
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
                |e0 AS MATERIALIZED (SELECT da, db FROM (
                |    SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |    FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |  WHERE j >= 0.25),
                |${kcoreIterSql(6, 2)}
                |SELECT v, CAST(count(*) AS BIGINT) AS core_deg
                |FROM (SELECT da AS v FROM e6 UNION ALL SELECT db AS v FROM e6)
                |GROUP BY v ORDER BY v""".stripMargin)),

      // LSH index quality audit: banded-MinHash candidate pairs scored
      // against the EXACT Jaccard truth set on a bounded subset —
      // precision/recall of the index itself, the audit that decides
      // band/row tuning before a full-corpus run. Pure composition of
      // two existing primitives + three 1-row aggregates. At sf0.01
      // the measured point (recall 0.18 at J≥0.25 under b=4, r=2,
      // s-curve midpoint ≈ 0.5) is the s-curve doing its job: this
      // config targets high-similarity pairs, and the audit is what
      // tells you to widen the bands before chasing looser dups
      "dedup_lsh_eval" -> Q(
        (s, d) => {
          val docs = docsUnder(s, d, 120)
          val cand = Dedup.minhashLshPairs(
            Dedup.minhashSignatures(docs, 5, 8), 8, 2)
          val truth = Dedup.ngramJaccard(docs, 5, 0.25).select(col("da"), col("db"))
          val hit = cand.join(truth, Seq("da", "db"), "left_semi")
          cand.agg(count(lit(1)).as("n_cand"))
            .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
            .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
            .select(col("n_cand"), col("n_truth"), col("n_hit"),
              when(col("n_cand") === 0, lit(null).cast("double"))
                .otherwise(round(col("n_hit") / col("n_cand"), 4)).as("prec"),
              when(col("n_truth") === 0, lit(null).cast("double"))
                .otherwise(round(col("n_hit") / col("n_truth"), 4)).as("recall"))
        },
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 120")}),
             |bands AS ($bandSelects),
             |cand AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |         FROM bands a JOIN bands b2
             |           ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |s AS (
             |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
             |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
             |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
             |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
             |truth AS (SELECT da, db FROM (
             |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
             |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
             |  WHERE j >= 0.25),
             |m AS (SELECT (SELECT count(*) FROM cand) AS n_cand,
             |             (SELECT count(*) FROM truth) AS n_truth,
             |             (SELECT count(*) FROM cand JOIN truth USING (da, db)) AS n_hit)
             |SELECT CAST(n_cand AS BIGINT) AS n_cand,
             |       CAST(n_truth AS BIGINT) AS n_truth,
             |       CAST(n_hit AS BIGINT) AS n_hit,
             |       CASE WHEN n_cand = 0 THEN NULL
             |            ELSE round(n_hit * 1.0 / n_cand, 4) END AS prec,
             |       CASE WHEN n_truth = 0 THEN NULL
             |            ELSE round(n_hit * 1.0 / n_truth, 4) END AS recall
             |FROM m""".stripMargin
        }),

      // degree assortativity of the near-dup graph: Pearson r between
      // endpoint degrees over DIRECTED edge copies (the standard
      // undirected convention — each edge contributes both (du,dw)
      // and (dw,du)). Positive r = dup cliques of similar size link
      // to each other; strongly negative r = hub-and-spoke chains,
      // the signature of a boilerplate shingle bridging unrelated
      // docs. Degrees are a broadcast |V|-row table joined back onto
      // the checkpointed edge frame — the corpus-scale shingle join
      // runs ONCE; everything after is O(|E|) with no shuffle join.
      "graph_assort" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            // three consumers (degrees, directed copies, edge count)
            .localCheckpoint(eager = false)
          val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("dg"))
          val dir = e0.select(col("da").as("u"), col("db").as("w"))
            .union(e0.select(col("db").as("u"), col("da").as("w")))
          dir
            .join(broadcast(deg.select(col("v").as("u"), col("dg").as("du"))), "u")
            .join(broadcast(deg.select(col("v").as("w"), col("dg").as("dw"))), "w")
            .agg(count(lit(1)).as("n_dir"),
                 corr(col("du").cast("double"), col("dw").cast("double")).as("r"))
            .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
            .select(col("n_nodes"), expr("n_dir div 2").as("n_edges"),
              when(col("r").isNull || isnan(col("r")), lit(null).cast("double"))
                .otherwise(round(col("r"), 4)).as("assortativity"))
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                |        FROM (SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)
                |        GROUP BY v),
                |dir AS (SELECT da AS u, db AS w FROM e0
                |        UNION ALL SELECT db AS u, da AS w FROM e0),
                |j AS (SELECT d1.dg AS du, d2.dg AS dw FROM dir
                |      JOIN deg d1 ON d1.v = dir.u JOIN deg d2 ON d2.v = dir.w),
                |a AS (SELECT CAST(count(*) AS BIGINT) AS n_dir,
                |             corr(CAST(du AS DOUBLE), CAST(dw AS DOUBLE)) AS r
                |      FROM j),
                |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
                |SELECT n_nodes, n_dir // 2 AS n_edges,
                |       CASE WHEN r IS NULL OR isnan(r) THEN NULL
                |            ELSE round(r, 4) END AS assortativity
                |FROM a, n""".stripMargin)),

      // Adamic–Adar link prediction on the near-dup graph: for every
      // NON-adjacent pair sharing ≥1 neighbor, score Σ 1/ln(deg(z))
      // over common neighbors z — the "these two docs dup the same
      // things but not yet each other" candidates a curator reviews
      // before tightening the Jaccard threshold. Wedge self-join on
      // the checkpointed neighbor frame (pivot z is the join key, so
      // the shuffle partitions by pivot exactly as graph_triangles
      // does); deg(z) ≥ 2 for any wedge pivot, so ln is never 0. The
      // final TakeOrderedAndProject keeps only the top 20 — no
      // global sort at scale.
      "graph_adamic_adar" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // nbr expansion + anti-join back
          val nb = e0.select(col("da").as("z"), col("db").as("x"))
            .union(e0.select(col("db").as("z"), col("da").as("x")))
            .localCheckpoint(eager = false) // wedge join reads it twice
          val deg = nb.groupBy("z").agg(count(lit(1)).as("dg"))
          nb.select(col("z"), col("x").as("u"))
            .join(nb.select(col("z"), col("x").as("v")), "z")
            .filter(col("u") < col("v"))
            .join(broadcast(deg), "z")
            .groupBy("u", "v")
            .agg(count(lit(1)).as("common"),
                 round(sum(lit(1.0) / log(col("dg").cast("double"))), 4).as("aa"))
            .join(e0, col("u") === col("da") && col("v") === col("db"), "left_anti")
            .orderBy(col("aa").desc, col("u"), col("v"))
            .limit(20)
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |nb AS (SELECT da AS z, db AS x FROM e0
                |       UNION ALL SELECT db AS z, da AS x FROM e0),
                |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS dg FROM nb GROUP BY z),
                |w AS (SELECT a.x AS u, b.x AS v, a.z
                |      FROM nb a JOIN nb b ON a.z = b.z AND a.x < b.x),
                |sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common,
                |              round(sum(1.0 / ln(CAST(dg AS DOUBLE))), 4) AS aa
                |       FROM w JOIN deg USING (z) GROUP BY u, v),
                |nonadj AS (SELECT sc.* FROM sc
                |           WHERE NOT EXISTS (SELECT 1 FROM e0
                |                             WHERE e0.da = sc.u AND e0.db = sc.v))
                |SELECT u, v, common, aa FROM nonadj
                |ORDER BY aa DESC, u, v LIMIT 20""".stripMargin)),

      // bounded BFS from the lowest-id node in the near-dup graph:
      // 4 unrolled frontier expansions (both engines run the SAME 4,
      // oracle unrolls them), each one distinct-expand + anti-join on
      // that round's CHECKPOINTED depth table — the corpus-scale
      // shingle join runs once, a round costs O(frontier·avg-degree)
      // shuffle, and first-reach = shortest depth because a visited
      // node never re-enters. The "how far does this dup cluster
      // chain" probe a curator runs on a suspicious component.
      "graph_bfs" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false)
          val nbr = e0.select(col("da").as("v"), col("db").as("n"))
            .union(e0.select(col("db").as("v"), col("da").as("n")))
            .localCheckpoint(eager = false) // read once per round
          // da < db on every edge, so min(da) IS the global min node
          var dt = e0.agg(min(col("da")).as("v"))
            .withColumn("depth", lit(0L))
            .localCheckpoint(eager = false)
          for (k <- 1 to 4) {
            val fr = dt.filter(col("depth") === (k - 1).toLong)
            val nxt = fr.join(nbr, "v").select(col("n").as("v")).distinct()
              .join(dt, Seq("v"), "left_anti")
              .withColumn("depth", lit(k.toLong))
            dt = dt.union(nxt)
              .localCheckpoint(eager = false) // next round reads twice
          }
          dt.orderBy("v").select(col("v"), col("depth"))
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |nbr AS (SELECT da AS v, db AS n FROM e0
                |        UNION ALL SELECT db AS v, da AS n FROM e0),
                |d0 AS (SELECT min(da) AS v, CAST(0 AS BIGINT) AS depth FROM e0),
                |${bfsIterSql(4)}
                |SELECT v, depth FROM d4 ORDER BY v""".stripMargin)),

      // shingle document-frequency profile (log2-bucketed histogram):
      // the skew audit that SETS the df cap dedup_jaccard_capped
      // applies — the tail buckets are exactly the stop-shingles whose
      // fan-out would explode the intersection join. floor(log2(df))
      // is exact at powers of two on both engines
      "dedup_df_profile" -> Q(
        (s, d) => graft.text.TextPrimitives
          .charShingles(docsUnder(s, d, 200), "doc_id", "text", 5)
          .groupBy("sh").agg(count(lit(1)).as("df"))
          .select(floor(log2(col("df"))).cast("long").as("b"))
          .groupBy("b").agg(count(lit(1)).as("n_shingles"))
          .orderBy("b"),
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 200")}),
                |df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM s GROUP BY sh)
                |SELECT CAST(floor(log2(df)) AS BIGINT) AS b,
                |       CAST(count(*) AS BIGINT) AS n_shingles
                |FROM df GROUP BY b ORDER BY b""".stripMargin)),

      // skew-safe Jaccard: shingles above the document-frequency cap
      // are dropped before the intersection join, bounding every join
      // key's fan-out at maxDf² (stop-shingle skew death at web scale)
      "dedup_jaccard_capped" -> Q(
        (s, d) => Dedup.ngramJaccardCapped(docsUnder(s, d, 120), 5, 0.25, 92),
        Some(s"""WITH s0 AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |s AS (SELECT s0.doc_id, s0.sh FROM s0 JOIN (
                |        SELECT sh FROM s0 GROUP BY sh HAVING count(*) <= 92) ok
                |      ON s0.sh = ok.sh),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db)
                |SELECT da, db, round(j, 4) AS jaccard FROM (
                |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |WHERE j >= 0.25 ORDER BY da, db""".stripMargin)),

      // asymmetric shingle containment |A∩B|/|A| — catches documents
      // embedded inside larger ones, which symmetric Jaccard misses
      "dedup_containment" -> Q(
        (s, d) => {
          val sh = graft.text.TextPrimitives.charShingles(docsUnder(s, d, 120), "doc_id", "text", 5)
          val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
          val a = sh.toDF("da", "sh")
          val b = sh.toDF("db", "sh")
          a.join(b, Seq("sh")).filter(col("da") =!= col("db"))
            .groupBy("da", "db").agg(count(lit(1)).as("ni"))
            .join(cnt.toDF("da", "na"), "da")
            .withColumn("c", col("ni") * lit(1.0) / col("na"))
            .filter(col("c") >= 0.6)
            .select(col("da"), col("db"), round(col("c"), 4).as("containment"))
            .orderBy("da", "db")
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id <> b.doc_id
                |      GROUP BY da, db)
                |SELECT da, db, round(cc, 4) AS containment FROM (
                |  SELECT da, db, ni * 1.0 / ca.cnt AS cc
                |  FROM i JOIN c ca ON ca.doc_id = da)
                |WHERE cc >= 0.6 ORDER BY da, db""".stripMargin)),

      "dedup_minhash_sig" -> Q(
        (s, d) => Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8),
        Some(s"""WITH sig AS (
                |${Dedup.minhashSigSql(5, 8, "doc_id < 200")})
                |SELECT * FROM sig ORDER BY doc_id""".stripMargin)),

      "dedup_minhash_tok" -> Q(
        (s, d) => Dedup.minhashSignaturesTokens(docsUnder(s, d, 200), 2, 8),
        Some(s"""WITH sig AS (
                |${Dedup.minhashOverSql(
                   graft.text.TextPrimitives.tokenShinglesSql(
                     "documents", "doc_id", "text", 2, "doc_id < 200"), 8)})
                |SELECT * FROM sig ORDER BY doc_id""".stripMargin)),

      "dedup_minhash_lsh" -> Q(
        (s, d) => Dedup.minhashLshPairs(
          Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8), 8, 2),
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS ($bandSelects)
             |SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
             |ORDER BY da, db""".stripMargin
        }),

      // incremental dedup: a NEW batch (doc_id 150–249) screened
      // against the EXISTING corpus (doc_id < 150) — the corpus
      // signature table is precomputed once, only batch signatures are
      // computed per increment, candidates come from the band
      // equi-join (batch×corpus never materializes)
      "dedup_incremental" -> Q(
        (s, d) => Dedup.minhashLshPairsIncremental(
          Dedup.minhashSignatures(docsUnder(s, d, 150), 5, 8),
          Dedup.minhashSignatures(Tables.documents(s, d)
            .filter(col("doc_id") >= 150 && col("doc_id") < 250), 5, 8),
          8, 2),
        Some {
          def bandSelects(src: String) = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM $src"
          }.mkString(" UNION ALL ")
          s"""WITH sigc AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 150")}),
             |sigb AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id >= 150 AND doc_id < 250")}),
             |bc AS (${bandSelects("sigc")}),
             |bb AS (${bandSelects("sigb")})
             |SELECT DISTINCT c.doc_id AS da, b2.doc_id AS db
             |FROM bc c JOIN bb b2 ON c.b = b2.b AND c.bv = b2.bv
             |ORDER BY da, db""".stripMargin
        }),

      // canonical-doc assignment: transitive closure of the LSH dup
      // graph (DuckDB oracle via recursive CTE). The label table is
      // built ONCE per (context, dir) — map-side minhash basis, no
      // signature shuffle — and shared with dedup_keep_best below.
      "dedup_clusters" -> Q(
        (s, d) => Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
          .orderBy("doc_id"),
        Some(s"""WITH RECURSIVE sig AS (
                |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
                |bands AS (${(0 until 4).map(b =>
                   s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                   .mkString(" UNION ALL ")}),
                |pairs AS (
                |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
                |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
                |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
                |reach(src, lbl) AS (
                |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
                |  UNION
                |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src)
                |SELECT src AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
                |FROM reach GROUP BY src ORDER BY src""".stripMargin)),

      // canonical selection: per duplicate cluster keep the highest-
      // quality member — composed ON TOP of the shared label table
      // (computed once by dedup_clusters above), the way a real
      // pipeline derives its keep/drop decision from one CC pass
      "dedup_keep_best" -> Q(
        (s, d) => Dedup.keepBest(
          Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2),
          graft.text.TextAnalytics.qualityScores(docsUnder(s, d, 200))),
        Some {
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH RECURSIVE sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS (${(0 until 4).map(b =>
                s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                .mkString(" UNION ALL ")}),
             |pairs AS (
             |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
             |reach(src, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
             |  UNION
             |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
             |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
             |q AS (
             |  SELECT doc_id,
             |    round((least(n_tok, 100) / 100.0) *
             |          (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
             |          (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
             |  FROM (
             |    SELECT doc_id, length(text) AS n_chars,
             |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |               t -> t IN ($stopList))) AS stop_cnt,
             |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
             |    FROM documents WHERE doc_id < 200)),
             |j AS (
             |  SELECT cc.doc_id, cluster, quality, row_number() OVER (
             |    PARTITION BY cluster ORDER BY quality DESC, cc.doc_id) AS rn
             |  FROM cc JOIN q USING (doc_id))
             |SELECT CAST(cluster AS BIGINT) AS cluster,
             |       CAST(count(*) AS BIGINT) AS n_members,
             |       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS kept_doc,
             |       max(quality) AS best_quality
             |FROM j GROUP BY cluster ORDER BY cluster""".stripMargin
        }),

      // dup-cluster size histogram (the dedup audit chart: how much of
      // the corpus sits in clusters of 1, 2, 3… members) — two tiny
      // aggregates ON TOP of the shared CC label table, so the audit
      // is ~free once dedup_clusters has run
      "dedup_cluster_sizes" -> Q(
        (s, d) => Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
          .groupBy("cluster").agg(count(lit(1)).as("sz"))
          .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
          .orderBy("sz"),
        Some(s"""WITH RECURSIVE sig AS (
                |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
                |bands AS (${(0 until 4).map(b =>
                   s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                   .mkString(" UNION ALL ")}),
                |pairs AS (
                |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
                |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
                |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
                |reach(src, lbl) AS (
                |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
                |  UNION
                |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
                |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
                |szs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz FROM cc GROUP BY cluster)
                |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
                |FROM szs GROUP BY sz ORDER BY sz""".stripMargin)),

      // fuzzy near-dup by edit distance on document prefixes (exact
      // integer distances — Spark and DuckDB levenshtein agree).
      // Blocked scale path: positional-unigram prefix filter feeds an
      // equi-join; exact levenshtein runs only on candidates
      // (Dedup.levenshteinPairs, equivalence spec vs the quadratic).
      "dedup_levenshtein" -> Q(
        (s, d) => Dedup.levenshteinPairs(docsUnder(s, d, 80), 40, 25, q = 1),
        Some("""SELECT a.doc_id AS da, b.doc_id AS db,
               |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
               |FROM (SELECT doc_id, substring(text, 1, 40) AS p FROM documents WHERE doc_id < 80) a
               |JOIN (SELECT doc_id, substring(text, 1, 40) AS p FROM documents WHERE doc_id < 80) b
               |  ON a.doc_id < b.doc_id
               |WHERE levenshtein(a.p, b.p) <= 25
               |ORDER BY da, db""".stripMargin)),

      "dedup_simhash" -> Q(
        (s, d) => Dedup.simhashPairs(docsUnder(s, d, 200), 6),
        Some(s"""WITH sig AS (
                |${Dedup.simhashSql("doc_id < 200")})
                |SELECT da, db, dist FROM (
                |  SELECT a.doc_id AS da, b.doc_id AS db,
                |         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
                |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
                |WHERE dist <= 6 ORDER BY da, db""".stripMargin)),

      "dedup_embed_cosine" -> Q(
        (s, d) => Dedup.embeddingNearDup(Tables.embeddings(s, d), 0.4),
        Some("""SELECT va, vb, score FROM (
               |  SELECT a.vec_id AS va, b.vec_id AS vb,
               |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) + 0.0 AS score
               |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
               |WHERE score >= 0.4 ORDER BY va, vb""".stripMargin)),

      // train/test contamination audit: the LSH near-dup candidate
      // pairs crossed with the deterministic hash split — counts of
      // candidate pairs that straddle split boundaries are exactly the
      // leakage a decontamination pass must remove. Pure composition
      // of two existing primitives; the split column is a map-side
      // expression, so the only added cost is two equi-joins against
      // the (doc_id, split) projection
      "pipe_split_leakage" -> Q(
        (s, d) => {
          val pairs = Dedup.minhashLshPairs(
            Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8), 8, 2)
          val splits = graft.ops.Sampling
            .hashSplit(Tables.documents(s, d), "doc_id", 80, 10)
            .select(col("doc_id"), col("split"))
          pairs
            .join(splits.select(col("doc_id").as("da"), col("split").as("split_a")), "da")
            .join(splits.select(col("doc_id").as("db"), col("split").as("split_b")), "db")
            .filter(col("split_a") =!= col("split_b"))
            .groupBy("split_a", "split_b")
            .agg(count(lit(1)).as("n_pairs"))
            .orderBy("split_a", "split_b")
        },
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS ($bandSelects),
             |pr AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |       FROM bands a JOIN bands b2
             |         ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |sp AS (SELECT doc_id,
             |              CASE WHEN b < 80 THEN 'train'
             |                   WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |       FROM (SELECT doc_id,
             |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
             |             FROM documents))
             |SELECT sa.split AS split_a, sb.split AS split_b,
             |       CAST(count(*) AS BIGINT) AS n_pairs
             |FROM pr JOIN sp sa ON pr.da = sa.doc_id
             |        JOIN sp sb ON pr.db = sb.doc_id
             |WHERE sa.split <> sb.split
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        }),

      // leakage-PROOF splitting — the FIX for what pipe_split_leakage
      // detects: hash the dup-CLUSTER label instead of the doc id, so
      // every near-dup family lands in one split by construction. The
      // query re-runs the LSH candidate audit against the new split
      // and reports n_leaked (0 whenever the candidate pairs are a
      // subset of the clustered pairs, i.e. always — candidates ARE
      // the cluster edges). Family-atomic splits trade proportion
      // accuracy for leakage-freedom: a giant dup family moves as one
      // unit (this corpus's aggressive b=4/r=2 banding produces one —
      // dedup_cluster_sizes is the audit that would flag it)
      "samp_cluster_split" -> Q(
        (s, d) => {
          val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
          val split = graft.ops.Sampling.hashSplit(labels, "cluster", 80, 10)
          val pairs = Dedup.minhashLshPairs(
            Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8), 8, 2)
          val leaks = pairs
            .join(split.select(col("doc_id").as("da"), col("split").as("sa")), "da")
            .join(split.select(col("doc_id").as("db"), col("split").as("sb")), "db")
            .filter(col("sa") =!= col("sb"))
            .agg(count(lit(1)).as("n_leaked"))
          split.groupBy("split").agg(count(lit(1)).as("n_docs"))
            .crossJoin(broadcast(leaks))
            .orderBy("split")
        },
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH RECURSIVE sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS ($bandSelects),
             |pr AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |       FROM bands a JOIN bands b2
             |         ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |edges AS (SELECT da, db FROM pr UNION ALL SELECT db, da FROM pr),
             |reach(src, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
             |  UNION
             |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
             |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
             |sp AS (SELECT doc_id,
             |              CASE WHEN bk < 80 THEN 'train'
             |                   WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
             |       FROM (SELECT doc_id,
             |               ('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 15))::BIGINT % 100 AS bk
             |             FROM cc)),
             |lk AS (SELECT CAST(count(*) AS BIGINT) AS n_leaked
             |       FROM pr JOIN sp a ON pr.da = a.doc_id
             |               JOIN sp b2 ON pr.db = b2.doc_id
             |       WHERE a.split <> b2.split)
             |SELECT split, CAST(count(*) AS BIGINT) AS n_docs, n_leaked
             |FROM sp, lk GROUP BY split, n_leaked ORDER BY split""".stripMargin
        }),

      // exact-substring dedup at n-gram granularity (the suffix-array
      // pass of RefinedWeb/Gopher, re-expressed relationally): hash
      // every 8-token window, count distinct docs per window hash, and
      // report per-doc coverage by cross-doc duplicated spans. Explode
      // is map-side; the only shuffles are the groupBy on the gram hash
      // and one equi-join back — both scale linearly with token count
      "dedup_span_ngrams" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val grams = Tables.documents(s, d)
            .select(col("doc_id"), t.as("t"))
            .select(col("doc_id"), explode(
              when(size(col("t")) >= 8,
                transform(sequence(lit(1), size(col("t")) - 7),
                  i => graft.functions.VectorFunctions.md5Long(
                    concat_ws(" ", slice(col("t"), i, lit(8))))))
              .otherwise(array().cast("array<bigint>"))).as("g"))
          val dc = grams.groupBy("g").agg(countDistinct("doc_id").as("ndocs"))
          grams.filter(col("doc_id") < 100)
            .join(dc, "g")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_grams"),
                 sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup"))
            .select(col("doc_id"), col("n_grams"), col("n_dup"),
                    round(col("n_dup") / col("n_grams"), 4).as("dup_frac"))
            .orderBy("doc_id")
        },
        Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |grams AS (SELECT doc_id,
               |                 ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS g
               |          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
               |                FROM toks)),
               |dc AS (SELECT g, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
               |       FROM grams GROUP BY g)
               |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               |       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               |       round(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_frac
               |FROM grams JOIN dc USING (g)
               |WHERE doc_id < 100
               |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // SemDeDup: coarse-cluster, then keep-first greedy drop inside
      // each cell — the quadratic scan never leaves a cell, so the
      // shuffle is one equi-join on cid (cells ∝ √N keeps them bounded)
      "dedup_semantic" -> Q(
        (s, d) => Dedup.semanticDedup(Tables.embeddings(s, d), 4, 0.4),
        Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               |               FROM embeddings WHERE vec_id < 4),
               |scored AS (
               |  SELECT e.vec_id, e.embedding, c.cid,
               |         row_number() OVER (PARTITION BY e.vec_id
               |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
               |  FROM embeddings e, cents c),
               |a AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
               |drp AS (SELECT DISTINCT x.cid, y.vec_id AS vb
               |        FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
               |        WHERE round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) + 0.0 >= 0.4),
               |n AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs FROM a GROUP BY cid),
               |dn AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_dropped FROM drp GROUP BY cid)
               |SELECT n.cid, n_vecs, CAST(coalesce(n_dropped, 0) AS BIGINT) AS n_dropped,
               |       round(coalesce(n_dropped, 0) * 1.0 / n_vecs, 4) AS drop_frac
               |FROM n LEFT JOIN dn USING (cid) ORDER BY n.cid""".stripMargin)))
  }

  // ---------------------------------------------------------------
  // Text analysis (SURVEY §2 #23–26) + embedder invariant (#13)
  // ---------------------------------------------------------------

  private val textQ: Seq[(String, Q)] = {
    import graft.text.TextAnalytics
    val stopList = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
    Seq(
      "text_token_count" -> Q(
        (s, d) => TextAnalytics.tokenCounts(Tables.documents(s, d)),
        Some("""SELECT doc_id,
               |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws,
               |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
               |FROM documents ORDER BY doc_id""".stripMargin)),

      "text_quality" -> Q(
        (s, d) => TextAnalytics.qualityScores(Tables.documents(s, d)),
        Some(s"""SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                |  round((least(n_tok, 100) / 100.0) *
                |        (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |        (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |FROM (
                |  SELECT doc_id, length(text) AS n_chars,
                |         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |             t -> t IN ($stopList))) AS stop_cnt,
                |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |  FROM documents)
                |ORDER BY doc_id""".stripMargin)),

      // CCNet-style perplexity bucketing (Wenzek et al. 2020), with the
      // cheap quality score standing in for the LM: per-language tercile
      // cutoffs are computed as ONE tiny aggregate (|lang| rows),
      // broadcast back, and every doc binned map-side — no per-language
      // global window, so the shape survives a skewed 100 TB corpus
      "text_ccnet_bins" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val q = TextAnalytics.qualityScores(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
          val cuts = q.groupBy("lang")
            .agg(expr("percentile(quality, array(0.3333333333333333D, 0.6666666666666666D))").as("cs"))
            .select(col("lang"), round(element_at(col("cs"), 1), 6).as("c1"),
                    round(element_at(col("cs"), 2), 6).as("c2"))
          q.join(broadcast(cuts), "lang")
            .withColumn("bin",
              when(col("quality") <= col("c1"), lit("tail"))
                .when(col("quality") <= col("c2"), lit("middle"))
                .otherwise(lit("head")))
            .groupBy("lang", "bin")
            .agg(count(lit(1)).as("n"), round(avg("quality"), 4).as("avg_q"))
            .orderBy("lang", "bin")
        },
        Some(s"""WITH q AS (
                |  SELECT doc_id, lang,
                |         round((least(n_tok, 100) / 100.0) *
                |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |  FROM (
                |    SELECT doc_id, lang, length(text) AS n_chars,
                |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |               t -> t IN ($stopList))) AS stop_cnt,
                |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |    FROM documents)),
                |cuts AS (SELECT lang,
                |                round(quantile_cont(quality, 0.3333333333333333), 6) AS c1,
                |                round(quantile_cont(quality, 0.6666666666666666), 6) AS c2
                |         FROM q GROUP BY lang)
                |SELECT lang,
                |       CASE WHEN quality <= c1 THEN 'tail'
                |            WHEN quality <= c2 THEN 'middle' ELSE 'head' END AS bin,
                |       CAST(count(*) AS BIGINT) AS n, round(avg(quality), 4) AS avg_q
                |FROM q JOIN cuts USING (lang)
                |GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin)),

      "text_langid" -> Q(
        (s, d) => TextAnalytics.languageId(Tables.documents(s, d)),
        Some(TextAnalytics.languageIdSql)),

      // language-ID confusion matrix: the heuristic's predictions vs
      // the corpus's ground-truth lang column, with per-true-language
      // recall fractions. The only window runs over the aggregated
      // |langs|×|preds| confusion cells
      "text_langid_eval" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val w = Window.partitionBy("lang")
          TextAnalytics.languageId(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
            .withColumn("frac", round(col("n") / sum("n").over(w), 4))
            .orderBy("lang", "pred_lang")
        },
        Some {
          def cnt(words: Seq[String]) =
            s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
              s"t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
          val Seq(en, es, de, fr) = TextAnalytics.Lexica.map { case (_, w) => cnt(w) }
          s"""WITH p AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN $en + $es + $de + $fr = 0 THEN 'und'
             |         WHEN $en >= greatest($es, $de, $fr) THEN 'en'
             |         WHEN $es >= greatest($de, $fr) THEN 'es'
             |         WHEN $de >= $fr THEN 'de'
             |         ELSE 'fr' END AS pred_lang
             |  FROM documents),
             |c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |      FROM p GROUP BY lang, pred_lang)
             |SELECT lang, pred_lang, n,
             |       round(n * 1.0 / sum(n) OVER (PARTITION BY lang), 4) AS frac
             |FROM c ORDER BY lang, pred_lang""".stripMargin
        }),

      // C4-style text normalization: casefold, strip punctuation,
      // collapse whitespace — pure map-side projection; the content
      // hash of the normalized form is the exact-dedup key a cleaned
      // corpus would use
      "text_normalize" -> Q(
        (s, d) => {
          val norm = TextAnalytics.normalize(col("text"))
          Tables.documents(s, d)
            .select(col("doc_id"), length(norm).cast("long").as("n_chars_norm"),
                    graft.functions.VectorFunctions.md5Long(norm).as("h_norm"))
            .orderBy("doc_id")
        },
        Some("""SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_chars_norm,
               |       ('0x' || substr(md5(norm), 1, 15))::BIGINT AS h_norm
               |FROM (SELECT doc_id,
               |        trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'),
               |             '\s+', ' ', 'g')) AS norm
               |      FROM documents)
               |ORDER BY doc_id""".stripMargin)),

      // Gopher-style repetition filters: top-unigram/bigram fractions,
      // type-token ratio, duplicated-trigram fraction per doc
      "text_repetition" -> Q(
        (s, d) => TextAnalytics.repetitionStats(Tables.documents(s, d)),
        Some(TextAnalytics.repetitionStatsSql)),

      // benchmark decontamination: train docs sharing any 8-token
      // shingle with the held-out eval slice (doc_id % 20 == 0)
      "text_decontam" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          TextAnalytics.contamination(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0), 8)
        },
        Some(s"""WITH tsh AS (
                |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 8, "doc_id % 20 <> 0")}),
                |bsh AS (SELECT DISTINCT sh FROM (
                |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 8, "doc_id % 20 = 0")}))
                |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                |       CAST(count(b.sh) AS BIGINT) AS n_hit,
                |       round(count(b.sh) / count(*), 4) AS hit_frac,
                |       CAST(count(b.sh) > 0 AS INTEGER) AS contaminated
                |FROM tsh t LEFT JOIN bsh b USING (sh)
                |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

      "text_fingerprint" -> Q(
        (s, d) => TextAnalytics.fingerprints(Tables.documents(s, d)),
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 4)})
                |SELECT doc_id, CAST(min(hm) AS BIGINT) AS fp_min,
                |       CAST(max(hm) AS BIGINT) AS fp_max,
                |       CAST(count(*) AS BIGINT) AS n_shingles
                |FROM (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS hm FROM s)
                |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // The reference's flagship flow (search_query: text → vector →
      // cosine top-k), oracle'd end-to-end: DuckDB reproduces the
      // feature-hash embedder AND the cosine, bit-for-bit.
      "text_search_e2e" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val raw = graft.embed.HashEmbedder.embedDocsRaw(
            Tables.documents(s, d), "doc_id", "text", 64)
          val q = raw.filter(col("doc_id") === 3).select(col("embedding").as("qv"))
          raw.crossJoin(broadcast(q))
            .select(col("doc_id"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("doc_id"))
            .limit(10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3)
             |SELECT doc_id,
             |       round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                  ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |FROM (SELECT s.doc_id, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |      FROM sums s, q)
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
        }),

      // hybrid retrieval: BM25 top-20 ⊕ embedding-cosine top-20 fused
      // by reciprocal rank (1/(60+r)) — the calibration-free lexical+
      // vector combination; both inputs bounded before fusion
      "text_hybrid_rrf" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val docs = Tables.documents(s, d)
          val lex = graft.text.Bm25.search(docs, Seq("spark", "hash", "merge"), 20)
          val raw = graft.embed.HashEmbedder.embedDocsRaw(docs, "doc_id", "text", 64)
          val qv = raw.filter(col("doc_id") === 3).select(col("embedding").as("qv"))
          val vec = raw.crossJoin(broadcast(qv))
            .select(col("doc_id"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("doc_id")).limit(20)
          graft.text.Hybrid.rrf(lex, vec, "doc_id", "bm25", "score", 60, 10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
             |              FROM documents),
             |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
             |       FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
             |       WHERE tok IN ('spark', 'hash', 'merge') GROUP BY doc_id, tok),
             |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
             |lex AS (SELECT doc_id,
             |               round(sum((ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)) /
             |                         (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
             |        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
             |        GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
             |sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3),
             |vec AS (SELECT doc_id,
             |               round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                          ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |        FROM (SELECT s.doc_id, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |              FROM sums s, q)
             |        ORDER BY score DESC, doc_id LIMIT 20),
             |lr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM lex),
             |vr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM vec)
             |SELECT coalesce(lr.doc_id, vr.doc_id) AS doc_id,
             |       round(coalesce(1.0 / (60 + lr.r), 0) + coalesce(1.0 / (60 + vr.r), 0), 6) AS rrf
             |FROM lr FULL JOIN vr ON lr.doc_id = vr.doc_id
             |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
        }),

      // the whole training-data prep pipeline as ONE Catalyst plan:
      // exact dedup → quality filter → deterministic split → stats
      // (operators composing is the point — no materialization
      // boundaries between stages)
      "pipe_e2e_prep" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val keep = graft.dedup.Dedup.exact(docs).select(col("keep_id").as("doc_id"))
          val deduped = docs.join(keep, "doc_id")
          val q = graft.text.TextAnalytics.qualityScores(deduped)
            .filter(col("quality") >= 0.3).select("doc_id", "n_tok")
          graft.ops.Sampling.hashSplit(q, "doc_id", 80, 10)
            .groupBy("split")
            .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"),
                 sum("n_tok").as("sum_tok"))
            .orderBy("split")
        },
        Some(s"""WITH keep AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
                |              FROM documents GROUP BY md5(text)),
                |dd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
                |q AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                |        round((least(n_tok, 100) / 100.0) *
                |              (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |              (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |      FROM (SELECT doc_id, length(text) AS n_chars,
                |                   len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |                   len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |                       t -> t IN ($stopList))) AS stop_cnt,
                |                   len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |            FROM dd)),
                |f AS (SELECT doc_id, n_tok FROM q WHERE quality >= 0.3),
                |sp AS (SELECT doc_id, n_tok,
                |              CASE WHEN b < 80 THEN 'train'
                |                   WHEN b < 90 THEN 'val' ELSE 'test' END AS split
                |       FROM (SELECT doc_id, n_tok,
                |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
                |             FROM f))
                |SELECT split, CAST(count(*) AS BIGINT) AS n,
                |       CAST(sum(doc_id) AS BIGINT) AS sum_id,
                |       CAST(sum(n_tok) AS BIGINT) AS sum_tok
                |FROM sp GROUP BY split ORDER BY split""".stripMargin)),

      // sequence packing for pretraining batches: concat-then-chunk
      // layout — each doc is assigned the 512-token context window its
      // first token lands in; the global prefix sum is a two-level
      // scan (bounded per-block windows + a blockSize-reduced offset
      // table), never a full-data global window (ops/Packing.scala)
      "pipe_pack_sequences" -> Q(
        (s, d) => {
          val toks = Tables.documents(s, d).select(col("doc_id"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("n_tok"))
          graft.ops.Packing.packSequences(toks, "doc_id", "n_tok", 512L, 100L)
            .groupBy("pack_id")
            .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tok"),
                 min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
            .orderBy("pack_id")
        },
        Some("""WITH t AS (
               |  SELECT doc_id,
               |         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
               |  FROM documents),
               |o AS (
               |  SELECT doc_id, n_tok,
               |         coalesce(sum(n_tok) OVER (ORDER BY doc_id
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
               |  FROM t)
               |SELECT CAST(off // 512 AS BIGINT) AS pack_id, CAST(count(*) AS BIGINT) AS n_docs,
               |       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
               |       CAST(min(doc_id) AS BIGINT) AS first_doc,
               |       CAST(max(doc_id) AS BIGINT) AS last_doc
               |FROM o GROUP BY pack_id ORDER BY pack_id""".stripMargin)),

      // deterministic hash-based train/val/test split (stable across
      // runs/partitioning — never rand())
      "samp_hash_split" -> Q(
        (s, d) => graft.ops.Sampling.hashSplit(Tables.documents(s, d), "doc_id", 80, 10)
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"))
          .orderBy("split"),
        Some("""SELECT split, CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(doc_id) AS BIGINT) AS sum_id FROM (
               |  SELECT doc_id,
               |         CASE WHEN b < 80 THEN 'train'
               |              WHEN b < 90 THEN 'val' ELSE 'test' END AS split
               |  FROM (SELECT doc_id,
               |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
               |        FROM documents))
               |GROUP BY split ORDER BY split""".stripMargin)),

      // domain-mix reweighting: per-source keep rates (training-mix
      // shaping), deterministic salted-hash acceptance — map-side
      // filter, no join, rerun-stable
      "samp_domain_mix" -> Q(
        (s, d) => {
          val rateBp = (substring(col("source"), 4, 10).cast("int") % 5 + 1) * 2000
          Tables.documents(s, d)
            .withColumn("kept",
              graft.ops.Sampling.domainWeighted(col("doc_id"), rateBp).cast("int"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_total"), sum("kept").cast("long").as("n_kept"),
                 max(rateBp).cast("long").as("rate_bp"))
            .orderBy("source")
        },
        Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_total,
               |       CAST(sum(kept) AS BIGINT) AS n_kept,
               |       CAST(max(rate_bp) AS BIGINT) AS rate_bp FROM (
               |  SELECT source,
               |         (CAST(substr(source, 4) AS INTEGER) % 5 + 1) * 2000 AS rate_bp,
               |         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
               |              < (CAST(substr(source, 4) AS INTEGER) % 5 + 1) * 2000 AS INTEGER) AS kept
               |  FROM documents)
               |GROUP BY source ORDER BY source""".stripMargin)),

      // global uniform m-sample as a mergeable bottom-k (the
      // deterministic distributed reservoir): m smallest content
      // hashes win; plans as TakeOrderedAndProject (m rows per
      // partition shuffle)
      "samp_bottomk" -> Q(
        (s, d) => graft.ops.Sampling.bottomK(Tables.documents(s, d), "doc_id", 20)
          .select("doc_id", "h", "source"),
        Some("""SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
               |       source
               |FROM documents ORDER BY h, doc_id LIMIT 20""".stripMargin)),

      // per-stratum reservoir: k smallest hashes WITHIN each source,
      // via the bounded TopK partial aggregate — map-side k per group,
      // no row_number over a hot group (the oracle's window IS that
      // shape; fine for DuckDB, wrong for 100 TB Spark)
      "samp_group_sample" -> Q(
        (s, d) => graft.ops.Sampling.bottomKPerGroup(
            Tables.documents(s, d), "source", "doc_id", 3)
          .orderBy("source", "h", "doc_id"),
        Some("""WITH h AS (SELECT source, doc_id,
               |  ('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |    % 1000000000 AS h
               |  FROM documents),
               |r AS (SELECT source, doc_id, h,
               |      row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
               |      FROM h)
               |SELECT source, doc_id, h FROM r WHERE rn <= 3
               |ORDER BY source, h, doc_id""".stripMargin)),

      // weighted sample without replacement via exponential clocks
      // (A-ES): P(selected) ∝ n_chars, no global weight total needed;
      // clock rounded before selection so both engines pick the same
      // winners
      "samp_weighted" -> Q(
        (s, d) => graft.ops.Sampling.weightedSample(
            Tables.documents(s, d), "doc_id", col("n_chars"), 20)
          .select("doc_id", "clock", "n_chars"),
        Some("""SELECT doc_id,
               |       round(-ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |                  % 1000000 + 1) / 1000000.0) / n_chars, 6) AS clock,
               |       n_chars
               |FROM documents WHERE n_chars > 0
               |ORDER BY clock, doc_id LIMIT 20""".stripMargin)),

      // the full curation pipeline as ONE Catalyst plan: PII scrub →
      // quality filter → temperature (α=0.5) language rebalance →
      // greedy token-budget selection → per-language summary. Every
      // stage is the library operator (Pii.redact, qualityScores,
      // temperatureRebalance, selectByTokenBudget); the oracle chains
      // the same stages as CTEs. No stage materializes — Catalyst
      // fuses scrub+quality into the scan projection.
      "pipe_curate" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val scrubbed = graft.text.Pii.redact(docs)
            .select(col("doc_id"), col("redacted").as("text"))
          val q = graft.text.TextAnalytics.qualityScores(scrubbed)
            .join(docs.select(col("doc_id"), col("lang")), "doc_id")
            .filter(col("quality") >= 0.1)
          val surv = graft.ops.Sampling.temperatureRebalance(q, "lang", "doc_id")
          val kept = graft.ops.Packing.selectByTokenBudget(
            surv, "doc_id", "n_tok", "quality", 8000L)
          kept.join(surv.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(count(lit(1)).as("n_kept"), sum("tok").as("sum_tok"))
            .orderBy("lang")
        },
        Some({
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH q AS (
             |  SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
             |         round((least(n_tok, 100) / 100.0) *
             |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
             |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
             |  FROM (
             |    SELECT doc_id, lang, length(text) AS n_chars,
             |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |               t -> t IN ($stopList))) AS stop_cnt,
             |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
             |    FROM documents)),
             |f AS (SELECT * FROM q WHERE quality >= 0.1),
             |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_orig FROM f GROUP BY lang),
             |m AS (SELECT min(n_orig) AS n_min FROM c),
             |r AS (SELECT lang, CAST(floor(round(sqrt(CAST(n_min AS DOUBLE) / n_orig), 6)
             |             * 1000000) AS BIGINT) AS thr FROM c, m),
             |t AS (SELECT f.* FROM f JOIN r USING (lang)
             |      WHERE ('0x' || substr(md5('ts:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |            % 1000000 < thr),
             |o AS (SELECT doc_id, lang, n_tok,
             |             CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS cum
             |      FROM t)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             |       CAST(sum(n_tok) AS BIGINT) AS sum_tok
             |FROM o WHERE cum - n_tok < 8000
             |GROUP BY lang ORDER BY lang""".stripMargin
        })),

      // deterministic token-dropout augmentation (1-in-10): the
      // hash-of-(doc_id, position) dropout mask is reproducible across
      // runs AND engines — the oracle rebuilds the same augmented text
      "aug_token_dropout" -> Q(
        (s, d) => graft.text.TextAnalytics
          .tokenDropout(Tables.documents(s, d), 10)
          .orderBy("doc_id"),
        Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |           FROM documents),
               |e AS (SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS tok FROM t),
               |k AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS aug,
               |             count(*) AS n_kept
               |      FROM e
               |      WHERE ('0x' || substr(md5('aug:' || CAST(doc_id AS VARCHAR) || ':'
               |              || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 10 <> 0
               |      GROUP BY doc_id)
               |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_orig,
               |       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
               |       ('0x' || substr(md5(coalesce(k.aug, '')), 1, 15))::BIGINT AS h_aug
               |FROM t LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin)),

      // temperature (α=0.5) language rebalancing: kept counts ∝
      // sqrt(original counts), smallest language kept fully — sqrt is
      // IEEE-exact cross-engine where pow(x, 1/T) is not, so the
      // integer keep thresholds match bit-for-bit
      "samp_temperature" -> Q(
        (s, d) => graft.ops.Sampling
          .temperatureRebalance(Tables.documents(s, d), "lang", "doc_id")
          .groupBy("lang")
          .agg(max("n_orig").as("n_orig"), max("thr").as("thr"),
               count(lit(1)).as("n_kept"))
          .orderBy("lang"),
        Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_orig
               |           FROM documents GROUP BY lang),
               |m AS (SELECT min(n_orig) AS n_min FROM c),
               |r AS (SELECT lang, n_orig,
               |             CAST(floor(round(sqrt(CAST(n_min AS DOUBLE) / n_orig), 6)
               |                  * 1000000) AS BIGINT) AS thr
               |      FROM c, m)
               |SELECT lang, max(r.n_orig) AS n_orig, max(r.thr) AS thr,
               |       CAST(count(*) AS BIGINT) AS n_kept
               |FROM documents d JOIN r USING (lang)
               |WHERE ('0x' || substr(md5('ts:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |      % 1000000 < thr
               |GROUP BY lang ORDER BY lang""".stripMargin)),

      // greedy token-budget corpus selection: highest-quality docs
      // admitted first until the token budget fills (the mixing step
      // of a pretraining data build). Ordering is (ROUNDED quality
      // desc, doc_id) so both engines pick the identical prefix; the
      // running total is the score-bucketed two-level scan
      // (ops/Packing.scala), never a full-data global window.
      "samp_token_budget" -> Q(
        (s, d) => graft.ops.Packing.selectByTokenBudget(
            graft.text.TextAnalytics.qualityScores(Tables.documents(s, d)),
            "doc_id", "n_tok", "quality", 10000L)
          .orderBy("cum_tok"),
        Some({
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH q AS (
             |  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |         round((least(n_tok, 100) / 100.0) *
             |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
             |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
             |  FROM (
             |    SELECT doc_id, length(text) AS n_chars,
             |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |               t -> t IN ($stopList))) AS stop_cnt,
             |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
             |    FROM documents)),
             |o AS (SELECT doc_id, quality, n_tok AS tok,
             |             CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_tok
             |      FROM q)
             |SELECT doc_id, quality, tok, cum_tok FROM o
             |WHERE cum_tok - tok < 10000 ORDER BY cum_tok""".stripMargin
        })),

      // DSIR-style importance weighting (Xie et al. 2023,
      // arXiv:2302.03169): hashed-unigram bucket counts for a target
      // domain (lang='en') vs the full corpus give a 64-row log-
      // likelihood-ratio table; every document scores as the sum of
      // its tokens' LLRs. The ratio table is broadcast, the per-doc
      // score is one map-side join + hash agg, and the final top-k is
      // a TakeOrderedAndProject — nothing here grows with corpus size
      // except the linear token scan
      "samp_importance" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val tok = Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), explode(t).as("tok"))
            .withColumn("b", graft.functions.VectorFunctions.md5Long(col("tok")) % 64)
          val src = tok.groupBy("b").agg(count(lit(1)).as("cs"))
          val tgt = tok.filter(col("lang") === "en")
            .groupBy("b").agg(count(lit(1)).as("ct"))
          val probs = src.join(tgt, Seq("b"), "left")
            .na.fill(0L, Seq("ct"))
            .crossJoin(broadcast(src.agg(sum("cs").as("ts"))))
            .crossJoin(broadcast(tgt.agg(sum("ct").as("tt"))))
            .select(col("b"),
              (log((col("ct") + lit(1.0)) / (col("tt") + lit(64.0)))
               - log((col("cs") + lit(1.0)) / (col("ts") + lit(64.0)))).as("llr"))
          tok.join(broadcast(probs), "b")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_tok"), round(sum("llr"), 4).as("w"))
            .orderBy(col("w").desc, col("doc_id"))
            .limit(20)
        },
        Some("""WITH tb AS (
               |  SELECT doc_id, lang,
               |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
               |  FROM (SELECT doc_id, lang,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)),
               |src AS (SELECT b, CAST(count(*) AS BIGINT) AS cs FROM tb GROUP BY b),
               |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
               |        FROM tb WHERE lang = 'en' GROUP BY b),
               |tot AS (SELECT (SELECT CAST(sum(cs) AS BIGINT) FROM src) AS ts,
               |               (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS tt),
               |probs AS (SELECT b,
               |                 ln((coalesce(ct, 0) + 1.0) / (tt + 64.0))
               |               - ln((cs + 1.0) / (ts + 64.0)) AS llr
               |          FROM src LEFT JOIN tgt USING (b), tot)
               |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, round(sum(llr), 4) AS w
               |FROM tb JOIN probs USING (b)
               |GROUP BY doc_id
               |ORDER BY w DESC, doc_id LIMIT 20""".stripMargin)),

      // length-bucketed batch shaping: cut batches of 8 inside token-
      // length bands — reports the padding waste a trainer would eat;
      // windows are bounded by the band width (see Packing.scaladoc)
      "pipe_bucket_batches" -> Q(
        (s, d) => graft.ops.Packing.bucketedBatches(
          Tables.documents(s, d).select(col("doc_id"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("n_tok")),
          "doc_id", "n_tok", 16L, 8, 8),
        Some("""WITH d AS (SELECT doc_id AS id,
               |                  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS tok
               |           FROM documents),
               |r AS (SELECT id, tok, least(tok // 16, 7) AS bucket,
               |             row_number() OVER (PARTITION BY least(tok // 16, 7)
               |                                ORDER BY tok, id) AS rn
               |      FROM d),
               |bb AS (SELECT bucket, (rn - 1) // 8 AS batch_idx,
               |              count(*) AS bn, max(tok) AS mx, sum(tok) AS st
               |       FROM r GROUP BY bucket, batch_idx)
               |SELECT bucket, CAST(count(*) AS BIGINT) AS n_batches,
               |       CAST(sum(bn) AS BIGINT) AS n_docs,
               |       CAST(sum(bn * mx - st) AS BIGINT) AS pad_tokens,
               |       round(sum(bn * mx - st) * 1.0 / sum(bn * mx), 4) AS pad_frac
               |FROM bb GROUP BY bucket ORDER BY bucket""".stripMargin)),

      // fixed-size/overlap chunker — produces the (doc_id, chunk_id)
      // keys the reference's ingest surface expects
      "text_chunking" -> Q(
        (s, d) => graft.text.Chunker.chunkDocs(Tables.documents(s, d), 500, 400)
          .select(col("doc_id"), col("chunk_id"),
                  length(col("chunk")).cast("long").as("chunk_len"),
                  graft.functions.VectorFunctions.md5Long(col("chunk")).as("h"))
          .orderBy("doc_id", "chunk_id"),
        Some("""SELECT doc_id, CAST((st - 1) // 400 AS BIGINT) AS chunk_id,
               |       CAST(length(ck) AS BIGINT) AS chunk_len,
               |       ('0x' || substr(md5(ck), 1, 15))::BIGINT AS h
               |FROM (SELECT doc_id, st, substring(text, st, 500) AS ck
               |      FROM (SELECT doc_id, text,
               |                   unnest(generate_series(1, greatest(length(text), 1), 400)) AS st
               |            FROM documents))
               |ORDER BY doc_id, chunk_id""".stripMargin)),

      // BM25 lexical retrieval (k1=1.2, b=0.75) — keyword-side
      // complement to the vector search
      "text_bm25" -> Q(
        (s, d) => graft.text.Bm25.search(
          Tables.documents(s, d), Seq("spark", "hash", "merge"), 10),
        Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
               |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
               |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
               |       FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
               |       WHERE tok IN ('spark', 'hash', 'merge') GROUP BY doc_id, tok),
               |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
               |SELECT doc_id,
               |       round(sum((ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)) /
               |                 (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
               |FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
               |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

      // vocabulary building: ranked token frequencies (the tokenizer-
      // training precursor)
      // inverted-index construction for the 20 highest-df terms:
      // per-term posting lists ("doc:tf" in doc order) built from one
      // (term, doc) hash agg + a semi-join against the TakeOrdered
      // term list. Posting materialization is bounded by a term's doc
      // frequency — a web-scale index would segment postings per
      // partition, which is this same plan with a (term, shard) key
      "text_postings" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val tf = Tables.documents(s, d)
            .select(col("doc_id"), explode(t).as("term"))
            .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          val stats = tf.groupBy("term")
            .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
                 array_join(transform(array_sort(collect_list(
                     struct(col("doc_id"), col("tf")))),
                   e => concat_ws(":", e.getField("doc_id"), e.getField("tf"))),
                   ",").as("postings"))
          val top = tf.groupBy("term").agg(count(lit(1)).as("df2"))
            .orderBy(col("df2").desc, col("term")).limit(20)
          stats.join(top, Seq("term"), "left_semi")
            .select(col("term"), col("df"), col("cf"), col("postings"))
            .orderBy(col("df").desc, col("term"))
        },
        Some("""WITH tf AS (
               |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
               |        FROM documents)
               |  GROUP BY term, doc_id),
               |stats AS (
               |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
               |         string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
               |  FROM tf GROUP BY term)
               |SELECT term, df, cf, postings FROM stats
               |ORDER BY df DESC, term LIMIT 20""".stripMargin)),

      // Zipf's-law fit over the top-100 vocabulary: closed-form least
      // squares of ln(freq) on ln(rank). The regression runs on a
      // TakeOrdered-bounded 100-row frame (same rank-after-limit shape
      // as text_vocab), and the slope/intercept/r2 formulas are written
      // identically on both engines — no built-in regr_* whose
      // numeric path could differ
      "text_zipf_fit" -> Q(
        (s, d) => {
          val w = Window.orderBy(col("freq").desc, col("tok"))
          val xy = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("freq"))
            .orderBy(col("freq").desc, col("tok")).limit(100)
            .withColumn("r", row_number().over(w))
            .select(log(col("r")).as("x"), log(col("freq")).as("y"))
          // degenerate-corpus guards, mirrored in the oracle: a vocab
          // of ≤1 terms makes sxx*n - sx² = 0 (slope undefined), and a
          // constant-frequency vocab makes n*syy - sy² = 0 (r2
          // undefined) — NULL both rather than inherit either engine's
          // divide-by-zero convention. Same double arithmetic both
          // sides, so the predicates flip identically.
          val dx = col("n") * col("sxx") - col("sx") * col("sx")
          val dy = col("n") * col("syy") - col("sy") * col("sy")
          val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / dx
          xy.agg(count(lit(1)).cast("double").as("n"),
                 sum("x").as("sx"), sum("y").as("sy"),
                 sum(col("x") * col("y")).as("sxy"),
                 sum(col("x") * col("x")).as("sxx"),
                 sum(col("y") * col("y")).as("syy"))
            .select(col("n").cast("long").as("n_terms"),
              when(dx === 0, lit(null).cast("double"))
                .otherwise(round(slope, 4)).as("slope"),
              when(dx === 0, lit(null).cast("double"))
                .otherwise(round((col("sy") - slope * col("sx")) / col("n"), 4)).as("intercept"),
              when(dx === 0 || dy === 0, lit(null).cast("double"))
                .otherwise(round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2)
                    / (dx * dy), 4)).as("r2"))
        },
        Some("""WITH vocab AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok ORDER BY freq DESC, tok LIMIT 100),
               |xy AS (SELECT ln(row_number() OVER (ORDER BY freq DESC, tok)) AS x,
               |              ln(freq) AS y FROM vocab),
               |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
               |             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM xy)
               |SELECT CAST(n AS BIGINT) AS n_terms,
               |       CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
               |         round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) END AS slope,
               |       CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
               |         round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 4) END AS intercept,
               |       CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL ELSE
               |         round(pow(n*sxy - sx*sy, 2)
               |               / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) END AS r2
               |FROM s""".stripMargin)),

      // per-language character-class profile (script/encoding drift
      // monitor): four regex strip-counts per doc — pure map — then a
      // |lang|-row aggregate. The scan projects only (lang, text)
      "text_charclass" -> Q(
        (s, d) => {
          val t = col("text")
          val n = greatest(length(t), lit(1)).cast("double")
          Tables.documents(s, d)
            .select(col("lang"),
              (length(regexp_replace(t, "[^A-Za-z]", "")) / n).as("alpha"),
              (length(regexp_replace(t, "[^0-9]", "")) / n).as("digit"),
              (length(regexp_replace(t, "[^ \\t\\n\\r]", "")) / n).as("space"),
              (length(regexp_replace(t, "[^A-Z]", "")) / n).as("upper"))
            .groupBy("lang")
            .agg(count(lit(1)).as("n_docs"),
                 round(avg("alpha"), 4).as("avg_alpha"),
                 round(avg("digit"), 4).as("avg_digit"),
                 round(avg("space"), 4).as("avg_space"),
                 round(avg("upper"), 4).as("avg_upper"))
            .orderBy("lang")
        },
        Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               |       round(avg(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / n), 4) AS avg_alpha,
               |       round(avg(length(regexp_replace(text, '[^0-9]', '', 'g')) / n), 4) AS avg_digit,
               |       round(avg(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) / n), 4) AS avg_space,
               |       round(avg(length(regexp_replace(text, '[^A-Z]', '', 'g')) / n), 4) AS avg_upper
               |FROM (SELECT lang, text,
               |             CAST(greatest(length(text), 1) AS DOUBLE) AS n
               |      FROM documents)
               |GROUP BY lang ORDER BY lang""".stripMargin)),

      // Flesch reading-ease per doc (readability as a quality signal):
      // sentences = [.!?]+ runs (min 1), syllables = [aeiouy]+ vowel
      // groups — all regex counts, pure map, no shuffle before the
      // bounded output sort
      "text_readability" -> Q(
        (s, d) => {
          val words = size(graft.text.TextPrimitives.tokens(col("text"))).cast("double")
          val sents = greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1)).cast("double")
          val sylls = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("double")
          Tables.documents(s, d).filter(col("doc_id") < 100)
            .select(col("doc_id"), words.cast("long").as("n_words"),
                    sents.cast("long").as("n_sent"), sylls.cast("long").as("n_syll"),
                    round(lit(206.835) - lit(1.015) * (words / sents)
                          - lit(84.6) * (sylls / greatest(words, lit(1.0))), 4).as("flesch"))
            .orderBy("doc_id")
        },
        Some("""SELECT doc_id, CAST(words AS BIGINT) AS n_words,
               |       CAST(sents AS BIGINT) AS n_sent, CAST(sylls AS BIGINT) AS n_syll,
               |       round(206.835 - 1.015 * (words / sents)
               |             - 84.6 * (sylls / greatest(words, 1.0)), 4) AS flesch
               |FROM (
               |  SELECT doc_id,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS words,
               |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS sents,
               |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS sylls
               |  FROM documents WHERE doc_id < 100)
               |ORDER BY doc_id""".stripMargin)),

      // per-doc token Shannon entropy (repetition/diversity signal the
      // Gopher filters threshold on): H = ln(n) − Σ c·ln(c) / n from
      // ONE (doc, tok) hash agg + one per-doc agg — no windows
      "text_entropy" -> Q(
        (s, d) => {
          val tf = Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          tf.groupBy("doc_id")
            .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
                 sum(col("c") * log(col("c"))).as("clc"))
            .select(col("doc_id"), col("n").as("n_tok"), col("n_types"),
                    round(log(col("n")) - col("clc") / col("n"), 4).as("entropy"))
            .orderBy("doc_id")
        },
        Some("""WITH tf AS (
               |  SELECT doc_id, tok, count(*) AS c
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents WHERE doc_id < 200)
               |  GROUP BY doc_id, tok)
               |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
               |       CAST(count(*) AS BIGINT) AS n_types,
               |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
               |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // per-language type-token ratio (vocabulary richness): one
      // explode + one expand-based distinct agg, |lang| output rows
      "text_ttr" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("lang"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_tok"), countDistinct("tok").as("n_types"))
          .withColumn("ttr", round(col("n_types") / col("n_tok").cast("double"), 4))
          .orderBy("lang"),
        Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_tok,
               |       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
               |       round(count(DISTINCT tok) / CAST(count(*) AS DOUBLE), 4) AS ttr
               |FROM (SELECT lang,
               |             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |      FROM documents)
               |GROUP BY lang ORDER BY lang""".stripMargin)),

      // Gopher-style rule bundle (Rae et al. 2021 §A1.1, the doc-level
      // KEEP/DROP decision): word count, mean word length, alpha-word
      // fraction, stopword floor — every rule a map-side HOF over the
      // token array, the keep flag their conjunction
      "text_gopher_rules" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val nW = size(toks).cast("double")
          val mwl = length(concat_ws("", toks)) / greatest(nW, lit(1.0))
          val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))) / greatest(nW, lit(1.0))
          val stopCnt = size(filter(toks,
            t => t.isin(graft.text.TextAnalytics.Stopwords: _*)))
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id"), nW.cast("long").as("n_words"),
                    round(mwl, 4).as("mean_wlen"),
                    round(alphaFrac, 4).as("alpha_frac"),
                    stopCnt.cast("long").as("stop_cnt"),
                    (nW >= 5 && mwl >= 3 && mwl <= 10 &&
                     alphaFrac >= 0.8 && stopCnt >= 2).cast("int").as("keep"))
            .orderBy("doc_id")
        },
        Some {
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""SELECT doc_id, CAST(n_w AS BIGINT) AS n_words,
             |       round(mwl, 4) AS mean_wlen, round(af, 4) AS alpha_frac,
             |       CAST(sc AS BIGINT) AS stop_cnt,
             |       CAST(n_w >= 5 AND mwl >= 3 AND mwl <= 10
             |            AND af >= 0.8 AND sc >= 2 AS INTEGER) AS keep
             |FROM (
             |  SELECT doc_id, n_w,
             |         length(array_to_string(toks, '')) / greatest(n_w, 1.0) AS mwl,
             |         len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
             |           / greatest(n_w, 1.0) AS af,
             |         len(list_filter(toks, t -> t IN ($stopList))) AS sc
             |  FROM (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS n_w
             |        FROM (SELECT doc_id,
             |                regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
             |              FROM documents WHERE doc_id < 200)))
             |ORDER BY doc_id""".stripMargin
        }),

      // per-source data card (the summary table a dataset release
      // ships): docs, tokens, char stats, language spread, median
      // length — ONE grouped pass over the corpus, |source| rows out
      "pipe_data_card" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("source"), col("lang"), col("n_chars"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("nt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tok"),
               round(avg("n_chars"), 2).as("avg_chars"),
               countDistinct("lang").as("n_langs"),
               round(expr("percentile(nt, 0.5D)"), 1).as("p50_tok"))
          .orderBy("source"),
        Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               |       CAST(sum(nt) AS BIGINT) AS n_tok,
               |       round(avg(n_chars), 2) AS avg_chars,
               |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               |       round(quantile_cont(nt, 0.5), 1) AS p50_tok
               |FROM (SELECT source, lang, n_chars,
               |             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS nt
               |      FROM documents)
               |GROUP BY source ORDER BY source""".stripMargin)),

      // exact Gini coefficient of per-doc token counts per source
      // (length-concentration audit), computed FROM GROUPED COUNTS:
      // rank sums over a run of c tied values collapse to
      // c·F + c(c+1)/2, so the only window runs over the DISTINCT
      // length values of a source (the bucketedBatches level-3 bound),
      // never the docs — counts stay integral; the rank sums go
      // through double (see below) so huge sources can't wrap a Long
      "stat_gini" -> Q(
        (s, d) => {
          val grp = Tables.documents(s, d)
            .select(col("source"),
              size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"))
            .groupBy("source", "x").agg(count(lit(1)).as("c"))
          val w = Window.partitionBy("source").orderBy("x")
            .rowsBetween(Window.unboundedPreceding, -1)
          // rank sums go through DOUBLE: at a 1e9-doc source the
          // c·F terms pass 1e18 and a Long product would wrap
          // silently (the relative error doubles introduce is ~1e-16,
          // invisible after the 4-decimal round; identical on both
          // engines)
          grp.withColumn("f", coalesce(sum("c").over(w), lit(0L)))
            .withColumn("rs",
              expr("x * (CAST(c AS DOUBLE) * f + (CAST(c AS DOUBLE) * (c + 1)) / 2)"))
            .groupBy("source")
            .agg(sum("c").as("n"), sum(expr("x * c")).as("sx"), sum("rs").as("srx"))
            .select(col("source"), col("n"),
              when(col("sx") === 0, lit(null).cast("double"))
                .otherwise(round(lit(2.0) * col("srx")
                  / (col("n").cast("double") * col("sx"))
                  - (col("n") + lit(1.0)) / col("n"), 4)).as("gini"))
            .orderBy("source")
        },
        Some("""WITH grp AS (
               |  SELECT source, x, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT source,
               |          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
               |        FROM documents)
               |  GROUP BY source, x),
               |cum AS (
               |  SELECT source, x, c,
               |         coalesce(sum(c) OVER (PARTITION BY source ORDER BY x
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
               |  FROM grp),
               |agg AS (
               |  SELECT source, CAST(sum(c) AS BIGINT) AS n, sum(x * c) AS sx,
               |         sum(x * (CAST(c AS DOUBLE) * f + (CAST(c AS DOUBLE) * (c + 1)) / 2)) AS srx
               |  FROM cum GROUP BY source)
               |SELECT source, n,
               |       CASE WHEN sx = 0 THEN NULL ELSE
               |         round(2.0 * srx / (CAST(n AS DOUBLE) * sx) - (n + 1.0) / n, 4) END AS gini
               |FROM agg ORDER BY source""".stripMargin)),

      // deterministic curriculum interleave: round-robin the sources
      // in (rank-within-source, source) order so a training run sees
      // every source early and repeatably. The per-source rank uses
      // Packing.boundedRowNumber (id-block two-level scan — a hot
      // source never funnels one window partition); the source-index
      // rank is the only global window and runs over the ≤|sources|
      // distinct-source table
      "pipe_interleave" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
          val ranked = graft.ops.Packing.boundedRowNumber(
            docs, Seq("source"), "doc_id", 1L << 20, "r")
          val srcs = docs.groupBy("source").agg(count(lit(1)).as("_n"))
          val sidx = srcs
            .withColumn("sidx", row_number().over(Window.orderBy("source")))
            .select(col("source"), col("sidx").cast("long").as("sidx"))
          val ns = srcs.agg(count(lit(1)).as("ns"))
          ranked.join(broadcast(sidx), "source").crossJoin(broadcast(ns))
            .select(((col("r") - 1) * col("ns") + col("sidx")).as("pos"),
                    col("source"), col("doc_id"))
            .orderBy("pos").limit(100)
        },
        Some("""WITH r AS (
               |  SELECT source, doc_id,
               |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
               |  FROM documents),
               |s AS (SELECT source,
               |             CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sidx
               |      FROM (SELECT DISTINCT source FROM documents)),
               |t AS (SELECT CAST(count(*) AS BIGINT) AS ns
               |      FROM (SELECT DISTINCT source FROM documents))
               |SELECT CAST((r - 1) * ns + sidx AS BIGINT) AS pos, source, doc_id
               |FROM r JOIN s USING (source), t
               |ORDER BY pos LIMIT 100""".stripMargin)),

      // word2vec negative-sampling table (Mikolov et al. 2013): the
      // unigram^0.75 distribution as (token, weight, draws-per-1M) —
      // one vocab agg + a 1-row broadcast normalizer + TakeOrdered;
      // the table a skip-gram trainer samples negatives from
      "samp_negative_sampling" -> Q(
        (s, d) => {
          val vocab = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("c"))
          val tot = vocab.agg(sum(pow(col("c"), 0.75)).as("z"))
          vocab.crossJoin(broadcast(tot))
            .select(col("tok"), col("c"),
              round(pow(col("c"), 0.75) / col("z"), 8).as("p"),
              round(pow(col("c"), 0.75) / col("z") * 1000000, 0).cast("long").as("n_per_m"))
            .orderBy(col("c").desc, col("tok")).limit(50)
        },
        Some("""WITH vocab AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok),
               |tot AS (SELECT sum(pow(c, 0.75)) AS z FROM vocab)
               |SELECT tok, c, round(pow(c, 0.75) / z, 8) AS p,
               |       CAST(round(pow(c, 0.75) / z * 1000000, 0) AS BIGINT) AS n_per_m
               |FROM vocab, tot
               |ORDER BY c DESC, tok LIMIT 50""".stripMargin)),

      // two-sample Kolmogorov–Smirnov drift test between the en and
      // non-en token-length distributions, exact from GROUPED counts:
      // ecdfs as running sums over the distinct length values (the
      // stat_gini bound — values, never rows), D = max gap, the
      // α=0.05 threshold 1.358·sqrt((n+m)/nm). The drift gate a
      // pipeline runs between ingest batches
      "samp_ks_test" -> Q(
        (s, d) => {
          val g = Tables.documents(s, d)
            .select(size(graft.text.TextPrimitives.tokens(col("text")))
                      .cast("long").as("x"),
                    when(col("lang") === "en", 1L).otherwise(0L).as("en"))
            .groupBy("x")
            .agg(sum("en").as("ce"), sum(lit(1L) - col("en")).as("cr"))
          val w = Window.orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val tot = g.agg(sum("ce").as("ne"), sum("cr").as("nr"))
          val dmax = g
            .withColumn("fe", sum("ce").over(w))
            .withColumn("fr", sum("cr").over(w))
            .crossJoin(broadcast(tot))
            .groupBy("ne", "nr")
            .agg(max(abs(col("fe").cast("double") / col("ne")
                         - col("fr").cast("double") / col("nr"))).as("d"))
          dmax.select(col("ne").as("n_en"), col("nr").as("n_rest"),
              round(col("d"), 4).as("d"),
              round(lit(1.358) * sqrt((col("ne") + col("nr"))
                / (col("ne").cast("double") * col("nr"))), 4).as("crit"))
            .withColumn("reject", (col("d") > col("crit")).cast("int"))
        },
        Some("""WITH g AS (
               |  SELECT x, CAST(sum(en) AS BIGINT) AS ce,
               |         CAST(sum(1 - en) AS BIGINT) AS cr
               |  FROM (SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
               |        FROM documents)
               |  GROUP BY x),
               |c AS (SELECT x, ce, cr,
               |             sum(ce) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fe,
               |             sum(cr) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fr
               |      FROM g),
               |t AS (SELECT CAST(sum(ce) AS BIGINT) AS ne, CAST(sum(cr) AS BIGINT) AS nr FROM g),
               |dm AS (SELECT ne, nr,
               |              max(abs(CAST(fe AS DOUBLE) / ne - CAST(fr AS DOUBLE) / nr)) AS d
               |       FROM c, t GROUP BY ne, nr)
               |SELECT ne AS n_en, nr AS n_rest, round(d, 4) AS d,
               |       round(1.358 * sqrt((ne + nr) / (CAST(ne AS DOUBLE) * nr)), 4) AS crit,
               |       CAST(round(d, 4) > round(1.358 * sqrt((ne + nr) / (CAST(ne AS DOUBLE) * nr)), 4)
               |            AS INTEGER) AS reject
               |FROM dm""".stripMargin)),

      "text_vocab" -> Q(
        (s, d) => {
          // orderBy+limit plans as TakeOrderedAndProject (bounded
          // per-partition heaps); rank is assigned AFTER the top-50 is
          // bounded, so the only global window runs over ≤50 rows —
          // a web-scale vocab (100M+ distinct tokens) never converges
          // on one task.
          val w = Window.orderBy(col("n").desc, col("tok"))
          Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("tok")).limit(50)
            .withColumn("rank", row_number().over(w).cast("long"))
            .orderBy("rank")
        },
        Some("""SELECT tok, n, rank FROM (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS n,
               |         CAST(row_number() OVER (ORDER BY count(*) DESC, tok) AS BIGINT) AS rank
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok)
               |WHERE rank <= 50 ORDER BY rank""".stripMargin)),

      // collocation mining: PMI of frequent bigrams (corpus statistics
      // for tokenizer/quality work); counts are exact integers, PMI a
      // deterministic function of them
      "text_pmi" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val docs = Tables.documents(s, d)
          val uni = docs.select(explode(toks).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("cnt"))
          val totals = uni.agg(sum("cnt").cast("double").as("t"))
          val bi = docs
            .select(explode(when(size(toks) === 1, array()).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
            .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
            .agg(count(lit(1)).as("nb"))
          val btotal = bi.agg(sum("nb").cast("double").as("bt"))
          bi.filter(col("nb") >= 50)
            .join(broadcast(uni.toDF("w1", "c1")), "w1")
            .join(broadcast(uni.toDF("w2", "c2")), "w2")
            .crossJoin(broadcast(totals)).crossJoin(broadcast(btotal))
            .select(col("w1"), col("w2"), col("nb"),
              round(log((col("nb") / col("bt")) /
                ((col("c1") / col("t")) * (col("c2") / col("t")))), 4).as("pmi"))
            .orderBy(col("pmi").desc, col("w1"), col("w2"))
            .limit(20)
        },
        Some("""WITH toks AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
               |        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
               |totals AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tt FROM uni),
               |bi AS (SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS nb
               |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
               |       GROUP BY w1, w2),
               |btotal AS (SELECT CAST(sum(nb) AS DOUBLE) AS bt FROM bi)
               |SELECT w1, w2, nb,
               |       round(ln((nb / bt) / ((c1 / tt) * (c2 / tt))), 4) AS pmi
               |FROM bi JOIN (SELECT tok AS w1, cnt AS c1 FROM uni) USING (w1)
               |        JOIN (SELECT tok AS w2, cnt AS c2 FROM uni) USING (w2),
               |     totals, btotal
               |WHERE nb >= 50
               |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

      // Dunning log-likelihood-ratio collocations: the significance
      // upgrade over text_pmi (PMI ranks rare-but-exclusive pairs;
      // LLR ranks pairs the corpus gives EVIDENCE for). The 2×2
      // contingency per bigram is built entirely from the bigram
      // table's own marginals (so k11+k12+k21+k22 = N exactly), and
      // LLR = 2·(Σxlx(k) − Σxlx(rows) − Σxlx(cols) + xlx(N)) is one
      // closed-form expression on integer counts — identical
      // arithmetic both engines, no per-row iteration. Marginals are
      // broadcast |vocab|-row tables; the bigram frame is
      // checkpointed so the corpus scan runs once for all four
      // consumers.
      "text_llr" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val bi = Tables.documents(s, d)
            .select(explode(when(size(toks) === 1, array()).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
            .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
            .agg(count(lit(1)).as("k11"))
            .localCheckpoint(eager = false) // marginals ×2 + total + scoring
          val m1 = bi.groupBy("w1").agg(sum("k11").as("c1"))
          val m2 = bi.groupBy("w2").agg(sum("k11").as("c2"))
          val tot = bi.agg(sum("k11").as("n"))
          def xlx(c: Column): Column =
            when(c <= 0.0, lit(0.0)).otherwise(c * log(c))
          bi.filter(col("k11") >= 30)
            .join(broadcast(m1), "w1")
            .join(broadcast(m2), "w2")
            .crossJoin(broadcast(tot))
            .withColumn("llr", round(lit(2.0) * (
              xlx(col("k11").cast("double"))
                + xlx((col("c1") - col("k11")).cast("double"))
                + xlx((col("c2") - col("k11")).cast("double"))
                + xlx((col("n") - col("c1") - col("c2") + col("k11")).cast("double"))
                - xlx(col("c1").cast("double"))
                - xlx((col("n") - col("c1")).cast("double"))
                - xlx(col("c2").cast("double"))
                - xlx((col("n") - col("c2")).cast("double"))
                + xlx(col("n").cast("double"))), 4))
            .select(col("w1"), col("w2"), col("k11").as("n_pair"), col("llr"))
            .orderBy(col("llr").desc, col("w1"), col("w2"))
            .limit(20)
        },
        Some {
          def xlx(e: String) =
            s"(CASE WHEN ($e) <= 0 THEN 0.0 ELSE ($e) * ln($e) END)"
          s"""WITH toks AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
             |              FROM documents),
             |bi AS (SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS k11
             |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
             |       GROUP BY w1, w2),
             |m1 AS (SELECT w1, CAST(sum(k11) AS BIGINT) AS c1 FROM bi GROUP BY w1),
             |m2 AS (SELECT w2, CAST(sum(k11) AS BIGINT) AS c2 FROM bi GROUP BY w2),
             |tot AS (SELECT CAST(sum(k11) AS BIGINT) AS n FROM bi)
             |SELECT w1, w2, k11 AS n_pair,
             |       round(2.0 * (${xlx("CAST(k11 AS DOUBLE)")}
             |         + ${xlx("CAST(c1 - k11 AS DOUBLE)")}
             |         + ${xlx("CAST(c2 - k11 AS DOUBLE)")}
             |         + ${xlx("CAST(n - c1 - c2 + k11 AS DOUBLE)")}
             |         - ${xlx("CAST(c1 AS DOUBLE)")}
             |         - ${xlx("CAST(n - c1 AS DOUBLE)")}
             |         - ${xlx("CAST(c2 AS DOUBLE)")}
             |         - ${xlx("CAST(n - c2 AS DOUBLE)")}
             |         + ${xlx("CAST(n AS DOUBLE)")}), 4) AS llr
             |FROM bi JOIN m1 USING (w1) JOIN m2 USING (w2), tot
             |WHERE k11 >= 30
             |ORDER BY llr DESC, w1, w2 LIMIT 20""".stripMargin
        }),

      // RAKE keyword extraction: candidate phrases are maximal
      // stopword-free token runs (break at the shared Stopwords
      // lexicon or empty tokens), word score = degree/frequency over
      // phrase co-occurrence, phrase score = Σ member word scores —
      // the classic unsupervised keyphrase pass a curation pipeline
      // runs to label clusters. Phrase ids come from a PER-DOC
      // running sum over token positions (partitioned window, never
      // global); word scores are a broadcast |vocab|-row table; word
      // scores are pinned to 6 decimals before the phrase sum so
      // both engines add identical addends.
      "text_rake" -> Q(
        (s, d) => {
          val stops = graft.text.TextAnalytics.Stopwords
          val tk = Tables.documents(s, d)
            .select(col("doc_id"),
              posexplode(graft.text.TextPrimitives.tokens(col("text")))
                .as(Seq("pos", "tok")))
          val w = Window.partitionBy("doc_id").orderBy("pos")
          val phr = tk
            .withColumn("brk",
              when(col("tok").isin(stops: _*) || col("tok") === "", 1L)
                .otherwise(0L))
            .withColumn("pid", sum("brk").over(w))
            .filter(col("brk") === 0)
            .localCheckpoint(eager = false) // phrase lens + word stats
          val ph = phr.groupBy("doc_id", "pid")
            .agg(count(lit(1)).as("plen"))
          val wp = phr.join(ph, Seq("doc_id", "pid"))
            .localCheckpoint(eager = false) // word stats + phrase scoring
          val ws = wp.groupBy("tok")
            .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
            .withColumn("score",
              round(col("deg") / col("freq").cast("double"), 6))
          wp.join(broadcast(ws.select("tok", "score")), "tok")
            .groupBy("doc_id", "pid")
            .agg(
              concat_ws(" ", transform(
                array_sort(collect_list(struct(col("pos"), col("tok")))),
                x => x("tok"))).as("phrase"),
              round(sum("score"), 4).as("rake"))
            .groupBy("phrase")
            .agg(count(lit(1)).as("n_occ"), max("rake").as("rake"))
            .orderBy(col("rake").desc, col("phrase"))
            .limit(20)
        },
        Some {
          val stopsIn = graft.text.TextAnalytics.Stopwords
            .map(s0 => s"'$s0'").mkString(", ")
          s"""WITH tk AS (
             |  SELECT doc_id, i AS pos, t[i] AS tok
             |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t,
             |               unnest(generate_series(1, len(t))) AS i
             |        FROM documents)),
             |br AS (SELECT doc_id, pos, tok,
             |              CASE WHEN tok IN ($stopsIn) OR tok = '' THEN 1 ELSE 0 END AS brk
             |       FROM tk),
             |pp AS (SELECT doc_id, pos, tok, brk,
             |              sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
             |       FROM br),
             |phr AS (SELECT doc_id, pos, tok, pid FROM pp WHERE brk = 0),
             |ph AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen
             |       FROM phr GROUP BY doc_id, pid),
             |wp AS (SELECT phr.doc_id, phr.pid, phr.pos, phr.tok, ph.plen
             |       FROM phr JOIN ph USING (doc_id, pid)),
             |ws AS (SELECT tok, round(sum(plen) / CAST(count(*) AS DOUBLE), 6) AS score
             |       FROM wp GROUP BY tok),
             |ps AS (SELECT wp.doc_id, wp.pid,
             |              string_agg(wp.tok, ' ' ORDER BY wp.pos) AS phrase,
             |              round(sum(ws.score), 4) AS rake
             |       FROM wp JOIN ws USING (tok) GROUP BY wp.doc_id, wp.pid)
             |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ, max(rake) AS rake
             |FROM ps GROUP BY phrase
             |ORDER BY rake DESC, phrase LIMIT 20""".stripMargin
        }),

      // self-BLEU (BLEU-2) over the near-dup candidate pairs: the
      // n-gram-precision view of how much db copies da — catches
      // "same boilerplate, reordered" pairs whose Jaccard is already
      // high but whose BLEU reveals phrase-level copying. Clipped
      // unigram/bigram overlaps are two grouped equi-joins on the
      // pair frame (per-doc count tables, shuffle keyed by doc —
      // never a cross join); brevity penalty + geometric mean are
      // closed-form on the counts. Candidate pairs are checkpointed:
      // the shingle join runs once, both overlap joins read it.
      "text_selfbleu" -> Q(
        (s, d) => {
          val docs = docsUnder(s, d, 120)
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val pairs = graft.dedup.Dedup.ngramJaccard(docs, 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // unigram + bigram overlap joins
          val uni = docs.select(col("doc_id"), explode(toks).as("w"))
            .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          val big = docs
            .select(col("doc_id"),
              explode(when(size(toks) === 1, array()).otherwise(
                zip_with(slice(toks, lit(1), size(toks) - 1),
                         slice(toks, lit(2), size(toks) - 1),
                         (a, b) => concat_ws(" ", a, b)))).as("g"))
            .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          val len1 = uni.groupBy("doc_id").agg(sum("c").as("l1"))
          val len2 = big.groupBy("doc_id").agg(sum("c").as("l2"))
          val o1 = pairs
            .join(uni.toDF("da", "w", "ca"), "da")
            .join(uni.toDF("db", "w", "cb"), Seq("db", "w"))
            .groupBy("da", "db").agg(sum(least(col("ca"), col("cb"))).as("m1"))
          val o2 = pairs
            .join(big.toDF("da", "g", "ca"), "da")
            .join(big.toDF("db", "g", "cb"), Seq("db", "g"))
            .groupBy("da", "db").agg(sum(least(col("ca"), col("cb"))).as("m2"))
          pairs
            .join(o1, Seq("da", "db"), "left").join(o2, Seq("da", "db"), "left")
            .join(broadcast(len1.toDF("da", "la1")), "da")
            .join(broadcast(len1.toDF("db", "lb1")), "db")
            .join(broadcast(len2.toDF("da", "la2")), "da")
            .join(broadcast(len2.toDF("db", "lb2")), "db")
            .withColumn("p1", coalesce(col("m1"), lit(0L)) / col("lb1").cast("double"))
            .withColumn("p2", coalesce(col("m2"), lit(0L)) / col("lb2").cast("double"))
            .withColumn("bp",
              when(col("lb1") >= col("la1"), lit(1.0))
                .otherwise(exp(lit(1.0) - col("la1") / col("lb1").cast("double"))))
            .select(col("da"), col("db"),
              round(col("bp") * sqrt(col("p1") * col("p2")), 4).as("bleu2"))
            .orderBy("da", "db")
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                |         FROM documents WHERE doc_id < 120),
                |uni AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
                |        FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
                |big AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
                |        FROM (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
                |              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                |                    FROM toks))
                |        GROUP BY doc_id, g),
                |len1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS l FROM uni GROUP BY doc_id),
                |len2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS l FROM big GROUP BY doc_id),
                |o1 AS (SELECT e0.da, e0.db, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m1
                |       FROM e0 JOIN uni a ON a.doc_id = e0.da
                |               JOIN uni b ON b.doc_id = e0.db AND b.w = a.w
                |       GROUP BY e0.da, e0.db),
                |o2 AS (SELECT e0.da, e0.db, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m2
                |       FROM e0 JOIN big a ON a.doc_id = e0.da
                |               JOIN big b ON b.doc_id = e0.db AND b.g = a.g
                |       GROUP BY e0.da, e0.db)
                |SELECT e0.da, e0.db,
                |       round(
                |         (CASE WHEN lb1.l >= la1.l THEN 1.0
                |               ELSE exp(1.0 - la1.l / CAST(lb1.l AS DOUBLE)) END)
                |         * sqrt((coalesce(o1.m1, 0) / CAST(lb1.l AS DOUBLE))
                |              * (coalesce(o2.m2, 0) / CAST(lb2.l AS DOUBLE))), 4) AS bleu2
                |FROM e0
                |LEFT JOIN o1 ON o1.da = e0.da AND o1.db = e0.db
                |LEFT JOIN o2 ON o2.da = e0.da AND o2.db = e0.db
                |JOIN len1 la1 ON la1.doc_id = e0.da
                |JOIN len1 lb1 ON lb1.doc_id = e0.db
                |JOIN len2 la2 ON la2.doc_id = e0.da
                |JOIN len2 lb2 ON lb2.doc_id = e0.db
                |ORDER BY e0.da, e0.db""".stripMargin)),

      // PII redaction (emails / phones / IPv4 → placeholder tokens) —
      // the scrub stage before text leaves the ingest boundary. The
      // synthetic corpus carries no PII, so the query seeds
      // deterministic doc_id-derived PII into each doc first; the
      // redaction itself (pattern set, application order, counts) is
      // what's under test, and the oracle rebuilds the same seeded
      // text and applies the same RE2-compatible patterns.
      "text_pii_redact" -> Q(
        (s, d) => {
          val seeded = Tables.documents(s, d).select(col("doc_id"),
            concat(col("text"),
              lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example.com call 555-"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
              lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
              lit(" host 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), ((col("doc_id") * 3) % 256).cast("string")).as("text"))
          graft.text.Pii.redact(seeded)
            .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
              graft.functions.VectorFunctions.md5Long(col("redacted")).as("h"))
            .orderBy("doc_id")
        },
        Some("""WITH seeded AS (
               |  SELECT doc_id,
               |         text || ' contact user' || CAST(doc_id AS VARCHAR)
               |              || '@mail.example.com call 555-'
               |              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
               |              || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               |              || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
               |              || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR) AS text
               |  FROM documents)
               |SELECT doc_id,
               |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               |       CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
               |       CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
               |       ('0x' || substr(md5(
               |         regexp_replace(regexp_replace(regexp_replace(text,
               |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               |           '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
               |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')), 1, 15))::BIGINT AS h
               |FROM seeded ORDER BY doc_id""".stripMargin)),

      // per-doc top-3 terms by tf-idf (keyword extraction; BM25's
      // corpus-side complement)
      "text_tfidf" -> Q(
        (s, d) => graft.text.TextAnalytics.tfidfTopTerms(Tables.documents(s, d), 3),
        Some("""WITH tf AS (
               |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY doc_id, tok),
               |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
               |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
               |SELECT doc_id, tok, tf, df, tfidf, rank FROM (
               |  SELECT doc_id, tok, tf, df, round(tf * ln(n / df), 4) AS tfidf,
               |         CAST(row_number() OVER (PARTITION BY doc_id
               |              ORDER BY round(tf * ln(n / df), 4) DESC, tok) AS BIGINT) AS rank
               |  FROM tf JOIN df USING (tok), n)
               |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

      // the reference's ingest+search path end-to-end: chunk →
      // deterministic embed → cosine top-k over (DocId, ChunkId) keys
      "text_chunk_search" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val chunks = graft.text.Chunker.chunkDocs(
              Tables.documents(s, d).filter(col("doc_id") < 200), 500, 400)
            .select((col("doc_id") * 1000 + col("chunk_id")).as("ckey"), col("chunk"))
          val raw = graft.embed.HashEmbedder.embedDocsRaw(chunks, "ckey", "chunk", 64)
          val q = raw.filter(col("ckey") === 3000).select(col("embedding").as("qv"))
          raw.crossJoin(broadcast(q))
            .select(col("ckey"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("ckey"))
            .limit(10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH chunks AS (
             |  SELECT doc_id * 1000 + (st - 1) // 400 AS doc_id,
             |         substring(text, st, 500) AS text
             |  FROM (SELECT doc_id, text,
             |               unnest(generate_series(1, length(text), 400)) AS st
             |        FROM documents WHERE doc_id < 200)),
             |sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64, "chunks")}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3000)
             |SELECT ckey,
             |       round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                  ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |FROM (SELECT s.doc_id AS ckey, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |      FROM sums s, q)
             |ORDER BY score DESC, ckey LIMIT 10""".stripMargin
        }),

      // corpus bigram LM quality scoring: avg add-one-smoothed
      // log P(w2|w1) per doc — the LM-perplexity-style quality filter
      "text_lm_score" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val docs = Tables.documents(s, d)
          def bigrams(df: DataFrame) = df
            .select(col("doc_id"), explode(when(size(toks) === 1, array()).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
            .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          val uni = docs.select(explode(toks).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("c1"))
          val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
          val bi = bigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("nb"))
          bigrams(docs.filter(col("doc_id") < 100))
            .join(broadcast(bi), Seq("w1", "w2"))
            .join(broadcast(uni.withColumnRenamed("tok", "w1")), "w1")
            .crossJoin(broadcast(vocab))
            .select(col("doc_id"),
              log((col("nb") + lit(1.0)) / (col("c1") + col("v"))).as("lp"))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_bigrams"), round(avg("lp"), 4).as("lm_score"))
            .orderBy("doc_id")
        },
        Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
               |        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
               |vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
               |allbg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               |          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
               |                FROM toks)),
               |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS nb
               |       FROM allbg GROUP BY w1, w2)
               |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               |       round(avg(ln((nb + 1.0) / (c1 + v))), 4) AS lm_score
               |FROM (SELECT a.doc_id, ln((nb + 1.0) / (c1 + v)) AS lp, nb, c1, v
               |      FROM allbg a JOIN bi USING (w1, w2)
               |                   JOIN (SELECT tok AS w1, c1 FROM uni) USING (w1),
               |           vocab
               |      WHERE a.doc_id < 100)
               |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // corpus statistics: token-bigram frequencies (non-distinct —
      // true occurrence counts, unlike the dedup shingle sets)
      "text_bigram_freq" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          // zip_with of the two shifted views beats the
          // sequence+slice-per-index formulation 5× (one array op per
          // doc, no per-bigram slice allocs); 1-token docs emit the
          // lone token, same as the oracle's slice semantics
          Tables.documents(s, d)
            .select(explode(when(size(toks) === 1, toks).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => concat(a, lit(" "), b)))).as("bigram"))
            .groupBy("bigram").agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("bigram"))
            .limit(20)
        },
        Some("""SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
               |  SELECT array_to_string(toks[i+1:i+2], ' ') AS bigram FROM (
               |    SELECT toks, unnest(generate_series(0, greatest(len(toks) - 2, 0))) AS i FROM (
               |      SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
               |      FROM documents)))
               |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

      "text_length_stats" -> Q(
        (s, d) => Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
               round(avg(length(col("text"))), 4).as("avg_len"),
               round(stddev(length(col("text"))), 4).as("sd_len"),
               min(length(col("text"))).cast("long").as("min_len"),
               max(length(col("text"))).cast("long").as("max_len"))
          .orderBy("lang"),
        Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(length(text)), 4) AS avg_len,
               |       round(stddev_samp(length(text)), 4) AS sd_len,
               |       CAST(min(length(text)) AS BIGINT) AS min_len,
               |       CAST(max(length(text)) AS BIGINT) AS max_len
               |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

      // Theil T inequality index of per-doc token counts per source —
      // the additively-decomposable complement to stat_gini, and
      // cheaper: T = Σ x·ln(x) / Σx − ln(Σx/n) needs ONE grouped agg
      // over (source, length) counts, no window at all. x=0 rows
      // contribute 0 (the x·ln x limit), so empty docs can't NaN it.
      "stat_theil" -> Q(
        (s, d) => {
          val grp = Tables.documents(s, d)
            .select(col("source"),
              size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"))
            .groupBy("source", "x").agg(count(lit(1)).as("c"))
          grp.groupBy("source")
            .agg(sum("c").as("n"), sum(expr("x * c")).as("sx"),
                 sum(expr("CASE WHEN x = 0 THEN 0.0 " +
                   "ELSE c * x * ln(CAST(x AS DOUBLE)) END")).as("sxlx"))
            .select(col("source"), col("n"),
              when(col("sx") === 0, lit(null).cast("double"))
                .otherwise(round(col("sxlx") / col("sx")
                  - log(col("sx").cast("double") / col("n")), 4)).as("theil"))
            .orderBy("source")
        },
        Some("""WITH grp AS (
               |  SELECT source, x, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT source,
               |          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
               |        FROM documents)
               |  GROUP BY source, x)
               |SELECT source, CAST(sum(c) AS BIGINT) AS n,
               |       CASE WHEN sum(x * c) = 0 THEN NULL ELSE
               |         round(sum(CASE WHEN x = 0 THEN 0.0 ELSE c * x * ln(CAST(x AS DOUBLE)) END)
               |                 / sum(x * c)
               |               - ln(CAST(sum(x * c) AS DOUBLE) / sum(c)), 4) END AS theil
               |FROM grp GROUP BY source ORDER BY source""".stripMargin)),

      // per-term burstiness (variance-to-mean ratio of per-doc counts,
      // zeros included) for the top-20 df terms: VMR = (Q − S²/N)/S
      // from S=Σtf, Q=Σtf² — docs NOT containing the term enter
      // through N alone, so no dense fan-out is ever materialized.
      // VMR≈(1−S/N) for scattered terms, ≫1 for topical ones; the
      // feature behind tf-idf-style topicality weighting. Same
      // semi-join-below-agg bound as text_postings.
      "text_burstiness" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val tf = docs
            .select(col("doc_id"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("term"))
            .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          val nDocs = docs.agg(countDistinct("doc_id").as("nd"))
          val top = tf.groupBy("term").agg(count(lit(1)).as("df2"))
            .orderBy(col("df2").desc, col("term")).limit(20)
          tf.join(top, Seq("term"), "left_semi")
            .groupBy("term")
            .agg(count(lit(1)).as("df"), sum("tf").as("s"),
                 sum(expr("tf * tf")).as("q"))
            .crossJoin(broadcast(nDocs))
            .select(col("term"), col("df"),
              round((col("q") - col("s").cast("double") * col("s") / col("nd"))
                / col("s"), 4).as("vmr"))
            .orderBy(col("df").desc, col("term"))
        },
        Some("""WITH tf AS (
               |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
               |        FROM documents)
               |  GROUP BY term, doc_id),
               |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM documents),
               |top AS (SELECT term FROM tf GROUP BY term
               |        ORDER BY count(*) DESC, term LIMIT 20),
               |a AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS s,
               |             CAST(sum(tf * tf) AS BIGINT) AS q
               |      FROM tf JOIN top USING (term) GROUP BY term)
               |SELECT term, df, round((q - CAST(s AS DOUBLE) * s / nd) / s, 4) AS vmr
               |FROM a, nd ORDER BY df DESC, term""".stripMargin)),

      // source-pair vocabulary Jaccard: which sources speak the same
      // language? Distinct (source, token) first — shuffle ∝ vocab ×
      // sources, never corpus size — then an equi-join on token whose
      // per-token fan-out is bounded by |sources|; output ≤ |sources|²
      // pairs. The corpus-mix audit behind samp_domain_mix.
      "text_source_similarity" -> Q(
        (s, d) => {
          val st = Tables.documents(s, d)
            .select(col("source"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .distinct()
          val cnt = st.groupBy("source").agg(count(lit(1)).as("c"))
          st.toDF("sa", "tok").join(st.toDF("sb", "tok2"),
              col("tok") === col("tok2") && col("sa") < col("sb"))
            .groupBy("sa", "sb").agg(count(lit(1)).as("ni"))
            .join(broadcast(cnt.toDF("sa", "ca")), "sa")
            .join(broadcast(cnt.toDF("sb", "cb")), "sb")
            .select(col("sa"), col("sb"),
              round(col("ni") / (col("ca") + col("cb") - col("ni")), 4).as("jaccard"))
            .orderBy("sa", "sb")
        },
        Some("""WITH st AS (
               |  SELECT DISTINCT source, tok
               |  FROM (SELECT source,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)),
               |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY source),
               |i AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS ni
               |      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
               |      GROUP BY sa, sb)
               |SELECT sa, sb, round(ni * 1.0 / (ca.c + cb.c - ni), 4) AS jaccard
               |FROM i JOIN cnt ca ON ca.source = sa JOIN cnt cb ON cb.source = sb
               |ORDER BY sa, sb""".stripMargin)),

      // KMV (bottom-k / theta-sketch) distinct sketches of each
      // source's vocabulary, with pairwise union / intersection /
      // Jaccard ESTIMATES from sketch merges alone. The sketch build
      // is the bounded TopK partial aggregate (k hashes per source per
      // map task — the mergeable form), pairs merge ≤64-element arrays
      // on the driver-free broadcast cross of the |S|-row sketch
      // table, and every estimate is deterministic (content hash, no
      // rand), so the DuckDB oracle reproduces it bit-for-bit: the
      // mergeability-plus-determinism combination that lets 100 TB
      // set-overlap questions run on kilobytes of state.
      "text_kmv_vocab" -> Q(
        (s, d) => {
          val K = 64
          val M = 1125899906842624L // 2^50: hash domain, exact in double
          import graft.functions.VectorFunctions.md5Long
          val st = Tables.documents(s, d)
            .select(col("source"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("term"))
            .select(col("source"),
              (md5Long(concat(lit("kmv:"), col("term"))) % M).as("h"))
            .distinct()
          val sk = st.groupBy("source")
            .agg(graft.ops.TopK.topk(K)(-col("h").cast("double"), col("h")).as("tk"))
            .select(col("source"), expr("transform(tk, x -> x.id)").as("hs"))
            .localCheckpoint(eager = false) // both sides of the pair cross
          sk.select(col("source").as("sa"), col("hs").as("ha"))
            .crossJoin(broadcast(sk.select(col("source").as("sb"), col("hs").as("hb"))))
            .filter(col("sa") < col("sb"))
            .withColumn("u", array_sort(array_union(col("ha"), col("hb"))))
            .withColumn("m", least(size(col("u")), lit(K)))
            .withColumn("v", expr("element_at(u, m)"))
            .withColumn("fst", slice(col("u"), 1, K))
            .withColumn("c", size(array_intersect(
              array_intersect(col("fst"), col("ha")), col("hb"))))
            .withColumn("est",
              when(col("m") >= K, lit((K - 1).toDouble * M) / col("v"))
                .otherwise(col("m").cast("double")))
            // ρ divides by min(K, m): a union sketch smaller than K
            // holds the ENTIRE union, so the estimate degrades
            // gracefully into the exact answer on small sets
            .select(col("sa"), col("sb"),
              round(col("est"), 1).as("union_est"),
              round(col("c") / col("m").cast("double") * col("est"), 1).as("inter_est"),
              round(col("c") / col("m").cast("double"), 4).as("jacc_est"))
            .orderBy("sa", "sb")
        },
        Some("""WITH st AS (SELECT DISTINCT source,
               |              ('0x' || substr(md5('kmv:' || tok), 1, 15))::BIGINT
               |                % 1125899906842624 AS h
               |            FROM (SELECT source,
               |                    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |                  FROM documents)),
               |sk AS (SELECT source, h,
               |              row_number() OVER (PARTITION BY source ORDER BY h) AS rn
               |       FROM st),
               |s64 AS (SELECT source, h FROM sk WHERE rn <= 64),
               |srcs AS (SELECT DISTINCT source FROM st),
               |pairs AS (SELECT a.source AS sa, b.source AS sb
               |          FROM srcs a JOIN srcs b ON a.source < b.source),
               |u AS (SELECT sa, sb, h FROM pairs JOIN s64 ON source = sa
               |      UNION
               |      SELECT sa, sb, h FROM pairs JOIN s64 ON source = sb),
               |ur AS (SELECT sa, sb, h,
               |              row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
               |       FROM u),
               |base AS (SELECT sa, sb, max(CASE WHEN rn <= 64 THEN h END) AS v,
               |                CAST(sum(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS m
               |         FROM ur GROUP BY sa, sb),
               |bth AS (SELECT ur.sa, ur.sb, CAST(count(*) AS BIGINT) AS c
               |        FROM ur JOIN s64 x ON x.source = ur.sa AND x.h = ur.h
               |                JOIN s64 y ON y.source = ur.sb AND y.h = ur.h
               |        WHERE ur.rn <= 64 GROUP BY ur.sa, ur.sb),
               |est AS (SELECT base.sa, base.sb, coalesce(c, 0) AS c, m,
               |               CASE WHEN m >= 64 THEN 63 * 1125899906842624.0 / v
               |                    ELSE CAST(m AS DOUBLE) END AS est
               |        FROM base LEFT JOIN bth ON bth.sa = base.sa AND bth.sb = base.sb)
               |SELECT sa, sb, round(est, 1) AS union_est,
               |       round(c / CAST(m AS DOUBLE) * est, 1) AS inter_est,
               |       round(c / CAST(m AS DOUBLE), 4) AS jacc_est
               |FROM est ORDER BY sa, sb""".stripMargin)),

      // per-source OLS fit of n_chars on token count — distributed
      // least squares via the Gram-matrix trick: ONE grouped agg
      // collects (n, Σx, Σy, Σx², Σxy, Σy²) and the closed form runs
      // on the |sources|-row frame. x and y are integers, so the
      // sums are EXACT in double (no cross-engine association drift)
      // up to 2^53; every product is taken in double to survive
      // 1e9-row groups (the stat_gini overflow lesson).
      "stat_ols_fit" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(col("source"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("double").as("x"),
            col("n_chars").cast("double").as("y"))
          t.groupBy("source").agg(
              count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
              sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
              sum(expr("y * y")).as("syy"))
            .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
            .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
            .withColumn("cv", col("n") * col("sxy") - col("sx") * col("sy"))
            .select(col("source"), col("n"),
              when(col("dx") === 0, lit(null).cast("double"))
                .otherwise(round(col("cv") / col("dx"), 6)).as("slope"),
              when(col("dx") === 0, lit(null).cast("double"))
                .otherwise(round((col("sy") - col("cv") / col("dx") * col("sx"))
                  / col("n"), 4)).as("intercept"),
              when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
                .otherwise(round(col("cv") * col("cv")
                  / (col("dx") * col("dy")), 6)).as("r2"))
            .orderBy("source")
        },
        Some("""WITH t AS (
               |  SELECT source,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS x,
               |         CAST(n_chars AS DOUBLE) AS y
               |  FROM documents),
               |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
               |             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
               |             sum(x*y) AS sxy, sum(y*y) AS syy
               |      FROM t GROUP BY source),
               |b AS (SELECT source, n, n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy,
               |             n*sxy - sx*sy AS cv, sx, sy FROM a)
               |SELECT source, n,
               |       CASE WHEN dx = 0 THEN NULL ELSE round(cv / dx, 6) END AS slope,
               |       CASE WHEN dx = 0 THEN NULL
               |            ELSE round((sy - cv / dx * sx) / n, 4) END AS intercept,
               |       CASE WHEN dx = 0 OR dy = 0 THEN NULL
               |            ELSE round(cv * cv / (dx * dy), 6) END AS r2
               |FROM b ORDER BY source""".stripMargin)),

      // Mann-Whitney U (en token counts vs all other languages) via
      // value-histogram midranks: ranks come from the (value → count)
      // frame (≤ distinct token counts, the stat_gini bound), so no
      // global row_number over docs ever runs. Tie-corrected normal
      // z uses Σ(t³−t); n1·n2 goes through double (long wraps at 1e9).
      "stat_mwu" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
          val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
            .withColumn("midrank",
              col("below").cast("double") + (col("nx") + 1) / 2.0)
            .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
                 sum(col("n1x") * col("midrank")).as("r1"),
                 sum(col("nx") * col("nx") * col("nx") - col("nx")).as("tie3"),
                 sum("nx").as("nn"))
            .select(col("n1"), col("n2"),
              round(col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2, 1).as("u1"),
              round((col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2
                     - col("n1").cast("double") * col("n2") / 2)
                / sqrt(col("n1").cast("double") * col("n2") / 12
                       * (col("nn") + 1 - col("tie3").cast("double")
                          / (col("nn").cast("double") * (col("nn") - 1)))), 4).as("z"))
        },
        Some("""WITH t AS (
               |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
               |  FROM documents),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
               |             CAST(count(*) AS BIGINT) AS nx FROM t GROUP BY x),
               |r AS (SELECT x, n1x, nx,
               |        CAST(coalesce(sum(nx) OVER (ORDER BY x
               |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               |          + (nx + 1) / 2.0 AS midrank
               |      FROM h),
               |a AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
               |             CAST(sum(nx - n1x) AS BIGINT) AS n2,
               |             sum(n1x * midrank) AS r1,
               |             CAST(sum(nx*nx*nx - nx) AS BIGINT) AS tie3,
               |             CAST(sum(nx) AS BIGINT) AS nn FROM r)
               |SELECT n1, n2,
               |       round(r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2, 1) AS u1,
               |       round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
               |              - CAST(n1 AS DOUBLE) * n2 / 2)
               |         / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
               |                * (nn + 1 - CAST(tie3 AS DOUBLE)
               |                   / (CAST(nn AS DOUBLE) * (nn - 1)))), 4) AS z
               |FROM a""".stripMargin)),

      // one-way ANOVA F across ALL language groups on document length:
      // the k-group generalization of stat_welch_ttest. Uses the
      // computational sum-of-squares identity (SSB = Σ s²/n − (Σs)²/N)
      // so the whole test is one grouped pass plus one aggregate over
      // the |langs|-row frame — no grand-mean join, no second scan.
      // Cancellation is benign here: SSB ≈ 7e4 out of ~8e7
      // intermediates loses 3 of double's 16 digits, and both engines
      // agree within the round-2 report.
      "stat_anova" -> Q(
        (s, d) => {
          val x = col("n_chars").cast("double")
          Tables.documents(s, d)
            .groupBy("lang")
            .agg(count(lit(1)).cast("double").as("n"),
                 sum(x).as("s"), sum(x * x).as("ss"))
            .agg(count(lit(1)).as("k"), sum("n").as("nn"), sum("s").as("st"),
                 sum("ss").as("sst"),
                 sum(col("s") * col("s") / col("n")).as("sb"))
            .select(col("k").cast("long").as("k_groups"),
                    col("nn").cast("long").as("n_total"),
                    round(col("sb") - col("st") * col("st") / col("nn"), 2)
                      .as("ss_between"),
                    round(col("sst") - col("sb"), 2).as("ss_within"),
                    round(((col("sb") - col("st") * col("st") / col("nn"))
                             / (col("k") - 1))
                          / ((col("sst") - col("sb")) / (col("nn") - col("k"))), 4)
                      .as("f_stat"))
        },
        Some("""WITH g AS (
               |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
               |         sum(CAST(n_chars AS DOUBLE)) AS s,
               |         sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS ss
               |  FROM documents GROUP BY lang)
               |SELECT CAST(count(*) AS BIGINT) AS k_groups,
               |       CAST(sum(n) AS BIGINT) AS n_total,
               |       round(sum(s*s/n) - sum(s)*sum(s)/sum(n), 2) AS ss_between,
               |       round(sum(ss) - sum(s*s/n), 2) AS ss_within,
               |       round((sum(s*s/n) - sum(s)*sum(s)/sum(n)) / (count(*) - 1)
               |             / ((sum(ss) - sum(s*s/n)) / (sum(n) - count(*))), 4) AS f_stat
               |FROM g""".stripMargin)),

      // Spearman rank correlation (doc chars vs tokens) the scale-safe
      // way: tied average ranks come from VALUE-level cumulative
      // counts (the stat_gini idiom — the global window runs over
      // |distinct values| rows, bounded by max document length, never
      // over the corpus), then the per-row ranks arrive by joining the
      // two broadcast value→rank maps back and ρ is one corr() pass.
      "stat_spearman" -> Q(
        (s, d) => {
          val base = Tables.documents(s, d)
            .select(col("n_chars").cast("long").as("x"),
              size(graft.text.TextPrimitives.tokens(col("text")))
                .cast("long").as("y"))
            .localCheckpoint(eager = false) // read 3×: two rank maps + rows
          def rankMap(c: String) = {
            val w = Window.orderBy(c).rowsBetween(Window.unboundedPreceding, -1)
            base.groupBy(c).agg(count(lit(1)).as("cnt"))
              .withColumn("f", coalesce(sum("cnt").over(w), lit(0L)))
              .select(col(c),
                (col("f") + (col("cnt") + lit(1)) / lit(2.0)).as(s"rank_$c"))
          }
          base.join(broadcast(rankMap("x")), "x")
            .join(broadcast(rankMap("y")), "y")
            .agg(count(lit(1)).cast("long").as("n"),
                 round(corr(col("rank_x"), col("rank_y")), 4).as("rho"))
        },
        Some("""WITH b AS (
               |  SELECT CAST(n_chars AS BIGINT) AS x,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS y
               |  FROM documents),
               |rx AS (SELECT x, coalesce(sum(cnt) OVER (ORDER BY x
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               |           + (cnt + 1) / 2.0 AS rank_x
               |       FROM (SELECT x, count(*) AS cnt FROM b GROUP BY x)),
               |ry AS (SELECT y, coalesce(sum(cnt) OVER (ORDER BY y
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               |           + (cnt + 1) / 2.0 AS rank_y
               |       FROM (SELECT y, count(*) AS cnt FROM b GROUP BY y))
               |SELECT CAST(count(*) AS BIGINT) AS n,
               |       round(corr(rank_x, rank_y), 4) AS rho
               |FROM b JOIN rx USING (x) JOIN ry USING (y)""".stripMargin)),

      // normalized mutual information between the lang and source
      // labels — "does source predict language?" in one number. All
      // information terms come off the checkpointed |langs|×|sources|
      // contingency cells (joint + both marginals + total), so after
      // the one grouped corpus pass everything is crosses of broadcast
      // single-row frames (the stat_cohens_kappa shape).
      "stat_nmi" -> Q(
        (s, d) => {
          val cells = Tables.documents(s, d).groupBy("lang", "source")
            .agg(count(lit(1)).cast("double").as("n"))
            .localCheckpoint(eager = false) // read 4×: joint, marginals, total
          val tot = cells.agg(sum("n").as("nn"))
          val rm = cells.groupBy("lang").agg(sum("n").as("r"))
          val cm = cells.groupBy("source").agg(sum("n").as("c"))
          val mi = cells.join(broadcast(rm), "lang").join(broadcast(cm), "source")
            .crossJoin(broadcast(tot))
            .agg(sum(col("n") / col("nn")
              * log(col("n") * col("nn") / (col("r") * col("c")))).as("mi"))
          val hl = rm.crossJoin(broadcast(tot))
            .agg(sum(col("r") / col("nn") * log(col("nn") / col("r"))).as("h_lang"))
          val hs = cm.crossJoin(broadcast(tot))
            .agg(sum(col("c") / col("nn") * log(col("nn") / col("c"))).as("h_source"))
          broadcast(mi).crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
            .select(round(col("mi"), 6).as("mi"),
                    round(col("h_lang"), 6).as("h_lang"),
                    round(col("h_source"), 6).as("h_source"),
                    round(col("mi") / sqrt(col("h_lang") * col("h_source")), 4)
                      .as("nmi"))
        },
        Some("""WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
               |           FROM documents GROUP BY lang, source),
               |t AS (SELECT sum(n) AS nn FROM c),
               |r AS (SELECT lang, sum(n) AS r FROM c GROUP BY lang),
               |co AS (SELECT source, sum(n) AS c2 FROM c GROUP BY source),
               |mi AS (SELECT sum(n / nn * ln(n * nn / (r * c2))) AS mi
               |       FROM c JOIN r USING (lang) JOIN co USING (source), t),
               |hl AS (SELECT sum(r / nn * ln(nn / r)) AS h_lang FROM r, t),
               |hs AS (SELECT sum(c2 / nn * ln(nn / c2)) AS h_source FROM co, t)
               |SELECT round(mi, 6) AS mi, round(h_lang, 6) AS h_lang,
               |       round(h_source, 6) AS h_source,
               |       round(mi / sqrt(h_lang * h_source), 4) AS nmi
               |FROM mi, hl, hs""".stripMargin)),

      // Kruskal–Wallis H (rank-based ANOVA) of doc length across
      // languages — the non-parametric twin of stat_anova. Tied
      // average ranks come from the VALUE-level histogram (the
      // stat_spearman idiom: the global window runs over |distinct
      // lengths| rows, never the corpus) and are carried in exact
      // HALF-UNIT longs (rank2 = 2·rank), so the per-group rank sums
      // are integer math — no double summation-order drift. The
      // tie-correction sums t³−t per value (integer-valued doubles:
      // exact until t³ > 2^53). Per-group rank sums come straight off
      // the |langs|×|lengths| cell frame; rows are never re-joined.
      "stat_kruskal" -> Q(
        (s, d) => {
          val cells = Tables.documents(s, d)
            .groupBy(col("lang"), col("n_chars").cast("long").as("x"))
            .agg(count(lit(1)).as("cnt"))
            .localCheckpoint(eager = false) // read 2×: value ranks + group sums
          val wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          val ranks = cells.groupBy("x").agg(sum("cnt").as("t"))
            .withColumn("f", coalesce(sum("t").over(wx), lit(0L)))
            .select(col("x"), col("t"),
              (col("f") * 2 + col("t") + 1).as("rank2"))
            .localCheckpoint(eager = false) // read 2×: rank join + tie term
          val grp = cells.join(broadcast(ranks), "x")
            .groupBy("lang").agg(sum("cnt").as("n_g"),
              sum(col("cnt") * col("rank2")).as("r2_g"))
          val ties = ranks.agg(
            sum(col("t").cast("double") * col("t") * col("t") - col("t"))
              .as("tie"))
          grp.agg(count(lit(1)).as("k"), sum("n_g").as("nn"),
              sum(col("r2_g").cast("double") * col("r2_g")
                / (col("n_g") * 4.0)).as("sr"))
            .crossJoin(broadcast(ties))
            .select(col("nn").cast("long").as("n"),
              col("k").cast("long").as("k_groups"),
              round(lit(12.0) / (col("nn").cast("double") * (col("nn") + 1))
                * col("sr") - lit(3.0) * (col("nn") + 1), 4).as("h"),
              round(lit(1.0) - col("tie")
                / (col("nn").cast("double") * col("nn") * col("nn")
                  - col("nn")), 6).as("tie_c"))
            .withColumn("h_adj", round(col("h") / col("tie_c"), 4))
        },
        Some("""WITH cells AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
               |                      count(*) AS cnt
               |               FROM documents GROUP BY lang, x),
               |hx AS (SELECT x, sum(cnt) AS t FROM cells GROUP BY x),
               |rk AS (SELECT x, t,
               |         coalesce(sum(t) OVER (ORDER BY x ROWS BETWEEN
               |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
               |           + t + 1 AS rank2
               |       FROM hx),
               |g AS (SELECT lang, sum(cnt) AS n_g, sum(cnt * rank2) AS r2_g
               |      FROM cells JOIN rk USING (x) GROUP BY lang),
               |tt AS (SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie FROM rk),
               |ag AS (SELECT count(*) AS k, sum(n_g) AS nn,
               |         sum(CAST(r2_g AS DOUBLE) * r2_g / (n_g * 4.0)) AS sr
               |       FROM g)
               |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
               |       round(12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * sr
               |             - 3.0 * (nn + 1), 4) AS h,
               |       round(1.0 - tie / (CAST(nn AS DOUBLE) * nn * nn - nn), 6)
               |         AS tie_c,
               |       round(round(12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * sr
               |                   - 3.0 * (nn + 1), 4)
               |             / round(1.0 - tie / (CAST(nn AS DOUBLE) * nn * nn - nn),
               |                     6), 4) AS h_adj
               |FROM ag, tt""".stripMargin)),

      // Brown–Forsythe (median-based Levene) test: does doc-length
      // VARIANCE differ across languages? z = |x − median_g| via one
      // exact per-group percentile + broadcast join-back, then the
      // stat_anova computational identity on z. Deviations are
      // carried as exact DOUBLED longs (median of integers is always
      // j or j.5, so 2z is integer) — the group sums Σz and Σz² are
      // integer math, immune to summation order.
      "stat_levene" -> Q(
        (s, d) => {
          val base = Tables.documents(s, d)
            .select(col("lang"), col("n_chars").cast("long").as("x"))
            .localCheckpoint(eager = false) // read 2×: medians + deviations
          val med = base.groupBy("lang")
            .agg(expr("percentile(x, 0.5D)").as("med"))
          val g = base.join(broadcast(med), "lang")
            .select(col("lang"),
              abs(col("x") * 2 - (col("med") * 2).cast("long")).as("z2"))
            .groupBy("lang").agg(count(lit(1)).cast("double").as("n"),
              sum("z2").cast("double").as("s2"),
              sum(col("z2") * col("z2")).cast("double").as("ss4"))
          g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
              sum(col("s2") / 2.0).as("st"),
              sum(col("ss4") / 4.0).as("sst"),
              sum(col("s2") * col("s2") / (col("n") * 4.0)).as("sb"))
            .select(col("k").cast("long").as("k_groups"),
              col("nn").cast("long").as("n_total"),
              round(col("sb") - col("st") * col("st") / col("nn"), 2)
                .as("ss_between"),
              round(col("sst") - col("sb"), 2).as("ss_within"),
              round(((col("sb") - col("st") * col("st") / col("nn"))
                       / (col("k") - 1))
                    / ((col("sst") - col("sb")) / (col("nn") - col("k"))), 4)
                .as("f_stat"))
        },
        Some("""WITH b AS (SELECT lang, CAST(n_chars AS BIGINT) AS x
               |           FROM documents),
               |m AS (SELECT lang, quantile_cont(x, 0.5) AS med
               |      FROM b GROUP BY lang),
               |g AS (SELECT b.lang, CAST(count(*) AS DOUBLE) AS n,
               |        CAST(sum(abs(b.x * 2 - CAST(m.med * 2 AS BIGINT)))
               |          AS DOUBLE) AS s2,
               |        CAST(sum(abs(b.x * 2 - CAST(m.med * 2 AS BIGINT))
               |               * abs(b.x * 2 - CAST(m.med * 2 AS BIGINT)))
               |          AS DOUBLE) AS ss4
               |      FROM b JOIN m USING (lang) GROUP BY b.lang)
               |SELECT CAST(count(*) AS BIGINT) AS k_groups,
               |       CAST(sum(n) AS BIGINT) AS n_total,
               |       round(sum(s2*s2/(n*4.0))
               |             - sum(s2/2.0)*sum(s2/2.0)/sum(n), 2) AS ss_between,
               |       round(sum(ss4/4.0) - sum(s2*s2/(n*4.0)), 2) AS ss_within,
               |       round((sum(s2*s2/(n*4.0))
               |              - sum(s2/2.0)*sum(s2/2.0)/sum(n)) / (count(*) - 1)
               |             / ((sum(ss4/4.0) - sum(s2*s2/(n*4.0)))
               |                / (sum(n) - count(*))), 4) AS f_stat
               |FROM g""".stripMargin)),

      // deterministic half-sample bootstrap of the mean tokens/doc:
      // 32 replicates, membership by salted content-stable hash parity
      // (the Sampling idiom — rerun/repartition never moves a doc
      // between replicates). ONE corpus scan computes all 64
      // conditional sums map-side; the replicate means stack into a
      // 32-row frame whose summary (SE + percentile CI) is
      // constant-cost at any corpus size. Replicate means rounded to
      // 6 before the summary so both engines interpolate identical
      // quantile inputs.
      "samp_bootstrap" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val B = 32
          val base = Tables.documents(s, d).select(col("doc_id").as("id"),
            size(graft.text.TextPrimitives.tokens(col("text")))
              .cast("double").as("x"))
          def mem(b: Int) =
            md5Long(concat(lit(s"boot:$b:"), col("id").cast("string"))) % 2 === 0
          val aggs = (0 until B).flatMap(b => Seq(
            sum(when(mem(b), col("x"))).as(s"s$b"),
            sum(when(mem(b), lit(1.0))).as(s"c$b")))
          val stackArgs = (0 until B)
            .map(b => s"$b, round(s$b / c$b, 6)").mkString(", ")
          base.agg(aggs.head, aggs.tail: _*)
            .select(expr(s"stack($B, $stackArgs) AS (rep, m)"))
            .agg(count(lit(1)).as("n_reps"),
                 round(avg("m"), 4).as("boot_mean"),
                 round(stddev_samp(col("m")), 4).as("boot_se"),
                 round(expr("percentile(m, 0.025D)"), 4).as("ci_lo"),
                 round(expr("percentile(m, 0.975D)"), 4).as("ci_hi"))
        },
        Some("""WITH base AS (
               |  SELECT doc_id AS id,
               |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS x
               |  FROM documents),
               |reps AS (
               |  SELECT rb, round(avg(x), 6) AS m
               |  FROM base, range(32) t(rb)
               |  WHERE ('0x' || substr(md5('boot:' || CAST(rb AS VARCHAR) || ':'
               |           || CAST(id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
               |  GROUP BY rb)
               |SELECT CAST(count(*) AS BIGINT) AS n_reps,
               |       round(avg(m), 4) AS boot_mean,
               |       round(stddev_samp(m), 4) AS boot_se,
               |       round(quantile_cont(m, 0.025), 4) AS ci_lo,
               |       round(quantile_cont(m, 0.975), 4) AS ci_hi
               |FROM reps""".stripMargin)),

      // Poisson bootstrap of the mean tokens/doc — the industry-
      // standard AT-SCALE bootstrap: each doc gets an independent
      // Poisson(1) weight per replicate (≈ multinomial resampling as
      // n→∞), so all 16 replicates come out of ONE scan with 32
      // map-side weighted sums — no resample materialization, no
      // shuffle growth, mergeable across partitions. Weights are the
      // inverse-CDF of a salted content-stable hash draw (CDF
      // constants written identically in both engines); replicate
      // means round to 6 before the constant-cost 16-row summary.
      "samp_poisson_bootstrap" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val B = 16
          val base = Tables.documents(s, d).select(col("doc_id").as("id"),
            size(graft.text.TextPrimitives.tokens(col("text")))
              .cast("double").as("x"))
          def w(b: Int) = {
            val u = (md5Long(concat(lit(s"pb:$b:"), col("id").cast("string")))
              % 1000000L + 1L) / lit(1000000.0)
            when(u <= 0.367879441, 0.0).when(u <= 0.735758882, 1.0)
              .when(u <= 0.919698603, 2.0).when(u <= 0.981011843, 3.0)
              .when(u <= 0.996340153, 4.0).when(u <= 0.999405815, 5.0)
              .otherwise(6.0)
          }
          val aggs = (0 until B).flatMap(b => Seq(
            sum(w(b) * col("x")).as(s"s$b"), sum(w(b)).as(s"w$b")))
          val stackArgs = (0 until B)
            .map(b => s"$b, round(s$b / w$b, 6)").mkString(", ")
          base.agg(aggs.head, aggs.tail: _*)
            .select(expr(s"stack($B, $stackArgs) AS (rep, m)"))
            .agg(count(lit(1)).as("n_reps"),
                 round(avg("m"), 4).as("boot_mean"),
                 round(stddev_samp(col("m")), 4).as("boot_se"),
                 round(expr("percentile(m, 0.025D)"), 4).as("ci_lo"),
                 round(expr("percentile(m, 0.975D)"), 4).as("ci_hi"))
        },
        Some("""WITH base AS (
               |  SELECT doc_id AS id,
               |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS x
               |  FROM documents),
               |dr AS (
               |  SELECT rb, x,
               |    (('0x' || substr(md5('pb:' || CAST(rb AS VARCHAR) || ':'
               |        || CAST(id AS VARCHAR)), 1, 15))::BIGINT % 1000000 + 1) / 1000000.0 AS u
               |  FROM base, range(16) t(rb)),
               |wt AS (
               |  SELECT rb, x,
               |    CASE WHEN u <= 0.367879441 THEN 0.0 WHEN u <= 0.735758882 THEN 1.0
               |         WHEN u <= 0.919698603 THEN 2.0 WHEN u <= 0.981011843 THEN 3.0
               |         WHEN u <= 0.996340153 THEN 4.0 WHEN u <= 0.999405815 THEN 5.0
               |         ELSE 6.0 END AS w
               |  FROM dr),
               |reps AS (SELECT rb, round(sum(w * x) / sum(w), 6) AS m
               |         FROM wt GROUP BY rb)
               |SELECT CAST(count(*) AS BIGINT) AS n_reps,
               |       round(avg(m), 4) AS boot_mean,
               |       round(stddev_samp(m), 4) AS boot_se,
               |       round(quantile_cont(m, 0.025), 4) AS ci_lo,
               |       round(quantile_cont(m, 0.975), 4) AS ci_hi
               |FROM reps""".stripMargin)),

      // ε=1 Laplace mechanism on the per-language histogram, with the
      // noise draw made deterministic: inverse-CDF of a salted
      // content-stable hash of the GROUP KEY (a real release would
      // use a sealed seed; the plumbing — per-group draw, two-sided
      // inverse CDF, post-noise rounding — is exactly this). Noise is
      // added AFTER the one grouped pass, so the mechanism costs one
      // projection over |langs| rows; the clamp under the log caps
      // |noise| at ~27b instead of surfacing either engine's ln(0).
      // True counts ride along as the calibration audit (this is the
      // mechanism test harness, not the private release itself).
      "priv_dp_counts" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val u = (md5Long(concat(lit("dp:"), col("lang")))
            % 1000000L + 1L) / lit(1000000.0) - 0.5
          val noise = -signum(col("u")) *
            log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(col("u"))))
          Tables.documents(s, d).groupBy("lang")
            .agg(count(lit(1)).as("n_true"))
            .withColumn("u", round(u, 6))
            .select(col("lang"), col("n_true"),
              round(noise, 4).as("noise"),
              round(col("n_true") + noise, 4).as("n_noisy"))
            .orderBy("lang")
        },
        Some("""WITH g AS (
               |  SELECT lang, CAST(count(*) AS BIGINT) AS n_true,
               |         round((('0x' || substr(md5('dp:' || lang), 1, 15))::BIGINT
               |           % 1000000 + 1) / 1000000.0 - 0.5, 6) AS u
               |  FROM documents GROUP BY lang),
               |n AS (SELECT lang, n_true,
               |             -sign(u) * ln(greatest(1e-12, 1.0 - 2.0 * abs(u))) AS noise
               |      FROM g)
               |SELECT lang, n_true, round(noise, 4) AS noise,
               |       round(n_true + noise, 4) AS n_noisy
               |FROM n ORDER BY lang""".stripMargin)),

      // k-anonymity audit: quasi-identifier = (lang, source, 200-char
      // length bin); the release-safety profile is the equivalence-
      // class SIZE histogram (how many classes of each size, how many
      // rows they carry, which sizes violate k=5). Two map-side-
      // combinable hash aggs — the first shuffles on the QI key (same
      // cardinality as the release table), the second on the ≤|distinct
      // sizes| histogram; no windows, no joins, so the audit runs at
      // any corpus size as two reduce passes
      "priv_k_anonymity" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("lang"), col("source"), expr("n_chars DIV 200").as("len_bin"))
          .groupBy("lang", "source", "len_bin")
          .agg(count(lit(1)).as("class_size"))
          .groupBy("class_size")
          .agg(count(lit(1)).as("n_classes"))
          .select(col("class_size"), col("n_classes"),
            (col("class_size") * col("n_classes")).as("n_rows"),
            (col("class_size") < 5).as("violates_k5"))
          .orderBy("class_size"),
        Some("""WITH eq AS (
               |  SELECT lang, source, n_chars // 200 AS len_bin,
               |         CAST(count(*) AS BIGINT) AS class_size
               |  FROM documents GROUP BY lang, source, len_bin)
               |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
               |       CAST(class_size * count(*) AS BIGINT) AS n_rows,
               |       class_size < 5 AS violates_k5
               |FROM eq GROUP BY class_size ORDER BY class_size""".stripMargin)),

      // l-diversity audit: within each (source, length-bin) QI group,
      // how many distinct values of the sensitive attribute (lang)
      // survive — a group an attacker can pin to one lang leaks it
      // even when k-anonymous. Output is the per-group (n, l,
      // violates_l2) table, bounded by |sources|·|bins|; one grouped
      // pass with countDistinct (Expand-based two-level agg, both
      // levels partial)
      "priv_l_diversity" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("source"), expr("n_chars DIV 500").as("len_bin"), col("lang"))
          .groupBy("source", "len_bin")
          .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("l"))
          .select(col("source"), col("len_bin"), col("n"), col("l"),
            (col("l") < 2).as("violates_l2"))
          .orderBy("source", "len_bin"),
        Some("""SELECT source, n_chars // 500 AS len_bin,
               |       CAST(count(*) AS BIGINT) AS n,
               |       CAST(count(DISTINCT lang) AS BIGINT) AS l,
               |       count(DISTINCT lang) < 2 AS violates_l2
               |FROM documents GROUP BY source, len_bin
               |ORDER BY source, len_bin""".stripMargin)),

      // Horvitz–Thompson total-token estimate from an unequal-
      // probability sample: long docs (n_chars ≥ 500) are included
      // w.p. 0.5, short ones w.p. 0.1, membership decided by a
      // deterministic per-doc hash (engine-reproducible, no RNG
      // state). Estimator Σ x_i/p_i is unbiased for the true total;
      // the query reports both plus the realized relative error per
      // source. One scan computes sample and truth together (the
      // conditional-agg trick — no second pass over the corpus)
      "samp_horvitz_thompson" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val inSample = (md5Long(concat(lit("ht:"), col("doc_id").cast("string")))
            % 1000L) < when(col("n_chars") >= 500, 500L).otherwise(100L)
          val p = when(col("n_chars") >= 500, 0.5).otherwise(0.1)
          Tables.documents(s, d)
            .select(col("source"), col("n_chars"), col("doc_id"),
              size(graft.text.TextPrimitives.tokens(col("text")))
                .cast("long").as("x"))
            .withColumn("in_s", inSample)
            .withColumn("p", p)
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              sum(when(col("in_s"), 1L).otherwise(0L)).as("n_sampled"),
              sum(col("x")).as("true_total"),
              round(sum(when(col("in_s"), col("x") / col("p")).otherwise(0.0)), 2)
                .as("ht_estimate"))
            .withColumn("rel_err",
              when(col("true_total") === 0, lit(null).cast("double"))
                .otherwise(round(abs(col("ht_estimate") - col("true_total"))
                  / col("true_total"), 4)))
            .orderBy("source")
        },
        Some("""WITH t AS (
               |  SELECT source, doc_id, n_chars,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |         (('0x' || substr(md5('ht:' || doc_id), 1, 15))::BIGINT % 1000)
               |           < (CASE WHEN n_chars >= 500 THEN 500 ELSE 100 END) AS in_s,
               |         CASE WHEN n_chars >= 500 THEN 0.5 ELSE 0.1 END AS p
               |  FROM documents),
               |g AS (
               |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               |         CAST(sum(CASE WHEN in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               |         CAST(sum(x) AS BIGINT) AS true_total,
               |         round(sum(CASE WHEN in_s THEN x / p ELSE 0.0 END), 2) AS ht_estimate
               |  FROM t GROUP BY source)
               |SELECT source, n_docs, n_sampled, true_total, ht_estimate,
               |       CASE WHEN true_total = 0 THEN NULL
               |            ELSE round(abs(ht_estimate - true_total) / true_total, 4)
               |       END AS rel_err
               |FROM g ORDER BY source""".stripMargin)),

      // Heaps'-law fit V(N) = K·N^β: vocabulary growth measured at
      // ~100 equal-width doc_id checkpoints regardless of corpus size
      // (block width = maxId/100, broadcast 1-row max — so the
      // cumulative windows run over ≤101 block rows at ANY scale,
      // never over docs). Vocab increments come from each term's
      // FIRST block (min-agg over the exploded stream — one shuffle
      // keyed by term, the same cardinality as any vocab build);
      // the log-log OLS closed form is one reduce over ≤101 points
      "text_heaps_fit" -> Q(
        (s, d) => {
          val toks = Tables.documents(s, d)
            .select(col("doc_id"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("w"))
          val mx = Tables.documents(s, d).agg(max("doc_id").as("mx"))
          val blocked = toks.crossJoin(broadcast(mx))
            .withColumn("blk", expr("doc_id DIV greatest(1, (mx DIV 100) + 1)"))
          val perBlk = blocked.groupBy("blk").agg(count(lit(1)).as("nt"))
          val firstBlk = blocked.groupBy("w").agg(min("blk").as("fb"))
            .groupBy(col("fb").as("blk")).agg(count(lit(1)).as("nv"))
          val wc = Window.orderBy("blk")
            .rowsBetween(Window.unboundedPreceding, 0)
          val pts = perBlk.join(firstBlk, Seq("blk"), "left")
            .na.fill(0L, Seq("nv"))
            .withColumn("cn", sum("nt").over(wc))
            .withColumn("cv", sum("nv").over(wc))
            .filter(col("cn") > 0 && col("cv") > 0)
            .select(log(col("cn").cast("double")).as("lx"),
                    log(col("cv").cast("double")).as("ly"))
          pts.agg(count(lit(1)).as("n_points"),
              avg("lx").as("ax"), avg("ly").as("ay"),
              covar_pop("lx", "ly").as("cxy"),
              var_pop("lx").as("vx"), var_pop("ly").as("vy"))
            .select(col("n_points"),
              // degenerate-corpus guard, mirrored in the oracle: a
              // corpus collapsing to ONE cumulative checkpoint gives
              // var_pop(lx)=0 and the OLS slope is undefined — NULL
              // it (and k/r2, which reuse it) rather than inherit
              // either engine's divide-by-zero convention
              when(col("vx") === 0, lit(null).cast("double"))
                .otherwise(round(col("cxy") / col("vx"), 4)).as("beta"),
              when(col("vx") === 0, lit(null).cast("double"))
                .otherwise(round(exp(col("ay") - col("cxy") / col("vx") * col("ax")), 4)).as("k"),
              when(col("vx") === 0 || col("vy") === 0, lit(null).cast("double"))
                .otherwise(round(pow(col("cxy") / sqrt(col("vx") * col("vy")), 2), 4)).as("r2"))
        },
        Some("""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
               |tok AS (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
               |        FROM documents),
               |blk AS (SELECT doc_id // greatest(1, (mx // 100) + 1) AS blk, w
               |        FROM tok, mx),
               |pt AS (SELECT blk, CAST(count(*) AS BIGINT) AS nt FROM blk GROUP BY blk),
               |fb AS (SELECT min_blk AS blk, CAST(count(*) AS BIGINT) AS nv FROM (
               |         SELECT w, min(blk) AS min_blk FROM blk GROUP BY w)
               |       GROUP BY min_blk),
               |cur AS (SELECT pt.blk, sum(nt) OVER (ORDER BY pt.blk) AS cn,
               |               sum(coalesce(nv, 0)) OVER (ORDER BY pt.blk) AS cv
               |        FROM pt LEFT JOIN fb ON pt.blk = fb.blk),
               |pts AS (SELECT ln(cn) AS lx, ln(cv) AS ly FROM cur
               |        WHERE cn > 0 AND cv > 0),
               |s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
               |             avg(lx) AS ax, avg(ly) AS ay, covar_pop(lx, ly) AS cxy,
               |             var_pop(lx) AS vx, var_pop(ly) AS vy FROM pts)
               |SELECT n_points,
               |       CASE WHEN vx = 0 THEN NULL ELSE round(cxy / vx, 4) END AS beta,
               |       CASE WHEN vx = 0 THEN NULL ELSE round(exp(ay - cxy / vx * ax), 4) END AS k,
               |       CASE WHEN vx = 0 OR vy = 0 THEN NULL ELSE
               |         round(pow(cxy / sqrt(vx * vy), 2), 4) END AS r2
               |FROM s""".stripMargin)),

      // chi-square test of independence for the lang × source
      // contingency table: expected counts from broadcast marginals
      // over the FULL grid (zero observed cells still contribute, so
      // the grid is marginals × marginals — bounded by the label
      // domains — left-joined with observed). One fact scan feeds all
      // three aggregates; everything after is |langs|·|sources| rows
      "stat_chi2_indep" -> Q(
        (s, d) => {
          val doc = Tables.documents(s, d)
          val rt = doc.groupBy("lang").agg(count(lit(1)).as("nl"))
          val ct = doc.groupBy("source").agg(count(lit(1)).as("ns"))
          val obs = doc.groupBy("lang", "source").agg(count(lit(1)).as("o"))
          val tot = doc.agg(count(lit(1)).as("n"))
          rt.crossJoin(broadcast(ct))
            .join(obs, Seq("lang", "source"), "left")
            .na.fill(0L, Seq("o"))
            .crossJoin(broadcast(tot))
            .withColumn("e", col("nl") * col("ns") / col("n").cast("double"))
            .agg(
              round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"),
              ((countDistinct(col("lang")) - 1) *
                (countDistinct(col("source")) - 1)).as("dof"),
              max(col("n")).as("n"))
        },
        Some("""WITH rt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
               |            FROM documents GROUP BY lang),
               |ct AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
               |       FROM documents GROUP BY source),
               |obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
               |        FROM documents GROUP BY lang, source),
               |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
               |grid AS (
               |  SELECT rt.lang, ct.source, rt.nl, ct.ns,
               |         coalesce(o, 0) AS o, n,
               |         rt.nl * ct.ns / CAST(n AS DOUBLE) AS e
               |  FROM rt CROSS JOIN ct
               |  LEFT JOIN obs ON rt.lang = obs.lang AND ct.source = obs.source
               |  CROSS JOIN tot)
               |SELECT round(sum(pow(o - e, 2) / e), 4) AS chi2,
               |       CAST((count(DISTINCT lang) - 1) *
               |            (count(DISTINCT source) - 1) AS BIGINT) AS dof,
               |       CAST(max(n) AS BIGINT) AS n
               |FROM grid""".stripMargin)),

      // Kendall's τ-b between per-nation wealth (avg customer balance)
      // and spend (avg order price): rank correlation robust to
      // non-linearity, with the tie-corrected denominator. The pair
      // scan is a self-join of the |nations|-row AGGREGATED frame
      // (625 pairs at 25 nations — bounded by the dimension domain,
      // never by facts); x/y round to 6dp first so both engines
      // classify concordance identically, making the counts integral
      "stat_kendall" -> Q(
        (s, d) => {
          val cust = Tables.customer(s, d)
            .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
            .groupBy("n_name").agg(round(avg("c_acctbal"), 6).as("x"))
          val ord = Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
            .groupBy(col("n_name").as("n2")).agg(round(avg("o_totalprice"), 6).as("y"))
          val f = cust.join(ord, col("n_name") === col("n2"))
            .select(col("n_name"), col("x"), col("y"))
          val a = f.select(col("n_name").as("ka"), col("x").as("xa"), col("y").as("ya"))
          val b = f.select(col("n_name").as("kb"), col("x").as("xb"), col("y").as("yb"))
          val pairs = a.join(b, col("ka") < col("kb"))
            .select(
              (signum(col("xb") - col("xa")) * signum(col("yb") - col("ya"))).as("s"),
              (col("xa") === col("xb")).cast("long").as("tx"),
              (col("ya") === col("yb")).cast("long").as("ty"))
          pairs.agg(
              count(lit(1)).as("n_pairs"),
              sum(when(col("s") > 0, 1L).otherwise(0L)).as("concordant"),
              sum(when(col("s") < 0, 1L).otherwise(0L)).as("discordant"),
              sum("tx").as("txs"), sum("ty").as("tys"))
            .select(col("n_pairs"), col("concordant"), col("discordant"),
              round((col("concordant") - col("discordant")) /
                sqrt((col("n_pairs") - col("txs")).cast("double") *
                     (col("n_pairs") - col("tys"))), 4).as("tau_b"))
        },
        Some("""WITH cx AS (
               |  SELECT n_name, round(avg(c_acctbal), 6) AS x
               |  FROM customer JOIN nation ON c_nationkey = n_nationkey
               |  GROUP BY n_name),
               |oy AS (
               |  SELECT n_name, round(avg(o_totalprice), 6) AS y
               |  FROM orders JOIN customer ON o_custkey = c_custkey
               |              JOIN nation ON c_nationkey = n_nationkey
               |  GROUP BY n_name),
               |f AS (SELECT cx.n_name, x, y FROM cx JOIN oy ON cx.n_name = oy.n_name),
               |p AS (
               |  SELECT sign(b.x - a.x) * sign(b.y - a.y) AS s,
               |         CAST(a.x = b.x AS BIGINT) AS tx,
               |         CAST(a.y = b.y AS BIGINT) AS ty
               |  FROM f a JOIN f b ON a.n_name < b.n_name),
               |g AS (
               |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               |         CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               |         CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
               |         CAST(sum(tx) AS BIGINT) AS txs, CAST(sum(ty) AS BIGINT) AS tys
               |  FROM p)
               |SELECT n_pairs, concordant, discordant,
               |       round((concordant - discordant) /
               |             sqrt(CAST(n_pairs - txs AS DOUBLE) * (n_pairs - tys)), 4) AS tau_b
               |FROM g""".stripMargin)),

      // modularity of the SOURCE partition over the near-dup graph:
      // do duplicates concentrate within a source (Q→1) or cross
      // source boundaries (Q→0)? Q = Σ_s [L_s/m − (D_s/2m)²] with
      // L_s = intra-source edges, D_s = degree mass of s. The edge
      // build is the shared bounded ngramJaccard; everything after is
      // |sources|-row arithmetic with the 1-row edge total broadcast —
      // the contribution table and its Q re-agg both read the same
      // tiny frame. The "is my dedup a per-source or global problem"
      // diagnostic that decides whether dedup can shard by source
      "graph_modularity" -> Q(
        (s, d) => {
          val docs = docsUnder(s, d, 120)
          val e0 = graft.dedup.Dedup.ngramJaccard(docs, 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // read for deg, intra, AND m
          val src = docs.select(col("doc_id"), col("source"))
          val lab = e0
            .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
            .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
            .localCheckpoint(eager = false)
          val mTot = lab.agg(count(lit(1)).as("m"))
          val degS = lab.select(col("sa").as("source"))
            .union(lab.select(col("sb").as("source")))
            .groupBy("source").agg(count(lit(1)).as("d_sum"))
          val intra = lab.filter(col("sa") === col("sb"))
            .groupBy(col("sa").as("source")).agg(count(lit(1)).as("l_intra"))
          val per = degS.join(intra, Seq("source"), "left")
            .na.fill(0L, Seq("l_intra"))
            .crossJoin(broadcast(mTot))
            .withColumn("contribution",
              round(col("l_intra") / col("m").cast("double")
                - pow(col("d_sum") / (lit(2.0) * col("m")), 2), 6))
          per.crossJoin(broadcast(
              per.agg(round(sum("contribution"), 4).as("q_total"))))
            .select(col("source"), col("l_intra"), col("d_sum"),
                    col("contribution"), col("q_total"))
            .orderBy("source")
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |lab AS (SELECT da, db, sa.source AS sa, sb.source AS sb
                |        FROM e0 JOIN documents sa ON e0.da = sa.doc_id
                |                JOIN documents sb ON e0.db = sb.doc_id),
                |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
                |degs AS (SELECT source, CAST(count(*) AS BIGINT) AS d_sum FROM (
                |           SELECT sa AS source FROM lab
                |           UNION ALL SELECT sb AS source FROM lab)
                |         GROUP BY source),
                |intra AS (SELECT sa AS source, CAST(count(*) AS BIGINT) AS l_intra
                |          FROM lab WHERE sa = sb GROUP BY sa),
                |per AS (
                |  SELECT degs.source, coalesce(l_intra, 0) AS l_intra, d_sum,
                |         round(coalesce(l_intra, 0) / CAST(m AS DOUBLE)
                |               - pow(d_sum / (2.0 * m), 2), 6) AS contribution
                |  FROM degs LEFT JOIN intra ON degs.source = intra.source
                |  CROSS JOIN m)
                |SELECT source, l_intra, d_sum, contribution,
                |       (SELECT round(sum(contribution), 4) FROM per) AS q_total
                |FROM per ORDER BY source""".stripMargin)),

      // neighborhood-Jaccard link prediction on the dup graph:
      // |N(u)∩N(v)| / |N(u)∪N(v)| for NON-adjacent pairs — the same
      // wedge join as Adamic-Adar (common neighbors enumerated via
      // the shared-neighbor key, never a node cross product) with
      // both endpoint degrees broadcast in; union size by
      // inclusion-exclusion, so one grouped count per pair suffices
      "graph_jaccard_nbrs" -> Q(
        (s, d) => {
          val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false)
          val nb = e0.select(col("da").as("z"), col("db").as("x"))
            .union(e0.select(col("db").as("z"), col("da").as("x")))
            .localCheckpoint(eager = false)
          val deg = nb.groupBy(col("x").as("node")).agg(count(lit(1)).as("dg"))
          nb.select(col("z"), col("x").as("u"))
            .join(nb.select(col("z"), col("x").as("v")), "z")
            .filter(col("u") < col("v"))
            .groupBy("u", "v")
            .agg(count(lit(1)).as("common"))
            .join(broadcast(deg.select(col("node").as("u"), col("dg").as("du"))), "u")
            .join(broadcast(deg.select(col("node").as("v"), col("dg").as("dv"))), "v")
            .join(e0, col("u") === col("da") && col("v") === col("db"), "left_anti")
            .select(col("u"), col("v"), col("common"),
              round(col("common") /
                (col("du") + col("dv") - col("common")).cast("double"), 4).as("jac"))
            .orderBy(col("jac").desc, col("u"), col("v"))
            .limit(20)
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |nb AS (SELECT da AS z, db AS x FROM e0
                |       UNION ALL SELECT db AS z, da AS x FROM e0),
                |deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS dg
                |        FROM nb GROUP BY x),
                |w AS (SELECT a.x AS u, b.x AS v
                |      FROM nb a JOIN nb b ON a.z = b.z AND a.x < b.x),
                |sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common
                |       FROM w GROUP BY u, v),
                |j AS (
                |  SELECT u, v, common,
                |         round(common / CAST(du.dg + dv.dg - common AS DOUBLE), 4) AS jac
                |  FROM sc JOIN deg du ON sc.u = du.node
                |          JOIN deg dv ON sc.v = dv.node
                |  WHERE NOT EXISTS (SELECT 1 FROM e0
                |                    WHERE e0.da = sc.u AND e0.db = sc.v))
                |SELECT u, v, common, jac FROM j
                |ORDER BY jac DESC, u, v LIMIT 20""".stripMargin)),

      // embedding-space anisotropy (Ethayarajh 2019): the average
      // cosine between DISTINCT vectors, computed WITHOUT a pair join
      // via the exact identity Σᵢⱼ v̂ᵢ·v̂ⱼ = ‖Σv̂‖², so
      // avg_cos = (‖Σv̂‖² − n)/(n(n−1)) — two linear passes (per-vector
      // norm, per-dimension sums) replace the O(n²) pair scan, which
      // is what makes the diagnostic runnable on a 100 TB embedding
      // table. Also reports the centroid norm (the "common direction"
      // magnitude a whitening pass would remove)
      "emb_anisotropy" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.l2Norm
          val f = Tables.embeddings(s, d)
            .filter(col("embedding").isNotNull)
            .select(col("vec_id"), col("embedding"),
              l2Norm(col("embedding")).as("nrm"))
            .filter(col("nrm") > 0)
          val dims = f.select(col("nrm"), posexplode(col("embedding")).as(Seq("i", "x")))
            .groupBy("i")
            .agg(sum(col("x").cast("double")).as("sx"),
                 sum(col("x").cast("double") / col("nrm")).as("su"))
          val nRow = f.agg(count(lit(1)).as("n"),
                           round(avg("nrm"), 6).as("mean_norm"))
          dims.crossJoin(broadcast(nRow))
            .agg(max(col("n")).as("n"), max(col("mean_norm")).as("mean_norm"),
              round(sqrt(sum(pow(col("sx") / col("n"), 2))), 6).as("centroid_norm"),
              round((sum(col("su") * col("su")) - max(col("n")))
                / (max(col("n")) * (max(col("n")) - lit(1.0))), 6)
                .as("avg_pairwise_cos"))
        },
        Some("""WITH f AS (
               |  SELECT vec_id, embedding::DOUBLE[] AS emb,
               |         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
               |  FROM embeddings WHERE embedding IS NOT NULL),
               |g AS (SELECT * FROM f WHERE nrm > 0),
               |d AS (SELECT nrm, generate_subscripts(emb, 1) AS i, unnest(emb) AS x FROM g),
               |s AS (SELECT i, sum(x) AS sx, sum(x / nrm) AS su FROM d GROUP BY i),
               |t AS (SELECT CAST(count(*) AS BIGINT) AS n, round(avg(nrm), 6) AS mean_norm
               |      FROM g)
               |SELECT n, mean_norm,
               |       round(sqrt(sum(pow(sx / n, 2))), 6) AS centroid_norm,
               |       round((sum(su * su) - n) / (n * (n - 1.0)), 6) AS avg_pairwise_cos
               |FROM s CROSS JOIN t
               |GROUP BY n, mean_norm""".stripMargin)),

      // Johnson–Lindenstrauss sign-projection recall: project 64-d
      // embeddings to 16-d with a DETERMINISTIC ±1 matrix (hash of
      // (dim,j) — no RNG state to ship to executors), then measure
      // top-10 recall of projected cosine search against full-dim
      // brute force for one probe. The projection is a pure map over a
      // driver-built literal sign matrix (whole-stage codegen, zero
      // shuffle); projected coordinates round to 6dp so both engines
      // rank identically.
      // The dimension-REDUCTION path of the vec_ quantization family
      // (matryoshka truncates, PQ codes — JL rotates mass into every
      // kept coordinate)
      "ann_jl_recall" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          import org.apache.spark.unsafe.types.UTF8String
          // the ±1 matrix is CONSTANT (hash of (dim,j) only): build its
          // 16×64 entries ONCE on the driver with the same md5 the
          // oracle uses and embed them as a literal, so the projection
          // is a pure whole-stage-codegen map — no explode fan-out, no
          // shuffle. (The exploded formulation pushed 64·16 rows per
          // vector through a hash + groupBy: 34 s at 5M vectors on
          // local[16]; this one is scan-bound at 1.6 s.)
          val sgn: IndexedSeq[IndexedSeq[Double]] = (0 until 16).map { j =>
            (0 until 64).map { i =>
              if (graft.functions.Md5Hash.hash60(
                UTF8String.fromString(s"jl:$i:$j")) % 2 == 0) 1.0 else -1.0
            }
          }
          val sgnLit = array(sgn.map(row => array(row.map(lit): _*)): _*)
          val e = Tables.embeddings(s, d)
          val proj = e.select(col("vec_id"),
            transform(sequence(lit(0), lit(15)), j =>
              round(aggregate(
                zip_with(col("embedding"), element_at(sgnLit, j + lit(1)),
                  (x, sg) => x.cast("double") * sg),
                lit(0.0), (acc, v) => acc + v), 6)).as("p"))
            .localCheckpoint(eager = false) // probe + corpus both read it
          val qF = e.filter(col("vec_id") === 7).select(col("embedding").as("qe"))
          val topFull = e.crossJoin(broadcast(qF)).filter(col("vec_id") =!= 7)
            .select(col("vec_id"), score(col("embedding"), col("qe")).as("sc"))
            .orderBy(col("sc").desc, col("vec_id")).limit(10)
          val qP = proj.filter(col("vec_id") === 7).select(col("p").as("qp"))
          val topProj = proj.crossJoin(broadcast(qP)).filter(col("vec_id") =!= 7)
            .select(col("vec_id"), score(col("p"), col("qp")).as("sp"))
            .orderBy(col("sp").desc, col("vec_id")).limit(10)
          topFull.join(topProj, "vec_id")
            .agg(count(lit(1)).as("n_overlap"))
            .select(lit(10L).as("k"), col("n_overlap"),
              round(col("n_overlap") / 10.0, 2).as("recall"))
        },
        Some("""WITH dims AS (
               |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               |         CAST(unnest(embedding) AS DOUBLE) AS x
               |  FROM embeddings),
               |pj AS (
               |  SELECT vec_id, j,
               |         round(sum(x * CASE WHEN (('0x' || substr(md5('jl:' || i || ':' || j), 1, 15))::BIGINT % 2) = 0
               |                        THEN 1.0 ELSE -1.0 END), 6) AS pj
               |  FROM dims CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)
               |  GROUP BY vec_id, j),
               |pnrm AS (SELECT vec_id, sqrt(sum(pj * pj)) AS nr FROM pj GROUP BY vec_id),
               |q AS (SELECT j, pj AS qj FROM pj WHERE vec_id = 7),
               |qn AS (SELECT nr AS qnr FROM pnrm WHERE vec_id = 7),
               |full_sc AS (
               |  SELECT e.vec_id,
               |         round(list_dot_product(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) /
               |               (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))) *
               |                sqrt(list_sum(list_transform(qe.embedding::DOUBLE[], x -> x * x)))), 6) AS sc
               |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 7) qe
               |  WHERE e.vec_id <> 7),
               |top_full AS (SELECT vec_id FROM full_sc ORDER BY sc DESC, vec_id LIMIT 10),
               |proj_sc AS (
               |  SELECT p.vec_id,
               |         round(sum(p.pj * q.qj) / (pnrm.nr * qn.qnr), 6) AS sp
               |  FROM pj p JOIN q ON p.j = q.j
               |  JOIN pnrm ON p.vec_id = pnrm.vec_id
               |  CROSS JOIN qn
               |  WHERE p.vec_id <> 7
               |  GROUP BY p.vec_id, pnrm.nr, qn.qnr),
               |top_proj AS (SELECT vec_id FROM proj_sc ORDER BY sp DESC, vec_id LIMIT 10)
               |SELECT CAST(10 AS BIGINT) AS k,
               |       CAST(count(*) AS BIGINT) AS n_overlap,
               |       round(count(*) / 10.0, 2) AS recall
               |FROM top_full JOIN top_proj USING (vec_id)""".stripMargin)),

      // Neyman allocation of a 100-doc evaluation budget across
      // language strata: n_h ∝ N_h·σ_h (token-count σ) — sample more
      // where strata are big AND noisy, the design that minimizes
      // estimator variance at fixed budget. ONE grouped pass makes
      // the |langs|-row stats frame (checkpointed: the share, base,
      // and remainder columns all read it); integerization is
      // largest-remainder so the allocations sum EXACTLY to budget,
      // with the rank window over |langs| rows. Shares and remainders
      // round to 9 pre-compare so both engines hand out identical
      // top-ups.
      "samp_strat_alloc" -> Q(
        (s, d) => {
          val st = Tables.documents(s, d)
            .select(col("lang"),
              size(graft.text.TextPrimitives.tokens(col("text")))
                .cast("double").as("x"))
            .groupBy("lang")
            .agg(count(lit(1)).as("nh"),
                 round(stddev_samp(col("x")), 6).as("sd"))
          val tot = st.agg(round(sum(col("nh") * col("sd")), 6).as("t"))
          val a = st.crossJoin(broadcast(tot))
            // all-constant strata (t = 0): allocation undefined, NULL not ÷0
            .withColumn("share", when(col("t") === 0, lit(null).cast("double"))
              .otherwise(round(col("nh") * col("sd") / col("t"), 9)))
            .withColumn("base", floor(col("share") * 100).cast("long"))
            .withColumn("rem", round(col("share") * 100 - col("base"), 9))
            .localCheckpoint(eager = false) // read 2×: base total + top-up rank
          val sb = a.agg(sum("base").as("sb"))
          val wR = Window.orderBy(col("rem").desc, col("lang"))
          a.crossJoin(broadcast(sb))
            .withColumn("rk", row_number().over(wR))
            .select(col("lang"), col("nh").as("n_docs"), col("sd"),
              (col("base") + when(col("rk") <= lit(100) - col("sb"), 1L)
                .otherwise(0L)).as("alloc"))
            .orderBy("lang")
        },
        Some("""WITH st AS (
               |  SELECT lang, CAST(count(*) AS BIGINT) AS nh,
               |         round(stddev_samp(
               |           CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE)), 6) AS sd
               |  FROM documents GROUP BY lang),
               |tot AS (SELECT round(sum(nh * sd), 6) AS t FROM st),
               |a AS (SELECT lang, nh, sd,
               |             CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END AS share,
               |             CAST(floor(CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END * 100) AS BIGINT) AS base,
               |             round(CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END * 100
               |               - floor(CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END * 100), 9) AS rem
               |      FROM st, tot),
               |sb AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM a),
               |rk AS (SELECT a.*, row_number() OVER (ORDER BY rem DESC, lang) AS rk
               |       FROM a)
               |SELECT lang, nh AS n_docs, sd,
               |       base + CASE WHEN rk <= 100 - sb THEN 1 ELSE 0 END AS alloc
               |FROM rk, sb ORDER BY lang""".stripMargin)),

      // first-round BPE merge candidates: corpus-weighted adjacent
      // character-pair counts, top 20. The corpus collapses to the
      // DISTINCT-word table first (Heaps'-law bounded — the pair
      // explosion runs over vocabulary entries weighted by word
      // frequency, never over raw tokens), then a codegen'd HOF emits
      // each word's adjacent pairs and TakeOrdered bounds the report.
      "text_bpe_pairs" -> Q(
        (s, d) => {
          val words = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("w"))
            .groupBy("w").agg(count(lit(1)).as("wc"))
          words.filter(length(col("w")) >= 2)
            .select(col("wc"), explode(expr(
              "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
              .as("pair"))
            .groupBy("pair").agg(sum("wc").as("n"))
            .orderBy(col("n").desc, col("pair")).limit(20)
        },
        Some("""WITH w AS (
               |  SELECT t AS w, CAST(count(*) AS BIGINT) AS wc FROM (
               |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
               |    FROM documents)
               |  GROUP BY t),
               |p AS (
               |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i:i+1])) AS pair, wc
               |  FROM w WHERE len(w) >= 2)
               |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
               |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

      // vocabulary coverage curve: what fraction of the corpus token
      // MASS do the top-{10,100,1k,10k} types cover — the number that
      // sizes a tokenizer vocab. The vocab aggregate runs ONCE
      // (checkpointed: total mass + top-k both read it); the top-10k
      // is TakeOrdered-bounded so ranking never globally sorts the
      // Heaps'-bounded-but-large type table, and the four curve
      // points are conditional sums over those ≤10k rows stacked
      // into the report.
      "text_vocab_coverage" -> Q(
        (s, d) => {
          val vocab = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n"))
            .localCheckpoint(eager = false) // read 2×: total mass + top-k
          val tot = vocab.agg(sum("n").as("t"), count(lit(1)).as("nv"))
          val wTop = Window.orderBy(col("n").desc, col("tok"))
          val top = vocab.orderBy(col("n").desc, col("tok")).limit(10000)
            .withColumn("rank", row_number().over(wTop))
          val ks = Seq(10, 100, 1000, 10000)
          val aggs = ks.flatMap(k => Seq(
            sum(when(col("rank") <= k, col("n")).otherwise(0L)).as(s"m$k"),
            sum(when(col("rank") <= k, 1L).otherwise(0L)).as(s"c$k")))
          val stackArgs = ks
            .map(k => s"$k, c$k, round(CAST(m$k AS DOUBLE) / t, 4)").mkString(", ")
          top.crossJoin(broadcast(tot))
            .groupBy("t", "nv")
            .agg(aggs.head, aggs.tail: _*)
            .select(col("nv").as("n_vocab"),
              expr(s"stack(${ks.size}, $stackArgs) AS (k, in_vocab, coverage)"))
            .select("k", "in_vocab", "n_vocab", "coverage")
            .orderBy("k")
        },
        Some("""WITH vocab AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS n
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok),
               |tot AS (SELECT sum(n) AS t, CAST(count(*) AS BIGINT) AS nv FROM vocab),
               |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
               |        FROM vocab ORDER BY n DESC, tok LIMIT 10000)
               |SELECT k, CAST(sum(CASE WHEN rank <= k THEN 1 ELSE 0 END) AS BIGINT) AS in_vocab,
               |       nv AS n_vocab,
               |       round(CAST(sum(CASE WHEN rank <= k THEN n ELSE 0 END) AS DOUBLE) / t, 4) AS coverage
               |FROM top, tot, (VALUES (10), (100), (1000), (10000)) ks(k)
               |GROUP BY k, nv, t ORDER BY k""".stripMargin)),

      // Welch's unequal-variance t-test on document length (en vs de):
      // one grouped pass computes (n, mean, var) per group, then the
      // t statistic and Welch–Satterthwaite df come from a cross join
      // of two single-row frames — constant-size everything after the
      // scan, so the test costs one aggregate at any corpus size.
      "stat_welch_ttest" -> Q(
        (s, d) => {
          val g = Tables.documents(s, d)
            .filter(col("lang").isin("en", "de"))
            .groupBy("lang")
            .agg(count(lit(1)).cast("double").as("n"),
                 avg(col("n_chars").cast("double")).as("m"),
                 var_samp(col("n_chars").cast("double")).as("v"))
            .localCheckpoint(eager = false) // read twice (both groups)
          val a = g.filter(col("lang") === "en")
            .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
          val b = g.filter(col("lang") === "de")
            .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
          val se2 = col("va") / col("na") + col("vb") / col("nb")
          a.crossJoin(b).select(
            col("na").cast("long").as("n_en"),
            col("nb").cast("long").as("n_de"),
            round(col("ma") - col("mb"), 4).as("mean_diff"),
            round((col("ma") - col("mb")) / sqrt(se2), 4).as("t_stat"),
            round(pow(se2, 2) /
              (pow(col("va") / col("na"), 2) / (col("na") - 1)
               + pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 2).as("df"))
        },
        Some("""WITH g AS (
               |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
               |         avg(CAST(n_chars AS DOUBLE)) AS m,
               |         var_samp(CAST(n_chars AS DOUBLE)) AS v
               |  FROM documents WHERE lang IN ('en', 'de') GROUP BY lang),
               |a AS (SELECT n AS na, m AS ma, v AS va FROM g WHERE lang = 'en'),
               |b AS (SELECT n AS nb, m AS mb, v AS vb FROM g WHERE lang = 'de')
               |SELECT CAST(na AS BIGINT) AS n_en, CAST(nb AS BIGINT) AS n_de,
               |       round(ma - mb, 4) AS mean_diff,
               |       round((ma - mb) / sqrt(va/na + vb/nb), 4) AS t_stat,
               |       round(pow(va/na + vb/nb, 2)
               |         / (pow(va/na, 2) / (na - 1) + pow(vb/nb, 2) / (nb - 1)), 2) AS df
               |FROM a, b""".stripMargin)),

      // Cohen's kappa for the stopword language-ID against the true
      // lang label: chance-corrected agreement from the confusion
      // cells. The cell table is tiny (|langs|²), so po/pe/kappa are
      // cross joins of broadcast single-row aggregates; only the
      // per-doc prediction pass scales with the corpus.
      "stat_cohens_kappa" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val cells = TextAnalytics.languageId(docs)
            .join(docs.select(col("doc_id"), col("lang")), "doc_id")
            .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
            .localCheckpoint(eager = false) // read three times below
          val tot = cells.agg(sum("n").cast("double").as("nn"))
          val diag = cells.filter(col("lang") === col("pred_lang"))
            .agg(coalesce(sum("n"), lit(0L)).cast("double").as("nd"))
          val marg = cells.groupBy("lang").agg(sum("n").as("r"))
            .join(cells.groupBy("pred_lang").agg(sum("n").as("c")),
                  col("lang") === col("pred_lang"))
            .agg(coalesce(sum(col("r") * col("c")), lit(0L))
              .cast("double").as("rc"))
          val po = col("nd") / col("nn")
          val pe = col("rc") / (col("nn") * col("nn"))
          broadcast(tot).crossJoin(broadcast(diag)).crossJoin(broadcast(marg))
            .select(round(po, 4).as("po"), round(pe, 4).as("pe"),
                    round((po - pe) / (lit(1.0) - pe), 4).as("kappa"))
        },
        Some {
          def cnt(words: Seq[String]) =
            s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
              s"t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
          val Seq(en, es, de, fr) = TextAnalytics.Lexica.map { case (_, w) => cnt(w) }
          s"""WITH p AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN $en + $es + $de + $fr = 0 THEN 'und'
             |         WHEN $en >= greatest($es, $de, $fr) THEN 'en'
             |         WHEN $es >= greatest($de, $fr) THEN 'es'
             |         WHEN $de >= $fr THEN 'de'
             |         ELSE 'fr' END AS pred_lang
             |  FROM documents),
             |c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |      FROM p GROUP BY lang, pred_lang),
             |t AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM c),
             |dg AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS nd
             |       FROM c WHERE lang = pred_lang),
             |m AS (SELECT CAST(coalesce(sum(r * c2), 0) AS DOUBLE) AS rc FROM
             |        (SELECT lang, sum(n) AS r FROM c GROUP BY lang) ra JOIN
             |        (SELECT pred_lang, sum(n) AS c2 FROM c GROUP BY pred_lang) ca
             |        ON ra.lang = ca.pred_lang)
             |SELECT round(nd / nn, 4) AS po,
             |       round(rc / (nn * nn), 4) AS pe,
             |       round((nd / nn - rc / (nn * nn))
             |             / (1 - rc / (nn * nn)), 4) AS kappa
             |FROM t, dg, m""".stripMargin
        }),

      // Jensen-Shannon divergence between every source pair's unigram
      // distribution over the global top-100 vocabulary: the vocab
      // bound (TakeOrdered) caps the dense zero-filled frame at
      // |sources|·100 rows, and the pair join fans out on TERM, so
      // work is C(|sources|,2)·100 regardless of corpus size. The
      // corpus-mix distance behind domain-weighting decisions.
      "text_js_div" -> Q(
        (s, d) => {
          // (source, term) counts materialize once — three consumers
          // (vocab bound, per-source mass, probabilities) must not
          // each re-scan the corpus
          val tf = Tables.documents(s, d)
            .select(col("source"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("term"))
            .groupBy("source", "term").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false)
          val top = tf.groupBy("term").agg(sum("c").as("tot"))
            .orderBy(col("tot").desc, col("term")).limit(100).select("term")
          val v = tf.join(top, Seq("term"), "left_semi")
          val tots = v.groupBy("source").agg(sum("c").as("nt"))
          val p = v.join(broadcast(tots), "source")
            .select(col("source"), col("term"), (col("c") / col("nt")).as("p"))
          val dense = tots.select("source").crossJoin(broadcast(top))
            .join(p, Seq("source", "term"), "left")
            .na.fill(0.0, Seq("p"))
            .localCheckpoint(eager = false) // both pair-join sides read it
          dense.select(col("source").as("sa"), col("term"), col("p").as("pa"))
            .join(dense.select(col("source").as("sb"), col("term").as("termb"),
              col("p").as("pb")),
              col("term") === col("termb") && col("sa") < col("sb"))
            .withColumn("m", (col("pa") + col("pb")) / 2)
            .withColumn("kl",
              when(col("pa") > 0, col("pa") * log(col("pa") / col("m"))).otherwise(0.0) +
              when(col("pb") > 0, col("pb") * log(col("pb") / col("m"))).otherwise(0.0))
            .groupBy("sa", "sb")
            .agg(round(sum("kl") * lit(0.5 / math.log(2.0)), 4).as("jsd_bits"))
            .orderBy("sa", "sb")
        },
        Some("""WITH tf AS (
               |  SELECT source, tok AS term, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT source,
               |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY source, tok),
               |top AS (SELECT term FROM (SELECT term, sum(c) AS tot FROM tf GROUP BY term)
               |        ORDER BY tot DESC, term LIMIT 100),
               |v AS (SELECT tf.source, tf.term, tf.c FROM tf JOIN top USING (term)),
               |tots AS (SELECT source, sum(c) AS nt FROM v GROUP BY source),
               |p AS (SELECT source, term, c * 1.0 / nt AS p FROM v JOIN tots USING (source)),
               |dense AS (SELECT s.source, t.term, coalesce(p.p, 0.0) AS p
               |          FROM (SELECT source FROM tots) s CROSS JOIN top t
               |          LEFT JOIN p ON p.source = s.source AND p.term = t.term),
               |pr AS (SELECT a.source AS sa, b.source AS sb, a.p AS pa, b.p AS pb
               |       FROM dense a JOIN dense b ON a.term = b.term AND a.source < b.source)
               |SELECT sa, sb, round(sum(
               |    CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END +
               |    CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END)
               |  * 0.5 / ln(2), 4) AS jsd_bits
               |FROM pr GROUP BY sa, sb ORDER BY sa, sb""".stripMargin)),

      // mutual information + chi-square independence of (source, lang)
      // in ONE pass over the contingency cells: marginals are tiny
      // re-aggregations of the |S|·|L| cell frame, the dense grid
      // (zero cells included — chi² needs them) is a broadcast cross
      // of the marginals, and the fact table is scanned exactly once.
      "text_mi_chi2" -> Q(
        (s, d) => {
          // the |S|·|L| contingency frame materializes once; the four
          // consumers (marginals ×2, total, grid) are re-aggregations
          // of it, so the corpus is scanned exactly once
          val cell = Tables.documents(s, d)
            .groupBy("source", "lang").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false)
          val ms = cell.groupBy("source").agg(sum("c").as("cs"))
          val ml = cell.groupBy("lang").agg(sum("c").as("cl"))
          val tot = cell.agg(sum("c").as("n"))
          val dims = ms.agg(count(lit(1)).as("nsrc"))
            .crossJoin(ml.agg(count(lit(1)).as("nlang")))
          ms.crossJoin(ml)
            .join(cell, Seq("source", "lang"), "left").na.fill(0L, Seq("c"))
            .crossJoin(broadcast(tot))
            .withColumn("e", col("cs").cast("double") * col("cl") / col("n"))
            .agg(max("n").as("n"),
              sum((col("c") - col("e")) * (col("c") - col("e")) / col("e")).as("chi2"),
              sum(when(col("c") > 0,
                col("c") / col("n") * log(col("c").cast("double") * col("n")
                  / (col("cs").cast("double") * col("cl")))).otherwise(0.0)).as("mi"))
            .crossJoin(broadcast(dims))
            .select(col("n"), ((col("nsrc") - 1) * (col("nlang") - 1)).as("dof"),
              round(col("chi2"), 4).as("chi2"),
              round(col("mi") * lit(1.0 / math.log(2.0)), 6).as("mi_bits"))
        },
        Some("""WITH cell AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
               |              FROM documents GROUP BY source, lang),
               |ms AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cell GROUP BY source),
               |ml AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cell GROUP BY lang),
               |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
               |dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ms) AS nsrc,
               |                (SELECT CAST(count(*) AS BIGINT) FROM ml) AS nlang),
               |grid AS (SELECT ms.source, ml.lang, ms.cs, ml.cl, coalesce(cell.c, 0) AS c,
               |                CAST(ms.cs AS DOUBLE) * ml.cl / tot.n AS e, tot.n
               |         FROM ms CROSS JOIN ml
               |         LEFT JOIN cell ON cell.source = ms.source AND cell.lang = ml.lang
               |         CROSS JOIN tot)
               |SELECT max(n) AS n,
               |       (SELECT (nsrc - 1) * (nlang - 1) FROM dims) AS dof,
               |       round(sum((c - e) * (c - e) / e), 4) AS chi2,
               |       round(sum(CASE WHEN c > 0
               |                 THEN c * 1.0 / n * ln(CAST(c AS DOUBLE) * n
               |                        / (CAST(cs AS DOUBLE) * cl))
               |                 ELSE 0 END) / ln(2), 6) AS mi_bits
               |FROM grid""".stripMargin)),

      // reliability (calibration) bins for the quality score against
      // the exact-duplicate label: does low quality actually predict
      // duplication? Bins are width-0.1 on the score, the dup label
      // is md5(text) multiplicity (the dedup_exact key), and both
      // sides of the join shuffle on the HASH — never the text.
      "samp_reliability_bins" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val q = TextAnalytics.qualityScores(docs)
            .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
          val dupc = docs.groupBy(md5(col("text")).as("h"))
            .agg(count(lit(1)).as("nh"))
          q.join(dupc, "h")
            .withColumn("bin", least(floor(col("quality") * 10), lit(9L)))
            .groupBy("bin")
            .agg(count(lit(1)).as("n"),
                 round(avg(when(col("nh") > 1, 1.0).otherwise(0.0)), 4).as("dup_rate"),
                 round(avg("quality"), 4).as("avg_q"))
            .orderBy("bin")
        },
        Some(s"""WITH q AS (
                |  SELECT doc_id, md5(text) AS h,
                |         round((least(n_tok, 100) / 100.0) *
                |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |  FROM (
                |    SELECT doc_id, text, length(text) AS n_chars,
                |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |               t -> t IN ($stopList))) AS stop_cnt,
                |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |    FROM documents)),
                |dupc AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS nh
                |         FROM documents GROUP BY md5(text))
                |SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS bin,
                |       CAST(count(*) AS BIGINT) AS n,
                |       round(avg(CASE WHEN nh > 1 THEN 1.0 ELSE 0.0 END), 4) AS dup_rate,
                |       round(avg(quality), 4) AS avg_q
                |FROM q JOIN dupc USING (h)
                |GROUP BY bin ORDER BY bin""".stripMargin)),

      // per-source quantile normalization onto the GLOBAL distribution
      // (the cross-source score-calibration step: a value's per-source
      // ecdf is mapped to the smallest global value of ≥ that ecdf,
      // inverse-CDF type 1). Everything runs on (value → count)
      // histograms — the stat_gini values-never-rows bound — so the
      // windows and the bounded inequality join touch ≤ distinct-value
      // frames no matter the corpus size; the output is the |S|·|V|
      // mapping table a pipeline would broadcast back onto rows.
      "samp_quantile_norm" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(col("source"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"))
          val hs = t.groupBy("source", "x").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false) // three consumers below
          val ns = hs.groupBy("source").agg(sum("c").as("n_s"))
          val ws = Window.partitionBy("source").orderBy("x")
            .rowsBetween(Window.unboundedPreceding, 0)
          val src = hs.join(broadcast(ns), "source")
            .withColumn("ecdf_s", sum("c").over(ws) / col("n_s"))
          val hg = hs.groupBy("x").agg(sum("c").as("c"))
          val wg = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
          val glob = hg.crossJoin(broadcast(hg.agg(sum("c").as("n_g"))))
            .withColumn("ecdf_g", sum("c").over(wg) / col("n_g"))
            .select(col("x").as("gx"), col("ecdf_g"))
          src.join(broadcast(glob), col("ecdf_g") >= col("ecdf_s"))
            .groupBy("source", "x").agg(min("gx").as("q_x"))
            .orderBy("source", "x")
        },
        Some("""WITH t AS (
               |  SELECT source,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
               |  FROM documents),
               |hs AS (SELECT source, x, CAST(count(*) AS BIGINT) AS c
               |       FROM t GROUP BY source, x),
               |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM hs GROUP BY source),
               |src AS (SELECT hs.source, hs.x,
               |          CAST(sum(c) OVER (PARTITION BY hs.source ORDER BY x
               |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               |            / n_s AS ecdf_s
               |        FROM hs JOIN ns USING (source)),
               |hg AS (SELECT x, CAST(sum(c) AS BIGINT) AS c FROM hs GROUP BY x),
               |ng AS (SELECT CAST(sum(c) AS BIGINT) AS n_g FROM hg),
               |gq AS (SELECT x AS gx,
               |           CAST(sum(c) OVER (ORDER BY x
               |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               |             / n_g AS ecdf_g
               |         FROM hg, ng)
               |SELECT source, x, CAST(min(gx) AS BIGINT) AS q_x
               |FROM src JOIN gq ON ecdf_g >= ecdf_s
               |GROUP BY source, x ORDER BY source, x""".stripMargin)),

      // deterministic shard manifest: hash-assign every doc to one of
      // 16 shards (content-stable — re-runs, appends and repartitions
      // never move a doc) and emit the per-shard stats a downstream
      // tokenizer/loader plans against (doc count, byte and token
      // totals, id range). One grouped agg; the manifest IS the
      // contract a 100 TB export hands to the training job.
      "pipe_shard_manifest" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          Tables.documents(s, d)
            .withColumn("shard",
              md5Long(concat(lit("shard:"), col("doc_id").cast("string"))) % 16)
            .groupBy("shard")
            .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_bytes"),
                 sum(size(graft.text.TextPrimitives.tokens(col("text")))
                   .cast("long")).as("n_tokens"),
                 min("doc_id").as("min_id"), max("doc_id").as("max_id"))
            .orderBy("shard")
        },
        Some("""SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |         % 16 AS shard,
               |       CAST(count(*) AS BIGINT) AS n_docs,
               |       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
               |       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT)
               |         AS n_tokens,
               |       min(doc_id) AS min_id, max(doc_id) AS max_id
               |FROM documents GROUP BY shard ORDER BY shard""".stripMargin)),

      // epoch-aware source mixing: smaller sources repeat (epochs =
      // sqrt(max/n_s), the temperature idiom), larger ones pass once.
      // Full repeats explode map-side from a per-source broadcast
      // factor; the fractional epoch admits each doc by deterministic
      // hash — so the emitted corpus is reproducible row-for-row and
      // the plan is scan → broadcast-join → explode, no shuffle of
      // the fact table at all before the final count.
      "pipe_epoch_mix" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val docs = Tables.documents(s, d)
          val per = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
            .localCheckpoint(eager = false) // read by eps AND its max
          val eps = per.crossJoin(broadcast(per.agg(max("n_s").as("mx"))))
            .withColumn("ep", sqrt(col("mx").cast("double") / col("n_s")))
          docs.join(broadcast(eps), "source")
            .withColumn("n_copies", floor(col("ep")) +
              when(pmod(md5Long(concat(col("doc_id").cast("string"), lit("#mix"))),
                  lit(10000L))
                < ((col("ep") - floor(col("ep"))) * 10000).cast("long"), 1L)
                .otherwise(0L))
            .select(col("source"), col("n_s"), col("ep"),
              explode(sequence(lit(1L), col("n_copies"))).as("copy"))
            .groupBy("source")
            .agg(max("n_s").as("n_docs"), round(max("ep"), 4).as("epochs"),
                 count(lit(1)).as("n_emitted"))
            .orderBy("source")
        },
        Some("""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
               |             FROM documents GROUP BY source),
               |mx AS (SELECT max(n_s) AS mx FROM per),
               |eps AS (SELECT source, n_s, sqrt(CAST(mx AS DOUBLE) / n_s) AS ep
               |        FROM per, mx),
               |extra AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_extra
               |          FROM documents d JOIN eps USING (source)
               |          WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '#mix'), 1, 15))::BIGINT
               |                  % 10000
               |                < CAST((ep - floor(ep)) * 10000 AS BIGINT)
               |          GROUP BY d.source)
               |SELECT source, n_s AS n_docs, round(ep, 4) AS epochs,
               |       CAST(n_s * floor(ep) + coalesce(n_extra, 0) AS BIGINT) AS n_emitted
               |FROM eps LEFT JOIN extra USING (source) ORDER BY source""".stripMargin)),

      // filter-attrition funnel: the per-stage report every curation
      // run ships with — docs and tokens surviving each cumulative
      // quality gate (length → min tokens → stopword ratio → exact
      // dedup). ONE scan computes every per-doc flag, the dedup gate
      // is a keep-first window over md5(text) (hash-partitioned, never
      // global), and the 5-row report is a single aggregate unpivoted
      // with stack() — adding a stage costs two sum() columns, not a
      // rescan, at any corpus size.
      "pipe_filter_attrition" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val flagged = Tables.documents(s, d)
            .select(col("doc_id"), col("n_chars"),
              size(t).cast("long").as("n_tok"),
              size(filter(t, x => x.isin(TextAnalytics.Stopwords: _*)))
                .cast("long").as("stop_cnt"),
              md5(col("text")).as("h"))
            .withColumn("rn",
              row_number().over(Window.partitionBy("h").orderBy("doc_id")))
            .withColumn("c1", col("n_chars") >= 150)
            .withColumn("c2", col("c1") && col("n_tok") >= 40)
            .withColumn("c3",
              col("c2") && col("stop_cnt") * lit(1.0) >= col("n_tok") * lit(0.05))
            .withColumn("c4", col("c3") && col("rn") === 1)
          def dt(c: Column, i: Int) = Seq(
            sum(when(c, 1L).otherwise(0L)).as(s"d$i"),
            sum(when(c, col("n_tok")).otherwise(0L)).as(s"t$i"))
          val stageCols = Seq(count(lit(1)).as("d0"), sum("n_tok").as("t0")) ++
            dt(col("c1"), 1) ++ dt(col("c2"), 2) ++
            dt(col("c3"), 3) ++ dt(col("c4"), 4)
          flagged.agg(stageCols.head, stageCols.tail: _*)
            .select(expr(
              """stack(5,
                |  CAST(0 AS BIGINT), 'raw',            d0, t0,
                |  CAST(1 AS BIGINT), 'len_ge_150',     d1, t1,
                |  CAST(2 AS BIGINT), 'tok_ge_40',      d2, t2,
                |  CAST(3 AS BIGINT), 'stop_ratio_5pc', d3, t3,
                |  CAST(4 AS BIGINT), 'exact_dedup',    d4, t4
                |) AS (stage_no, stage, docs, tokens)""".stripMargin))
            .orderBy("stage_no")
        },
        Some {
          val stop = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH f AS (
             |  SELECT doc_id, n_chars,
             |    len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |        t -> t IN ($stop))) AS stop_cnt,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents),
             |c AS (SELECT n_tok,
             |        n_chars >= 150 AS c1,
             |        n_chars >= 150 AND n_tok >= 40 AS c2,
             |        n_chars >= 150 AND n_tok >= 40
             |          AND stop_cnt * 1.0 >= n_tok * 0.05 AS c3,
             |        n_chars >= 150 AND n_tok >= 40
             |          AND stop_cnt * 1.0 >= n_tok * 0.05 AND rn = 1 AS c4
             |      FROM f)
             |SELECT CAST(0 AS BIGINT) AS stage_no, 'raw' AS stage,
             |       CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_tok) AS BIGINT) AS tokens
             |FROM c
             |UNION ALL SELECT 1, 'len_ge_150', CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c1 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |UNION ALL SELECT 2, 'tok_ge_40', CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c2 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |UNION ALL SELECT 3, 'stop_ratio_5pc', CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c3 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |UNION ALL SELECT 4, 'exact_dedup', CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c4 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |ORDER BY stage_no""".stripMargin
        }),

      "emb_norm_invariant" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.sqNorm
          graft.embed.HashEmbedder.embedDocs(Tables.documents(s, d), "doc_id", "text", 64)
            .filter(abs(sqrt(sqNorm(col("embedding"))) - 1.0) < 1e-9)
            .agg(count(lit(1)).as("n"))
        },
        Some("SELECT CAST(count(*) AS BIGINT) AS n FROM documents")),

      // the production-shaped inference path (batched mapPartitions
      // through the JVM-pooled EmbedClient — the reference's external
      // vectorizer integration, document_ingestor.py:605) running the
      // flagship search flow. Same oracle as text_search_e2e: the
      // deterministic raw-sum client makes the service path bit-equal
      // to the distributed groupBy embedder, so one SQL pins BOTH
      // physical paths to the same result — swapping transports
      // (in-plan agg ↔ external service) cannot change any answer
      "emb_service_search" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val svc = new graft.embed.ServiceEmbedder(
            new graft.embed.HashEmbedClientFactory(64, normalize = false),
            dim = 64, batchSize = 32)
          val raw = svc.embedDocs(Tables.documents(s, d), "doc_id", "text")
          val q = raw.filter(col("doc_id") === 3).select(col("embedding").as("qv"))
          raw.crossJoin(broadcast(q))
            .select(col("doc_id"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("doc_id"))
            .limit(10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3)
             |SELECT doc_id,
             |       round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                  ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |FROM (SELECT s.doc_id, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |      FROM sums s, q)
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
        }))
  }

  // ---------------------------------------------------------------
  // ANN: brute force / LSH / IVF (SURVEY §2 #14–16)
  // ---------------------------------------------------------------

  private val sqlCos = "round(list_cosine_similarity(%s, %s), 6) + 0.0"

  private val annQ: Seq[(String, Q)] = {
    import graft.ann.Ann
    Seq(
      "ann_topk_batch" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val q = emb.filter(col("vec_id") <= 4)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          Ann.bruteForceTopK(emb, q, 5)
        },
        Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               |           FROM embeddings WHERE vec_id <= 4),
               |sc AS (SELECT qid, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |       FROM embeddings e, q WHERE e.vec_id <> qid)
               |SELECT qid, vec_id, score, rnk FROM (
               |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
               |  FROM sc)
               |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

      // exact k-NN graph (k=5) with the two statistics SNN-style
      // clustering and SemDeDup audits read off it: per node, how many
      // of its top-5 are MUTUAL (it is also in their top-5) and how
      // many share its label (homophily). Edges come from the TopK
      // partial aggregate (map-side bounded, no window over the
      // pairwise set); mutuality is a self-equi-join on the 5·n edge
      // list, label joins broadcast the (vec_id,label) dim. At corpus
      // scale the pairwise stage swaps for the LSH/IVF-bucketed
      // candidate generation already in ann/Ann.scala — the graph
      // statistics are unchanged downstream of the edge list.
      "ann_knn_graph" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          // dense kernel: all-vectors-as-queries is the case where the
          // BNLJ row-per-pair cost dominates (AnnSpec pins row-equality
          // with bruteForceTopK; ~10× at the 2000-query oracle corpus)
          val edges = Ann.bruteForceTopKDense(emb,
              emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), 5)
            .select(col("qid"), col("vec_id").as("nid"))
            .localCheckpoint(eager = false) // read 3×: mutual (both sides) + homophily
          val mutual = edges.as("a")
            .join(edges.as("b"),
              col("a.qid") === col("b.nid") && col("a.nid") === col("b.qid"))
            .groupBy(col("a.qid")).agg(count(lit(1)).as("n_mutual"))
          val lbl = emb.select(col("vec_id"), col("label"))
          val homo = edges
            .join(broadcast(lbl.select(col("vec_id").as("qid"),
                                       col("label").as("ql"))), "qid")
            .join(broadcast(lbl.select(col("vec_id").as("nid"),
                                       col("label").as("nl"))), "nid")
            .groupBy("qid")
            .agg(sum(when(col("ql") === col("nl"), 1).otherwise(0))
              .as("n_same_label"))
          homo.join(mutual, Seq("qid"), "left")
            .select(col("qid").as("vec_id"), col("n_same_label"),
                    coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
            .orderBy("vec_id")
        },
        Some("""WITH sc AS (
               |  SELECT q.vec_id AS qid, e.vec_id AS nid,
               |         round(list_cosine_similarity(e.embedding::DOUBLE[],
               |               q.embedding::DOUBLE[]), 6) + 0.0 AS score
               |  FROM embeddings e, embeddings q WHERE e.vec_id <> q.vec_id),
               |ed AS (SELECT qid, nid FROM (
               |    SELECT *, row_number() OVER (PARTITION BY qid
               |           ORDER BY score DESC, nid) AS rnk FROM sc)
               |  WHERE rnk <= 5),
               |mu AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_mutual
               |       FROM ed a JOIN ed b ON a.qid = b.nid AND a.nid = b.qid
               |       GROUP BY a.qid),
               |ho AS (SELECT qid,
               |         CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END) AS BIGINT)
               |           AS n_same_label
               |       FROM ed JOIN embeddings ql ON ed.qid = ql.vec_id
               |               JOIN embeddings nl ON ed.nid = nl.vec_id
               |       GROUP BY qid)
               |SELECT ho.qid AS vec_id, n_same_label,
               |       CAST(coalesce(n_mutual, 0) AS BIGINT) AS n_mutual
               |FROM ho LEFT JOIN mu USING (qid) ORDER BY vec_id""".stripMargin)),

      // MMR diversified re-ranking (λ=0.5): relevant-but-diverse top-5
      // out of a top-20 cosine pool — the greedy loop is a pure
      // Catalyst HOF over the one packed candidate array
      // (ann/Mmr.scala); the oracle unrolls the same 5 greedy steps as
      // chained CTEs with identical rounding and id tie-breaks
      "ann_mmr_rerank" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
          graft.ann.Mmr.rerank(emb.filter(col("vec_id") =!= 0), q, 20, 5, 0.5)
        },
        Some(
          s"""WITH qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
             |cand AS (SELECT vec_id,
             |                round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) + 0.0 AS sim,
             |                embedding::DOUBLE[] AS emb
             |         FROM embeddings, qv WHERE vec_id <> 0
             |         ORDER BY sim DESC, vec_id LIMIT 20),
             |sel0 AS (SELECT vec_id, sim, emb, 0 AS rank FROM cand WHERE false),
             |${mmrUnrolledSql(5)}
             |SELECT CAST(rank AS BIGINT) AS rank, vec_id, sim FROM sel5 ORDER BY rank""".stripMargin
        )),

      // greedy k-center coreset (farthest-point traversal) over a
      // bounded pool — the diverse-subset primitive for curation.
      // Same HOF-on-one-packed-array shape as MMR: only the pool scan
      // grows with data; the oracle unrolls the identical greedy
      "samp_coreset" -> Q(
        (s, d) => graft.ann.Coreset.kCenter(
          Tables.embeddings(s, d).filter(col("vec_id") < 100), 6),
        Some(s"""WITH cand AS (SELECT vec_id, embedding::DOUBLE[] AS emb
               |              FROM embeddings WHERE vec_id < 100),
               |sel1 AS (SELECT vec_id, emb, 1 AS rank FROM cand
               |         ORDER BY vec_id LIMIT 1),
               |${kcenterUnrolledSql(6)}
               |SELECT CAST(rank AS BIGINT) AS rank, vec_id
               |FROM sel6 ORDER BY rank""".stripMargin)),

      // served from the bucket-PARTITIONED materialized index: the
      // probe neighborhood equi-joins the partition column, so the
      // measured plan prunes unprobed buckets (plan-guarded)
      "ann_lsh_bucketed" -> Q(
        (s, d) => graft.ann.AnnIndex.lshTopKIndexed(s, d, Seq(0L, 1L, 2L),
          nPlanes = 6, dim = 64, k = 3),
        Some("""WITH planes AS (
               |  SELECT p, list_transform(generate_series(0, 63), dd ->
               |    (('0x' || substr(md5(concat_ws('_', 'pl', p, dd)), 1, 15))::BIGINT % 2001 - 1000) / 1000.0) AS w
               |  FROM generate_series(0, 5) t(p)),
               |sig AS (
               |  SELECT vec_id,
               |         CAST(sum(CASE WHEN list_inner_product(embedding::DOUBLE[], w) > 0
               |                       THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
               |  FROM embeddings, planes GROUP BY vec_id),
               |q AS (SELECT s.vec_id AS qid, e.embedding::DOUBLE[] AS qv, s.bucket AS qb
               |      FROM sig s JOIN embeddings e USING (vec_id) WHERE s.vec_id IN (0, 1, 2)),
               |cand AS (
               |  SELECT qid, e.vec_id,
               |         round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id, q
               |  WHERE e.vec_id <> qid AND bit_count(xor(s.bucket, qb)) <= 1)
               |SELECT qid, vec_id, score, rnk FROM (
               |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
               |  FROM cand)
               |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin)),

      // contrastive hard-negative mining: for each anchor, the
      // highest-cosine vector with a DIFFERENT label — the negative a
      // contrastive/triplet trainer wants. Same bounded TopK partial
      // aggregate as batched search (k=1 row per partition per anchor)
      "emb_hard_negatives" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val anchors = emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                    col("label").as("qlab"))
          val agg = graft.ops.TopK.topk(1)
          emb.crossJoin(broadcast(anchors))
            .filter(col("label") =!= col("qlab"))
            .select(col("qid"),
              graft.functions.VectorFunctions.score(col("embedding"), col("qv")).as("score"),
              col("vec_id"))
            .groupBy("qid")
            .agg(agg(col("score"), col("vec_id")).as("top"))
            .select(col("qid"), explode(col("top")))
            .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"))
            .orderBy("qid")
        },
        Some("""WITH a AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS qlab
               |           FROM embeddings WHERE vec_id < 10),
               |sc AS (SELECT qid, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |       FROM embeddings e, a WHERE e.label <> a.qlab)
               |SELECT qid, vec_id, score FROM (
               |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
               |  FROM sc)
               |WHERE rn = 1 ORDER BY qid""".stripMargin)),

      // contrastive TRIPLET mining (anchor, hardest positive, hardest
      // negative): pos = least-similar same-label (the pair the model
      // must pull together), neg = most-similar cross-label (the pair
      // it must push apart). Arg-min/max via struct-ordered min/max
      // aggregates — deterministic ties (score, then id), single scan,
      // map-side partials; anchors broadcast
      "emb_triplets" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val anchors = emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                    col("label").as("qlab"))
          val scored = emb.crossJoin(broadcast(anchors))
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("qlab"), col("label"), col("vec_id"),
              graft.functions.VectorFunctions.score(col("embedding"), col("qv")).as("sc"))
          val pos = scored.filter(col("label") === col("qlab"))
            .groupBy("qid").agg(min(struct(col("sc"), col("vec_id"))).as("p"))
            .select(col("qid"), col("p.vec_id").as("pos_id"),
                    col("p.sc").as("pos_score"))
          val neg = scored.filter(col("label") =!= col("qlab"))
            .groupBy("qid")
            .agg(max(struct(col("sc"), (-col("vec_id")).as("nid"))).as("n"))
            .select(col("qid"), (-col("n.nid")).as("neg_id"),
                    col("n.sc").as("neg_score"))
          pos.join(neg, "qid").orderBy("qid")
        },
        Some("""WITH a AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS qlab
               |           FROM embeddings WHERE vec_id < 10),
               |sc AS (SELECT qid, qlab, e.label, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS sc
               |       FROM embeddings e, a WHERE e.vec_id <> qid),
               |p AS (SELECT qid, vec_id AS pos_id, sc AS pos_score FROM (
               |        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc ASC, vec_id ASC) AS rn
               |        FROM sc WHERE label = qlab) WHERE rn = 1),
               |n AS (SELECT qid, vec_id AS neg_id, sc AS neg_score FROM (
               |        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id ASC) AS rn
               |        FROM sc WHERE label <> qlab) WHERE rn = 1)
               |SELECT qid, pos_id, pos_score, neg_id, neg_score
               |FROM p JOIN n USING (qid) ORDER BY qid""".stripMargin)),

      // embedding analytics: per-label centroid + intra-cluster
      // cohesion (training-data quality / drift monitoring)
      "emb_label_cohesion" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.cosineSim
          val emb = Tables.embeddings(s, d)
          val dims = emb.select(col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          val cent = dims.groupBy("label", "i")
            .agg(avg(col("x").cast("double")).as("ax"))
            .groupBy("label")
            .agg(transform(sort_array(collect_list(struct(col("i"), col("ax")))),
              e => e.getField("ax")).as("cv"))
          emb.join(broadcast(cent), "label")
            .select(col("label"), cosineSim(col("embedding"), col("cv")).as("c"))
            .groupBy("label")
            .agg(count(lit(1)).as("n"), round(avg("c"), 4).as("cohesion"))
            .orderBy("label")
        },
        Some("""WITH dims AS (
               |  SELECT label, unnest(embedding) AS x,
               |         generate_subscripts(embedding, 1) AS i
               |  FROM embeddings),
               |cent AS (
               |  SELECT label, list(ax ORDER BY i) AS cv FROM (
               |    SELECT label, i, avg(x) AS ax FROM dims GROUP BY label, i)
               |  GROUP BY label)
               |SELECT e.label, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(list_cosine_similarity(e.embedding::DOUBLE[], c.cv)), 4) AS cohesion
               |FROM embeddings e JOIN cent c ON e.label = c.label
               |GROUP BY e.label ORDER BY e.label""".stripMargin)),

      // centroid-based silhouette per label — cluster-quality audit
      // one level up from cohesion: a = cosine distance to OWN
      // centroid, b = distance to the NEAREST OTHER centroid,
      // s = (b−a)/max(a,b). The |labels|-row centroid table
      // broadcasts, so the per-point work is a broadcast cross join
      // (|rows|×|labels|) that never shuffles the embeddings; the
      // per-point scores are pinned to ×1e6 longs before the
      // per-label average so both engines accumulate identical
      // integers. Singleton corpora (no other label) score 0.
      "emb_silhouette" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.cosineSim
          val emb = Tables.embeddings(s, d)
          val dims = emb.select(col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          val cent = dims.groupBy("label", "i")
            .agg(avg(col("x").cast("double")).as("ax"))
            .groupBy("label")
            .agg(transform(sort_array(collect_list(struct(col("i"), col("ax")))),
              e => e.getField("ax")).as("cv"))
            .select(col("label").as("clabel"), col("cv"))
          val p = emb.crossJoin(broadcast(cent))
            .select(col("vec_id"), col("label"), col("clabel"),
              round(lit(1.0) - cosineSim(col("embedding"), col("cv")), 6)
                .as("dist"))
            .groupBy("vec_id", "label").agg(
              min(when(col("clabel") === col("label"), col("dist"))).as("a"),
              min(when(col("clabel") =!= col("label"), col("dist"))).as("b"))
          p.select(col("label"),
              when(col("a").isNull || col("b").isNull, lit(0L))
                .when(greatest(col("a"), col("b")) > 0,
                  round((col("b") - col("a"))
                    / greatest(col("a"), col("b")) * 1e6, 0).cast("long"))
                .otherwise(lit(0L)).as("s_l"))
            .groupBy("label").agg(count(lit(1)).as("n"),
              round(sum("s_l").cast("double") / count(lit(1)) / 1e6, 4)
                .as("silhouette"))
            .orderBy("label")
        },
        Some("""WITH dims AS (
               |  SELECT label, unnest(embedding) AS x,
               |         generate_subscripts(embedding, 1) AS i
               |  FROM embeddings),
               |cent AS (
               |  SELECT label AS clabel, list(ax ORDER BY i) AS cv FROM (
               |    SELECT label, i, avg(x) AS ax FROM dims GROUP BY label, i)
               |  GROUP BY label),
               |p AS (SELECT e.vec_id, e.label,
               |        min(CASE WHEN c.clabel = e.label THEN
               |          round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
               |          END) AS a,
               |        min(CASE WHEN c.clabel <> e.label THEN
               |          round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
               |          END) AS b
               |      FROM embeddings e, cent c GROUP BY e.vec_id, e.label),
               |s AS (SELECT label,
               |        CASE WHEN a IS NULL OR b IS NULL THEN 0
               |             WHEN greatest(a, b) > 0
               |             THEN CAST(round((b - a) / greatest(a, b) * 1000000)
               |                    AS BIGINT)
               |             ELSE 0 END AS s_l
               |      FROM p)
               |SELECT label, CAST(count(*) AS BIGINT) AS n,
               |       round(sum(s_l) * 1.0 / count(*) / 1000000.0, 4) AS silhouette
               |FROM s GROUP BY label ORDER BY label""".stripMargin)),

      // deterministic per-label balanced sampling (class rebalancing
      // for training sets)
      "samp_stratified" -> Q(
        (s, d) => graft.ops.Sampling.stratified(
            Tables.embeddings(s, d), "label", "vec_id", 20)
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("vec_id").as("sum_vid"))
          .orderBy("label"),
        Some("""SELECT label, CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(vec_id) AS BIGINT) AS sum_vid FROM (
               |  SELECT label, vec_id, row_number() OVER (
               |    PARTITION BY label
               |    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
               |             vec_id) AS rn
               |  FROM embeddings)
               |WHERE rn <= 20 GROUP BY label ORDER BY label""".stripMargin)),

      // per-dimension mean/spread of the embedding column — the
      // distribution-drift monitor for embedding pipelines
      // one matrix-free power-iteration step toward the top principal
      // direction: v' ∝ Σ_rows x·(x·v₀), v₀ = e₀ — distributed linear
      // algebra as a per-dimension sum aggregate (the Krylov/momentum
      // building block for drift monitoring without MLlib), rounded
      // before normalization so both engines normalize identical sums
      "emb_power_iter" -> Q(
        (s, d) => {
          val sums = Tables.embeddings(s, d)
            .select(posexplode(col("embedding")).as(Seq("i", "x")),
                    element_at(col("embedding"), 1).cast("double").as("x0"))
            .groupBy(col("i").cast("long").as("i"))
            .agg(round(sum(col("x").cast("double") * col("x0")), 4).as("sj"))
          val norm = sums.agg(round(sqrt(sum(col("sj") * col("sj"))), 4).as("nn"))
          sums.crossJoin(broadcast(norm))
            .select(col("i"), col("sj"), round(col("sj") / col("nn"), 6).as("vj"))
            .orderBy("i")
        },
        Some("""WITH sums AS (
               |  SELECT CAST(i - 1 AS BIGINT) AS i, round(sum(x * x0), 4) AS sj
               |  FROM (SELECT generate_subscripts(embedding, 1) AS i,
               |               CAST(unnest(embedding) AS DOUBLE) AS x,
               |               CAST(embedding[1] AS DOUBLE) AS x0
               |        FROM embeddings)
               |  GROUP BY i),
               |norm AS (SELECT round(sqrt(sum(sj * sj)), 4) AS nn FROM sums)
               |SELECT i, sj, round(sj / nn, 6) AS vj
               |FROM sums, norm ORDER BY i""".stripMargin)),

      "emb_dim_stats" -> Q(
        (s, d) => Tables.embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i").cast("long").as("i"))
          .agg(count(lit(1)).as("n"),
               round(avg(col("x").cast("double")), 6).as("mean"),
               round(stddev(col("x").cast("double")), 6).as("sd"))
          .orderBy("i"),
        Some("""SELECT CAST(i - 1 AS BIGINT) AS i, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(x), 6) AS mean, round(stddev_samp(x), 6) AS sd
               |FROM (SELECT generate_subscripts(embedding, 1) AS i,
               |             CAST(unnest(embedding) AS DOUBLE) AS x
               |      FROM embeddings)
               |GROUP BY i ORDER BY i""".stripMargin)),

      // embedding drift A/B: per-dimension mean shift between two
      // halves of the corpus (old batch vs new batch stand-in:
      // vec_id parity) — ONE conditional aggregate per dim; the
      // monitor a re-embedding rollout watches. Shift computed from
      // the ROUNDED means so both engines subtract identical values
      "emb_drift" -> Q(
        (s, d) => Tables.embeddings(s, d)
          .select((col("vec_id") % 2).cast("int").as("h"),
                  posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i").cast("long").as("i"))
          .agg(round(avg(when(col("h") === 0, col("x").cast("double"))), 6).as("mean_a"),
               round(avg(when(col("h") === 1, col("x").cast("double"))), 6).as("mean_b"))
          .withColumn("shift", round(col("mean_a") - col("mean_b"), 6))
          .orderBy("i"),
        Some("""SELECT CAST(i - 1 AS BIGINT) AS i,
               |       round(avg(CASE WHEN h = 0 THEN x END), 6) AS mean_a,
               |       round(avg(CASE WHEN h = 1 THEN x END), 6) AS mean_b,
               |       round(round(avg(CASE WHEN h = 0 THEN x END), 6)
               |             - round(avg(CASE WHEN h = 1 THEN x END), 6), 6) AS shift
               |FROM (SELECT CAST(vec_id % 2 AS INTEGER) AS h,
               |             generate_subscripts(embedding, 1) AS i,
               |             CAST(unnest(embedding) AS DOUBLE) AS x
               |      FROM embeddings)
               |GROUP BY i ORDER BY i""".stripMargin)),

      // per-dim z-score whitening (drift correction before indexing /
      // contrastive training): stats collapse to ONE broadcast array
      // row, the whitening is a per-row transform HOF — the corpus is
      // scanned once, never exploded through a shuffle (the oracle's
      // explode-join-regroup is the same math, not the same plan)
      "emb_whiten" -> Q(
        (s, d) => graft.embed.Whitening.whiten(Tables.embeddings(s, d))
          .select(col("vec_id"),
            element_at(col("z"), 1).as("z1"),
            element_at(col("z"), 2).as("z2"),
            round(sqrt(aggregate(col("z"), lit(0.0), (acc, v) => acc + v * v)), 6)
              .as("znorm"))
          .orderBy("vec_id"),
        Some("""WITH st AS (
               |  SELECT i, round(avg(x), 6) AS mean,
               |         round(coalesce(stddev_samp(x), 0.0), 6) AS sd
               |  FROM (SELECT generate_subscripts(embedding, 1) AS i,
               |               CAST(unnest(embedding) AS DOUBLE) AS x
               |        FROM embeddings)
               |  GROUP BY i),
               |z AS (
               |  SELECT e.vec_id, s.i,
               |         CASE WHEN s.sd = 0 THEN 0.0
               |              ELSE round((CAST(e.embedding[s.i] AS DOUBLE) - s.mean) / s.sd, 6)
               |         END AS z
               |  FROM embeddings e JOIN st s ON true)
               |SELECT vec_id,
               |       max(CASE WHEN i = 1 THEN z END) AS z1,
               |       max(CASE WHEN i = 2 THEN z END) AS z2,
               |       round(sqrt(sum(z * z)), 6) AS znorm
               |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

      // leave-one-out 1-NN label accuracy (embedding-quality metric
      // for labeled training data); integer counts — exact compare.
      // Scale shape: the QUERY sample (300 vecs) is the broadcast
      // side, the corpus is streamed once, and min-struct partial-
      // aggregates map-side — per-task state is O(|queries|), the
      // corpus never shuffles. At 100 TB the sample stays bounded
      // while the corpus side grows; ann/Ann.knn1Lsh is the spec'd
      // candidate-pruned variant when the query set is itself large.
      "emb_knn_accuracy" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val corpus = Tables.embeddings(s, d)
            .select(col("vec_id").as("vb"), col("embedding").as("eb"),
                    col("label").as("lb"))
          val queries = Tables.embeddings(s, d).filter(col("vec_id") < 300)
            .select(col("vec_id").as("va"), col("embedding").as("ea"),
                    col("label").as("la"))
          corpus.crossJoin(broadcast(queries))
            .filter(col("va") =!= col("vb"))
            .select(col("va"), col("la"), col("vb"), col("lb"),
              (lit(1.0) - score(col("ea"), col("eb"))).as("ns"))
            .groupBy("va", "la")
            // min of (1-score, vb, lb) == nearest by (score desc, vb)
            .agg(min(struct(col("ns"), col("vb"), col("lb"))).as("m"))
            .groupBy("la")
            .agg(count(lit(1)).as("n"),
                 sum(when(col("la") === col("m.lb"), 1L).otherwise(0L)).as("n_correct"))
            .orderBy("la")
        },
        Some("""WITH e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 300),
               |p AS (SELECT a.vec_id AS va, a.label AS la, b.label AS lb, b.vec_id AS vb,
               |             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) + 0.0 AS s
               |      FROM e a, embeddings b WHERE a.vec_id <> b.vec_id),
               |nn AS (SELECT la, lb FROM (
               |  SELECT *, row_number() OVER (PARTITION BY va ORDER BY s DESC, vb) AS rn
               |  FROM p) WHERE rn = 1)
               |SELECT la, CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
               |FROM nn GROUP BY la ORDER BY la""".stripMargin)),

      // int8 scalar quantization of the embedding column (integer
      // code outputs — the compare is exact by construction)
      // 1-bit binary quantization: sign bits packed into two 32-bit
      // halves (no sign-bit ambiguity across engines), Hamming
      // distance by xor+popcount — 64 dims in 8 bytes, a 32× scan-
      // I/O cut for the candidate pass of a binary-quantized index
      "vec_binary_quant" -> Q(
        (s, d) => {
          def pack(off: Int) = aggregate(
            sequence(lit(0), lit(31)), lit(0L),
            (acc, i) => acc + when(
              element_at(col("embedding"), i + lit(off + 1)) > 0,
              pow(lit(2.0), i).cast("long")).otherwise(lit(0L)))
          val packed = Tables.embeddings(s, d)
            .select(col("vec_id"), pack(0).as("lo"), pack(32).as("hi"))
          val q = packed.filter(col("vec_id") === 7)
            .select(col("lo").as("qlo"), col("hi").as("qhi"))
          packed.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= 7)
            .select(col("vec_id"),
              (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
               bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("ham"))
            .orderBy(col("ham"), col("vec_id")).limit(10)
        },
        Some("""WITH packed AS (
               |  SELECT vec_id,
               |    CAST(list_sum(list_transform(generate_series(0, 31),
               |      i -> CASE WHEN embedding[i + 1] > 0 THEN power(2.0, i) ELSE 0.0 END)) AS BIGINT) AS lo,
               |    CAST(list_sum(list_transform(generate_series(0, 31),
               |      i -> CASE WHEN embedding[i + 33] > 0 THEN power(2.0, i) ELSE 0.0 END)) AS BIGINT) AS hi
               |  FROM embeddings),
               |q AS (SELECT lo AS qlo, hi AS qhi FROM packed WHERE vec_id = 7)
               |SELECT vec_id,
               |       CAST(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)) AS BIGINT) AS ham
               |FROM packed, q WHERE vec_id <> 7
               |ORDER BY ham, vec_id LIMIT 10""".stripMargin)),

      // Matryoshka truncation: search on the 16-dim prefix of the
      // embedding (MRL-style nested representation) — 4× cheaper
      // candidate scoring with the same plan shape as full-dim search
      "vec_matryoshka" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val emb = Tables.embeddings(s, d)
            .select(col("vec_id"), slice(col("embedding"), 1, 16).as("e16"))
          val q = emb.filter(col("vec_id") === 7).select(col("e16").as("q16"))
          emb.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= 7)
            .select(col("vec_id"),
              (round(score(col("e16"), col("q16")), 6) + lit(0.0)).as("score"))
            .orderBy(col("score").desc, col("vec_id")).limit(10)
        },
        Some("""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS e16 FROM embeddings),
               |q AS (SELECT e16 AS q16 FROM e WHERE vec_id = 7)
               |SELECT vec_id, round(list_cosine_similarity(e16, q16), 6) + 0.0 AS score
               |FROM e, q WHERE vec_id <> 7
               |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)),

      "vec_scalar_quant" -> Q(
        (s, d) => graft.ann.Quant.encode(Tables.embeddings(s, d))
          .select(col("vec_id"),
                  aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
                  array_min(col("codes")).as("code_min"),
                  array_max(col("codes")).as("code_max"))
          .orderBy("vec_id"),
        Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               |                     unnest(embedding) AS x
               |              FROM embeddings),
               |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
               |      FROM dims GROUP BY i),
               |codes AS (SELECT vec_id,
               |                 CASE WHEN mx = mn THEN 0
               |                      ELSE CAST(round((x::DOUBLE - mn) / (mx - mn) * 255.0) AS BIGINT)
               |                 END AS c
               |          FROM dims JOIN p USING (i))
               |SELECT vec_id, CAST(sum(c) AS BIGINT) AS code_sum,
               |       CAST(min(c) AS BIGINT) AS code_min,
               |       CAST(max(c) AS BIGINT) AS code_max
               |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

      // quantization fidelity report: per-vector cosine between the
      // original embedding and its int8 round-trip (encode → decode) —
      // the acceptance gate before switching ANN candidate generation
      // to the 4×-smaller codes
      "vec_quant_fidelity" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions
          graft.ann.Quant.decode(graft.ann.Quant.encode(Tables.embeddings(s, d)))
            .select(col("vec_id"),
              VectorFunctions.score(col("embedding"), col("dequant")).as("fid"))
            .agg(count(lit(1)).as("n_vectors"),
                 round(avg("fid"), 4).as("avg_fid"),
                 round(min("fid"), 4).as("min_fid"))
        },
        Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               |                     unnest(embedding) AS x
               |              FROM embeddings),
               |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
               |      FROM dims GROUP BY i),
               |dq AS (SELECT vec_id, i,
               |              CASE WHEN mx = mn THEN mn
               |                   ELSE mn + CAST(round((x::DOUBLE - mn) / (mx - mn) * 255.0) AS BIGINT)
               |                        * (mx - mn) / 255.0 END AS y
               |       FROM dims JOIN p USING (i)),
               |dqa AS (SELECT vec_id, list(y ORDER BY i) AS dqv FROM dq GROUP BY vec_id),
               |c AS (SELECT e.vec_id,
               |             round(list_cosine_similarity(e.embedding::DOUBLE[], a.dqv), 6) + 0.0 AS fid
               |      FROM embeddings e JOIN dqa a USING (vec_id))
               |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               |       round(avg(fid), 4) AS avg_fid,
               |       round(min(fid), 4) AS min_fid
               |FROM c""".stripMargin)),

      // residual (two-stage) scalar quantization: int8 the residual
      // against the per-label centroid — same 8 bits over a tighter
      // range; QuantSpec asserts fidelity strictly beats plain int8
      "vec_residual_quant" -> Q(
        (s, d) => graft.ann.Quant.residualFidelity(
            Tables.embeddings(s, d), "label")
          .agg(count(lit(1)).as("n_vectors"),
               round(avg("fid"), 4).as("avg_fid"),
               round(min("fid"), 4).as("min_fid")),
        Some("""WITH dims AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
               |                     unnest(embedding) AS x
               |              FROM embeddings),
               |cent AS (SELECT label, i, avg(x::DOUBLE) AS m FROM dims GROUP BY label, i),
               |res AS (SELECT vec_id, i, x::DOUBLE - m AS r, m
               |        FROM dims JOIN cent USING (label, i)),
               |p AS (SELECT i, min(r) AS mn, max(r) AS mx FROM res GROUP BY i),
               |rq AS (SELECT vec_id, i,
               |              m + CASE WHEN mx = mn THEN r
               |                       ELSE mn + round((r - mn) / (mx - mn) * 255.0)
               |                            * (mx - mn) / 255.0 END AS y
               |       FROM res JOIN p USING (i)),
               |ra AS (SELECT vec_id, list(y ORDER BY i) AS rec FROM rq GROUP BY vec_id),
               |c AS (SELECT e.vec_id,
               |             round(list_cosine_similarity(e.embedding::DOUBLE[], a.rec), 6) + 0.0 AS fid
               |      FROM embeddings e JOIN ra a USING (vec_id))
               |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               |       round(avg(fid), 4) AS avg_fid,
               |       round(min(fid), 4) AS min_fid
               |FROM c""".stripMargin)),

      // one Lloyd's step of the IVF coarse quantizer, oracled: nearest
      // seed centroid by squared L2 (ties → smallest cid), then
      // per-cell re-centering (first two dims shown)
      "ann_kmeans_step" -> Q(
        (s, d) => {
          import graft.functions.VectorExpressions.{sqNorm, dot => vdot}
          val emb = Tables.embeddings(s, d)
          val centsRow = emb.filter(col("vec_id") < 8)
            .agg(sort_array(collect_list(
              struct(col("vec_id").as("cid"), col("embedding").as("cv")))).as("cents"))
          emb.crossJoin(broadcast(centsRow))
            .withColumn("key", element_at(array_sort(transform(col("cents"),
              e => struct(
                (sqNorm(col("embedding")) + sqNorm(e.getField("cv")) -
                  vdot(col("embedding"), e.getField("cv")) * 2).as("dd"),
                e.getField("cid").as("cid")))), 1))
            .select(col("vec_id"), col("embedding"), col("key.cid").as("cid"))
            .groupBy("cid")
            .agg(count(lit(1)).as("n"),
                 round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("c0"),
                 round(avg(element_at(col("embedding"), 2).cast("double")), 6).as("c1"))
            .orderBy("cid")
        },
        Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               |               FROM embeddings WHERE vec_id < 8),
               |a AS (SELECT e.vec_id, e.embedding, cid,
               |        row_number() OVER (PARTITION BY e.vec_id ORDER BY
               |          list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) +
               |          list_inner_product(cv, cv) -
               |          list_inner_product(e.embedding::DOUBLE[], cv) * 2, cid) AS rn
               |      FROM embeddings e, cents)
               |SELECT cid, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
               |       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1
               |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin)),

      // product-quantization ADC search, oracled: 4×16-d subspaces,
      // codebooks = seed-vector slices, per-subspace argmin codes,
      // asymmetric distance = Σ_s d(q_s, c_{s,code_s}), top-5.
      // All sums explicitly left-associated on both engines.
      "vec_pq_adc" -> Q(
        (s, d) => {
          import graft.functions.VectorExpressions.{sqNorm, dot => vdot}
          val emb = Tables.embeddings(s, d)
          val dsub = 16
          def sub(c: Column, si: Int) = slice(c, lit(si * dsub + 1), lit(dsub))
          def sqd(a: Column, b: Column) = sqNorm(a) + sqNorm(b) - vdot(a, b) * 2
          val centCols = (0 until 4).map(si =>
            sort_array(collect_list(struct(col("vec_id").as("cid"),
              sub(col("embedding"), si).as("cv")))).as(s"c$si"))
          val centsRow = emb.filter(col("vec_id") < 4)
            .agg(centCols.head, centCols.tail: _*)
          val q = emb.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
          def termFor(si: Int): Column = {
            val key = element_at(array_sort(transform(col(s"c$si"),
              e => struct(sqd(sub(col("embedding"), si), e.getField("cv")).as("dd"),
                          e.getField("cid").as("cid")))), 1)
            sqd(sub(col("qv"), si),
                element_at(col(s"c$si"),
                  (key.getField("cid") + 1).cast("int")).getField("cv"))
          }
          val adc = ((termFor(0) + termFor(1)) + termFor(2)) + termFor(3)
          val w = Window.orderBy(col("adc").asc, col("vec_id"))
          emb.filter(col("vec_id") =!= 42)
            .crossJoin(broadcast(centsRow)).crossJoin(broadcast(q))
            .select(col("vec_id"), (round(adc, 6) + lit(0.0)).as("adc"))
            .orderBy(col("adc").asc, col("vec_id")).limit(5)
            .withColumn("rnk", row_number().over(w).cast("long"))
            .orderBy("rnk")
        },
        Some {
          def ip(a: String, b: String) = s"list_inner_product($a, $b)"
          def sl(v: String) = s"$v[s.s*16+1 : s.s*16+16]"
          def sqdSql(a: String, b: String) =
            s"${ip(sl(a), sl(a))} + ${ip(sl(b), sl(b))} - ${ip(sl(a), sl(b))} * 2"
          s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cents AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 4),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 42),
             |sub AS (SELECT x.vec_id, s.s, c.cid, ${sqdSql("x.v", "c.v")} AS dd
             |        FROM e x, generate_series(0, 3) s(s), cents c
             |        WHERE x.vec_id <> 42),
             |chosen AS (SELECT vec_id, s, cid FROM (
             |  SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |  FROM sub) WHERE rn = 1),
             |qd AS (SELECT s.s, c.cid, ${sqdSql("q.qv", "c.v")} AS dq
             |       FROM q, generate_series(0, 3) s(s), cents c),
             |t AS (SELECT vec_id,
             |        max(CASE WHEN s = 0 THEN dq END) AS t0,
             |        max(CASE WHEN s = 1 THEN dq END) AS t1,
             |        max(CASE WHEN s = 2 THEN dq END) AS t2,
             |        max(CASE WHEN s = 3 THEN dq END) AS t3
             |      FROM chosen JOIN qd USING (s, cid) GROUP BY vec_id)
             |SELECT vec_id, adc, rnk FROM (
             |  SELECT vec_id, round(((t0 + t1) + t2) + t3, 6) + 0.0 AS adc,
             |         CAST(row_number() OVER (
             |           ORDER BY round(((t0 + t1) + t2) + t3, 6) + 0.0, vec_id) AS BIGINT) AS rnk
             |  FROM t)
             |WHERE rnk <= 5 ORDER BY rnk""".stripMargin
        }),

      // served from the cell-PARTITIONED materialized index: probed
      // cells equi-join the partition column (pruned I/O, plan-guarded)
      "ann_ivf_probe" -> Q(
        (s, d) => graft.ann.AnnIndex.ivfProbeIndexed(s, d,
          nCents = 4, qid = 42L, nprobe = 2, k = 5),
        Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               |               FROM embeddings WHERE vec_id < 4),
               |scored AS (
               |  SELECT e.vec_id, e.embedding, c.cid,
               |         row_number() OVER (PARTITION BY e.vec_id
               |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
               |  FROM embeddings e, cents c),
               |assigned AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
               |probes AS (SELECT cid AS pcid FROM scored WHERE vec_id = 42 AND rn <= 2),
               |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
               |SELECT vec_id, cid, score, rnk FROM (
               |  SELECT a.vec_id, a.cid,
               |         round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) + 0.0 AS score,
               |         CAST(row_number() OVER (
               |           ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) + 0.0 DESC, a.vec_id) AS BIGINT) AS rnk
               |  FROM assigned a, probes, q
               |  WHERE a.cid = pcid AND a.vec_id <> 42)
               |WHERE rnk <= 5 ORDER BY rnk""".stripMargin)))
  }

  // ---------------------------------------------------------------
  // Multimodal (SURVEY §2 #27)
  // ---------------------------------------------------------------

  private val multimodalQ: Seq[(String, Q)] = Seq(
    "mm_binary_meta" -> Q(
      (s, d) => graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d)),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       hm % 1024 + 1 AS width, (hm // 1024) % 1024 + 1 AS height
             |FROM (SELECT doc_id, text, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // video frame-sampling fan-out (every 30th frame) as a pure
    // Catalyst explode — the oracle-able twin of
    // Multimodal.sampleFrames' mapPartitions shape
    "mm_frame_sample" -> Q(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2) // kind = video
        .select(col("doc_id"),
                (graft.functions.VectorFunctions.md5Long(col("text")) % 240 + 1).as("n_frames"))
        .select(col("doc_id"),
                explode(sequence(lit(0L), col("n_frames") - 1, lit(30L))).as("frame_idx"))
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 30)) AS BIGINT) AS frame_idx
             |FROM (SELECT doc_id,
             |             ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |      FROM documents WHERE doc_id % 3 = 2)
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // resize-to-box metadata math (max side 256, aspect preserved) —
    // floor() made explicit on both sides (DuckDB CAST rounds)
    "mm_resize_box" -> Q(
      (s, d) => graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
        .withColumn("scale",
          least(lit(1.0), lit(256.0) / greatest(col("width"), col("height"))))
        .select(col("doc_id"), col("width"), col("height"),
                greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("new_w"),
                greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("new_h"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, width, height,
             |       greatest(1, CAST(floor(width * scale) AS BIGINT)) AS new_w,
             |       greatest(1, CAST(floor(height * scale) AS BIGINT)) AS new_h
             |FROM (SELECT doc_id, width, height,
             |             least(1.0, 256.0 / greatest(width, height)) AS scale
             |      FROM (SELECT doc_id, hm % 1024 + 1 AS width,
             |                   (hm // 1024) % 1024 + 1 AS height
             |            FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |                  FROM documents)))
             |ORDER BY doc_id""".stripMargin)),

    // ViT-style patch grid: resize to 224 max-side (same math as
    // mm_resize_box), then fan out one row per 16x16 patch with pixel
    // offsets and edge-clipped extents — the coordinate plan an image
    // encoder's decode stage consumes. Explode is map-side; per-image
    // fan-out is bounded by (224/16)^2 = 196 patches
    "mm_patch_grid" -> Q(
      (s, d) => graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
        .filter(col("doc_id") < 30)
        .withColumn("scale",
          least(lit(1.0), lit(224.0) / greatest(col("width"), col("height"))))
        .select(col("doc_id"),
          greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("w"),
          greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("h"))
        .withColumn("npx", expr("(w + 15) DIV 16"))
        .select(col("doc_id"), col("w"), col("h"), col("npx"),
          explode(sequence(lit(0L), col("npx") * expr("(h + 15) DIV 16") - 1)).as("p"))
        .select(col("doc_id"), col("w"), col("h"), col("p"),
          (pmod(col("p"), col("npx")) * 16).as("x0"),
          (expr("p DIV npx") * 16).as("y0"),
          least(lit(16L), col("w") - pmod(col("p"), col("npx")) * 16).as("pw"),
          least(lit(16L), col("h") - expr("p DIV npx") * 16).as("ph"))
        .orderBy("doc_id", "p"),
      Some("""SELECT doc_id, w, h, p,
             |       (p % npx) * 16 AS x0, (p // npx) * 16 AS y0,
             |       least(16, w - (p % npx) * 16) AS pw,
             |       least(16, h - (p // npx) * 16) AS ph
             |FROM (
             |  SELECT doc_id, w, h, npx,
             |         CAST(unnest(generate_series(0, npx * ((h + 15) // 16) - 1)) AS BIGINT) AS p
             |  FROM (
             |    SELECT doc_id, w, h, (w + 15) // 16 AS npx
             |    FROM (
             |      SELECT doc_id,
             |             greatest(1, CAST(floor(width * scale) AS BIGINT)) AS w,
             |             greatest(1, CAST(floor(height * scale) AS BIGINT)) AS h
             |      FROM (SELECT doc_id, width, height,
             |                   least(1.0, 224.0 / greatest(width, height)) AS scale
             |            FROM (SELECT doc_id, hm % 1024 + 1 AS width,
             |                         (hm // 1024) % 1024 + 1 AS height
             |                  FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |                        FROM documents WHERE doc_id < 30))))))
             |ORDER BY doc_id, p""".stripMargin)),

    // audio segmentation: fixed 10s windows from (sample_rate,
    // n_samples) metadata with tail-padding flag — the fan-out an
    // ASR/audio-embedding pipeline feeds to its decoder (decode
    // itself stubbed; md5-derived fake metadata, same as mm_binary_meta)
    "mm_audio_windows" -> Q(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1) // kind = audio
        .select(col("doc_id"), graft.functions.VectorFunctions.md5Long(col("text")).as("hm"))
        .selectExpr("doc_id",
          "element_at(array(8000L, 16000L, 44100L), CAST(hm % 3 AS INT) + 1) AS sr",
          "hm % 2000000 + 1 AS n_samples")
        .selectExpr("doc_id", "sr", "n_samples", "sr * 10 AS win",
          "(n_samples + sr * 10 - 1) DIV (sr * 10) AS n_win")
        .select(col("doc_id"), col("sr"), col("n_samples"),
          explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"),
          col("win"), col("n_win"))
        .select(col("doc_id"), col("sr"), col("n_samples"), col("win_idx"),
          (col("win_idx") * col("win")).as("start_sample"),
          least(col("win_idx") * col("win") + col("win"), col("n_samples")).as("end_sample"),
          (col("win_idx") === col("n_win") - 1 && col("n_samples") % col("win") =!= 0)
            .cast("int").as("padded"))
        .orderBy("doc_id", "win_idx"),
      Some("""SELECT doc_id, sr, n_samples, win_idx,
             |       win_idx * win AS start_sample,
             |       least(win_idx * win + win, n_samples) AS end_sample,
             |       CAST(win_idx = n_win - 1 AND n_samples % win <> 0 AS INTEGER) AS padded
             |FROM (
             |  SELECT doc_id, sr, n_samples, win, n_win,
             |         CAST(unnest(generate_series(0, n_win - 1)) AS BIGINT) AS win_idx
             |  FROM (
             |    SELECT doc_id, sr, n_samples, sr * 10 AS win,
             |           (n_samples + sr * 10 - 1) // (sr * 10) AS n_win
             |    FROM (
             |      SELECT doc_id, CAST(([8000, 16000, 44100])[CAST(hm % 3 AS INTEGER) + 1] AS BIGINT) AS sr,
             |             hm % 2000000 + 1 AS n_samples
             |      FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |            FROM documents WHERE doc_id % 3 = 1))))
             |ORDER BY doc_id, win_idx""".stripMargin)),

    // shot-boundary detection over the sampled frame sequence: the
    // per-frame "feature" is the decode stub (deterministic hash per
    // (doc, frame) — no codecs in this container; the Spark-side
    // plumbing is the real part), a cut is a frame whose feature
    // jumps > 600 from its predecessor, shots = cuts + 1. The lag
    // window is bounded by the per-video frame count (≤ 240), never
    // the corpus, so the shape survives any number of videos.
    "mm_shot_bounds" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val frames = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2) // kind = video
          .select(col("doc_id"),
            (md5Long(col("text")) % 240 + 1).as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0L), col("n_frames") - 1)).as("f"))
          .withColumn("feat",
            md5Long(concat(col("doc_id").cast("string"), lit("#"),
              col("f").cast("string"))) % 1000)
        val w = Window.partitionBy("doc_id").orderBy("f")
        frames.withColumn("pf", lag(col("feat"), 1).over(w))
          .groupBy("doc_id", "n_frames")
          .agg(sum(when(abs(col("feat") - col("pf")) > 600, 1L).otherwise(0L))
            .as("n_cuts"))
          .withColumn("n_shots", col("n_cuts") + 1)
          .orderBy("doc_id")
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, n_frames,
             |         CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS f
             |  FROM (SELECT doc_id,
             |               ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |        FROM documents WHERE doc_id % 3 = 2)),
             |ft AS (SELECT doc_id, n_frames, f,
             |         ('0x' || substr(md5(doc_id::VARCHAR || '#' || f::VARCHAR), 1, 15))::BIGINT
             |           % 1000 AS feat
             |       FROM fr),
             |lg AS (SELECT doc_id, n_frames, feat,
             |         lag(feat) OVER (PARTITION BY doc_id ORDER BY f) AS pf FROM ft)
             |SELECT doc_id, n_frames,
             |       CAST(sum(CASE WHEN abs(feat - pf) > 600 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             |       CAST(sum(CASE WHEN abs(feat - pf) > 600 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_shots
             |FROM lg GROUP BY doc_id, n_frames ORDER BY doc_id""".stripMargin)))

  // ---------------------------------------------------------------
  // Round-10 additions: classifier/retrieval evaluation metrics,
  // distribution-shift monitors, and a mergeable frequency sketch
  // ---------------------------------------------------------------

  private val round10Q: Seq[(String, Q)] = {
    import graft.text.TextAnalytics
    // shared oracle CTE: (doc_id, lang, source, quality) with the
    // 4dp-rounded quality score — the bounded-distinct-value grid
    // every distribution metric below aggregates on
    val stopList = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
    val qualityCte =
      s"""q AS (
         |  SELECT doc_id, lang, source,
         |         round((least(n_tok, 100) / 100.0) *
         |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
         |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
         |  FROM (
         |    SELECT doc_id, lang, source, length(text) AS n_chars,
         |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
         |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |               t -> t IN ($stopList))) AS stop_cnt,
         |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
         |    FROM documents))""".stripMargin
    def qualityWithLabels(s: SparkSession, d: String) = {
      val docs = Tables.documents(s, d)
      TextAnalytics.qualityScores(docs).drop("n_tok")
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
    }
    Seq(
      // ROC AUC of the quality score as an "is English" classifier —
      // the ranking-quality audit a filtering pipeline runs before
      // trusting a score as a keep/drop signal. Identical machinery to
      // stat_mwu (AUC = U/(n₁n₂)): aggregate per DISTINCT 4dp score
      // value (bounded grid ≤10⁴ rows at any corpus size), midranks
      // from a cumulative window over that grid — never a global sort
      // of docs. Ties handled exactly via midranks.
      "stat_roc_auc" -> Q(
        (s, d) => {
          val t = qualityWithLabels(s, d).select(col("quality").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
          val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
            .withColumn("midrank",
              col("below").cast("double") + (col("nx") + 1) / 2.0)
            .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
                 sum(col("n1x") * col("midrank")).as("r1"))
            .select(col("n1").as("n_pos"), col("n2").as("n_neg"),
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
                .otherwise(round(
                  (col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2)
                    / (col("n1").cast("double") * col("n2")), 4)).as("auc"))
        },
        Some(s"""WITH $qualityCte,
               |t AS (SELECT quality AS x,
               |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g FROM q),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
               |             CAST(count(*) AS BIGINT) AS nx FROM t GROUP BY x),
               |r AS (SELECT n1x, nx,
               |        CAST(coalesce(sum(nx) OVER (ORDER BY x
               |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               |          + (nx + 1) / 2.0 AS midrank
               |      FROM h),
               |a AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
               |             CAST(sum(nx - n1x) AS BIGINT) AS n2,
               |             sum(n1x * midrank) AS r1 FROM r)
               |SELECT n1 AS n_pos, n2 AS n_neg,
               |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
               |            ELSE round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
               |                       / (CAST(n1 AS DOUBLE) * n2), 4) END AS auc
               |FROM a""".stripMargin)),

      // population stability index between the src1 slice and the rest
      // of the corpus over 10 fixed-width quality bins — the standard
      // "did the distribution drift?" gate between two data snapshots.
      // Laplace-smoothed (+0.5/bin) so empty bins stay finite; the
      // full 10-bin spine comes from an explicit sequence, so zero
      // bins appear in the report instead of vanishing. Everything
      // after the one grouped scan is 10-row arithmetic.
      "stat_psi" -> Q(
        (s, d) => {
          val binned = qualityWithLabels(s, d)
            .select(least(floor(col("quality") * 10), lit(9L)).cast("long").as("bin"),
              when(col("source") === "src1", 1L).otherwise(0L).as("is_ref"))
            .groupBy("bin")
            .agg(sum("is_ref").as("nr"), sum(lit(1L) - col("is_ref")).as("nc"))
          val spine = s.range(10).select(col("id").as("bin"))
          val g = spine.join(binned, Seq("bin"), "left")
            .na.fill(0L, Seq("nr", "nc"))
          val tot = g.agg(sum("nr").as("tr"), sum("nc").as("tc"))
          val p = (col("nr") + 0.5) / (col("tr") + 5.0)
          val qq = (col("nc") + 0.5) / (col("tc") + 5.0)
          val contrib = (p - qq) * log(p / qq)
          g.crossJoin(broadcast(tot))
            .select(col("bin"), col("nr").as("n_ref"), col("nc").as("n_cmp"),
              round(contrib, 6).as("contrib"),
              round(sum(contrib).over(Window.partitionBy()), 6).as("psi_total"))
            .orderBy("bin")
        },
        Some(s"""WITH $qualityCte,
               |b AS (SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS bin,
               |             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS is_ref FROM q),
               |c AS (SELECT bin, CAST(sum(is_ref) AS BIGINT) AS nr,
               |             CAST(sum(1 - is_ref) AS BIGINT) AS nc FROM b GROUP BY bin),
               |g AS (SELECT s.bin, coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
               |      FROM (SELECT unnest(range(10)) AS bin) s
               |      LEFT JOIN c ON s.bin = c.bin),
               |t AS (SELECT CAST(sum(nr) AS BIGINT) AS tr,
               |             CAST(sum(nc) AS BIGINT) AS tc FROM g),
               |x AS (SELECT bin, nr, nc,
               |             ((nr + 0.5) / (tr + 5.0) - (nc + 0.5) / (tc + 5.0))
               |               * ln(((nr + 0.5) / (tr + 5.0)) / ((nc + 0.5) / (tc + 5.0))) AS contrib
               |      FROM g, t)
               |SELECT bin, nr AS n_ref, nc AS n_cmp, round(contrib, 6) AS contrib,
               |       round(sum(contrib) OVER (), 6) AS psi_total
               |FROM x ORDER BY bin""".stripMargin)),

      // 1-D Wasserstein (earth mover's) distance between the quality
      // distributions of English vs non-English docs: W₁ = ∫|F₁−F₂|dx
      // over the bounded grid of distinct 4dp score values — the
      // metric that (unlike KS) weighs HOW FAR mass moved, which is
      // what a data-mixture change actually costs downstream. Same
      // scale shape as stat_roc_auc: one grouped scan, then windows
      // over the ≤10⁴-row value grid.
      "stat_wasserstein" -> Q(
        (s, d) => {
          val t = qualityWithLabels(s, d).select(col("quality").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x")
            .agg(sum("g").as("na"), sum(lit(1L) - col("g")).as("nb"))
          val wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
          val wl = Window.orderBy("x")
          val tot = h.agg(sum("na").as("ta"), sum("nb").as("tb"))
          h.crossJoin(broadcast(tot))
            .withColumn("fa", sum("na").over(wc) / col("ta").cast("double"))
            .withColumn("fb", sum("nb").over(wc) / col("tb").cast("double"))
            .withColumn("gap", lead("x", 1).over(wl) - col("x"))
            .filter(col("gap").isNotNull)
            .agg(max("ta").as("n_en"), max("tb").as("n_other"),
              round(sum(abs(col("fa") - col("fb")) * col("gap")), 6).as("w1"))
        },
        Some(s"""WITH $qualityCte,
               |t AS (SELECT quality AS x,
               |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g FROM q),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS na,
               |             CAST(sum(1 - g) AS BIGINT) AS nb FROM t GROUP BY x),
               |tt AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
               |              CAST(sum(nb) AS BIGINT) AS tb FROM h),
               |c AS (SELECT x,
               |             sum(na) OVER (ORDER BY x) / CAST(ta AS DOUBLE) AS fa,
               |             sum(nb) OVER (ORDER BY x) / CAST(tb AS DOUBLE) AS fb,
               |             lead(x) OVER (ORDER BY x) - x AS gap, ta, tb
               |      FROM h, tt)
               |SELECT CAST(max(ta) AS BIGINT) AS n_en, CAST(max(tb) AS BIGINT) AS n_other,
               |       round(sum(abs(fa - fb) * gap), 6) AS w1
               |FROM c WHERE gap IS NOT NULL""".stripMargin)),

      // count-min sketch (depth 4 × width 64, explicit md5 row-hash
      // family) over event types, with per-key estimate vs exact truth
      // on the bounded type domain. The sketch build is ONE map-side-
      // combinable groupBy of d·N rows into ≤256 cells — mergeable
      // across shards/days by cell-wise addition, which is the whole
      // point of CMS at 100 TB (heavy-hitter counts without a
      // per-key shuffle). overest ≥ 0 always (one-sided error), and
      // the spec asserts the ε=e/w bound on the bounded domain.
      "ev_countmin" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val depth = 4
          val width = 64
          val ev = Tables.events(s, d)
          def cmCell = pmod(md5Long(concat(lit("cm"), col("d").cast("string"),
            lit(":"), col("event_type"))), lit(width))
          // cell build shared with the streaming twin (StreamingSpec
          // asserts micro-batched cells equal these)
          val cells = graft.streaming.StreamOps.countMinCells(ev, depth, width)
          val keys = ev.groupBy("event_type").agg(count(lit(1)).as("exact"))
          val keyCells = keys.select(col("event_type"), col("exact"),
              explode(sequence(lit(0), lit(depth - 1))).as("d"))
            .withColumn("cell", cmCell)
          keyCells.join(cells, Seq("d", "cell"))
            .groupBy("event_type")
            .agg(max("exact").as("exact"), min("cnt").as("cms_est"))
            .select(col("event_type"), col("exact"), col("cms_est"),
              (col("cms_est") - col("exact")).as("overest"))
            .orderBy("event_type")
        },
        Some("""WITH rows_ AS (
               |  SELECT event_type, d,
               |         ('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || ':' || event_type), 1, 15))::BIGINT % 64 AS cell
               |  FROM events, (SELECT unnest(range(4)) AS d)),
               |cells AS (SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt
               |          FROM rows_ GROUP BY d, cell),
               |keys AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact
               |         FROM events GROUP BY event_type),
               |kc AS (SELECT event_type, exact, d,
               |              ('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || ':' || event_type), 1, 15))::BIGINT % 64 AS cell
               |       FROM keys, (SELECT unnest(range(4)) AS d))
               |SELECT kc.event_type, CAST(max(exact) AS BIGINT) AS exact,
               |       CAST(min(cnt) AS BIGINT) AS cms_est,
               |       CAST(min(cnt) - max(exact) AS BIGINT) AS overest
               |FROM kc JOIN cells ON kc.d = cells.d AND kc.cell = cells.cell
               |GROUP BY kc.event_type ORDER BY kc.event_type""".stripMargin)),

      // NDCG@10 of embedding search as a RETRIEVAL-QUALITY metric:
      // for query docs 1–5, rank the corpus by exact cosine (raw
      // signed-bucket sums — bit-reproducible in SQL), relevance =
      // same-language-as-query, ideal DCG from the corpus-wide
      // relevant count. Complements the recall evals (ann_jl_recall,
      // dedup_lsh_eval) with a graded-ranking metric. The per-query
      // candidate set is the whole (small) corpus here; at scale the
      // ranking input swaps for the partition-pruned ANN paths and
      // this metric is unchanged downstream.
      "text_ndcg" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val docs = Tables.documents(s, d)
          val raw = graft.embed.HashEmbedder.embedDocsRaw(docs, "doc_id", "text", 64)
            .join(docs.select("doc_id", "lang"), "doc_id")
          val qs = raw.filter(col("doc_id") <= 5)
            .select(col("doc_id").as("qid"), col("embedding").as("qv"),
                    col("lang").as("qlang"))
          val scored = raw.crossJoin(broadcast(qs))
            .filter(col("doc_id") =!= col("qid"))
            .select(col("qid"), col("qlang"), col("doc_id"), col("lang"),
              score(col("embedding"), col("qv")).as("sc"))
          val w = Window.partitionBy("qid").orderBy(col("sc").desc, col("doc_id"))
          val top = scored.withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 10)
            .groupBy("qid")
            .agg(sum(when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("n_rel_top10"),
              sum(when(col("lang") === col("qlang"),
                lit(1.0) / log2(col("rnk") + 1)).otherwise(0.0)).as("dcg"))
          val rel = scored.groupBy("qid")
            .agg(sum(when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("n_rel"))
          top.join(rel, "qid")
            .withColumn("idcg", expr(
              "aggregate(sequence(1, int(least(10, n_rel))), 0D, (a, i) -> a + 1.0 / log2(i + 1))"))
            .select(col("qid"), col("n_rel_top10"),
              when(col("n_rel") === 0, lit(null).cast("double"))
                .otherwise(round(col("dcg") / col("idcg"), 4)).as("ndcg"))
            .orderBy("qid")
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |lg AS (SELECT doc_id, lang FROM documents),
             |qs AS (SELECT sums.doc_id AS qid, lang AS qlang, sums.*
             |       FROM sums JOIN lg USING (doc_id) WHERE doc_id <= 5),
             |sc AS (SELECT ss.qid, ss.qlang, ss.doc_id, lg.lang,
             |              round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                         ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS sc
             |       FROM (SELECT s.doc_id, q.qid, q.qlang, ($dot) AS dot,
             |                    ($na) AS na, ($nb) AS nb
             |             FROM sums s JOIN qs q ON s.doc_id <> q.qid) ss
             |       JOIN lg ON ss.doc_id = lg.doc_id),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc DESC, doc_id) AS rnk
             |       FROM sc),
             |top AS (SELECT qid,
             |          CAST(sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_top10,
             |          sum(CASE WHEN lang = qlang THEN 1.0 / log2(rnk + 1) ELSE 0.0 END) AS dcg
             |        FROM rk WHERE rnk <= 10 GROUP BY qid),
             |rel AS (SELECT qid, CAST(sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
             |        FROM sc GROUP BY qid),
             |id_ AS (SELECT qid, sum(1.0 / log2(i + 1)) AS idcg
             |        FROM rel, LATERAL (SELECT unnest(generate_series(1, CAST(least(10, n_rel) AS BIGINT))) AS i)
             |        GROUP BY qid)
             |SELECT top.qid, n_rel_top10,
             |       CASE WHEN n_rel = 0 THEN NULL
             |            ELSE round(dcg / idcg, 4) END AS ndcg
             |FROM top JOIN rel USING (qid) LEFT JOIN id_ USING (qid)
             |ORDER BY qid""".stripMargin
        }),

      // TOST equivalence test (two one-sided z-tests) on mean per-user
      // event value between the md5 A/B arms: the inverse of ev_ab_test
      // — "are the arms the SAME within ±δ?", which is what a holdout
      // validation or infra migration actually needs to show. Welch SE
      // from per-arm var_samp of per-user means; margin δ = 0.5;
      // equivalent ⇔ both one-sided z's clear 1.6449 (α = 0.05).
      "stat_tost" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val delta = 0.5
          val g = Tables.events(s, d)
            .groupBy("user_id").agg(avg("value").as("uv"))
            .withColumn("arm",
              md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
            .groupBy("arm")
            .agg(count(lit(1)).cast("double").as("n"), avg("uv").as("m"),
                 var_samp("uv").as("v"))
            .localCheckpoint(eager = false) // read twice (both arms)
          val t = g.filter(col("arm") === 1)
            .select(col("n").as("nt"), col("m").as("mt"), col("v").as("vt"))
          val c = g.filter(col("arm") === 0)
            .select(col("n").as("nc"), col("m").as("mc"), col("v").as("vc"))
          val se = sqrt(col("vt") / col("nt") + col("vc") / col("nc"))
          val diff = col("mt") - col("mc")
          val zl = (diff + delta) / se
          val zu = (diff - delta) / se
          // se = 0 (degenerate constant-value corpus) would throw
          // DIVIDE_BY_ZERO under ANSI — NULL the z's, mirrored below
          def guarded(c: Column) =
            when(se === 0.0, lit(null).cast("double")).otherwise(c)
          t.crossJoin(c).select(
            col("nt").cast("long").as("n_t"), col("nc").cast("long").as("n_c"),
            round(diff, 4).as("mean_diff"), round(se, 6).as("se"),
            guarded(round(zl, 4)).as("z_lower"),
            guarded(round(zu, 4)).as("z_upper"),
            when(se === 0.0, lit(null).cast("int"))
              .otherwise((zl > 1.6449 && zu < -1.6449).cast("int")).as("equivalent"))
        },
        Some("""WITH u AS (
               |  SELECT user_id, avg(value) AS uv,
               |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
               |  FROM events GROUP BY user_id),
               |g AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n, avg(uv) AS m,
               |             var_samp(uv) AS v FROM u GROUP BY arm),
               |t AS (SELECT n AS nt, m AS mt, v AS vt FROM g WHERE arm = 1),
               |c AS (SELECT n AS nc, m AS mc, v AS vc FROM g WHERE arm = 0)
               |SELECT CAST(nt AS BIGINT) AS n_t, CAST(nc AS BIGINT) AS n_c,
               |       round(mt - mc, 4) AS mean_diff,
               |       round(sqrt(vt/nt + vc/nc), 6) AS se,
               |       CASE WHEN sqrt(vt/nt + vc/nc) = 0 THEN NULL
               |            ELSE round((mt - mc + 0.5) / sqrt(vt/nt + vc/nc), 4) END AS z_lower,
               |       CASE WHEN sqrt(vt/nt + vc/nc) = 0 THEN NULL
               |            ELSE round((mt - mc - 0.5) / sqrt(vt/nt + vc/nc), 4) END AS z_upper,
               |       CASE WHEN sqrt(vt/nt + vc/nc) = 0 THEN NULL
               |            ELSE CAST((mt - mc + 0.5) / sqrt(vt/nt + vc/nc) > 1.6449
               |                 AND (mt - mc - 0.5) / sqrt(vt/nt + vc/nc) < -1.6449 AS INTEGER) END AS equivalent
               |FROM t, c""".stripMargin)),

      // TextRank keyphrase extraction: weighted PageRank over the
      // word co-occurrence graph (window ≤2 on the stopword-filtered
      // token stream), vocab bounded to the top-150 tokens by
      // frequency so the graph is ≤150 nodes at ANY corpus size —
      // the corpus-scale work is one token count + one pair count,
      // both map-side-combinable; the 4 power iterations run on the
      // collected bounded graph (same altitude call as
      // graph_pagerank's |event-types| chain). Per-iteration round
      // to 7dp pins the trajectory across engines.
      "text_textrank" -> Q(
        (s, d) => {
          import graft.text.TextAnalytics
          val stopArr = typedlit(TextAnalytics.Stopwords)
          val toksRaw = graft.text.TextPrimitives.tokens(col("text"))
          val content = filter(toksRaw, t => !array_contains(stopArr, t))
          val docs = Tables.documents(s, d).select(content.as("a"))
            .localCheckpoint(eager = false) // vocab + two pair streams
          val vocab = docs.select(explode(col("a")).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("freq"))
            .orderBy(col("freq").desc, col("tok")).limit(150)
          def pairs(k: Int) = docs.select(explode(zip_with(
              slice(col("a"), lit(1), greatest(size(col("a")) - k, lit(0))),
              slice(col("a"), lit(k + 1), greatest(size(col("a")) - k, lit(0))),
              (x, y) => concat(x, lit(" "), y))).as("p"))
            .select(split(col("p"), " ").as("sp"))
            .select(element_at(col("sp"), 1).as("x"), element_at(col("sp"), 2).as("y"))
          val e0 = pairs(1).union(pairs(2))
            .filter(col("x") =!= col("y"))
            .select(least(col("x"), col("y")).as("src"),
                    greatest(col("x"), col("y")).as("dst"))
            .join(broadcast(vocab.select(col("tok").as("src"))), "src")
            .join(broadcast(vocab.select(col("tok").as("dst"))), "dst")
            .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          val nodes = vocab.select("tok").collect().map(_.getString(0)).sorted
          val canon = e0.collect()
            .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"), r.getAs[Long]("w")))
            .sortBy(t => (t._1, t._2))
          val bi = canon.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
          val wa = bi.groupBy(_._1).map { case (a, es) => a -> es.map(_._3).sum }
          val edges = bi.map { case (a, b, w) =>
            (a, b, BigDecimal(w.toDouble / wa(a))
              .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble) }
          val nN = nodes.length
          def r7(x: Double) =
            BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
          var rank = nodes.map(t => t -> r7(1.0 / nN)).toMap
          for (_ <- 1 to 4) {
            val in = edges.groupBy(_._2).map { case (dst, es) =>
              dst -> es.sortBy(_._1).map(e => e._3 * rank(e._1)).sum }
            rank = nodes.map(t => t -> r7(0.15 / nN + 0.85 * in.getOrElse(t, 0.0))).toMap
          }
          import s.implicits._
          rank.toSeq.sortBy(_._1).toDF("tok", "r0")
            .select(col("tok"), round(col("r0"), 5).as("pr"))
            .orderBy(col("pr").desc, col("tok")).limit(15)
        },
        Some {
          val stopList = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          val iters = (1 to 4).map { k =>
            s"""it$k AS (SELECT n.t, round(0.15 / nn.nn + 0.85 * coalesce(
               |  (SELECT sum(e.p * i.r) FROM e JOIN it${k - 1} i ON i.t = e.src
               |   WHERE e.dst = n.t), 0), 7) AS r
               |  FROM nodes n, nn)""".stripMargin
          }.mkString(",\n")
          s"""WITH content AS (
             |  SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |                     t -> t NOT IN ($stopList)) AS a
             |  FROM documents),
             |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
             |          FROM (SELECT unnest(a) AS tok FROM content)
             |          GROUP BY tok ORDER BY freq DESC, tok LIMIT 150),
             |p1 AS (SELECT a[i] AS x, a[i+1] AS y FROM (
             |         SELECT a, unnest(generate_series(1, len(a) - 1)) AS i FROM content)),
             |p2 AS (SELECT a[i] AS x, a[i+2] AS y FROM (
             |         SELECT a, unnest(generate_series(1, len(a) - 2)) AS i FROM content)),
             |e0 AS (SELECT least(x, y) AS src, greatest(x, y) AS dst,
             |              CAST(count(*) AS BIGINT) AS w
             |       FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
             |       WHERE x <> y AND least(x, y) IN (SELECT tok FROM vocab)
             |         AND greatest(x, y) IN (SELECT tok FROM vocab)
             |       GROUP BY src, dst),
             |bi AS (SELECT src AS a, dst AS b, w FROM e0
             |       UNION ALL SELECT dst, src, w FROM e0),
             |deg AS (SELECT a, CAST(sum(w) AS BIGINT) AS wa FROM bi GROUP BY a),
             |e AS (SELECT a AS src, b AS dst, round(w * 1.0 / wa, 7) AS p
             |      FROM bi JOIN deg USING (a)),
             |nodes AS (SELECT tok AS t FROM vocab),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
             |it0 AS (SELECT t, round(1.0 / nn, 7) AS r FROM nodes, nn),
             |$iters
             |SELECT t AS tok, round(r, 5) AS pr FROM it4
             |ORDER BY pr DESC, tok LIMIT 15""".stripMargin
        }),

      // Cliff's delta effect size for en vs non-en token counts —
      // the non-parametric "how big is the difference" companion to
      // stat_mwu's "is there one": δ = 2·AUC − 1 from the same
      // midrank/rank-sum machinery over the DISTINCT-value histogram
      // (values, never rows), with the conventional magnitude labels
      "stat_cliffs_delta" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
          val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          val delta =
            ((col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2) * 2
              / (col("n1").cast("double") * col("n2"))) - 1
          h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
            .withColumn("midrank",
              col("below").cast("double") + (col("nx") + 1) / 2.0)
            .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
                 sum(col("n1x") * col("midrank")).as("r1"))
            .select(col("n1").as("n_en"), col("n2").as("n_other"),
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
                .otherwise(round(delta, 4)).as("delta"),
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("string"))
                .otherwise(
                  when(abs(delta) < 0.147, "negligible")
                    .when(abs(delta) < 0.33, "small")
                    .when(abs(delta) < 0.474, "medium")
                    .otherwise("large")).as("magnitude"))
        },
        Some("""WITH t AS (
               |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
               |  FROM documents),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
               |             CAST(count(*) AS BIGINT) AS nx FROM t GROUP BY x),
               |r AS (SELECT n1x, nx,
               |        CAST(coalesce(sum(nx) OVER (ORDER BY x
               |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               |          + (nx + 1) / 2.0 AS midrank
               |      FROM h),
               |a AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
               |             CAST(sum(nx - n1x) AS BIGINT) AS n2,
               |             sum(n1x * midrank) AS r1 FROM r),
               |dl AS (SELECT n1, n2,
               |              (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2) * 2
               |                / (CAST(n1 AS DOUBLE) * n2) - 1 AS delta
               |       FROM a)
               |SELECT n1 AS n_en, n2 AS n_other,
               |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE round(delta, 4) END AS delta,
               |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
               |            WHEN abs(delta) < 0.147 THEN 'negligible'
               |            WHEN abs(delta) < 0.33 THEN 'small'
               |            WHEN abs(delta) < 0.474 THEN 'medium'
               |            ELSE 'large' END AS magnitude
               |FROM dl""".stripMargin)),

      // ε=1 DP mean of the (already-[0,1]-clipped) quality score per
      // source: the private-release twin of a per-slice quality
      // report. Budget split over the two released statistics (sum
      // and count, sensitivity 1 each ⇒ Laplace scale 2); noise is
      // the same deterministic inverse-CDF draw as priv_dp_counts so
      // the release is reproducible and oracle-exact. The sum rounds
      // to 6dp BEFORE noising so partial-sum grouping can't leak
      // into the release. Count guard: max(1, noisy_n)
      "priv_dp_mean" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          def lap(tag: String) = {
            // u rounds to 6dp BEFORE the inverse-CDF on both engines —
            // the draw must be bit-identical, not just close
            val u = round((md5Long(concat(lit(tag), col("source")))
              % 1000000L + 1L) / lit(1000000.0) - 0.5, 6)
            round(-signum(u) * lit(2.0) *
              log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(u))), 6)
          }
          qualityWithLabels(s, d).groupBy("source")
            .agg(count(lit(1)).as("n_true"),
                 round(sum("quality"), 6).as("sum_true"))
            .select(col("source"), col("n_true"),
              round(col("sum_true") + lap("dpm:"), 6).as("sum_noisy"),
              round(col("n_true") + lap("dpc:"), 6).as("n_noisy"))
            .select(col("source"), col("n_true"), col("sum_noisy"), col("n_noisy"),
              round(col("sum_noisy") / greatest(lit(1.0), col("n_noisy")), 4)
                .as("dp_mean"))
            .orderBy("source")
        },
        Some(s"""WITH $qualityCte,
               |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_true,
               |             round(sum(quality), 6) AS sum_true,
               |             round((('0x' || substr(md5('dpm:' || source), 1, 15))::BIGINT
               |               % 1000000 + 1) / 1000000.0 - 0.5, 6) + 0.0 AS us,
               |             round((('0x' || substr(md5('dpc:' || source), 1, 15))::BIGINT
               |               % 1000000 + 1) / 1000000.0 - 0.5, 6) + 0.0 AS uc
               |      FROM q GROUP BY source),
               |n AS (SELECT source, n_true,
               |             round(sum_true + round(-sign(us) * 2.0
               |               * ln(greatest(1e-12, 1.0 - 2.0 * abs(us))), 6), 6) AS sum_noisy,
               |             round(n_true + round(-sign(uc) * 2.0
               |               * ln(greatest(1e-12, 1.0 - 2.0 * abs(uc))), 6), 6) AS n_noisy
               |      FROM g)
               |SELECT source, n_true, sum_noisy, n_noisy,
               |       round(sum_noisy / greatest(1.0, n_noisy), 4) AS dp_mean
               |FROM n ORDER BY source""".stripMargin)),

      // Qini/uplift curve by pre-period-activity decile: score users
      // on first-half event volume, treat = md5 arm, response =
      // second-half purchase — "does targeting high-score users
      // concentrate the treatment effect?", the decision curve an
      // uplift-targeting rollout reads. Deciles from BROADCAST
      // percentile cutoffs (ev_lift_gain's shape, never a global
      // ntile sort); the only window is the cumulative over ≤10
      // decile rows, best deciles first. Qini_k = X_t − X_c·N_t/N_c
      // on cumulative counts; NULL (not ÷0) when a cum control side
      // is empty
      "ev_qini" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val ev = Tables.events(s, d)
          val bounds = ev.agg(min(expr("ts div 86400000000000")).as("mn"),
                              max(expr("ts div 86400000000000")).as("mx"))
          val users = ev
            .select(col("user_id"), expr("ts div 86400000000000").as("day"),
                    col("event_type"))
            .crossJoin(broadcast(bounds))
            // integer DIV, matching the oracle's `// 2` exactly even
            // when mn+mx+1 is odd
            .withColumn("post",
              (col("day") >= expr("(mn + mx + 1) DIV 2")).cast("long"))
            .groupBy("user_id")
            .agg(sum(lit(1L) - col("post")).as("score"),
                 max(when(col("post") === 1 && col("event_type") === "purchase", 1L)
                   .otherwise(0L)).as("resp"))
            .withColumn("arm",
              md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
            .localCheckpoint(eager = false) // cutoffs + bucketing
          val cuts = users.agg(expr(
            "transform(percentile(score, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)), " +
            "x -> round(x, 6))").as("bs"))
          val bucketed = users.crossJoin(broadcast(cuts))
            .withColumn("decile", lit(10) - expr(
              "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN score > b THEN 1 ELSE 0 END)"))
          val wCum = Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          bucketed.groupBy("decile")
            .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
                 sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
                 sum(when(col("arm") === 1, col("resp")).otherwise(0L)).as("x_t"),
                 sum(when(col("arm") === 0, col("resp")).otherwise(0L)).as("x_c"))
            .withColumn("cnt", sum("n_t").over(wCum))
            .withColumn("cnc", sum("n_c").over(wCum))
            .withColumn("cxt", sum("x_t").over(wCum))
            .withColumn("cxc", sum("x_c").over(wCum))
            .select(col("decile"), col("n_t"), col("n_c"), col("x_t"), col("x_c"),
              when(col("n_t") === 0 || col("n_c") === 0, lit(null).cast("double"))
                .otherwise(round(col("x_t") / col("n_t").cast("double")
                  - col("x_c") / col("n_c").cast("double"), 4)).as("uplift"),
              when(col("cnc") === 0, lit(null).cast("double"))
                .otherwise(round(col("cxt")
                  - col("cxc") * col("cnt").cast("double") / col("cnc"), 4)).as("qini"))
            .orderBy("decile")
        },
        Some("""WITH b AS (SELECT min(ts // 86400000000000) AS mn,
               |                  max(ts // 86400000000000) AS mx FROM events),
               |u AS (
               |  SELECT user_id,
               |         CAST(sum(CASE WHEN (ts // 86400000000000) >= (mn + mx + 1) // 2
               |                       THEN 0 ELSE 1 END) AS BIGINT) AS score,
               |         max(CASE WHEN (ts // 86400000000000) >= (mn + mx + 1) // 2
               |                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS resp,
               |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
               |  FROM events, b GROUP BY user_id),
               |c AS (SELECT round(quantile_cont(score, 0.1), 6) AS b1, round(quantile_cont(score, 0.2), 6) AS b2,
               |             round(quantile_cont(score, 0.3), 6) AS b3, round(quantile_cont(score, 0.4), 6) AS b4,
               |             round(quantile_cont(score, 0.5), 6) AS b5, round(quantile_cont(score, 0.6), 6) AS b6,
               |             round(quantile_cont(score, 0.7), 6) AS b7, round(quantile_cont(score, 0.8), 6) AS b8,
               |             round(quantile_cont(score, 0.9), 6) AS b9
               |      FROM u),
               |bk AS (SELECT u.*, 10 - ((score > b1)::INT + (score > b2)::INT + (score > b3)::INT
               |              + (score > b4)::INT + (score > b5)::INT + (score > b6)::INT
               |              + (score > b7)::INT + (score > b8)::INT + (score > b9)::INT) AS decile
               |       FROM u, c),
               |g AS (SELECT decile,
               |             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               |             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               |             CAST(sum(CASE WHEN arm = 1 THEN resp ELSE 0 END) AS BIGINT) AS x_t,
               |             CAST(sum(CASE WHEN arm = 0 THEN resp ELSE 0 END) AS BIGINT) AS x_c
               |      FROM bk GROUP BY decile),
               |w AS (SELECT *,
               |             CAST(sum(n_t) OVER o AS BIGINT) AS cnt, CAST(sum(n_c) OVER o AS BIGINT) AS cnc,
               |             CAST(sum(x_t) OVER o AS BIGINT) AS cxt, CAST(sum(x_c) OVER o AS BIGINT) AS cxc
               |      FROM g WINDOW o AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               |SELECT decile, n_t, n_c, x_t, x_c,
               |       CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
               |            ELSE round(x_t / CAST(n_t AS DOUBLE) - x_c / CAST(n_c AS DOUBLE), 4) END AS uplift,
               |       CASE WHEN cnc = 0 THEN NULL
               |            ELSE round(cxt - cxc * CAST(cnt AS DOUBLE) / cnc, 4) END AS qini
               |FROM w ORDER BY decile""".stripMargin)),

      // Chao1 species-richness estimate of the vocabulary: how many
      // word types remain UNSEEN given the singleton/doubleton profile
      // — the "is more data worth scanning" complement to the Heaps
      // fit. Bias-corrected form V + f1(f1−1)/(2(f2+1)) (no f2=0
      // division), plus Good–Turing sample coverage 1 − f1/N. The
      // whole estimator is two aggregates over the term-frequency
      // histogram the vocab build already produces.
      "text_chao1" -> Q(
        (s, d) => {
          val freqs = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("f"))
          freqs.agg(count(lit(1)).as("v_obs"),
              sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
              sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"),
              sum("f").as("n_tokens"))
            .select(col("v_obs"), col("f1"), col("f2"), col("n_tokens"),
              round(col("v_obs") + col("f1").cast("double") * (col("f1") - 1)
                / ((col("f2") + 1) * 2.0), 2).as("chao1"),
              round(lit(1.0) - col("f1") / col("n_tokens").cast("double"), 6)
                .as("coverage"))
        },
        Some("""WITH fr AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS f FROM (
               |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |    FROM documents)
               |  GROUP BY tok)
               |SELECT CAST(count(*) AS BIGINT) AS v_obs,
               |       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               |       CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
               |       CAST(sum(f) AS BIGINT) AS n_tokens,
               |       round(count(*) + sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
               |               * CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) - 1 AS DOUBLE)
               |               / (2.0 * (sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) + 1)), 2) AS chao1,
               |       round(1.0 - sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
               |               / CAST(sum(f) AS DOUBLE), 6) AS coverage
               |FROM fr""".stripMargin)),

      // Goertzel-style seasonality strength: spectral power of the
      // daily purchase series at candidate periods {2,3,7,14} days —
      // ONE pass builds the |days|-row series, then each period is a
      // cos/sin pair of sums over that bounded frame (no FFT, no
      // per-row state). Trig terms round to 10dp before the products
      // so libm-vs-JDK last-ulp drift can't reach the 4dp report.
      "ts_goertzel" -> Q(
        (s, d) => {
          val daily = Tables.events(s, d)
            .filter(col("event_type") === "purchase")
            .groupBy(expr("ts div 86400000000000").as("day"))
            .agg(count(lit(1)).cast("double").as("x"))
          val periods = Seq(2, 3, 7, 14)
          val twoPi = 2.0 * math.Pi
          val withTrig = daily.select((Seq(col("day"), col("x")) ++
            periods.flatMap { p =>
              Seq(round(cos(col("day") * (twoPi / p)), 10).as(s"c$p"),
                  round(sin(col("day") * (twoPi / p)), 10).as(s"s$p"))
            }): _*)
          val aggs = sum("x").as("total") +: periods.flatMap { p =>
            Seq(sum(col("x") * col(s"c$p")).as(s"a$p"),
                sum(col("x") * col(s"s$p")).as(s"b$p"))
          }
          withTrig.agg(count(lit(1)).as("n_days"), aggs: _*)
            .select((col("n_days") +: periods.map { p =>
              round(sqrt(col(s"a$p") * col(s"a$p") + col(s"b$p") * col(s"b$p"))
                * 2.0 / col("n_days"), 4).as(s"amp_$p")
            }): _*)
        },
        Some {
          val periods = Seq(2, 3, 7, 14)
          val terms = periods.map { p =>
            s"sum(x * round(cos(day * (2 * pi() / $p)), 10)) AS a$p, " +
              s"sum(x * round(sin(day * (2 * pi() / $p)), 10)) AS b$p"
          }.mkString(",\n             ")
          val amps = periods.map { p =>
            s"round(sqrt(a$p * a$p + b$p * b$p) * 2.0 / n_days, 4) AS amp_$p"
          }.mkString(",\n       ")
          s"""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day, CAST(count(*) AS DOUBLE) AS x
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n_days, sum(x) AS total,
             |             $terms
             |      FROM daily)
             |SELECT n_days,
             |       $amps
             |FROM s""".stripMargin
        }),

      // Cramér's V effect size for the lang × source association —
      // the "how strong" companion to stat_chi2_indep's "is there":
      // V = √(χ²/(n·min(r−1,c−1))), same broadcast-marginal full-grid
      // expected counts (zero observed cells still contribute)
      "stat_cramers_v" -> Q(
        (s, d) => {
          val doc = Tables.documents(s, d)
          val rt = doc.groupBy("lang").agg(count(lit(1)).as("nl"))
          val ct = doc.groupBy("source").agg(count(lit(1)).as("ns"))
          val obs = doc.groupBy("lang", "source").agg(count(lit(1)).as("o"))
          val tot = doc.agg(count(lit(1)).as("n"))
          val chi2 = sum(pow(col("o") - col("e"), 2) / col("e"))
          val mindf = least(countDistinct(col("lang")) - 1,
                            countDistinct(col("source")) - 1)
          rt.crossJoin(broadcast(ct))
            .join(obs, Seq("lang", "source"), "left")
            .na.fill(0L, Seq("o"))
            .crossJoin(broadcast(tot))
            .withColumn("e", col("nl") * col("ns") / col("n").cast("double"))
            .agg(round(chi2, 4).as("chi2"), mindf.as("min_df"), max(col("n")).as("n"),
              when(mindf === 0, lit(null).cast("double"))
                .otherwise(round(sqrt(chi2 / (max(col("n")) * mindf)), 4)).as("v"))
        },
        Some("""WITH rt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
               |            FROM documents GROUP BY lang),
               |ct AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
               |       FROM documents GROUP BY source),
               |obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
               |        FROM documents GROUP BY lang, source),
               |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
               |grid AS (
               |  SELECT rt.lang, ct.source, coalesce(o, 0) AS o, n,
               |         rt.nl * ct.ns / CAST(n AS DOUBLE) AS e
               |  FROM rt CROSS JOIN ct
               |  LEFT JOIN obs ON rt.lang = obs.lang AND ct.source = obs.source
               |  CROSS JOIN tot),
               |a AS (SELECT sum(pow(o - e, 2) / e) AS chi2,
               |             least(count(DISTINCT lang) - 1,
               |                   count(DISTINCT source) - 1) AS min_df,
               |             CAST(max(n) AS BIGINT) AS n
               |      FROM grid)
               |SELECT round(chi2, 4) AS chi2, CAST(min_df AS BIGINT) AS min_df, n,
               |       CASE WHEN min_df = 0 THEN NULL
               |            ELSE round(sqrt(chi2 / (n * min_df)), 4) END AS v
               |FROM a""".stripMargin)),

      // two-NN intrinsic-dimension estimate (Facco et al. 2017): the
      // MLE id = n/Σln(r₂/r₁) from each vector's two nearest-neighbor
      // distances — "how many dimensions does the embedding ACTUALLY
      // use", the manifold complement to emb_anisotropy/emb_dim_stats.
      // Distances round to 6dp (engine-identical ranking); zero-r₁
      // duplicates are excluded as the estimator requires. The
      // pairwise stage is the bounded-corpus oracle form; at scale the
      // candidate pairs come from the LSH/IVF bucketed paths (same
      // note as ann_knn_graph) with the estimator unchanged.
      "emb_twonn_id" -> Q(
        (s, d) => {
          // dense kernel (negated-distance TopK merge) instead of a
          // row_number window over the 4M-pair frame: the window
          // formulation measured 43 s at sf0.1, the kernel ~1 s —
          // same (dist asc, ib) ranking, oracle unchanged
          graft.ann.Ann.nearestDistancesDense(Tables.embeddings(s, d), 2)
            .groupBy(col("vec_id").as("ia"))
            .agg(min(when(col("rnk") === 1, col("dist"))).as("r1"),
                 min(when(col("rnk") === 2, col("dist"))).as("r2"))
            .filter(col("r1") > 0)
            .agg(count(lit(1)).as("n_used"),
                 round(sum(log(col("r2") / col("r1"))), 6).as("sum_log_mu"))
            .select(col("n_used"),
              col("sum_log_mu"),
              when(col("sum_log_mu") <= 0, lit(null).cast("double"))
                .otherwise(round(col("n_used") / col("sum_log_mu"), 4)).as("id_hat"))
        },
        Some("""WITH p AS (
               |  SELECT a.vec_id AS ia, b.vec_id AS ib,
               |         round(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist
               |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
               |rk AS (SELECT ia, dist,
               |              row_number() OVER (PARTITION BY ia ORDER BY dist, ib) AS rnk
               |       FROM p),
               |nn AS (SELECT ia,
               |              min(CASE WHEN rnk = 1 THEN dist END) AS r1,
               |              min(CASE WHEN rnk = 2 THEN dist END) AS r2
               |       FROM rk WHERE rnk <= 2 GROUP BY ia),
               |a AS (SELECT CAST(count(*) AS BIGINT) AS n_used,
               |             round(sum(ln(r2 / r1)), 6) AS sum_log_mu
               |      FROM nn WHERE r1 > 0)
               |SELECT n_used, sum_log_mu,
               |       CASE WHEN sum_log_mu <= 0 THEN NULL
               |            ELSE round(n_used / sum_log_mu, 4) END AS id_hat
               |FROM a""".stripMargin)),

      // sign-flip permutation test on the A/B mean difference: the
      // assumption-free p-value (no normality, no variance formula) —
      // B=64 deterministic md5 re-randomizations of the per-user arm,
      // T_b for every permutation from ONE wide aggregate over the
      // per-user frame (130 conditional sums — the dim-64 embedder
      // precedent; all map-side), then the p-value is scalar
      // arithmetic on the 1-row result. p = (1+#{|T_b|≥|T_obs|})/(B+1).
      // T's round to 6dp before comparison so both engines classify
      // "extreme" identically.
      "stat_perm_test" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val B = 64
          def armCol(tag: String) =
            md5Long(concat(lit(tag), col("user_id").cast("string"))) % 2
          val users = Tables.events(s, d)
            .groupBy("user_id").agg(avg("value").as("uv"))
            .select(Seq(col("uv"), armCol("ab:").as("h_obs")) ++
              (0 until B).map(b => armCol(s"perm:$b:").as(s"h$b")): _*)
          def tStat(hs: String): Column = {
            val s1 = col(s"s1_$hs"); val n1 = col(s"n1_$hs")
            // a permutation can land every user in one arm on a tiny
            // corpus — NULL that T (its comparison then counts 0 on
            // both engines) instead of an ANSI divide-by-zero
            when(n1 === 0.0 || n1 === col("n"), lit(null).cast("double"))
              .otherwise(round(s1 / n1 - (col("s") - s1) / (col("n") - n1), 6))
          }
          val aggs =
            Seq(count(lit(1)).cast("double").as("n"), sum("uv").as("s"),
                sum(when(col("h_obs") === 1, col("uv")).otherwise(0.0)).as("s1_obs"),
                sum(when(col("h_obs") === 1, 1.0).otherwise(0.0)).as("n1_obs")) ++
            (0 until B).flatMap(b => Seq(
              sum(when(col(s"h$b") === 1, col("uv")).otherwise(0.0)).as(s"s1_$b"),
              sum(when(col(s"h$b") === 1, 1.0).otherwise(0.0)).as(s"n1_$b")))
          val nExtreme = (0 until B).map(b =>
            when(abs(tStat(b.toString)) >= abs(tStat("obs")), 1).otherwise(0))
            .reduce(_ + _)
          users.agg(aggs.head, aggs.tail: _*)
            .select(round(tStat("obs"), 4).as("t_obs"),
              lit(B).cast("long").as("n_perms"),
              nExtreme.cast("long").as("n_extreme"),
              round((nExtreme + 1) / lit((B + 1).toDouble), 4).as("p_value"))
        },
        Some {
          val B = 64
          def armSql(tag: String) =
            s"('0x' || substr(md5('$tag' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2"
          val hCols = (s"${armSql("ab:")} AS h_obs" +:
            (0 until B).map(b => s"${armSql(s"perm:$b:")} AS h$b")).mkString(",\n         ")
          val aggCols = (Seq(
            "CAST(count(*) AS DOUBLE) AS n", "sum(uv) AS s",
            "sum(CASE WHEN h_obs = 1 THEN uv ELSE 0.0 END) AS s1_obs",
            "sum(CASE WHEN h_obs = 1 THEN 1.0 ELSE 0.0 END) AS n1_obs") ++
            (0 until B).flatMap(b => Seq(
              s"sum(CASE WHEN h$b = 1 THEN uv ELSE 0.0 END) AS s1_$b",
              s"sum(CASE WHEN h$b = 1 THEN 1.0 ELSE 0.0 END) AS n1_$b")))
            .mkString(",\n             ")
          def tSql(hs: String) =
            s"(CASE WHEN n1_$hs = 0 OR n1_$hs = n THEN NULL ELSE " +
              s"round(s1_$hs / n1_$hs - (s - s1_$hs) / (n - n1_$hs), 6) END)"
          val extreme = (0 until B)
            .map(b => s"CASE WHEN abs(${tSql(b.toString)}) >= abs(${tSql("obs")}) THEN 1 ELSE 0 END")
            .mkString(" + ")
          s"""WITH u AS (
             |  SELECT user_id, avg(value) AS uv FROM events GROUP BY user_id),
             |h AS (SELECT uv,
             |         $hCols
             |      FROM u),
             |a AS (SELECT $aggCols
             |      FROM h)
             |SELECT round(${tSql("obs")}, 4) AS t_obs,
             |       CAST($B AS BIGINT) AS n_perms,
             |       CAST($extreme AS BIGINT) AS n_extreme,
             |       round(($extreme + 1) / ${(B + 1).toDouble}, 4) AS p_value
             |FROM a""".stripMargin
        }),

      // inter-arrival time fit: exponential-rate MLE λ=1/mean over
      // per-user event gaps + KS distance of the empirical gap CDF
      // from Exp(λ̂) — the Poissonity check behind every queueing/
      // capacity assumption. Gaps collapse to a DISTINCT-second
      // histogram (the samp_ks_test bound: values, never rows);
      // λ rounds to 10dp and the model CDF to 8dp so both engines
      // score identical deviations. KS evaluated at the observed
      // points (right-continuous form), documented + mirrored.
      "ev_interarrival" -> Q(
        (s, d) => {
          val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          val gaps = Tables.events(s, d)
            .withColumn("pts", lag("ts", 1).over(w))
            .filter(col("pts").isNotNull)
            .select(expr("(ts - pts) DIV 1000000000").as("gs"))
          val h = gaps.groupBy("gs").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false) // stats + ECDF passes
          val st = h.agg(sum("c").as("n"),
            round(sum(col("gs") * col("c")) / sum("c").cast("double"), 6).as("m"))
          val wc = Window.orderBy("gs").rowsBetween(Window.unboundedPreceding, 0)
          h.crossJoin(broadcast(st))
            .withColumn("lam", round(lit(1.0) / col("m"), 10))
            .withColumn("femp", sum("c").over(wc) / col("n").cast("double"))
            .withColumn("fexp",
              round(lit(1.0) - exp(-col("lam") * col("gs")), 8))
            .agg(max("n").as("n_gaps"), max(round(col("m"), 4)).as("mean_gap_s"),
              max(col("lam")).as("lambda_per_s"),
              round(max(abs(col("femp") - col("fexp"))), 4).as("ks_stat"))
        },
        Some("""WITH g AS (
               |  SELECT (ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               |           // 1000000000 AS gs
               |  FROM events),
               |h AS (SELECT gs, CAST(count(*) AS BIGINT) AS c FROM g
               |      WHERE gs IS NOT NULL GROUP BY gs),
               |st AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               |              round(sum(gs * c) / CAST(sum(c) AS DOUBLE), 6) AS m FROM h),
               |e AS (SELECT gs, c, n, m, round(1.0 / m, 10) AS lam,
               |             sum(c) OVER (ORDER BY gs) / CAST(n AS DOUBLE) AS femp
               |      FROM h, st)
               |SELECT CAST(max(n) AS BIGINT) AS n_gaps, max(round(m, 4)) AS mean_gap_s,
               |       max(lam) AS lambda_per_s,
               |       round(max(abs(femp - round(1.0 - exp(-lam * gs), 8))), 4) AS ks_stat
               |FROM e""".stripMargin)),

      // average local clustering coefficient (Watts–Strogatz) of the
      // near-dup graph: per-node Cᵢ = 2·triᵢ/(degᵢ(degᵢ−1)) averaged
      // over deg≥2 nodes — "do my neighbors know each other", the
      // node-level complement to graph_triangles' global transitivity.
      // Same bounded edge build + degree-oriented wedge join; each
      // closed triangle credits all three corners via one explode.
      "graph_local_cc" -> Q(
        (s, d) => {
          val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // degrees + orientation + closure
          val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("dg"))
          val or_ = e0
            .join(broadcast(deg.select(col("v").as("da"), col("dg").as("dga"))), "da")
            .join(broadcast(deg.select(col("v").as("db"), col("dg").as("dgb"))), "db")
            .select(
              when(col("dga") < col("dgb") ||
                   (col("dga") === col("dgb") && col("da") < col("db")),
                struct(col("da").as("u"), col("db").as("w")))
                .otherwise(struct(col("db").as("u"), col("da").as("w"))).as("e"))
            .select(col("e.u").as("u"), col("e.w").as("w"))
          val tri = or_.select(col("u"), col("w").as("v1"))
            .join(or_.select(col("u"), col("w").as("v2")), "u")
            .filter(col("v1") < col("v2"))
            .join(e0, col("v1") === col("da") && col("v2") === col("db"))
            .select(col("u"), col("v1"), col("v2"))
          val perNode = tri
            .select(explode(array(col("u"), col("v1"), col("v2"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("t"))
          deg.filter(col("dg") >= 2)
            .join(perNode, Seq("v"), "left")
            .na.fill(0L, Seq("t"))
            .select((col("t") * 2.0 / (col("dg") * (col("dg") - 1))).as("cc"))
            .agg(count(lit(1)).as("n_deg2_nodes"),
                 round(avg("cc"), 4).as("avg_local_cc"))
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
                |edges AS (SELECT da, db FROM (
                |    SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |    FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |  WHERE j >= 0.25),
                |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
                |    SELECT da AS v FROM edges UNION ALL SELECT db FROM edges)
                |  GROUP BY v),
                |orient AS (SELECT CASE WHEN a.dg < b.dg OR (a.dg = b.dg AND da < db)
                |                  THEN da ELSE db END AS u,
                |                  CASE WHEN a.dg < b.dg OR (a.dg = b.dg AND da < db)
                |                  THEN db ELSE da END AS w
                |           FROM edges JOIN deg a ON a.v = da JOIN deg b ON b.v = db),
                |tri AS (SELECT w1.u, w1.w AS v1, w2.w AS v2
                |        FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.w < w2.w
                |        JOIN edges ON w1.w = da AND w2.w = db),
                |pn AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
                |    SELECT u AS v FROM tri UNION ALL SELECT v1 FROM tri
                |    UNION ALL SELECT v2 FROM tri)
                |  GROUP BY v)
                |SELECT CAST(count(*) AS BIGINT) AS n_deg2_nodes,
                |       round(avg(coalesce(t, 0) * 2.0 / (dg * (dg - 1))), 4) AS avg_local_cc
                |FROM deg LEFT JOIN pn USING (v) WHERE dg >= 2""".stripMargin)))
  }

  // ---------------------------------------------------------------
  // Round-10 second wave: Markov-model diagnostics off the shared
  // transition-cell materialization, time-series trend/whiteness
  // tests, extreme-value and partial-correlation fits, and the dup
  // graph's degree distribution
  // ---------------------------------------------------------------

  private val round10bQ: Seq[(String, Q)] = Seq(
    // next-event majority-class baseline: predict argmax p(to|from)
    // and score it — the sanity floor every sequence model must beat.
    // Pure projection over the shared transitionCells table (zero
    // fact scans here); ties break to the lexicographically first
    // target on both engines.
    "ev_markov_accuracy" -> Q(
      (s, d) => {
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val wb = Window.partitionBy("from_type")
          .orderBy(col("n").desc, col("to_type"))
        val tot = pairs.groupBy("from_type").agg(sum("n").as("n_total"))
        pairs.withColumn("rk", row_number().over(wb))
          .filter(col("rk") === 1)
          .join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type").as("best_to"),
                  col("n").as("n_best"), col("n_total"),
                  round(col("n") / col("n_total"), 4).as("acc"))
          .orderBy("from_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |best AS (SELECT from_type, to_type, n,
             |           row_number() OVER (PARTITION BY from_type
             |                              ORDER BY n DESC, to_type) AS rk
             |         FROM cnt),
             |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_total
             |        FROM cnt GROUP BY 1)
             |SELECT from_type, b.to_type AS best_to, b.n AS n_best, n_total,
             |       round(b.n * 1.0 / n_total, 4) AS acc
             |FROM best b JOIN tot USING (from_type)
             |WHERE rk = 1 ORDER BY from_type""".stripMargin)),

    // entropy rate of the event-type Markov chain: H = −Σᵢ πᵢ Σⱼ
    // p_ij ln p_ij with π from the same 12 pinned power-iteration
    // rounds as ev_stationary — how predictable is the NEXT event
    // given the current one, on a 0 (deterministic) … ln k (uniform)
    // scale. Everything iterates off the shared transitionCells
    // materialization; rounded-to-0 cell probabilities (< 5e-7) are
    // excluded from the p·ln p sum on BOTH engines.
    "ev_markov_entropy" -> Q(
      (s, d) => {
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val tot = pairs.groupBy("from_type").agg(sum("n").as("tt"))
        val cells = pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"),
                  round(col("n") / col("tt"), 6).as("p"))
          .localCheckpoint(eager = false) // 12 iteration reads + entropy pass
        val states = cells.select("from_type").distinct()
        val kk = states.agg(count(lit(1)).as("k"))
        var v = states.crossJoin(broadcast(kk))
          .select(col("from_type").as("state"),
                  round(lit(1.0) / col("k"), 7).as("v"))
        for (_ <- 1 to 12)
          v = cells.join(broadcast(v), cells("from_type") === v("state"))
            .groupBy("to_type")
            .agg(round(sum(col("p") * col("v")), 7).as("v"))
            .withColumnRenamed("to_type", "state")
        val hi = cells.filter(col("p") > 0).groupBy("from_type")
          .agg(round(-sum(col("p") * log(col("p"))), 6).as("h_i"))
        val er = hi.join(v, hi("from_type") === v("state"))
          .agg(round(sum(col("v") * col("h_i")), 4).as("entropy_rate"))
        er.crossJoin(broadcast(kk))
          .select(col("k").as("n_states"), col("entropy_rate"),
                  when(col("k") > 1, round(log(col("k")), 4))
                    .otherwise(lit(null).cast("double")).as("max_entropy"),
                  when(col("k") > 1 && col("entropy_rate").isNotNull,
                       round(col("entropy_rate") / round(log(col("k")), 4), 4))
                    .otherwise(lit(null).cast("double")).as("efficiency"))
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, count(*) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |tot AS (SELECT from_type, sum(n) AS tt FROM cnt GROUP BY from_type),
             |cells AS MATERIALIZED (
             |  SELECT from_type, to_type, round(n * 1.0 / tt, 6) AS p
             |  FROM cnt JOIN tot USING (from_type)),
             |kk AS (SELECT count(DISTINCT from_type) AS k FROM cells),
             |v0 AS (SELECT DISTINCT from_type AS state, round(1.0 / k, 7) AS v
             |       FROM cells, kk),
             |${stationaryIterSql(12)},
             |hh AS (SELECT from_type AS state, round(-sum(p * ln(p)), 6) AS h_i
             |       FROM cells WHERE p > 0 GROUP BY from_type),
             |er AS (SELECT round(sum(v.v * h_i), 4) AS entropy_rate
             |       FROM v12 v JOIN hh USING (state))
             |SELECT CAST(k AS BIGINT) AS n_states, entropy_rate,
             |       CASE WHEN k > 1 THEN round(ln(k), 4) END AS max_entropy,
             |       CASE WHEN k > 1 AND entropy_rate IS NOT NULL
             |            THEN round(entropy_rate / round(ln(k), 4), 4)
             |       END AS efficiency
             |FROM er, kk""".stripMargin)),

    // Ljung–Box whiteness test per type: Q = n(n+2) Σ_{k≤3} r_k²/(n−k)
    // over the hourly-count series, with r_k the ts_acf pairwise
    // autocorrelation (identical aligned-pair corr on both engines,
    // rounded to 6 before squaring). Large Q ⇒ the series is NOT
    // white noise ⇒ the seasonal/trend models downstream have signal
    // to work with. Lags with n ≤ k or undefined r are excluded on
    // both sides; the hourly rollup is ONE checkpointed fact pass.
    "ts_ljung_box" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // lag pairs ×3 + the per-type n
        val nn = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"))
        val a = hourly.withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(round(corr("c", "cb"), 6).as("r"))
          .join(broadcast(nn), "event_type")
          .groupBy("event_type")
          .agg(max("n_hours").as("n_hours"),
               sum(when(col("r").isNotNull && col("n_hours") > col("k"), 1L)
                 .otherwise(0L)).as("n_lags"),
               round(max("n_hours") * (max("n_hours") + lit(2)) *
                 sum(when(col("r").isNotNull && col("n_hours") > col("k"),
                       pow(col("r"), 2) / (col("n_hours") - col("k")))
                   .otherwise(lit(0.0))), 4).as("q_lb"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, ts // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
             |       FROM hourly GROUP BY 1),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |rk AS (SELECT a.event_type, l.k, round(corr(a.c, b.c), 6) AS r
             |       FROM hourly a CROSS JOIN l
             |       JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k
             |       GROUP BY a.event_type, l.k)
             |SELECT event_type, max(n_hours) AS n_hours,
             |       CAST(sum(CASE WHEN r IS NOT NULL AND n_hours > k
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_lags,
             |       round(max(n_hours) * (max(n_hours) + 2) *
             |             sum(CASE WHEN r IS NOT NULL AND n_hours > k
             |                      THEN pow(r, 2) / (n_hours - k) ELSE 0.0 END),
             |             4) AS q_lb
             |FROM rk JOIN nn USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Mann–Kendall trend test + Sen's slope per type on the daily
    // count series: S = Σ_{i<j} sign(c_j − c_i), tie-corrected
    // var(S), continuity-corrected z, and the median pairwise slope.
    // The pair self-join is calendar²-bounded per type (the ts_pettitt
    // frame bound); the daily rollup is ONE checkpointed fact pass
    // read by pairs, ties, and the n frame.
    "ts_mann_kendall" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // pairs ×2 + ties + n
        val b = daily.select(col("event_type").as("et2"),
          col("day").as("day2"), col("c").as("c2"))
        val pr = daily.join(b, col("event_type") === col("et2") &&
            col("day2") > col("day"))
          .groupBy("event_type")
          .agg(sum(signum(col("c2") - col("c"))).cast("long").as("s_stat"),
               round(expr("percentile((c2 - c) / (day2 - day), 0.5D)"), 6)
                 .as("sen_slope"))
        val ties = daily.groupBy("event_type", "c")
          .agg(count(lit(1)).cast("double").as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
            .as("tie_term"))
        val nn = daily.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("nd"))
        val vs = (col("nd") * (col("nd") - 1) * (lit(2) * col("nd") + 5) -
                  col("tie_term")) / lit(18.0)
        nn.join(ties, "event_type")
          .join(pr, Seq("event_type"), "left")
          .select(col("event_type"), col("nd").cast("long").as("n_days"),
                  col("s_stat"), col("sen_slope"),
                  when(vs > 0 && col("s_stat").isNotNull,
                       round((col("s_stat") - signum(col("s_stat"))) /
                             sqrt(vs), 4))
                    .otherwise(lit(null).cast("double")).as("z"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |pr AS (SELECT a.event_type,
             |         CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat,
             |         round(quantile_cont((b.c - a.c) / (b.day - a.day), 0.5), 6)
             |           AS sen_slope
             |       FROM daily a JOIN daily b
             |         ON b.event_type = a.event_type AND b.day > a.day
             |       GROUP BY 1),
             |ties AS (SELECT event_type,
             |           sum(t * (t - 1) * (2 * t + 5)) AS tie_term
             |         FROM (SELECT event_type, CAST(count(*) AS DOUBLE) AS t
             |               FROM daily GROUP BY event_type, c)
             |         GROUP BY 1),
             |nn AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS nd
             |       FROM daily GROUP BY 1)
             |SELECT event_type, CAST(nd AS BIGINT) AS n_days, s_stat, sen_slope,
             |       CASE WHEN (nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0 > 0
             |                 AND s_stat IS NOT NULL
             |            THEN round((s_stat - sign(s_stat)) /
             |                   sqrt((nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0), 4)
             |       END AS z
             |FROM nn JOIN ties USING (event_type)
             |LEFT JOIN pr USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // Gumbel extreme-value fit of WEEKLY MAXIMA of daily counts per
    // type (method of moments: β = s√6/π, μ = m − γβ) — the
    // capacity-planning question "how big can a peak week get".
    // p_exceed_max = P(a future weekly max exceeds the observed max).
    // Two tiny rollups; moments rounded to 6 before the closed form
    // so both engines evaluate the identical expression.
    "stat_gumbel" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val weekly = daily
          .groupBy(col("event_type"), expr("day div 7").as("wk"))
          .agg(max("c").as("m"))
        val g = lit(0.5772156649015329) // Euler–Mascheroni
        weekly.groupBy("event_type")
          .agg(count(lit(1)).as("n_weeks"),
               round(avg("m"), 6).as("mean_max"),
               round(stddev_pop(col("m").cast("double")), 6).as("sd_max"),
               max("m").as("max_weekly"))
          .select(col("event_type"), col("n_weeks"), col("max_weekly"),
                  round(col("sd_max") * sqrt(lit(6.0)) / lit(math.Pi), 6)
                    .as("beta"),
                  round(col("mean_max") -
                    g * round(col("sd_max") * sqrt(lit(6.0)) / lit(math.Pi), 6), 6)
                    .as("mu"))
          .withColumn("p_exceed_max",
            when(col("beta") > 0,
                 round(lit(1.0) - exp(-exp(-(col("max_weekly") - col("mu")) /
                                            col("beta"))), 4))
              .otherwise(lit(null).cast("double")))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |weekly AS (SELECT event_type, day // 7 AS wk, max(c) AS m
             |           FROM daily GROUP BY 1, 2),
             |mom AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_weeks,
             |               round(avg(m), 6) AS mean_max,
             |               round(stddev_pop(CAST(m AS DOUBLE)), 6) AS sd_max,
             |               max(m) AS max_weekly
             |        FROM weekly GROUP BY 1),
             |fit AS (SELECT event_type, n_weeks, max_weekly,
             |          round(sd_max * sqrt(6.0) / pi(), 6) AS beta,
             |          round(mean_max - 0.5772156649015329 *
             |                round(sd_max * sqrt(6.0) / pi(), 6), 6) AS mu
             |        FROM mom)
             |SELECT event_type, n_weeks, max_weekly, beta, mu,
             |       CASE WHEN beta > 0
             |            THEN round(1.0 - exp(-exp(-(max_weekly - mu) / beta)), 4)
             |       END AS p_exceed_max
             |FROM fit ORDER BY event_type""".stripMargin)),

    // first-order partial correlation on lineitem: does quantity
    // correlate with revenue AFTER controlling for discount?
    // r_xy·z = (r_xy − r_xz r_yz)/√((1−r_xz²)(1−r_yz²)) off the three
    // pairwise corrs of ONE hash aggregate — the 3-variable
    // confounder check, zero joins, zero windows. Pairwise r rounded
    // to 6 so both engines feed the identical closed form.
    "stat_partial_corr" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.agg(count(lit(1)).as("n_rows"),
               round(corr("l_quantity", "l_extendedprice"), 6).as("r_xy"),
               round(corr("l_quantity", "l_discount"), 6).as("r_xz"),
               round(corr("l_extendedprice", "l_discount"), 6).as("r_yz"))
          .select(col("n_rows"), col("r_xy"), col("r_xz"), col("r_yz"),
                  when((lit(1.0) - pow(col("r_xz"), 2)) > 0 &&
                       (lit(1.0) - pow(col("r_yz"), 2)) > 0,
                       round((col("r_xy") - col("r_xz") * col("r_yz")) /
                             sqrt((lit(1.0) - pow(col("r_xz"), 2)) *
                                  (lit(1.0) - pow(col("r_yz"), 2))), 4))
                    .otherwise(lit(null).cast("double")).as("r_xy_given_z"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |         round(corr(l_quantity, l_extendedprice), 6) AS r_xy,
             |         round(corr(l_quantity, l_discount), 6) AS r_xz,
             |         round(corr(l_extendedprice, l_discount), 6) AS r_yz
             |  FROM lineitem)
             |SELECT n_rows, r_xy, r_xz, r_yz,
             |       CASE WHEN (1.0 - pow(r_xz, 2)) > 0 AND (1.0 - pow(r_yz, 2)) > 0
             |            THEN round((r_xy - r_xz * r_yz) /
             |                   sqrt((1.0 - pow(r_xz, 2)) * (1.0 - pow(r_yz, 2))), 4)
             |       END AS r_xy_given_z
             |FROM c""".stripMargin)),

    // degree distribution of the near-dup graph: log2-bucketed degree
    // histogram + the discrete Hill/MLE power-law exponent
    // α = 1 + n/Σ ln(dᵢ/(d_min−½)) with d_min = 1 — is dup-degree
    // heavy-tailed (one mega-cluster) or thin (pairwise dups)?
    // Shares the bounded edge build every graph_* query uses; the
    // 1-row α frame broadcasts onto the ≤log2(n)-row histogram.
    "graph_degree_dist" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false) // degrees read by hist AND alpha
        val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("dg"))
          .localCheckpoint(eager = false)
        val alpha = deg.agg(count(lit(1)).as("n_nodes"),
            round(lit(1.0) + count(lit(1)) /
              sum(log(col("dg") / lit(0.5))), 4).as("alpha_hill"))
        deg.groupBy(floor(log2(col("dg"))).cast("long").as("deg_bucket"))
          .agg(count(lit(1)).as("n_in_bucket"))
          .crossJoin(broadcast(alpha))
          .select(col("deg_bucket"), col("n_in_bucket"),
                  col("n_nodes"), col("alpha_hill"))
          .orderBy("deg_bucket")
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
              |        FROM (SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)
              |        GROUP BY v),
              |al AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
              |              round(1.0 + count(*) / sum(ln(dg / 0.5)), 4) AS alpha_hill
              |       FROM deg)
              |SELECT CAST(floor(log2(dg)) AS BIGINT) AS deg_bucket,
              |       CAST(count(*) AS BIGINT) AS n_in_bucket, n_nodes, alpha_hill
              |FROM deg, al
              |GROUP BY 1, n_nodes, alpha_hill ORDER BY 1""".stripMargin)),

    // Dirichlet query-likelihood retrieval (Zhai & Lafferty 2001) —
    // the probabilistic LM complement to BM25 over the same
    // one-explode shuffle; zero-tf query terms contribute the
    // smoothed collection mass so scores are comparable across docs
    "text_lmir" -> Q(
      (s, d) => graft.text.Bm25.dirichletQL(
        Tables.documents(s, d), Seq("spark", "hash", "merge"), 10),
      Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |              FROM documents),
             |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
             |tc AS (SELECT sum(dl) AS t_coll FROM dl),
             |hits AS (SELECT doc_id, tok
             |         FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
             |         WHERE tok IN ('spark', 'hash', 'merge')),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
             |       FROM hits GROUP BY 1, 2),
             |cf AS (SELECT tok, CAST(count(*) AS DOUBLE) AS cf FROM hits GROUP BY 1),
             |m AS (SELECT DISTINCT doc_id FROM tf),
             |terms AS (SELECT unnest(['spark', 'hash', 'merge']) AS tok)
             |SELECT doc_id,
             |       CAST(sum(CASE WHEN tf.tf IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_hit_terms,
             |       round(sum(ln((coalesce(tf.tf, 0.0) + 2000.0 * cf / t_coll) /
             |                    (dl + 2000.0))), 4) AS ql
             |FROM m CROSS JOIN terms
             |LEFT JOIN tf USING (doc_id, tok)
             |JOIN cf USING (tok) JOIN dl USING (doc_id), tc
             |GROUP BY doc_id ORDER BY ql DESC, doc_id LIMIT 10""".stripMargin)),

    // lexicon-based sentiment scoring per language: mean token
    // valence over matched terms per doc, rolled up per lang — the
    // cheap quality/tone signal next to text_quality. The 4-term
    // valence lexicon is a broadcast literal on both engines; docs
    // with no lexicon hit are excluded from the doc average (counted
    // separately) rather than imputed 0.
    "text_sentiment" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val lex = s.createDataFrame(Seq(
          ("fast", 2.0), ("slow", -2.0), ("big", 1.0), ("small", -1.0)))
          .toDF("tok", "val")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
                  explode(TextPrimitives.tokens(col("text"))).as("tok"))
        val perDoc = toks.join(broadcast(lex), "tok")
          .groupBy("doc_id", "lang")
          .agg(round(avg("val"), 6).as("sent"), count(lit(1)).as("n_hits"))
        val nd = Tables.documents(s, d).groupBy("lang")
          .agg(count(lit(1)).as("n_docs"))
        perDoc.groupBy("lang")
          .agg(count(lit(1)).as("n_scored"),
               round(avg("sent"), 4).as("mean_sentiment"),
               sum(when(col("sent") > 0, 1L).otherwise(0L)).as("n_positive"))
          .join(broadcast(nd), "lang")
          .select(col("lang"), col("n_docs"), col("n_scored"),
                  col("mean_sentiment"), col("n_positive"))
          .orderBy("lang")
      },
      Some("""WITH lex AS (SELECT * FROM (VALUES ('fast', 2.0), ('slow', -2.0),
             |                                   ('big', 1.0), ('small', -1.0))
             |             AS t(tok, val)),
             |toks AS (SELECT doc_id, lang, unnest(
             |           regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |         FROM documents),
             |pd AS (SELECT doc_id, lang, round(avg(val), 6) AS sent,
             |              CAST(count(*) AS BIGINT) AS n_hits
             |       FROM toks JOIN lex USING (tok) GROUP BY 1, 2),
             |nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
             |       FROM documents GROUP BY 1)
             |SELECT lang, n_docs, CAST(count(*) AS BIGINT) AS n_scored,
             |       round(avg(sent), 4) AS mean_sentiment,
             |       CAST(sum(CASE WHEN sent > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_positive
             |FROM pd JOIN nd USING (lang)
             |GROUP BY lang, n_docs ORDER BY lang""".stripMargin)),

    // vocabulary diversity indices per source: Simpson's D = Σpᵢ²
    // (repeat probability), Berger–Parker dominance = max pᵢ, and
    // Pielou evenness J = H/ln V — the one-pass diversity triple the
    // data card reports next to raw entropy. Two hash aggregates
    // ((source,tok) counts → per-source moments), no windows.
    "text_diversity" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val tc = Tables.documents(s, d)
          .select(col("source"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).cast("double").as("c"))
        tc.groupBy("source")
          .agg(sum("c").as("n_tok"), count(lit(1)).as("v_types"),
               sum(col("c") * col("c")).as("sq"),
               max("c").as("mx"),
               sum(col("c") * log(col("c"))).as("clc"))
          .select(col("source"), col("n_tok").cast("long").as("n_tok"),
                  col("v_types"),
                  round(col("sq") / (col("n_tok") * col("n_tok")), 6).as("simpson_d"),
                  round(col("mx") / col("n_tok"), 6).as("berger_parker"),
                  when(col("v_types") > 1,
                       round((log(col("n_tok")) - col("clc") / col("n_tok")) /
                             log(col("v_types").cast("double")), 4))
                    .otherwise(lit(null).cast("double")).as("evenness"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS DOUBLE) AS c
             |  FROM (SELECT source, unnest(
             |          regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2),
             |m AS (SELECT source, sum(c) AS n_tok,
             |             CAST(count(*) AS BIGINT) AS v_types,
             |             sum(c * c) AS sq, max(c) AS mx,
             |             sum(c * ln(c)) AS clc
             |      FROM tc GROUP BY 1)
             |SELECT source, CAST(n_tok AS BIGINT) AS n_tok, v_types,
             |       round(sq / (n_tok * n_tok), 6) AS simpson_d,
             |       round(mx / n_tok, 6) AS berger_parker,
             |       CASE WHEN v_types > 1
             |            THEN round((ln(n_tok) - clc / n_tok) /
             |                       ln(CAST(v_types AS DOUBLE)), 4)
             |       END AS evenness
             |FROM m ORDER BY source""".stripMargin)),

    // sorted-neighborhood blocking (Hernández & Stolfo 1995): docs
    // sorted by (length-block, 24-char prefix key), each compared to
    // its next 2 neighbors only — the classic entity-resolution
    // candidate generator, O(n·w) pairs instead of O(n²). Candidates
    // rescored by exact distinct-token Jaccard (map-side set HOFs on
    // the bounded pair frame); the rank join is the ts_acf aligned
    // equi-join idiom, keyed on (block, rank+k).
    "dedup_sorted_nbrhood" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val base = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"), expr("n_chars DIV 64").as("blk"),
                  lower(substring(trim(col("text")), 1, 24)).as("sk"),
                  array_distinct(TextPrimitives.tokens(col("text"))).as("ts"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("blk").orderBy("sk", "doc_id")))
          .localCheckpoint(eager = false) // both sides of the rank join
        val a = base.withColumn("k", explode(array(lit(1), lit(2))))
        val b = base.select(col("blk").as("blk2"), col("rn").as("rn2"),
          col("doc_id").as("doc2"), col("ts").as("ts2"))
        a.join(b, col("blk") === col("blk2") && col("rn2") === col("rn") + col("k"))
          .withColumn("inter",
            size(array_intersect(col("ts"), col("ts2"))).cast("double"))
          .withColumn("uni",
            (size(col("ts")) + size(col("ts2"))).cast("double") - col("inter"))
          .filter(col("uni") > 0)
          .select(least(col("doc_id"), col("doc2")).as("da"),
                  greatest(col("doc_id"), col("doc2")).as("db"),
                  round(col("inter") / col("uni"), 4).as("j_sn"))
          .filter(col("j_sn") >= 0.5)
          .orderBy("da", "db")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT doc_id, n_chars // 64 AS blk,
             |         lower(substr(trim(text), 1, 24)) AS sk,
             |         list_distinct(
             |           regexp_split_to_array(lower(trim(text)), '\s+')) AS ts,
             |         row_number() OVER (PARTITION BY n_chars // 64
             |           ORDER BY lower(substr(trim(text), 1, 24)), doc_id) AS rn
             |  FROM documents WHERE text IS NOT NULL),
             |k AS (SELECT unnest([1, 2]) AS k),
             |pr AS (SELECT a.doc_id AS x, b.doc_id AS y, a.ts AS ta, b.ts AS tb
             |       FROM base a CROSS JOIN k
             |       JOIN base b ON b.blk = a.blk AND b.rn = a.rn + k.k),
             |sc AS (SELECT x, y,
             |         CAST(len(list_filter(ta, t -> list_contains(tb, t))) AS DOUBLE)
             |           AS inter,
             |         CAST(len(ta) + len(tb) AS DOUBLE) -
             |           len(list_filter(ta, t -> list_contains(tb, t))) AS uni
             |       FROM pr)
             |SELECT least(x, y) AS da, greatest(x, y) AS db,
             |       round(inter / uni, 4) AS j_sn
             |FROM sc WHERE uni > 0 AND round(inter / uni, 4) >= 0.5
             |ORDER BY da, db""".stripMargin)),

    // CUPED variance reduction (Deng et al. 2013): pre-period
    // purchases as the covariate, θ = cov(X,Y)/var(X) estimated once
    // globally (rounded to 6 on both engines), per-arm adjusted means
    // + the realized variance-reduction factor. The experiment
    // sensitivity upgrade every A/B platform ships; one fact rollup,
    // θ and the pre-mean broadcast as a 1-row frame.
    "ev_cuped" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ud = Tables.events(s, d)
          .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
          .localCheckpoint(eager = false) // bounds + the per-user xy rollup
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val uxy = ud.crossJoin(broadcast(bounds))
          // div not /: Spark's long `/` is double division, which
          // would ceil the midpoint when mn+mx+1 is odd while the
          // oracle's `//` floors it (even on current testdata, but
          // the split must not depend on that)
          .withColumn("post", (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(sum(when(col("post") === 0, col("p")).otherwise(0L))
                 .cast("double").as("x"),
               sum(when(col("post") === 1, col("p")).otherwise(0L))
                 .cast("double").as("y"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // theta pass + per-arm pass
        val th = uxy.agg(
          when(var_pop("x") > 0, round(covar_pop("x", "y") / var_pop("x"), 6))
            .otherwise(lit(0.0)).as("theta"),
          round(avg("x"), 6).as("x_bar"))
        uxy.crossJoin(broadcast(th))
          .withColumn("y_adj", col("y") - col("theta") * (col("x") - col("x_bar")))
          .groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
               round(avg("y"), 6).as("mean_y"),
               round(avg("y_adj"), 6).as("mean_y_cuped"),
               round(var_pop("y"), 6).as("var_y"),
               round(var_pop("y_adj"), 6).as("var_y_cuped"),
               when(var_pop("y") > 0,
                    round(lit(1.0) - var_pop("y_adj") / var_pop("y"), 4))
                 .otherwise(lit(null).cast("double")).as("var_reduction"))
          .orderBy("arm")
      },
      Some("""WITH ud AS (
             |  SELECT user_id, ts // 86400000000000 AS day,
             |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
             |uxy AS MATERIALIZED (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN day >= (mn + mx + 1) // 2 THEN 0 ELSE p END)
             |              AS DOUBLE) AS x,
             |         CAST(sum(CASE WHEN day >= (mn + mx + 1) // 2 THEN p ELSE 0 END)
             |              AS DOUBLE) AS y,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 2 AS arm
             |  FROM ud, b GROUP BY user_id),
             |th AS (SELECT CASE WHEN var_pop(x) > 0
             |                   THEN round(covar_pop(x, y) / var_pop(x), 6)
             |                   ELSE 0.0 END AS theta,
             |              round(avg(x), 6) AS x_bar
             |       FROM uxy),
             |adj AS (SELECT arm, y, y - theta * (x - x_bar) AS y_adj FROM uxy, th)
             |SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(y), 6) AS mean_y,
             |       round(avg(y_adj), 6) AS mean_y_cuped,
             |       round(var_pop(y), 6) AS var_y,
             |       round(var_pop(y_adj), 6) AS var_y_cuped,
             |       CASE WHEN var_pop(y) > 0
             |            THEN round(1.0 - var_pop(y_adj) / var_pop(y), 4)
             |       END AS var_reduction
             |FROM adj GROUP BY arm ORDER BY arm""".stripMargin)),

    // t-closeness audit (Li et al. 2007): per QI group (lang, source),
    // the ordered-EMD distance between the group's sensitive-value
    // distribution (length bins) and the global one —
    // t = Σ|cum(p−q)|/(m−1). Complements k-anonymity/l-diversity:
    // a group can be k-anonymous yet leak via a skewed value dist.
    // Grid = groups × bins (bounded), zero-filled; cumsum windows run
    // partitioned per group; both dists rounded to 6 pre-cumsum.
    "priv_t_closeness" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("lang"), col("source"), expr("n_chars DIV 200").as("bin"))
          .localCheckpoint(eager = false) // global dist + group dist
        val glob = docs.groupBy("bin").agg(count(lit(1)).as("gc"))
        val globN = docs.agg(count(lit(1)).as("gn"))
        val q = glob.crossJoin(broadcast(globN))
          .select(col("bin"), round(col("gc") / col("gn"), 6).as("qp"))
        val grp = docs.groupBy("lang", "source").agg(count(lit(1)).as("n_rows"))
        val cells = docs.groupBy("lang", "source", "bin").agg(count(lit(1)).as("c"))
        val grid = grp.crossJoin(broadcast(q))
          .join(cells, Seq("lang", "source", "bin"), "left")
          .select(col("lang"), col("source"), col("bin"), col("n_rows"), col("qp"),
                  round(coalesce(col("c"), lit(0L)) / col("n_rows"), 6).as("pp"))
        val wc = Window.partitionBy("lang", "source").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mBins = glob.agg(count(lit(1)).as("m"))
        grid.withColumn("cum", sum(col("pp") - col("qp")).over(wc))
          .groupBy("lang", "source")
          .agg(max("n_rows").as("n_rows"), sum(abs(col("cum"))).as("s"))
          .crossJoin(broadcast(mBins))
          .select(col("lang"), col("source"), col("n_rows"),
                  when(col("m") > 1, round(col("s") / (col("m") - 1), 4))
                    .otherwise(lit(null).cast("double")).as("t_dist"))
          .withColumn("violates_t02",
            when(col("t_dist").isNotNull, col("t_dist") > 0.2))
          .orderBy("lang", "source")
      },
      Some("""WITH docs AS (SELECT lang, source, n_chars // 200 AS bin FROM documents),
             |gl AS (SELECT bin, CAST(count(*) AS BIGINT) AS gc FROM docs GROUP BY 1),
             |gn AS (SELECT CAST(count(*) AS BIGINT) AS gn FROM docs),
             |q AS (SELECT bin, round(gc * 1.0 / gn, 6) AS qp FROM gl, gn),
             |grp AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows
             |        FROM docs GROUP BY 1, 2),
             |cells AS (SELECT lang, source, bin, CAST(count(*) AS BIGINT) AS c
             |          FROM docs GROUP BY 1, 2, 3),
             |grid AS (SELECT g.lang, g.source, q.bin, g.n_rows, q.qp,
             |                round(coalesce(c.c, 0) * 1.0 / g.n_rows, 6) AS pp
             |         FROM grp g CROSS JOIN q
             |         LEFT JOIN cells c ON c.lang = g.lang AND c.source = g.source
             |                           AND c.bin = q.bin),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM gl),
             |cm AS (SELECT lang, source, n_rows,
             |              sum(pp - qp) OVER (PARTITION BY lang, source ORDER BY bin
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |       FROM grid)
             |SELECT lang, source, n_rows,
             |       CASE WHEN m > 1 THEN round(sum(abs(cum)) / (m - 1), 4) END AS t_dist,
             |       CASE WHEN m > 1 THEN round(sum(abs(cum)) / (m - 1), 4) > 0.2
             |       END AS violates_t02
             |FROM cm, m
             |GROUP BY lang, source, n_rows, m ORDER BY lang, source""".stripMargin)))

  // ---------------------------------------------------------------
  // Round-10 third wave: normality / effect-size / paired tests for
  // the experimentation family, the classic lexical repeat-rate
  // statistic, and ranked-retrieval MAP/MRR evaluation
  // ---------------------------------------------------------------

  private val round10cQ: Seq[(String, Q)] = Seq(
    // Jarque–Bera normality test per event_type: JB = n/6·(S² + K²/4)
    // from the SAME two-pass centered power sums as stat_moments
    // (broadcast per-type mean rounded to 6, so both engines center
    // identically), p = exp(−JB/2) — the χ²₂ survival function in
    // closed form, no special functions needed. S and K are rounded
    // to 6 BEFORE entering JB so the engines feed the statistic the
    // identical argument. Zero-variance / tiny groups NULL out.
    "stat_jarque_bera" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
        val mus = ev.groupBy("event_type")
          .agg(round(sum("value") / count(lit(1)), 6).as("mu"))
        val vr = col("m2s") / col("n")
        val sk = round((col("m3s") / col("n")) / pow(vr, 1.5), 6)
        val ku = round((col("m4s") / col("n")) / pow(vr, 2) - lit(3), 6)
        ev.join(broadcast(mus), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
               sum(pow(col("value") - col("mu"), 2)).as("m2s"),
               sum(pow(col("value") - col("mu"), 3)).as("m3s"),
               sum(pow(col("value") - col("mu"), 4)).as("m4s"))
          .withColumn("jb",
            when(vr <= 0 || col("n") < 4, lit(null).cast("double"))
              .otherwise(round(col("n") / 6 * (sk * sk + ku * ku / 4), 4)))
          .select(col("event_type"), col("n").cast("long").as("n_rows"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(sk).as("skew"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(ku).as("kurt"),
                  col("jb"),
                  when(col("jb").isNull, lit(null).cast("double"))
                    .otherwise(round(exp(-col("jb") / 2), 6)).as("p_normal"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, value FROM events
             |            WHERE value IS NOT NULL AND NOT isnan(value)),
             |mus AS (SELECT event_type, round(sum(value) / count(*), 6) AS mu
             |        FROM ev GROUP BY 1),
             |cm AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             |              sum(pow(value - mu, 2)) AS m2s,
             |              sum(pow(value - mu, 3)) AS m3s,
             |              sum(pow(value - mu, 4)) AS m4s
             |       FROM ev JOIN mus USING (event_type) GROUP BY 1),
             |sk AS (SELECT event_type, n, m2s / n AS vr,
             |              round((m3s / n) / pow(m2s / n, 1.5), 6) AS s,
             |              round((m4s / n) / pow(m2s / n, 2) - 3, 6) AS k
             |       FROM cm WHERE m2s / n > 0),
             |jbt AS (SELECT event_type, n, vr, s, k,
             |               CASE WHEN n < 4 THEN NULL
             |                    ELSE round(n / 6 * (s * s + k * k / 4), 4) END AS jb
             |        FROM sk),
             |z AS (SELECT cm.event_type, cm.n, jbt.s, jbt.k, jbt.jb
             |      FROM cm LEFT JOIN jbt USING (event_type))
             |SELECT event_type, CAST(n AS BIGINT) AS n_rows, s AS skew, k AS kurt,
             |       jb, CASE WHEN jb IS NULL THEN NULL
             |                ELSE round(exp(-jb / 2), 6) END AS p_normal
             |FROM z ORDER BY event_type""".stripMargin)),

    // Cohen's d + Hedges' g effect size of the en-vs-de doc-length
    // difference — the "how big in SD units" companion to
    // stat_welch_t (parametric) and stat_cliffs_delta (ordinal).
    // Pooled-SD d with the small-sample g correction 1 − 3/(4N−9);
    // conventional magnitude labels off the ROUNDED d so a boundary
    // ulp can't differ between engines. One grouped pass, two 1-row
    // frames crossed.
    "stat_cohens_d" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .groupBy("lang")
          .agg(count(lit(1)).cast("double").as("n"),
               avg(col("n_chars").cast("double")).as("m"),
               var_samp(col("n_chars").cast("double")).as("v"))
          .localCheckpoint(eager = false) // read twice (both langs)
        val a = g.filter(col("lang") === "en")
          .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
        val b = g.filter(col("lang") === "de")
          .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
        val sp2 = ((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2")) /
          (col("n1") + col("n2") - 2)
        val dC = round((col("m1") - col("m2")) / sqrt(sp2), 6)
        val bad = col("n1") < 2 || col("n2") < 2 || sp2 <= 0
        a.crossJoin(b).select(
          col("n1").cast("long").as("n_en"), col("n2").cast("long").as("n_de"),
          round(col("m1") - col("m2"), 4).as("mean_diff"),
          when(bad, lit(null).cast("double")).otherwise(dC).as("cohens_d"),
          when(bad, lit(null).cast("double"))
            .otherwise(round(dC * (lit(1.0) - lit(3.0) /
              (lit(4.0) * (col("n1") + col("n2")) - 9)), 6)).as("hedges_g"),
          when(bad, lit(null).cast("string")).otherwise(
            when(abs(dC) < 0.2, "negligible")
              .when(abs(dC) < 0.5, "small")
              .when(abs(dC) < 0.8, "medium")
              .otherwise("large")).as("magnitude"))
      },
      Some("""WITH g AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |                  avg(CAST(n_chars AS DOUBLE)) AS m,
             |                  var_samp(CAST(n_chars AS DOUBLE)) AS v
             |           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
             |a AS (SELECT n AS n1, m AS m1, v AS v1 FROM g WHERE lang = 'en'),
             |b AS (SELECT n AS n2, m AS m2, v AS v2 FROM g WHERE lang = 'de'),
             |c AS (SELECT n1, n2, m1 - m2 AS md,
             |             ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2) AS sp2
             |      FROM a, b),
             |e AS (SELECT n1, n2, md, sp2,
             |             CASE WHEN n1 < 2 OR n2 < 2 OR sp2 <= 0 THEN NULL
             |                  ELSE round(md / sqrt(sp2), 6) END AS dd
             |      FROM c)
             |SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n2 AS BIGINT) AS n_de,
             |       round(md, 4) AS mean_diff, dd AS cohens_d,
             |       CASE WHEN dd IS NULL THEN NULL
             |            ELSE round(dd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9)), 6)
             |       END AS hedges_g,
             |       CASE WHEN dd IS NULL THEN NULL
             |            WHEN abs(dd) < 0.2 THEN 'negligible'
             |            WHEN abs(dd) < 0.5 THEN 'small'
             |            WHEN abs(dd) < 0.8 THEN 'medium'
             |            ELSE 'large' END AS magnitude
             |FROM e""".stripMargin)),

    // McNemar's paired test on pre→post purchase conversion: did the
    // SAME users' purchase behavior change across the midpoint split
    // (ev_cuped's calendar halves)? Only the discordant pairs b
    // (pre-only) and c (post-only) carry signal; continuity-corrected
    // χ² = (|b−c|−1)²/(b+c), p from the χ²₁ survival function
    // erfc(√(χ²/2)) via the A&S 7.1.26 polynomial (stat_fdr's exact
    // closed form; χ² rounded to 6 before feeding it). ONE fact
    // rollup → per-user pair → 4 counts; everything after is 1-row
    // arithmetic.
    "stat_mcnemar" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
          .localCheckpoint(eager = false) // bounds + the per-user pair rollup
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val up = ud.crossJoin(broadcast(bounds))
          // integer floor-division: Spark's `/` on longs returns
          // double, which would ceil the comparison when mn+mx+1 is
          // odd while DuckDB's `//` floors it
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(max(when(col("post") === 0 && col("p") > 0, 1L).otherwise(0L)).as("x"),
               max(when(col("post") === 1 && col("p") > 0, 1L).otherwise(0L)).as("y"))
        val xx = sqrt(col("chi2") / 2)
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        up.agg(count(lit(1)).as("n_users"),
               sum(when(col("x") === 1 && col("y") === 1, 1L).otherwise(0L)).as("n_both"),
               sum(when(col("x") === 1 && col("y") === 0, 1L).otherwise(0L)).as("b"),
               sum(when(col("x") === 0 && col("y") === 1, 1L).otherwise(0L)).as("c"))
          .withColumn("chi2",
            when(col("b") + col("c") === 0, lit(null).cast("double"))
              .otherwise(round(pow(abs(col("b") - col("c")) - lit(1.0), 2) /
                (col("b") + col("c")), 6)))
          .select(col("n_users"), col("n_both"), col("b").as("n_pre_only"),
                  col("c").as("n_post_only"), col("chi2"),
                  when(col("chi2").isNull, lit(null).cast("double")).otherwise(
                    round(t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                      + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                      + t1 * lit(1.061405429)))))
                      * exp(-xx * xx), 6)).as("p_value"))
      },
      Some("""WITH ud AS (
             |  SELECT user_id, ts // 86400000000000 AS day,
             |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
             |  FROM events GROUP BY 1, 2),
             |bb AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
             |up AS (SELECT user_id,
             |         max(CASE WHEN day < (mn + mx + 1) // 2 AND p > 0 THEN 1 ELSE 0 END) AS x,
             |         max(CASE WHEN day >= (mn + mx + 1) // 2 AND p > 0 THEN 1 ELSE 0 END) AS y
             |       FROM ud, bb GROUP BY user_id),
             |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |              CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             |              CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |              CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
             |       FROM up),
             |ch AS (SELECT *, CASE WHEN b + c = 0 THEN NULL
             |                      ELSE round(pow(abs(b - c) - 1.0, 2) / (b + c), 6)
             |                 END AS chi2
             |       FROM ct),
             |t AS (SELECT *, sqrt(chi2 / 2) AS xx,
             |             1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2)) AS t1
             |      FROM ch)
             |SELECT n_users, n_both, b AS n_pre_only, c AS n_post_only, chi2,
             |       CASE WHEN chi2 IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736 + t1 * (1.421413741
             |           + t1 * (-1.453152027 + t1 * 1.061405429))))
             |         * exp(-xx * xx), 6) END AS p_value
             |FROM t""".stripMargin)),

    // Yule's characteristic K per source — the classic vocabulary
    // repeat-rate constant K = 10⁴·(Σc² − N)/N² (Yule 1944), scale-
    // invariant unlike raw TTR, so sources of different sizes compare
    // directly. Same two hash aggregates as text_diversity (the
    // (source,tok) count table), different invariant.
    "text_yule_k" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        Tables.documents(s, d)
          .select(col("source"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).cast("double").as("c"))
          .groupBy("source")
          .agg(sum("c").as("n_tok"), count(lit(1)).as("v_types"),
               sum(col("c") * col("c")).as("s2"))
          .select(col("source"), col("n_tok").cast("long").as("n_tok"),
                  col("v_types"),
                  round(lit(10000.0) * (col("s2") - col("n_tok")) /
                        (col("n_tok") * col("n_tok")), 4).as("yule_k"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS DOUBLE) AS c
             |  FROM (SELECT source, unnest(
             |          regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2)
             |SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
             |       CAST(count(*) AS BIGINT) AS v_types,
             |       round(10000.0 * (sum(c * c) - sum(c)) / (sum(c) * sum(c)), 4)
             |         AS yule_k
             |FROM tc GROUP BY source ORDER BY source""".stripMargin)),

    // MAP@10 + MRR of embedding search (relevance = same-lang, the
    // text_ndcg protocol) — the order-sensitive precision companion
    // to NDCG's graded gain: AP averages precision at each relevant
    // hit, RR scores only the first. Same bounded 5-query broadcast
    // scoring pass; the per-query running-precision sum is a ≤10-row
    // window inside the top-10 slice.
    "text_map_mrr" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val docs = Tables.documents(s, d)
        val raw = graft.embed.HashEmbedder.embedDocsRaw(docs, "doc_id", "text", 64)
          .join(docs.select("doc_id", "lang"), "doc_id")
        val qs = raw.filter(col("doc_id") <= 5)
          .select(col("doc_id").as("qid"), col("embedding").as("qv"),
                  col("lang").as("qlang"))
        val scored = raw.crossJoin(broadcast(qs))
          .filter(col("doc_id") =!= col("qid"))
          .select(col("qid"), col("qlang"), col("doc_id"), col("lang"),
            score(col("embedding"), col("qv")).as("sc"))
        val w = Window.partitionBy("qid").orderBy(col("sc").desc, col("doc_id"))
        val wc = Window.partitionBy("qid").orderBy("rnk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val top = scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .withColumn("rel", when(col("lang") === col("qlang"), 1L).otherwise(0L))
          .withColumn("cum_rel", sum("rel").over(wc))
          .groupBy("qid")
          .agg(sum(when(col("rel") === 1,
                 col("cum_rel").cast("double") / col("rnk")).otherwise(0.0))
                 .as("ap_num"),
               max(when(col("rel") === 1, lit(1.0) / col("rnk"))).as("rr_raw"),
               sum("rel").as("n_rel_top10"))
        val rel = scored.groupBy("qid")
          .agg(sum(when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("n_rel"))
        top.join(rel, "qid")
          .select(col("qid"), col("n_rel_top10"),
            when(col("n_rel") === 0, lit(null).cast("double"))
              .otherwise(round(col("ap_num") / least(lit(10L), col("n_rel")), 4))
              .as("ap10"),
            coalesce(round(col("rr_raw"), 4), lit(0.0)).as("rr"))
          .orderBy("qid")
      },
      Some {
        val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
        s"""WITH sums AS (
           |${graft.embed.HashEmbedder.rawSumsSql(64)}),
           |lg AS (SELECT doc_id, lang FROM documents),
           |qs AS (SELECT sums.doc_id AS qid, lang AS qlang, sums.*
           |       FROM sums JOIN lg USING (doc_id) WHERE doc_id <= 5),
           |sc AS (SELECT ss.qid, ss.qlang, ss.doc_id, lg.lang,
           |              round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
           |                         ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS sc
           |       FROM (SELECT s.doc_id, q.qid, q.qlang, ($dot) AS dot,
           |                    ($na) AS na, ($nb) AS nb
           |             FROM sums s JOIN qs q ON s.doc_id <> q.qid) ss
           |       JOIN lg ON ss.doc_id = lg.doc_id),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc DESC, doc_id) AS rnk
           |       FROM sc),
           |top AS (SELECT qid, rnk,
           |          CASE WHEN lang = qlang THEN 1 ELSE 0 END AS rel,
           |          sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) OVER (
           |            PARTITION BY qid ORDER BY rnk
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel
           |        FROM rk WHERE rnk <= 10),
           |ag AS (SELECT qid,
           |         sum(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rnk
           |                  ELSE 0.0 END) AS ap_num,
           |         max(CASE WHEN rel = 1 THEN 1.0 / rnk END) AS rr_raw,
           |         CAST(sum(rel) AS BIGINT) AS n_rel_top10
           |       FROM top GROUP BY qid),
           |rel AS (SELECT qid, CAST(sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
           |        FROM sc GROUP BY qid)
           |SELECT ag.qid, n_rel_top10,
           |       CASE WHEN n_rel = 0 THEN NULL
           |            ELSE round(ap_num / least(10, n_rel), 4) END AS ap10,
           |       coalesce(round(rr_raw, 4), 0.0) AS rr
           |FROM ag JOIN rel USING (qid) ORDER BY ag.qid""".stripMargin
      }),

    // rich-club coefficient φ(k) of the near-dup graph: among nodes
    // of degree > k, the realized fraction of possible edges — "do
    // the hub documents all duplicate each other?" (mega-cluster
    // early warning, complements graph_assort/graph_degree_dist).
    // Degree table is a broadcast |V|-row join-back onto the shared
    // bounded edge build; k sweep is a 3-row literal cross.
    "graph_rich_club" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false) // degrees + edge filter
        val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("dg"))
          .localCheckpoint(eager = false) // N_k pass + both join-backs
        val ks = s.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)))
          .toDF("k")
        val nk = deg.crossJoin(broadcast(ks)).filter(col("dg") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_k"))
        val ek = e0
          .join(broadcast(deg.select(col("v").as("da"), col("dg").as("dga"))), "da")
          .join(broadcast(deg.select(col("v").as("db"), col("dg").as("dgb"))), "db")
          .crossJoin(broadcast(ks))
          .filter(col("dga") > col("k") && col("dgb") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("e_k"))
        nk.join(ek, Seq("k"), "left")
          .select(col("k"), col("n_k"), coalesce(col("e_k"), lit(0L)).as("e_k"),
            when(col("n_k") >= 2,
              round(lit(2.0) * coalesce(col("e_k"), lit(0L)) /
                (col("n_k") * (col("n_k") - 1)), 4))
              .otherwise(lit(null).cast("double")).as("phi"))
          .orderBy("k")
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
              |        FROM (SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)
              |        GROUP BY v),
              |ks AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
              |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k
              |       FROM deg, ks WHERE dg > k GROUP BY k),
              |ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_k
              |       FROM e0 JOIN deg a ON a.v = da JOIN deg b ON b.v = db, ks
              |       WHERE a.dg > k AND b.dg > k GROUP BY k)
              |SELECT k, n_k, coalesce(e_k, 0) AS e_k,
              |       CASE WHEN n_k >= 2
              |            THEN round(2.0 * coalesce(e_k, 0) / (n_k * (n_k - 1)), 4)
              |       END AS phi
              |FROM nk LEFT JOIN ek USING (k) ORDER BY k""".stripMargin)),

    // Hurst exponent per event_type via rescaled-range analysis:
    // daily counts → blocks of w ∈ {4,8,16} days → R/S per full
    // block (cumulative-deviation range over block σ) → H = OLS
    // slope of ln(avg R/S) on ln(w). H≈0.5 random walk, >0.5
    // long-range dependence (bursty load that capacity planning
    // can't treat as iid). Everything after the ONE fact rollup is
    // calendar-bounded; cumsum windows run per (type, w, block);
    // the OLS guards n≥2 ∧ var>0 (the text_heaps_fit lesson).
    "ts_hurst" -> Q(
      (s, d) => {
        val dc = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("cnt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("day")).cast("long") - 1)
          .localCheckpoint(eager = false) // block stats + cumdev join
        val ws = s.createDataFrame(Seq(Tuple1(4L), Tuple1(8L), Tuple1(16L)))
          .toDF("w")
        val blocks = dc.crossJoin(broadcast(ws))
          .withColumn("blk", expr("rn div w"))
        val bs = blocks.groupBy("event_type", "w", "blk")
          .agg(count(lit(1)).as("bn"), round(avg("cnt"), 6).as("mu"),
               var_pop("cnt").as("vp"))
          .filter(col("bn") === col("w")) // full blocks only
        val wb = Window.partitionBy("event_type", "w", "blk").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val rsb = blocks.join(bs, Seq("event_type", "w", "blk"))
          .withColumn("cum", sum(col("cnt") - col("mu")).over(wb))
          .groupBy("event_type", "w", "blk")
          .agg(max("cum").as("mx"), min("cum").as("mn"), max("vp").as("vp"))
          .filter(col("vp") > 0)
          .select(col("event_type"), col("w"),
                  round((col("mx") - col("mn")) / sqrt(col("vp")), 6).as("rs"))
        val pw = rsb.groupBy("event_type", "w")
          .agg(round(avg("rs"), 6).as("ars"), count(lit(1)).as("n_blocks"))
          .filter(col("ars") > 0)
        pw.select(col("event_type"), log(col("w").cast("double")).as("lx"),
                  log(col("ars")).as("ly"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("np"),
               covar_pop("lx", "ly").as("cxy"), var_pop("lx").as("vx"))
          .select(col("event_type"), col("np").cast("long").as("n_scales"),
                  when(col("np") >= 2 && col("vx") > 0,
                       round(col("cxy") / col("vx"), 4))
                    .otherwise(lit(null).cast("double")).as("hurst"))
          .orderBy("event_type")
      },
      Some("""WITH dc AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS cnt
             |  FROM events GROUP BY 1, 2),
             |rn AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
             |                        ORDER BY day) AS BIGINT) - 1 AS rn
             |       FROM dc),
             |ws AS (SELECT CAST(unnest([4, 8, 16]) AS BIGINT) AS w),
             |blocks AS (SELECT rn.*, w, rn // w AS blk FROM rn, ws),
             |bs AS (SELECT event_type, w, blk, count(*) AS bn,
             |              round(avg(cnt), 6) AS mu, var_pop(cnt) AS vp
             |       FROM blocks GROUP BY 1, 2, 3),
             |fb AS (SELECT * FROM bs WHERE bn = w),
             |wc AS (SELECT b.event_type, b.w, b.blk, b.cnt, fb.mu, fb.vp,
             |              sum(b.cnt - fb.mu) OVER (
             |                PARTITION BY b.event_type, b.w, b.blk ORDER BY b.day
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |       FROM blocks b JOIN fb USING (event_type, w, blk)),
             |rsb AS (SELECT event_type, w,
             |               round((max(cum) - min(cum)) / sqrt(max(vp)), 6) AS rs
             |        FROM wc GROUP BY event_type, w, blk HAVING max(vp) > 0),
             |pw AS (SELECT event_type, w, round(avg(rs), 6) AS ars,
             |              count(*) AS n_blocks
             |       FROM rsb GROUP BY 1, 2 HAVING round(avg(rs), 6) > 0),
             |pts AS (SELECT event_type, ln(CAST(w AS DOUBLE)) AS lx,
             |               ln(ars) AS ly FROM pw),
             |ag AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS np,
             |              covar_pop(lx, ly) AS cxy, var_pop(lx) AS vx
             |       FROM pts GROUP BY 1)
             |SELECT event_type, CAST(np AS BIGINT) AS n_scales,
             |       CASE WHEN np >= 2 AND vx > 0 THEN round(cxy / vx, 4) END AS hurst
             |FROM ag ORDER BY event_type""".stripMargin)),

    // ε-local-DP frequency estimation via randomized response (Warner
    // 1965): each user's true "ever purchased" bit is reported
    // truthfully with p = 0.75 (ε = ln 3) and flipped otherwise —
    // deterministic inverse-CDF draw from the md5 hash (the
    // priv_dp_mean idiom), debiased as π̂ = (λ̂ − (1−p))/(2p−1).
    // The local-DP counterpart of the central-DP priv_dp_* releases;
    // ONE per-user rollup, then 1-row arithmetic.
    "priv_rand_response" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val r = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("t"))
          .withColumn("u",
            (md5Long(concat(lit("rr:"), col("user_id").cast("string"))) % 1000000)
              .cast("double") / 1000000.0)
          .withColumn("r", when(col("u") < 0.75, col("t")).otherwise(lit(1L) - col("t")))
        r.agg(count(lit(1)).as("n_users"), sum("t").as("n_true_yes"),
              sum("r").as("n_reported_yes"))
          .select(col("n_users"), col("n_true_yes"), col("n_reported_yes"),
            when(col("n_users") > 0,
              round(col("n_true_yes").cast("double") / col("n_users"), 6))
              .otherwise(lit(null).cast("double")).as("pi_true"),
            when(col("n_users") > 0,
              round((col("n_reported_yes").cast("double") / col("n_users")
                - 0.25) / 0.5, 6))
              .otherwise(lit(null).cast("double")).as("pi_hat"))
          .withColumn("abs_err", round(abs(col("pi_hat") - col("pi_true")), 6))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t
             |  FROM events GROUP BY 1),
             |r AS (SELECT t,
             |        CASE WHEN (('0x' || substr(md5('rr:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |                   % 1000000) / 1000000.0 < 0.75
             |             THEN t ELSE 1 - t END AS r
             |      FROM u),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |              CAST(sum(t) AS BIGINT) AS n_true_yes,
             |              CAST(sum(r) AS BIGINT) AS n_reported_yes
             |       FROM r),
             |pi AS (SELECT *,
             |         CASE WHEN n_users > 0
             |              THEN round(CAST(n_true_yes AS DOUBLE) / n_users, 6) END AS pi_true,
             |         CASE WHEN n_users > 0
             |              THEN round((CAST(n_reported_yes AS DOUBLE) / n_users - 0.25) / 0.5, 6)
             |         END AS pi_hat
             |       FROM ag)
             |SELECT n_users, n_true_yes, n_reported_yes, pi_true, pi_hat,
             |       round(abs(pi_hat - pi_true), 6) AS abs_err
             |FROM pi""".stripMargin)),

    // perceptual-hash (aHash) image near-dup: 64 deterministic
    // md5-stub "pixels" per image (decode stubbed, the mm_binary_meta
    // convention — the Spark plumbing of grid → mean-threshold bits →
    // pairwise Hamming is real), nearest neighbor per image by
    // Hamming distance over the bounded doc_id<120 image subset.
    // At corpus scale the pair join becomes dedup_simhash's banded
    // equi-join on hash bands; the exact quadratic form here is the
    // oracle-able ground truth for that path.
    "mm_image_ahash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val px = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 0 && col("doc_id") < 120 &&
                  col("text").isNotNull)
          .select(col("doc_id"), col("text"),
                  explode(sequence(lit(0L), lit(63L))).as("k"))
          .select(col("doc_id"), col("k"),
            (md5Long(concat(col("text"), lit(":px"), col("k").cast("string")))
              % 256).as("px"))
          .localCheckpoint(eager = false) // mean join + pair join
        val mu = px.groupBy("doc_id").agg(avg(col("px").cast("double")).as("mu"))
        val bits = px.join(mu, "doc_id")
          .select(col("doc_id"), col("k"),
                  (col("px") > col("mu")).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val ham = bits.select(col("doc_id").as("da"), col("k"), col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"), col("bit").as("bb")),
                Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
        val wnn = Window.partitionBy("da").orderBy(col("hamming"), col("db"))
        ham.withColumn("rk", row_number().over(wnn)).filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
                  col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 0 AND doc_id < 120 AND text IS NOT NULL),
             |px AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
             |              ('0x' || substr(md5(text || ':px' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
             |                % 256 AS px
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)),
             |mu AS (SELECT doc_id, avg(CAST(px AS DOUBLE)) AS mu FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, k, CAST(px > mu AS BIGINT) AS bit
             |         FROM px JOIN mu USING (doc_id)),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // participation ratio PR = tr(C)²/tr(C²) of the embedding
    // covariance — the eigen-free effective-dimension estimate
    // (PR = d for isotropic, → 1 for rank-collapsed), the spectral
    // companion to emb_anisotropy/emb_twonn_id that needs NO
    // eigendecomposition: both traces come from the 64×64 cross-
    // moment cells, a 4096-cell map-side-combinable aggregate (the
    // ev_countmin posture). Cells rounded to 7 before squaring so
    // partial-agg sum order can't reach the report. At reference
    // dim 1024 the fan-out (1M cells) moves to the whitening/power-
    // iteration mapPartitions accumulator instead.
    "emb_participation_ratio" -> Q(
      (s, d) => {
        // one-pass cross-moment aggregate + driver math on the
        // bounded d² cells (CovMoments doc) — no N·d² row fan-out
        import graft.embed.CovMoments._
        import s.implicits._
        val m = moments(Tables.embeddings(s, d))
        val cv = covCells(m)
        var trc = 0.0; var trc2 = 0.0
        for (a <- 0 until m.dim; b <- 0 until m.dim) {
          if (a == b) trc += cv(a)(b)
          trc2 += cv(a)(b) * cv(a)(b)
        }
        Seq((m.n, m.dim.toLong, r(trc, 6),
             if (trc2 > 0) Some(r(trc * trc / trc2, 4)) else None))
          .toDF("n_vecs", "dim", "tr_c", "pr_dim")
      },
      Some("""WITH px AS (SELECT vec_id,
             |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
             |              CAST(unnest(embedding) AS DOUBLE) AS xa
             |            FROM embeddings WHERE embedding IS NOT NULL),
             |cells AS (SELECT p.a, q.a AS b, CAST(count(*) AS DOUBLE) AS n,
             |                 round(sum(p.xa * q.xa) / count(*) -
             |                       (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
             |          FROM px p JOIN px q ON p.vec_id = q.vec_id
             |          GROUP BY 1, 2),
             |ag AS (SELECT max(n) AS nv, max(a) AS mxa,
             |              sum(CASE WHEN a = b THEN cv ELSE 0.0 END) AS trc,
             |              sum(cv * cv) AS trc2
             |       FROM cells)
             |SELECT CAST(nv AS BIGINT) AS n_vecs, mxa + 1 AS dim,
             |       round(trc, 6) AS tr_c,
             |       CASE WHEN trc2 > 0 THEN round(trc * trc / trc2, 4) END AS pr_dim
             |FROM ag""".stripMargin)),

    // group-sequential A/B monitoring with O'Brien–Fleming bounds:
    // the cumulative Welch z at 4 equally-spaced calendar looks vs
    // the OBF boundary 2.0243·√(K/k) — the "peek early without
    // inflating α" machinery every experimentation platform needs
    // next to the fixed-horizon ev_ab_test. One fact pass fanned ×4
    // by the broadcast look table; cut days use integer division on
    // both engines.
    "stat_group_seq" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // bounds + the look rollup
        val looks = ev.agg(min("day").as("mn"), max("day").as("mx"))
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L), lit(4L))))
          .select(col("k"),
            (col("mn") - 1 + expr("((mx - mn + 1) * k) div 4")).as("cut"))
        val g = ev.crossJoin(broadcast(looks))
          .filter(col("day") <= col("cut"))
          .groupBy("k")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
               avg(when(col("arm") === 1, col("value"))).as("m_t"),
               avg(when(col("arm") === 0, col("value"))).as("m_c"),
               var_samp(when(col("arm") === 1, col("value"))).as("v_t"),
               var_samp(when(col("arm") === 0, col("value"))).as("v_c"))
        val se2 = col("v_t") / col("n_t") + col("v_c") / col("n_c")
        g.select(col("k"), col("n_t"), col("n_c"),
            when(col("n_t") < 2 || col("n_c") < 2 || se2 <= 0.0,
                 lit(null).cast("double"))
              .otherwise(round((col("m_t") - col("m_c")) / sqrt(se2), 4)).as("z"),
            round(lit(2.0243) * sqrt(lit(4.0) / col("k")), 4).as("z_boundary"))
          .withColumn("reject",
            when(col("z").isNull, lit(null).cast("boolean"))
              .otherwise(abs(col("z")) > col("z_boundary")))
          .orderBy("k")
      },
      Some("""WITH ev AS (
             |  SELECT ts // 86400000000000 AS day, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |looks AS (SELECT CAST(k AS BIGINT) AS k,
             |                 mn - 1 + ((mx - mn + 1) * k) // 4 AS cut
             |          FROM b, (SELECT unnest([1, 2, 3, 4]) AS k)),
             |g AS (SELECT k,
             |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |        avg(CASE WHEN arm = 1 THEN value END) AS m_t,
             |        avg(CASE WHEN arm = 0 THEN value END) AS m_c,
             |        var_samp(CASE WHEN arm = 1 THEN value END) AS v_t,
             |        var_samp(CASE WHEN arm = 0 THEN value END) AS v_c
             |      FROM ev, looks WHERE day <= cut GROUP BY k),
             |z AS (SELECT k, n_t, n_c,
             |        CASE WHEN n_t < 2 OR n_c < 2 OR v_t / n_t + v_c / n_c <= 0.0
             |             THEN NULL
             |             ELSE round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 4)
             |        END AS z,
             |        round(2.0243 * sqrt(4.0 / k), 4) AS z_boundary
             |      FROM g)
             |SELECT k, n_t, n_c, z, z_boundary,
             |       CASE WHEN z IS NULL THEN NULL
             |            ELSE abs(z) > z_boundary END AS reject
             |FROM z ORDER BY k""".stripMargin)),

    // eigenvector centrality of the near-dup graph: 6 unrolled
    // power-iteration rounds (neighbor-sum + L1 renormalization,
    // per-round round-to-7 pinning the trajectory — the ev_stationary
    // idiom on the dup graph), top-10 hub documents. Unlike degree,
    // this scores being connected to OTHER hubs — the doc family a
    // curator should read first. Corpus-scale work = the one shared
    // shingle-join edge build; each round is O(E) shuffle.
    "graph_eigencentrality" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read once per round
        val nodes = nbr.select(col("v")).distinct()
        val nn = nodes.agg(count(lit(1)).cast("double").as("nn"))
        var x = nodes.crossJoin(broadcast(nn))
          .select(col("v"), round(lit(1.0) / col("nn"), 7).as("c"))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 6) {
          val raw = nbr.join(x.select(col("v").as("n"), col("c")), "n")
            .groupBy("v").agg(sum("c").as("raw"))
          val tot = raw.agg(sum("raw").as("t"))
          x = raw.crossJoin(broadcast(tot))
            .select(col("v"), round(col("raw") / col("t"), 7).as("c"))
            .localCheckpoint(eager = false) // next round + final sort
        }
        x.orderBy(col("c").desc, col("v")).limit(10)
          .select(col("v").as("doc_id"), col("c").as("centrality"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |nodes AS (SELECT DISTINCT v FROM nbr),
              |x0 AS (SELECT v, round(1.0 / (SELECT CAST(count(*) AS DOUBLE)
              |                              FROM nodes), 7) AS c
              |       FROM nodes),
              |${eigenIterSql(6)}
              |SELECT v AS doc_id, c AS centrality
              |FROM x6 ORDER BY c DESC, v LIMIT 10""".stripMargin)),

    // second-order Markov next-event model: trigram cells from ONE
    // two-lead window pass, best next event per (prev2, prev1)
    // context with its accuracy, vs the first-order baseline
    // p(to | prev1) computed from the SAME trigram population's
    // margins — lift > 0 is the memory the one-step ev_markov_accuracy
    // model leaves on the table. Cells bounded by |types|³.
    "ev_markov2" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tri = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("t1", lead("event_type", 1).over(w))
          .withColumn("t2", lead("event_type", 2).over(w))
          .filter(col("t1").isNotNull && col("t2").isNotNull)
          .groupBy(col("event_type").as("t0"), col("t1"), col("t2"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = false) // best-per-context + margins
        val wb = Window.partitionBy("t0", "t1").orderBy(col("n").desc, col("t2"))
        val tot = tri.groupBy("t0", "t1").agg(sum("n").as("n_total"))
        val m1 = tri.groupBy("t1", "t2").agg(sum("n").as("m"))
        val w1 = Window.partitionBy("t1").orderBy(col("m").desc, col("t2"))
        val best1 = m1
          .join(broadcast(m1.groupBy("t1").agg(sum("m").as("mt"))), "t1")
          .withColumn("rk", row_number().over(w1)).filter(col("rk") === 1)
          .select(col("t1"), round(col("m") / col("mt"), 4).as("acc1"))
        tri.withColumn("rk", row_number().over(wb)).filter(col("rk") === 1)
          .join(broadcast(tot), Seq("t0", "t1"))
          .join(broadcast(best1), "t1")
          .select(col("t0"), col("t1"), col("t2").as("best_to"),
                  col("n").as("n_best"), col("n_total"),
                  round(col("n") / col("n_total"), 4).as("acc2"), col("acc1"),
                  round(round(col("n") / col("n_total"), 4) - col("acc1"), 4)
                    .as("lift"))
          .orderBy("t0", "t1")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS t0,
             |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
             |         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
             |  FROM events),
             |tri AS (SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
             |        FROM tr WHERE t1 IS NOT NULL AND t2 IS NOT NULL
             |        GROUP BY 1, 2, 3),
             |tot AS (SELECT t0, t1, CAST(sum(n) AS BIGINT) AS n_total
             |        FROM tri GROUP BY 1, 2),
             |m1 AS (SELECT t1, t2, CAST(sum(n) AS BIGINT) AS m
             |       FROM tri GROUP BY 1, 2),
             |tot1 AS (SELECT t1, CAST(sum(m) AS BIGINT) AS mt FROM m1 GROUP BY 1),
             |b1 AS (SELECT t1, acc1 FROM (
             |         SELECT m1.t1, round(m * 1.0 / mt, 4) AS acc1,
             |                row_number() OVER (PARTITION BY m1.t1
             |                                   ORDER BY m DESC, t2) AS rk
             |         FROM m1 JOIN tot1 USING (t1))
             |       WHERE rk = 1),
             |best AS (SELECT *, row_number() OVER (PARTITION BY t0, t1
             |                     ORDER BY n DESC, t2) AS rk
             |         FROM tri)
             |SELECT b.t0, b.t1, b.t2 AS best_to, b.n AS n_best, t.n_total,
             |       round(b.n * 1.0 / t.n_total, 4) AS acc2, b1.acc1,
             |       round(round(b.n * 1.0 / t.n_total, 4) - b1.acc1, 4) AS lift
             |FROM best b JOIN tot t USING (t0, t1) JOIN b1 USING (t1)
             |WHERE b.rk = 1 ORDER BY t0, t1""".stripMargin)),

    // linear CKA between the full 64-d embedding and its 16-d
    // Matryoshka prefix: ‖C_xy‖²F / (‖C_xx‖F·‖C_yy‖F), where every
    // block is a sub-matrix of the ONE 64×64 covariance cell table
    // (emb_participation_ratio's aggregate) because Y is a prefix of
    // X — so the whole representation-similarity score is arithmetic
    // over 4096 map-side-combinable cells. The "does the truncated
    // index preserve structure" check behind vec_matryoshka.
    "emb_cka" -> Q(
      (s, d) => {
        // one-pass cross-moment aggregate + driver math on the
        // bounded d² cells (CovMoments doc) — no N·d² row fan-out
        import graft.embed.CovMoments._
        import s.implicits._
        val m = moments(Tables.embeddings(s, d))
        val cv = covCells(m)
        var fxx = 0.0; var fyy = 0.0; var fxy = 0.0
        for (a <- 0 until m.dim; b <- 0 until m.dim) {
          val c2 = cv(a)(b) * cv(a)(b)
          fxx += c2
          fyy += (if (a < 16 && b < 16) c2 else 0.0)
          fxy += (if (b < 16) c2 else 0.0)
        }
        Seq((m.n, 16L,
             if (fxx > 0 && fyy > 0)
               Some(r(fxy / (math.sqrt(fxx) * math.sqrt(fyy)), 4))
             else None))
          .toDF("n_vecs", "dim_prefix", "cka")
      },
      Some("""WITH px AS (SELECT vec_id,
             |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
             |              CAST(unnest(embedding) AS DOUBLE) AS xa
             |            FROM embeddings WHERE embedding IS NOT NULL),
             |cells AS (SELECT p.a, q.a AS b, CAST(count(*) AS DOUBLE) AS n,
             |                 round(sum(p.xa * q.xa) / count(*) -
             |                       (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
             |          FROM px p JOIN px q ON p.vec_id = q.vec_id
             |          GROUP BY 1, 2),
             |ag AS (SELECT max(n) AS nv,
             |              sum(cv * cv) AS fxx,
             |              sum(CASE WHEN a < 16 AND b < 16 THEN cv * cv ELSE 0.0 END) AS fyy,
             |              sum(CASE WHEN b < 16 THEN cv * cv ELSE 0.0 END) AS fxy
             |       FROM cells)
             |SELECT CAST(nv AS BIGINT) AS n_vecs, CAST(16 AS BIGINT) AS dim_prefix,
             |       CASE WHEN fxx > 0 AND fyy > 0
             |            THEN round(fxy / (sqrt(fxx) * sqrt(fyy)), 4) END AS cka
             |FROM ag""".stripMargin)),

    // ARI + Coleman–Liau readability per doc — the character-based
    // indices next to the syllable-based Flesch (text_readability):
    // no syllable heuristic, so they transfer across languages
    // better. Same map-side regex-count shape; words=0 guarded NULL.
    "text_ari" -> Q(
      (s, d) => {
        val words = size(graft.text.TextPrimitives.tokens(col("text"))).cast("double")
        val sents = greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"),
          lit(0))), lit(1)).cast("double")
        val chars = length(regexp_replace(col("text"), "\\s", "")).cast("double")
        // + 1e-9 before the round: the raw indices land EXACTLY on
        // 4-decimal ties (0.5·words/sents is .5-granular), where
        // Spark's string-decimal HALF_UP and DuckDB's numeric round
        // disagree about the same double; the identical nudge on both
        // engines moves every tie off the boundary
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), chars.cast("long").as("n_chars_ns"),
                  words.cast("long").as("n_words"), sents.cast("long").as("n_sent"),
                  when(words > 0, round(lit(4.71) * (chars / words)
                    + lit(0.5) * (words / sents) - lit(21.43) + lit(1e-9), 4))
                    .otherwise(lit(null).cast("double")).as("ari"),
                  when(words > 0, round(lit(0.0588) * (chars / words * 100)
                    - lit(0.296) * (sents / words * 100) - lit(15.8) + lit(1e-9), 4))
                    .otherwise(lit(null).cast("double")).as("coleman_liau"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(chars AS BIGINT) AS n_chars_ns,
             |       CAST(words AS BIGINT) AS n_words, CAST(sents AS BIGINT) AS n_sent,
             |       CASE WHEN words > 0
             |            THEN round(4.71 * (chars / words) + 0.5 * (words / sents)
             |                       - 21.43 + 1e-9, 4) END AS ari,
             |       CASE WHEN words > 0
             |            THEN round(0.0588 * (chars / words * 100)
             |                       - 0.296 * (sents / words * 100) - 15.8 + 1e-9, 4)
             |       END AS coleman_liau
             |FROM (
             |  SELECT doc_id,
             |         CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS chars,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS words,
             |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS sents
             |  FROM documents WHERE doc_id < 100)
             |ORDER BY doc_id""".stripMargin)),

    // voice-activity segments over the audio window fan-out
    // (mm_audio_windows' grid): per-window energy is the decode stub
    // (deterministic md5 — the real part is the segmentation
    // plumbing), speech windows merged into maximal runs by
    // gaps-and-islands (win_idx − row_number), segment extents
    // clipped to n_samples. Per-audio fan-out ≤ 25 windows; the
    // merge window is per-doc, never corpus-wide.
    "mm_audio_vad" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val wins = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1) // kind = audio
          .select(col("doc_id"), md5Long(col("text")).as("hm"))
          .selectExpr("doc_id",
            "element_at(array(8000L, 16000L, 44100L), CAST(hm % 3 AS INT) + 1) AS sr",
            "hm % 2000000 + 1 AS n_samples")
          .selectExpr("doc_id", "n_samples", "sr * 10 AS win",
            "(n_samples + sr * 10 - 1) DIV (sr * 10) AS n_win")
          .select(col("doc_id"), col("n_samples"), col("win"),
            explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"))
          .withColumn("energy",
            md5Long(concat(col("doc_id").cast("string"), lit(":vad:"),
              col("win_idx").cast("string"))) % 100)
          .filter(col("energy") >= 40)
        val wseg = Window.partitionBy("doc_id").orderBy("win_idx")
        wins.withColumn("seg", col("win_idx") - row_number().over(wseg))
          .groupBy("doc_id", "seg")
          .agg(min("win_idx").as("start_win"), max("win_idx").as("end_win"),
               count(lit(1)).as("n_windows"),
               (min("win_idx") * max("win")).as("start_sample"),
               least((max("win_idx") + 1) * max("win"), max("n_samples"))
                 .as("end_sample"))
          .select(col("doc_id"), col("start_win"), col("end_win"),
                  col("n_windows"), col("start_sample"), col("end_sample"))
          .orderBy("doc_id", "start_win")
      },
      Some("""WITH wins AS (
             |  SELECT doc_id, n_samples, win,
             |         CAST(unnest(generate_series(0, n_win - 1)) AS BIGINT) AS win_idx
             |  FROM (
             |    SELECT doc_id, n_samples, sr * 10 AS win,
             |           (n_samples + sr * 10 - 1) // (sr * 10) AS n_win
             |    FROM (
             |      SELECT doc_id, CAST(([8000, 16000, 44100])[CAST(hm % 3 AS INTEGER) + 1] AS BIGINT) AS sr,
             |             hm % 2000000 + 1 AS n_samples
             |      FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |            FROM documents WHERE doc_id % 3 = 1)))),
             |sp AS (SELECT doc_id, n_samples, win, win_idx
             |       FROM (SELECT *,
             |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':vad:' ||
             |                 CAST(win_idx AS VARCHAR)), 1, 15))::BIGINT % 100 AS energy
             |             FROM wins)
             |       WHERE energy >= 40),
             |seg AS (SELECT *, win_idx - row_number() OVER (PARTITION BY doc_id
             |                    ORDER BY win_idx) AS seg
             |        FROM sp)
             |SELECT doc_id, min(win_idx) AS start_win, max(win_idx) AS end_win,
             |       CAST(count(*) AS BIGINT) AS n_windows,
             |       min(win_idx) * max(win) AS start_sample,
             |       least((max(win_idx) + 1) * max(win), max(n_samples)) AS end_sample
             |FROM seg GROUP BY doc_id, seg
             |ORDER BY doc_id, start_win""".stripMargin)),

    // trend/seasonal strength of the daily series (Hyndman's F_T/F_S
    // off ts_decompose's EXACT components — same centered-7d-MA trend,
    // same integer-scaled mean-centered day-of-week seasonal):
    // F = max(0, 1 − var(resid)/var(component + resid)). The one-
    // number summary a monitoring wall shows next to the full
    // decomposition; everything after the daily rollup is
    // |days|-bounded.
    "ts_strength" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("ts DIV 86400000000000").as("day"))
          .groupBy("day").agg(count(lit(1)).cast("double").as("y"))
        val wT = Window.orderBy("day").rangeBetween(-3, 3)
        val trended = daily
          .withColumn("n_win", count(lit(1)).over(wT))
          .withColumn("trend", round(avg("y").over(wT), 6))
          .filter(col("n_win") === 7)
          .withColumn("dow", col("day") % 7)
          .withColumn("det_l",
            round((col("y") - col("trend")) * 1e6, 0).cast("long"))
          .localCheckpoint(eager = false)
        val seas = trended.groupBy("dow").agg(
          round(sum("det_l").cast("double") / count(lit(1)) / 1e6, 6).as("s_raw"))
        val m = seas.agg(
          round(sum(round(col("s_raw") * 1e6, 0).cast("long")).cast("double")
            / count(lit(1)) / 1e6, 6).as("s_mean"))
        val seasAdj = seas.crossJoin(broadcast(m))
          .select(col("dow"), round(col("s_raw") - col("s_mean"), 6).as("seasonal"))
        trended.join(broadcast(seasAdj), "dow")
          .select(
            round(col("y") - col("trend") - col("seasonal"), 6).as("resid"),
            round(col("y") - col("trend"), 6).as("det"),
            round(col("y") - col("seasonal"), 6).as("deseas"))
          .agg(count(lit(1)).as("n_days"),
               var_pop("resid").as("vr"), var_pop("det").as("vd"),
               var_pop("deseas").as("vds"))
          .select(col("n_days"),
            when(col("vds") > 0, round(greatest(lit(0.0),
              lit(1.0) - col("vr") / col("vds")), 4))
              .otherwise(lit(null).cast("double")).as("strength_trend"),
            when(col("vd") > 0, round(greatest(lit(0.0),
              lit(1.0) - col("vr") / col("vd")), 4))
              .otherwise(lit(null).cast("double")).as("strength_seasonal"))
      },
      Some("""WITH daily AS (SELECT ts // 86400000000000 AS day,
             |                      CAST(count(*) AS DOUBLE) AS y
             |               FROM events GROUP BY day),
             |t AS (SELECT day, y, count(*) OVER w AS n_win,
             |             round(avg(y) OVER w, 6) AS trend
             |      FROM daily
             |      WINDOW w AS (ORDER BY day RANGE BETWEEN 3 PRECEDING
             |                   AND 3 FOLLOWING)),
             |f AS (SELECT day, day % 7 AS dow, y, trend,
             |             CAST(round((y - trend) * 1000000) AS BIGINT) AS det_l
             |      FROM t WHERE n_win = 7),
             |sr AS (SELECT dow, round(sum(det_l) * 1.0 / count(*) / 1000000.0, 6) AS s_raw
             |       FROM f GROUP BY dow),
             |sm AS (SELECT round(sum(CAST(round(s_raw * 1000000) AS BIGINT)) * 1.0
             |                    / count(*) / 1000000.0, 6) AS s_mean FROM sr),
             |se AS (SELECT dow, round(s_raw - s_mean, 6) AS seasonal FROM sr, sm),
             |comp AS (SELECT round(f.y - f.trend - se.seasonal, 6) AS resid,
             |                round(f.y - f.trend, 6) AS det,
             |                round(f.y - se.seasonal, 6) AS deseas
             |         FROM f JOIN se USING (dow)),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_days, var_pop(resid) AS vr,
             |              var_pop(det) AS vd, var_pop(deseas) AS vds
             |       FROM comp)
             |SELECT n_days,
             |       CASE WHEN vds > 0
             |            THEN round(greatest(0.0, 1.0 - vr / vds), 4) END AS strength_trend,
             |       CASE WHEN vd > 0
             |            THEN round(greatest(0.0, 1.0 - vr / vd), 4) END AS strength_seasonal
             |FROM ag""".stripMargin)),

    // normalized spectral entropy over the Goertzel power grid
    // {2,3,7,14}d: how CONCENTRATED the periodic energy is (0 = one
    // dominant cycle, 1 = white across the probed periods) — the
    // one-number "is there a rhythm" gate in front of ts_goertzel's
    // per-period amplitudes. Same single-pass trig aggregate, powers
    // rounded to 6 before normalization.
    "ts_spectral_entropy" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("x"))
        val periods = Seq(2, 3, 7, 14)
        val twoPi = 2.0 * math.Pi
        val withTrig = daily.select((Seq(col("day"), col("x")) ++
          periods.flatMap { p =>
            Seq(round(cos(col("day") * (twoPi / p)), 10).as(s"c$p"),
                round(sin(col("day") * (twoPi / p)), 10).as(s"s$p"))
          }): _*)
        val aggs = periods.flatMap { p =>
          Seq(sum(col("x") * col(s"c$p")).as(s"a$p"),
              sum(col("x") * col(s"s$p")).as(s"b$p"))
        }
        val pw = withTrig.agg(count(lit(1)).as("n_days"), aggs: _*)
          .select((col("n_days") +: periods.map { p =>
            round(col(s"a$p") * col(s"a$p") + col(s"b$p") * col(s"b$p"), 6)
              .as(s"p$p")
          }): _*)
        val tot = periods.map(p => col(s"p$p")).reduce(_ + _)
        val shared = pw.select((col("n_days") +: periods.map { p =>
          when(tot > 0, round(col(s"p$p") / tot, 6))
            .otherwise(lit(null).cast("double")).as(s"share_$p")
        }): _*)
        val h = periods.map { p =>
          val q = col(s"share_$p")
          when(q > 0, -q * log(q)).otherwise(lit(0.0))
        }.reduce(_ + _)
        shared.select((col("n_days") +:
          periods.map(p => col(s"share_$p"))) :+
          when(col("share_2").isNull, lit(null).cast("double"))
            .otherwise(round(h / log(lit(4.0)), 4)).as("spectral_entropy_norm"): _*)
      },
      Some {
        val periods = Seq(2, 3, 7, 14)
        val terms = periods.map { p =>
          s"sum(x * round(cos(day * (2 * pi() / $p)), 10)) AS a$p, " +
            s"sum(x * round(sin(day * (2 * pi() / $p)), 10)) AS b$p"
        }.mkString(",\n             ")
        val pows = periods.map { p =>
          s"round(a$p * a$p + b$p * b$p, 6) AS p$p"
        }.mkString(",\n       ")
        val totE = periods.map(p => s"p$p").mkString(" + ")
        val shares = periods.map { p =>
          s"CASE WHEN $totE > 0 THEN round(p$p / ($totE), 6) END AS share_$p"
        }.mkString(",\n       ")
        val hTerms = periods.map { p =>
          s"CASE WHEN share_$p > 0 THEN -share_$p * ln(share_$p) ELSE 0.0 END"
        }.mkString(" + ")
        s"""WITH daily AS (
           |  SELECT ts // 86400000000000 AS day, CAST(count(*) AS DOUBLE) AS x
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |s AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
           |             $terms
           |      FROM daily),
           |p AS (SELECT n_days,
           |       $pows
           |      FROM s),
           |sh AS (SELECT n_days,
           |       $shares
           |       FROM p)
           |SELECT n_days, share_2, share_3, share_7, share_14,
           |       CASE WHEN share_2 IS NULL THEN NULL
           |            ELSE round(($hTerms) / ln(4.0), 4) END AS spectral_entropy_norm
           |FROM sh""".stripMargin
      }),

    // power-law fit of the retention curve: mean cohort retention per
    // week-of-age (ev_cohort_triangle's cells, age ≥ 1), OLS on the
    // log-log grid → decay exponent + fitted week-1 retention + r².
    // The "shape of forgetting" summary a growth team tracks as one
    // number; the fit runs on ≤ |weeks| rows, n≥2 ∧ var>0 guarded.
    "ev_retention_fit" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000 DIV 7").as("wk"))
        val c0 = ev.groupBy("user_id").agg(min("wk").as("w0"))
        val sz = c0.groupBy("w0").agg(count(lit(1)).as("n_cohort"))
        val ages = ev.distinct().join(c0, "user_id")
          .groupBy(col("w0"), (col("wk") - col("w0")).as("wk_off"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sz), "w0")
          .select(col("wk_off"),
            round(col("n_active") / col("n_cohort"), 4).as("pct"))
          .filter(col("wk_off") >= 1)
          .groupBy("wk_off")
          .agg(round(avg("pct"), 6).as("ret"))
          .filter(col("ret") > 0)
        val b = col("cxy") / col("vx")
        val ok = col("np") >= 2 && col("vx") > 0
        ages.select(log(col("wk_off").cast("double")).as("lx"),
                    log(col("ret")).as("ly"))
          .agg(count(lit(1)).cast("double").as("np"),
               avg("lx").as("mx"), avg("ly").as("my"),
               covar_pop("lx", "ly").as("cxy"), var_pop("lx").as("vx"),
               var_pop("ly").as("vy"))
          .select(col("np").cast("long").as("n_ages"),
            when(ok, round(b, 4)).otherwise(lit(null).cast("double")).as("decay_exp"),
            when(ok, round(exp(col("my") - b * col("mx")), 4))
              .otherwise(lit(null).cast("double")).as("ret_w1_fit"),
            when(ok && col("vy") > 0,
              round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 4))
              .otherwise(lit(null).cast("double")).as("r2"))
      },
      Some("""WITH ev AS (SELECT user_id, ts // 1000 // 86400000000 // 7 AS wk
             |            FROM events),
             |c0 AS (SELECT user_id, min(wk) AS w0 FROM ev GROUP BY user_id),
             |sz AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_cohort
             |       FROM c0 GROUP BY w0),
             |cells AS (SELECT wk - w0 AS wk_off, CAST(count(*) AS BIGINT) AS n_active, w0
             |          FROM (SELECT DISTINCT user_id, wk FROM ev) du
             |          JOIN c0 USING (user_id) GROUP BY w0, wk_off),
             |ages AS (SELECT wk_off, round(avg(pct), 6) AS ret FROM (
             |           SELECT wk_off, round(n_active * 1.0 / n_cohort, 4) AS pct
             |           FROM cells JOIN sz USING (w0) WHERE wk_off >= 1)
             |         GROUP BY wk_off HAVING round(avg(pct), 6) > 0),
             |pts AS (SELECT ln(CAST(wk_off AS DOUBLE)) AS lx, ln(ret) AS ly
             |        FROM ages),
             |ag AS (SELECT CAST(count(*) AS DOUBLE) AS np, avg(lx) AS mx,
             |              avg(ly) AS my, covar_pop(lx, ly) AS cxy,
             |              var_pop(lx) AS vx, var_pop(ly) AS vy
             |       FROM pts)
             |SELECT CAST(np AS BIGINT) AS n_ages,
             |       CASE WHEN np >= 2 AND vx > 0
             |            THEN round(cxy / vx, 4) END AS decay_exp,
             |       CASE WHEN np >= 2 AND vx > 0
             |            THEN round(exp(my - (cxy / vx) * mx), 4) END AS ret_w1_fit,
             |       CASE WHEN np >= 2 AND vx > 0 AND vy > 0
             |            THEN round(cxy * cxy / (vx * vy), 4) END AS r2
             |FROM ag""".stripMargin)),

    // content-defined chunking (the FastCDC/rsync family): cut the
    // text wherever the rolling 8-gram hash ≡ 0 (mod 32) — boundaries
    // move WITH the content, so an insertion early in a doc doesn't
    // shift every later chunk the way fixed-width chunking does —
    // then count duplicate chunks corpus-wide by content hash. The
    // storage/transfer-dedup primitive next to the retrieval-oriented
    // text_chunking; everything is map-side per doc except the final
    // distinct-count (grams fan out ≤ len rows/doc, the per-doc
    // boundary window is doc-bounded).
    "dedup_cdc_chunks" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && length(col("text")) >= 8)
          .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        val cuts = docs
          .select(col("doc_id"), col("text"), col("len"),
            explode(sequence(lit(1), col("len") - 7)).as("i"))
          .filter(md5Long(expr("substring(text, i, 8)")) % 32 === 0)
          .select(col("doc_id"), col("text"), col("len"), col("i"))
          .union(docs.select(col("doc_id"), col("text"), col("len"),
            lit(1).as("i")))
          .distinct()
        val wch = Window.partitionBy("doc_id").orderBy("i")
        cuts
          .withColumn("nxt", coalesce(lead("i", 1).over(wch), col("len") + 1))
          .withColumn("clen", col("nxt") - col("i"))
          .withColumn("chunk", expr("substring(text, i, clen)"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
               count(lit(1)).as("n_chunks"),
               countDistinct(md5(col("chunk").cast("binary"))).as("n_unique"),
               round(lit(1.0) - countDistinct(md5(col("chunk").cast("binary")))
                 / count(lit(1)), 4).as("dedup_ratio"),
               round(avg("clen"), 4).as("mean_len"))
      },
      Some("""WITH docs AS (SELECT doc_id, text, length(text) AS len
             |              FROM documents
             |              WHERE text IS NOT NULL AND length(text) >= 8),
             |pos AS (SELECT doc_id, text, len, CAST(i AS INTEGER) AS i
             |        FROM docs, LATERAL (SELECT unnest(generate_series(1, len - 7)) AS i)),
             |cuts AS (SELECT doc_id, text, len, i FROM pos
             |         WHERE ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT % 32 = 0
             |         UNION
             |         SELECT doc_id, text, len, 1 FROM docs),
             |ch AS (SELECT doc_id,
             |              substr(text, i,
             |                CAST(coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i),
             |                              len + 1) - i AS INTEGER)) AS chunk,
             |              coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i),
             |                       len + 1) - i AS clen
             |       FROM cuts)
             |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |       CAST(count(*) AS BIGINT) AS n_chunks,
             |       CAST(count(DISTINCT md5(chunk)) AS BIGINT) AS n_unique,
             |       round(1.0 - count(DISTINCT md5(chunk)) * 1.0 / count(*), 4)
             |         AS dedup_ratio,
             |       round(avg(clen), 4) AS mean_len
             |FROM ch""".stripMargin)),

    // two-sample Anderson–Darling (tie-corrected midrank form,
    // Scholz–Stephens 1987) on en-vs-rest token counts — weighs the
    // TAILS where KS is blind, off the same distinct-value histogram
    // as samp_ks_test (cumulative sums over VALUES, never rows).
    // Degenerate terms (denominator ≤ 0, e.g. the whole mass at one
    // value) contribute 0 on both engines.
    "stat_ad_test" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(size(graft.text.TextPrimitives.tokens(col("text")))
                    .cast("long").as("x"),
                  when(col("lang") === "en", 1L).otherwise(0L).as("en"))
          .groupBy("x")
          .agg(sum("en").as("le"), sum(lit(1L) - col("en")).as("lr"))
        val w = Window.orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = g.agg(sum("le").as("ne"), sum("lr").as("nr"))
        val cum = g
          .withColumn("fe", sum("le").over(w))
          .withColumn("fr", sum("lr").over(w))
          .crossJoin(broadcast(tot))
          .withColumn("nn", (col("ne") + col("nr")).cast("double"))
          .withColumn("l", (col("le") + col("lr")).cast("double"))
          .withColumn("bj", col("fe") + col("fr") - col("l") / 2)
          .withColumn("mej", col("fe") - col("le").cast("double") / 2)
          .withColumn("mrj", col("fr") - col("lr").cast("double") / 2)
          .withColumn("den",
            col("bj") * (col("nn") - col("bj")) - col("nn") * col("l") / 4)
        def inner(m: Column, n: Column) =
          when(col("den") > 0,
            (col("l") / col("nn")) * pow(col("nn") * m - n * col("bj"), 2)
              / col("den")).otherwise(lit(0.0))
        cum.agg(max("ne").as("ne"), max("nr").as("nr"), max("nn").as("nn"),
            sum(inner(col("mej"), col("ne").cast("double"))).as("se"),
            sum(inner(col("mrj"), col("nr").cast("double"))).as("sr"))
          .select(col("ne").as("n_en"), col("nr").as("n_rest"),
            when(col("ne") > 0 && col("nr") > 0,
              round((col("nn") - 1) / col("nn") *
                (col("se") / col("ne") + col("sr") / col("nr")), 4))
              .otherwise(lit(null).cast("double")).as("a2"))
      },
      Some("""WITH g AS (
             |  SELECT x, CAST(sum(en) AS BIGINT) AS le,
             |         CAST(sum(1 - en) AS BIGINT) AS lr
             |  FROM (SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
             |               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
             |        FROM documents)
             |  GROUP BY x),
             |t AS (SELECT CAST(sum(le) AS BIGINT) AS ne,
             |             CAST(sum(lr) AS BIGINT) AS nr FROM g),
             |c AS (SELECT x, le, lr,
             |             sum(le) OVER wc AS fe, sum(lr) OVER wc AS fr
             |      FROM g WINDOW wc AS (ORDER BY x ROWS BETWEEN UNBOUNDED
             |        PRECEDING AND CURRENT ROW)),
             |m AS (SELECT ne, nr, CAST(ne + nr AS DOUBLE) AS nn,
             |             CAST(le + lr AS DOUBLE) AS l,
             |             fe + fr - CAST(le + lr AS DOUBLE) / 2 AS bj,
             |             fe - CAST(le AS DOUBLE) / 2 AS mej,
             |             fr - CAST(lr AS DOUBLE) / 2 AS mrj
             |      FROM c, t),
             |d AS (SELECT *, bj * (nn - bj) - nn * l / 4 AS den FROM m),
             |ag AS (SELECT max(ne) AS ne, max(nr) AS nr, max(nn) AS nn,
             |         sum(CASE WHEN den > 0 THEN (l / nn) *
             |               pow(nn * mej - ne * bj, 2) / den ELSE 0.0 END) AS se,
             |         sum(CASE WHEN den > 0 THEN (l / nn) *
             |               pow(nn * mrj - nr * bj, 2) / den ELSE 0.0 END) AS sr
             |       FROM d)
             |SELECT ne AS n_en, nr AS n_rest,
             |       CASE WHEN ne > 0 AND nr > 0
             |            THEN round((nn - 1) / nn * (se / ne + sr / nr), 4)
             |       END AS a2
             |FROM ag""".stripMargin)),

    // near-dup threshold sensitivity curve: pair counts at Jaccard
    // cutoffs {0.1,0.2,0.3,0.5,0.7} from ONE pairwise-Jaccard pass on
    // the bounded subset — the tuning table a curator reads before
    // committing a dedup threshold (how fast does the pair set
    // explode as the bar drops?). Zero-count thresholds stay as rows.
    "dedup_threshold_curve" -> Q(
      (s, d) => {
        val pj = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.1)
          .localCheckpoint(eager = false) // one count pass per threshold
        val th = s.createDataFrame(Seq(0.1, 0.2, 0.3, 0.5, 0.7).map(Tuple1(_)))
          .toDF("thr")
        val counts = pj.crossJoin(broadcast(th))
          .filter(col("jaccard") >= col("thr"))
          .groupBy("thr").agg(count(lit(1)).as("n_pairs"))
        th.join(counts, Seq("thr"), "left")
          .select(col("thr"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
          .orderBy("thr")
      },
      Some(s"""WITH s AS (
              |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
              |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
              |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
              |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |      GROUP BY da, db),
              |pj AS (SELECT round(ni * 1.0 / (ca.cnt + cb.cnt - ni), 4) AS j
              |       FROM i JOIN c ca ON ca.doc_id = da
              |       JOIN c cb ON cb.doc_id = db
              |       WHERE ni * 1.0 / (ca.cnt + cb.cnt - ni) >= 0.1),
              |th AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.5, 0.7]) AS DOUBLE) AS thr),
              |counts AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_pairs
              |           FROM th JOIN pj ON j >= thr GROUP BY thr)
              |SELECT thr, coalesce(n_pairs, 0) AS n_pairs
              |FROM th LEFT JOIN counts USING (thr) ORDER BY thr""".stripMargin)),

    // daily sample-ratio-mismatch trend: the ev_srm gate per day
    // (distinct users per day × md5 arm, χ² vs 50/50 at the 0.001
    // bar) — a ramp or assignment bug shows as WHEN the imbalance
    // started, which the single global χ² can't say. |days| output
    // rows, one distinct pass.
    "ev_srm_daily" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val half = col("n").cast("double") / 2
        Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"), col("user_id"))
          .distinct()
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("day")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
          .withColumn("n", col("n_t") + col("n_c"))
          .withColumn("chi2",
            when(col("n") > 0,
              round(pow(col("n_t") - half, 2) / half
                + pow(col("n_c") - half, 2) / half, 6))
              .otherwise(lit(null).cast("double")))
          .withColumn("srm_flag",
            when(col("chi2").isNull, lit(null).cast("boolean"))
              .otherwise(col("chi2") > 10.828)) // chi2(1) at alpha=0.001
          .select(col("day"), col("n_t"), col("n_c"), col("chi2"), col("srm_flag"))
          .orderBy("day")
      },
      Some("""WITH du AS (SELECT DISTINCT ts // 86400000000000 AS day, user_id
             |            FROM events),
             |g AS (SELECT day,
             |        CAST(sum(CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 1
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |        CAST(sum(CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_c
             |      FROM du GROUP BY day),
             |z AS (SELECT day, n_t, n_c, n_t + n_c AS n,
             |        CASE WHEN n_t + n_c > 0 THEN round(
             |          pow(n_t - CAST(n_t + n_c AS DOUBLE) / 2, 2) / (CAST(n_t + n_c AS DOUBLE) / 2)
             |          + pow(n_c - CAST(n_t + n_c AS DOUBLE) / 2, 2) / (CAST(n_t + n_c AS DOUBLE) / 2), 6)
             |        END AS chi2
             |      FROM g)
             |SELECT day, n_t, n_c, chi2,
             |       CASE WHEN chi2 IS NULL THEN NULL
             |            ELSE chi2 > 10.828 END AS srm_flag
             |FROM z ORDER BY day""".stripMargin)),

    // k-NN majority-vote label consistency at k ∈ {1,3,5} — does
    // more context help or hurt? (1-NN = emb_knn_accuracy's metric;
    // diverging k=5 accuracy means noisy near-neighborhoods.) ONE
    // broadcast scoring pass bounds rk ≤ 5; votes are per-(query,k)
    // windows over ≤ 5 rows; ties break to the smallest label on
    // both engines.
    "emb_knn_vote" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val corpus = Tables.embeddings(s, d)
          .select(col("vec_id").as("vb"), col("embedding").as("eb"),
                  col("label").as("lb"))
        val queries = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id").as("va"), col("embedding").as("ea"),
                  col("label").as("la"))
        val wq = Window.partitionBy("va").orderBy(col("sc").desc, col("vb"))
        val top = corpus.crossJoin(broadcast(queries))
          .filter(col("va") =!= col("vb"))
          .select(col("va"), col("la"), col("vb"), col("lb"),
            score(col("eb"), col("ea")).as("sc"))
          .withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 5)
          .localCheckpoint(eager = false) // one vote pass per k
        val ks = s.createDataFrame(Seq(Tuple1(1L), Tuple1(3L), Tuple1(5L)))
          .toDF("k")
        val votes = top.crossJoin(broadcast(ks)).filter(col("rk") <= col("k"))
          .groupBy("va", "la", "k", "lb").agg(count(lit(1)).as("c"))
        val wv = Window.partitionBy("va", "k").orderBy(col("c").desc, col("lb"))
        votes.withColumn("r2", row_number().over(wv)).filter(col("r2") === 1)
          .groupBy("k")
          .agg(count(lit(1)).as("n_queries"),
               sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_correct"))
          .withColumn("acc", round(col("n_correct") / col("n_queries"), 4))
          .orderBy("k")
      },
      Some("""WITH q AS (SELECT vec_id AS va, embedding AS ea, label AS la
             |           FROM embeddings WHERE vec_id < 300),
             |p AS (SELECT va, la, b.vec_id AS vb, b.label AS lb,
             |             round(list_cosine_similarity(b.embedding::DOUBLE[], ea::DOUBLE[]), 6) + 0.0 AS sc
             |      FROM q, embeddings b WHERE va <> b.vec_id),
             |top AS (SELECT * FROM (
             |          SELECT *, row_number() OVER (PARTITION BY va
             |                      ORDER BY sc DESC, vb) AS rk
             |          FROM p) WHERE rk <= 5),
             |ks AS (SELECT CAST(unnest([1, 3, 5]) AS BIGINT) AS k),
             |votes AS (SELECT va, la, k, lb, CAST(count(*) AS BIGINT) AS c
             |          FROM top, ks WHERE rk <= k GROUP BY 1, 2, 3, 4),
             |w AS (SELECT *, row_number() OVER (PARTITION BY va, k
             |                  ORDER BY c DESC, lb) AS r2
             |      FROM votes)
             |SELECT k, CAST(count(*) AS BIGINT) AS n_queries,
             |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             |       round(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS acc
             |FROM w WHERE r2 = 1 GROUP BY k ORDER BY k""".stripMargin)),

    // IVF recall-vs-nprobe tuning curve: for 3 queries × nprobe ∈
    // {1,2,4}, recall@10 of the probed cells' candidates against the
    // brute-force truth, plus the candidate count actually scanned —
    // the table that tells an operator WHERE to set nprobe (the
    // recall/scan-cost tradeoff ann_ivf_probe fixes at 2). Centroids
    // are ann_ivf_probe's deterministic first-4 convention; at scale
    // the candidates come from the partition-pruned cell index, the
    // shape here is the oracle-able truth for it.
    "ann_ivf_recall_curve" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val wAssign = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cid"))
        val scored = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cid"),
            score(col("embedding"), col("cv")).as("cs"))
          .withColumn("rn", row_number().over(wAssign))
          .localCheckpoint(eager = false) // assignment + probe lists
        val assigned = scored.filter(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cid"))
        val qids = Seq(7L, 42L, 99L)
        val qs = emb.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val wq = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val truth = emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), score(col("embedding"), col("qv")).as("sc"))
          .withColumn("rk", row_number().over(wq)).filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
          .localCheckpoint(eager = false) // joined once per (q, nprobe)
        val nps = s.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(4L)))
          .toDF("nprobe")
        val probes = scored.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("qid"), col("cid"), col("rn"))
          .crossJoin(broadcast(nps)).filter(col("rn") <= col("nprobe"))
          .select(col("qid"), col("cid"), col("nprobe"))
        val cand = assigned.join(broadcast(probes), Seq("cid"))
          .filter(col("vec_id") =!= col("qid"))
          .join(broadcast(qs), "qid")
          .select(col("qid"), col("nprobe"), col("vec_id"),
            score(col("embedding"), col("qv")).as("sc"))
          .localCheckpoint(eager = false) // top-10 pass + count pass
        val wc = Window.partitionBy("qid", "nprobe").orderBy(col("sc").desc, col("vec_id"))
        val hits = cand.withColumn("rk", row_number().over(wc))
          .filter(col("rk") <= 10)
          .join(truth, Seq("qid", "vec_id"), "left_semi")
          .groupBy("qid", "nprobe").agg(count(lit(1)).as("n_hits"))
        cand.groupBy("qid", "nprobe").agg(count(lit(1)).as("n_cand"))
          .join(hits, Seq("qid", "nprobe"), "left")
          .select(col("qid"), col("nprobe"), col("n_cand"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            round(coalesce(col("n_hits"), lit(0L)) / lit(10.0), 4).as("recall_at_10"))
          .orderBy("qid", "nprobe")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings
             |           WHERE embedding IS NOT NULL),
             |cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             |          FROM e WHERE vec_id < 4),
             |scored AS (SELECT e.vec_id, e.embedding, c.cid,
             |             row_number() OVER (PARTITION BY e.vec_id
             |               ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
             |           FROM e, cents c),
             |assigned AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
             |qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
             |       FROM e WHERE vec_id IN (7, 42, 99)),
             |truth AS (SELECT qid, vec_id FROM (
             |    SELECT q.qid, e.vec_id,
             |           row_number() OVER (PARTITION BY q.qid
             |             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) + 0.0 DESC, e.vec_id) AS rk
             |    FROM e, qs q WHERE e.vec_id <> q.qid)
             |  WHERE rk <= 10),
             |nps AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
             |probes AS (SELECT s.vec_id AS qid, s.cid, np.nprobe
             |           FROM scored s, nps np
             |           WHERE s.vec_id IN (7, 42, 99) AND s.rn <= np.nprobe),
             |cand AS (SELECT p.qid, p.nprobe, a.vec_id,
             |                round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) + 0.0 AS sc
             |         FROM assigned a JOIN probes p USING (cid)
             |         JOIN qs q ON q.qid = p.qid
             |         WHERE a.vec_id <> p.qid),
             |top AS (SELECT qid, nprobe, vec_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid, nprobe
             |                ORDER BY sc DESC, vec_id) AS rk
             |    FROM cand) WHERE rk <= 10),
             |hits AS (SELECT t.qid, t.nprobe, CAST(count(*) AS BIGINT) AS n_hits
             |         FROM top t JOIN truth USING (qid, vec_id) GROUP BY 1, 2),
             |nc AS (SELECT qid, nprobe, CAST(count(*) AS BIGINT) AS n_cand
             |       FROM cand GROUP BY 1, 2)
             |SELECT qid, nprobe, n_cand, coalesce(n_hits, 0) AS n_hits,
             |       round(coalesce(n_hits, 0) / 10.0, 4) AS recall_at_10
             |FROM nc LEFT JOIN hits USING (qid, nprobe)
             |ORDER BY qid, nprobe""".stripMargin)),

    // smoothed target encoding per event_type (the m-estimate,
    // m = 20): the categorical-feature encoder a tabular model
    // pipeline ships — raw rate vs the prior-shrunk rate that
    // doesn't let rare categories memorize the target. ONE grouped
    // pass + a broadcast 1-row prior.
    "feat_target_encode" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("y", when(col("value") > 50.0, 1.0).otherwise(0.0))
        val prior = ev.agg(round(avg("y"), 6).as("prior"))
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("y").as("s"))
          .crossJoin(broadcast(prior))
          .select(col("event_type"), col("n"),
            round(col("s") / col("n"), 6).as("raw_rate"),
            round((col("s") + lit(20.0) * col("prior")) / (col("n") + lit(20.0)), 6)
              .as("te_smooth"),
            col("prior"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
             |                   CASE WHEN value > 50.0 THEN 1.0 ELSE 0.0 END AS y
             |            FROM events),
             |pr AS (SELECT round(avg(y), 6) AS prior FROM ev),
             |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(y) AS s
             |      FROM ev GROUP BY 1)
             |SELECT event_type, n, round(s / n, 6) AS raw_rate,
             |       round((s + 20.0 * prior) / (n + 20.0), 6) AS te_smooth, prior
             |FROM g, pr ORDER BY event_type""".stripMargin)),

    // hashing-trick collision audit: distinct vocabulary hashed into
    // 1024 feature buckets (md5 mod), reporting load factor, max
    // bucket, and the collision rate — the "is 2^k buckets enough"
    // check in front of hashed bag-of-words features. Two hash aggs
    // over the distinct vocab; nothing touches raw doc rows twice.
    "feat_hash_buckets" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.documents(s, d)
          .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .distinct()
          .withColumn("bucket", pmod(md5Long(col("tok")), lit(1024)))
          .groupBy("bucket").agg(count(lit(1)).as("n_toks"))
        g.agg(count(lit(1)).as("n_buckets_used"),
              sum("n_toks").as("n_tokens"),
              max("n_toks").as("max_bucket"),
              sum(when(col("n_toks") > 1, col("n_toks") - 1).otherwise(0L))
                .as("n_collided"))
          .select(col("n_tokens"), col("n_buckets_used"), col("max_bucket"),
            col("n_collided"),
            round(col("n_collided") / col("n_tokens").cast("double"), 6)
              .as("collision_rate"))
      },
      Some("""WITH v AS (SELECT DISTINCT unnest(
             |             regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |           FROM documents),
             |g AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
             |             CAST(count(*) AS BIGINT) AS n_toks
             |      FROM v GROUP BY 1)
             |SELECT CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             |       CAST(count(*) AS BIGINT) AS n_buckets_used,
             |       CAST(max(n_toks) AS BIGINT) AS max_bucket,
             |       CAST(sum(CASE WHEN n_toks > 1 THEN n_toks - 1 ELSE 0 END) AS BIGINT) AS n_collided,
             |       round(sum(CASE WHEN n_toks > 1 THEN n_toks - 1 ELSE 0 END)
             |             / CAST(sum(n_toks) AS DOUBLE), 6) AS collision_rate
             |FROM g""".stripMargin)),

    // session abandonment by exit event: ev_sessionize's session ids,
    // each session keyed by its LAST event type (deterministic
    // last-row pick) and whether it converted — the "where do users
    // give up" table. Both windows are per-user; the session rollup
    // is one grouped pass.
    "ev_abandonment" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("sid", sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        val wLast = Window.partitionBy("user_id", "sid")
          .orderBy(col("ts").desc, col("event_id").desc)
        val per = sess
          .withColumn("rl", row_number().over(wLast))
          .groupBy("user_id", "sid")
          .agg(max(when(col("rl") === 1, col("event_type"))).as("last_type"),
               max(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("conv"))
        per.groupBy("last_type")
          .agg(count(lit(1)).as("n_sessions"),
               sum(lit(1L) - col("conv")).as("n_abandoned"))
          .withColumn("abandon_rate",
            round(col("n_abandoned") / col("n_sessions"), 4))
          .orderBy("last_type")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sd AS (SELECT *,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             |       FROM g),
             |s AS (SELECT *,
             |        row_number() OVER (PARTITION BY user_id, sid
             |          ORDER BY ts DESC, event_id DESC) AS rl
             |      FROM sd),
             |per AS (SELECT user_id, sid,
             |          max(CASE WHEN rl = 1 THEN event_type END) AS last_type,
             |          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |        FROM s GROUP BY 1, 2)
             |SELECT last_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(1 - conv) AS BIGINT) AS n_abandoned,
             |       round(sum(1 - conv) * 1.0 / count(*), 4) AS abandon_rate
             |FROM per GROUP BY last_type ORDER BY last_type""".stripMargin)),

    // time-based train/test split with leakage audit: events before
    // the calendar midpoint train, after test — and the number the
    // split REALLY hinges on: what share of test users was seen in
    // training (temporal splits leak identity even when rows don't
    // overlap). One fact pass + two per-side distinct-user sets.
    "samp_time_split" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
          .localCheckpoint(eager = false) // bounds + both sides
        val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
        val tagged = ev.crossJoin(broadcast(bounds))
          .withColumn("test", (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
        val users = tagged.select(col("user_id"), col("test")).distinct()
          .groupBy("user_id")
          .agg(max(when(col("test") === 0, 1L).otherwise(0L)).as("in_train"),
               max(when(col("test") === 1, 1L).otherwise(0L)).as("in_test"))
        val rows = tagged.agg(
          sum(lit(1L) - col("test")).as("n_train_rows"),
          sum(col("test")).as("n_test_rows"))
        val u = users.agg(
          sum("in_train").as("n_train_users"),
          sum("in_test").as("n_test_users"),
          sum(col("in_train") * col("in_test")).as("n_seen_users"))
        rows.crossJoin(u)
          .select(col("n_train_rows"), col("n_test_rows"),
            col("n_train_users"), col("n_test_users"), col("n_seen_users"),
            when(col("n_test_users") > 0,
              round(col("n_seen_users") / col("n_test_users").cast("double"), 4))
              .otherwise(lit(null).cast("double")).as("leakage_rate"))
      },
      Some("""WITH ev AS (SELECT user_id, ts // 86400000000000 AS day FROM events),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |tg AS (SELECT user_id,
             |              CASE WHEN day >= (mn + mx + 1) // 2 THEN 1 ELSE 0 END AS test
             |       FROM ev, b),
             |rows_ AS (SELECT CAST(sum(1 - test) AS BIGINT) AS n_train_rows,
             |                 CAST(sum(test) AS BIGINT) AS n_test_rows
             |          FROM tg),
             |us AS (SELECT user_id,
             |              max(CASE WHEN test = 0 THEN 1 ELSE 0 END) AS in_train,
             |              max(CASE WHEN test = 1 THEN 1 ELSE 0 END) AS in_test
             |       FROM (SELECT DISTINCT user_id, test FROM tg) GROUP BY 1),
             |u AS (SELECT CAST(sum(in_train) AS BIGINT) AS n_train_users,
             |             CAST(sum(in_test) AS BIGINT) AS n_test_users,
             |             CAST(sum(in_train * in_test) AS BIGINT) AS n_seen_users
             |      FROM us)
             |SELECT n_train_rows, n_test_rows, n_train_users, n_test_users,
             |       n_seen_users,
             |       CASE WHEN n_test_users > 0
             |            THEN round(n_seen_users / CAST(n_test_users AS DOUBLE), 4)
             |       END AS leakage_rate
             |FROM rows_, u""".stripMargin)))

  /** Chained a/h half-step CTEs for graph_hits' unrolled HITS rounds —
    * the eigenIterSql idiom on the DIRECTED transition graph: each
    * authority pass pulls hub mass along edges, each hub pass pulls
    * authority mass against them, both L1-normalized and rounded to 7
    * so the trajectory is pinned identically on both engines.
    */
  private def hitsIterSql(iters: Int): String = (1 to iters).map { k =>
    // AS MATERIALIZED: each half-step is referenced twice (the join
    // and its L1-normalizer scalar subquery) — without the hint DuckDB
    // inlines the whole chain, re-expanding the fact scan 2^(2k) times
    val hp = if (k == 1) "h0" else s"h${k - 1}"
    s"""a${k}r AS MATERIALIZED (SELECT e.v AS t, sum(e.wt * $hp.h) AS raw
       |          FROM e JOIN $hp ON $hp.t = e.u GROUP BY e.v),
       |a$k AS MATERIALIZED (SELECT n.t, round(coalesce(r.raw, 0)
       |               / nullif((SELECT sum(raw) FROM a${k}r), 0), 7) AS a
       |        FROM nodes n LEFT JOIN a${k}r r ON r.t = n.t),
       |h${k}r AS MATERIALIZED (SELECT e.u AS t, sum(e.wt * a$k.a) AS raw
       |          FROM e JOIN a$k ON a$k.t = e.v GROUP BY e.u),
       |h$k AS MATERIALIZED (SELECT n.t, round(coalesce(r.raw, 0)
       |               / nullif((SELECT sum(raw) FROM h${k}r), 0), 7) AS h
       |        FROM nodes n LEFT JOIN h${k}r r ON r.t = n.t)""".stripMargin
  }.mkString(",\n")

  private val round10dQ: Seq[(String, Q)] = Seq(
    // Granger-style lag-1 predictive test: do yesterday's CLICKS help
    // predict today's PURCHASES beyond yesterday's purchases alone?
    // Both daily series come out of ONE conditional rollup over the
    // facts (the ts_ccf idiom); the lag alignment is a day = day+1
    // equi-join on the checkpointed O(days) frame, and the full vs
    // restricted OLS is the closed-form 2-regressor Gram solution on
    // CENTERED sums — exact integer count sums feed every term, so
    // both engines compute bit-identical inputs. F ~ F(1, n-3).
    "ts_granger" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"),
               sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"))
          .localCheckpoint(eager = false) // both sides of the lag join
        val prev = daily.select(col("day").as("dp"),
          col("y").as("yl"), col("x").as("xl"))
        val g = daily.join(prev, col("dp") === col("day") - 1)
          .agg(count(lit(1)).cast("double").as("n"),
               sum("y").as("sy"), sum("yl").as("syl"), sum("xl").as("sxl"),
               sum(col("y") * col("y")).as("syy"),
               sum(col("yl") * col("yl")).as("sylyl"),
               sum(col("xl") * col("xl")).as("sxlxl"),
               sum(col("y") * col("yl")).as("syyl"),
               sum(col("y") * col("xl")).as("syxl"),
               sum(col("yl") * col("xl")).as("sylxl"))
        g.withColumn("s11", col("sylyl") - col("syl") * col("syl") / col("n"))
          .withColumn("s22", col("sxlxl") - col("sxl") * col("sxl") / col("n"))
          .withColumn("s12", col("sylxl") - col("syl") * col("sxl") / col("n"))
          .withColumn("t1", col("syyl") - col("sy") * col("syl") / col("n"))
          .withColumn("t2", col("syxl") - col("sy") * col("sxl") / col("n"))
          .withColumn("syc", col("syy") - col("sy") * col("sy") / col("n"))
          .withColumn("det", col("s11") * col("s22") - col("s12") * col("s12"))
          .withColumn("ok", col("n") >= 4 && col("det") > 0 && col("s11") > 0)
          .withColumn("b", when(col("ok"),
            (col("t1") * col("s22") - col("t2") * col("s12")) / col("det")))
          .withColumn("c", when(col("ok"),
            (col("s11") * col("t2") - col("s12") * col("t1")) / col("det")))
          .withColumn("rssf", when(col("ok"),
            col("syc") - col("b") * col("t1") - col("c") * col("t2")))
          .withColumn("rssr", when(col("ok"),
            col("syc") - col("t1") * col("t1") / col("s11")))
          .select(col("n").cast("long").as("n_pairs"),
            round(col("b"), 6).as("ar1"),
            round(col("c"), 6).as("beta_clicks"),
            when(col("ok") && col("rssf") > 0,
              round((col("rssr") - col("rssf"))
                / (col("rssf") / (col("n") - 3)), 4)).as("f_stat"),
            when(col("ok") && col("syc") > 0,
              round(lit(1.0) - col("rssf") / col("syc"), 6)).as("r2_full"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |p AS (SELECT a.y, b.y AS yl, b.x AS xl
             |      FROM daily a JOIN daily b ON b.day = a.day - 1),
             |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(y) AS sy,
             |             sum(yl) AS syl, sum(xl) AS sxl, sum(y*y) AS syy,
             |             sum(yl*yl) AS sylyl, sum(xl*xl) AS sxlxl,
             |             sum(y*yl) AS syyl, sum(y*xl) AS syxl,
             |             sum(yl*xl) AS sylxl
             |      FROM p),
             |c1 AS (SELECT n, sylyl - syl*syl/n AS s11, sxlxl - sxl*sxl/n AS s22,
             |              sylxl - syl*sxl/n AS s12, syyl - sy*syl/n AS t1,
             |              syxl - sy*sxl/n AS t2, syy - sy*sy/n AS syc
             |       FROM g),
             |c2 AS (SELECT *, s11*s22 - s12*s12 AS det,
             |              (n >= 4 AND s11*s22 - s12*s12 > 0 AND s11 > 0) AS ok
             |       FROM c1),
             |c3 AS (SELECT *,
             |              CASE WHEN ok THEN (t1*s22 - t2*s12) / det END AS b,
             |              CASE WHEN ok THEN (s11*t2 - s12*t1) / det END AS c
             |       FROM c2),
             |c4 AS (SELECT *,
             |              CASE WHEN ok THEN syc - b*t1 - c*t2 END AS rssf,
             |              CASE WHEN ok THEN syc - t1*t1/s11 END AS rssr
             |       FROM c3)
             |SELECT CAST(n AS BIGINT) AS n_pairs, round(b, 6) AS ar1,
             |       round(c, 6) AS beta_clicks,
             |       CASE WHEN ok AND rssf > 0
             |            THEN round((rssr - rssf) / (rssf / (n - 3)), 4)
             |       END AS f_stat,
             |       CASE WHEN ok AND syc > 0
             |            THEN round(1.0 - rssf / syc, 6) END AS r2_full
             |FROM c4""".stripMargin)),

    // Durbin-Watson autocorrelation-of-residuals audit per event type:
    // fit daily count ~ day by closed-form OLS (exact integer sums),
    // broadcast the |types|-row coefficient table back onto the SAME
    // checkpointed daily frame, and run DW = sum((e_t - e_{t-1})^2) /
    // sum(e^2) as one per-type lag window over O(days) rows. DW ~ 2
    // means the linear-trend residuals are white; ~0 means the trend
    // model is missing strong positive autocorrelation. Slope and
    // intercept are rounded to 6 BEFORE the residual pass so both
    // engines compute identical residuals.
    "stat_durbin_watson" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // coefficient fit + residual pass
        val coef = daily.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
               sum(col("day").cast("double")).as("sx"), sum("c").as("sy"),
               sum(col("day").cast("double") * col("day")).as("sxx"),
               sum(col("day").cast("double") * col("c")).as("sxy"))
          .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("dx") > 0)
          .select(col("event_type"), col("n").cast("long").as("n_days"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / col("dx"), 6)
              .as("slope"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6).as("icept"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.join(broadcast(coef), "event_type")
          .withColumn("e", col("c") - col("icept") - col("slope") * col("day"))
          .withColumn("el", lag("e", 1).over(w))
          .groupBy("event_type")
          .agg(max("n_days").as("n_days"), max("slope").as("slope"),
               sum(col("e") * col("e")).as("see"),
               sum(pow(col("e") - col("el"), 2)).as("sd"))
          .select(col("event_type"), col("n_days"), col("slope"),
            when(col("see") > 0 && col("n_days") >= 2,
              round(col("sd") / col("see"), 4)).as("dw"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |coef AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             |                sum(CAST(day AS DOUBLE)) AS sx, sum(c) AS sy,
             |                sum(CAST(day AS DOUBLE) * day) AS sxx,
             |                sum(CAST(day AS DOUBLE) * c) AS sxy
             |         FROM daily GROUP BY 1),
             |cf AS (SELECT event_type, CAST(n AS BIGINT) AS n_days,
             |              round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             |              round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS icept
             |       FROM coef WHERE n*sxx - sx*sx > 0),
             |r AS (SELECT d.event_type, cf.n_days, cf.slope,
             |             d.c - cf.icept - cf.slope * d.day AS e,
             |             lag(d.c - cf.icept - cf.slope * d.day)
             |               OVER (PARTITION BY d.event_type ORDER BY d.day) AS el
             |      FROM daily d JOIN cf ON cf.event_type = d.event_type)
             |SELECT event_type, max(n_days) AS n_days, max(slope) AS slope,
             |       CASE WHEN sum(e*e) > 0 AND max(n_days) >= 2
             |            THEN round(sum((e - el)*(e - el)) / sum(e*e), 4)
             |       END AS dw
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Breusch-Pagan heteroscedasticity test on lineitem price ~
    // quantity: does residual VARIANCE drift with quantity,
    // invalidating constant-variance
    // OLS inference? The whole test - main fit, squared residuals,
    // auxiliary regression of e^2 on x, LM = n*R^2_aux - collapses to
    // closed-form arithmetic over the 14 raw mixed moments
    // sum(x^i y^j), i+j <= 4, from ONE hash aggregate (the
    // stat_moments power-sum idiom; y pre-scaled by 1e-4 to keep
    // 4th-power sums well inside double range). p from the chi^2_1
    // survival erfc(sqrt(LM/2)) via the shared A&S 7.1.26 polynomial.
    "stat_breusch_pagan" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 10000.0).as("y"))
        val m = li.agg(count(lit(1)).cast("double").as("n"),
          sum("x").as("m10"), sum("y").as("m01"),
          sum(expr("x*x")).as("m20"), sum(expr("x*y")).as("m11"),
          sum(expr("y*y")).as("m02"),
          sum(expr("x*x*x")).as("m30"), sum(expr("x*x*y")).as("m21"),
          sum(expr("x*y*y")).as("m12"), sum(expr("y*y*y")).as("m03"),
          sum(expr("x*x*x*x")).as("m40"), sum(expr("x*x*x*y")).as("m31"),
          sum(expr("x*x*y*y")).as("m22"), sum(expr("x*y*y*y")).as("m13"),
          sum(expr("y*y*y*y")).as("m04"))
        val withCoef = m
          .withColumn("dxm", col("n") * col("m20") - col("m10") * col("m10"))
          .filter(col("dxm") > 0)
          .withColumn("b", (col("n") * col("m11") - col("m10") * col("m01")) / col("dxm"))
          .withColumn("a", (col("m01") - col("b") * col("m10")) / col("n"))
        val u = withCoef
          .withColumn("su",
            col("m02") - lit(2) * col("a") * col("m01") - lit(2) * col("b") * col("m11")
              + col("n") * col("a") * col("a")
              + lit(2) * col("a") * col("b") * col("m10")
              + col("b") * col("b") * col("m20"))
          .withColumn("sxu",
            col("m12") - lit(2) * col("a") * col("m11") - lit(2) * col("b") * col("m21")
              + col("a") * col("a") * col("m10")
              + lit(2) * col("a") * col("b") * col("m20")
              + col("b") * col("b") * col("m30"))
          .withColumn("su2",
            col("m04") - lit(4) * col("a") * col("m03") - lit(4) * col("b") * col("m13")
              + lit(6) * (col("a") * col("a") * col("m02")
                + lit(2) * col("a") * col("b") * col("m12")
                + col("b") * col("b") * col("m22"))
              - lit(4) * (col("a") * col("a") * col("a") * col("m01")
                + lit(3) * col("a") * col("a") * col("b") * col("m11")
                + lit(3) * col("a") * col("b") * col("b") * col("m21")
                + col("b") * col("b") * col("b") * col("m31"))
              + col("n") * pow(col("a"), 4)
              + lit(4) * pow(col("a"), 3) * col("b") * col("m10")
              + lit(6) * col("a") * col("a") * col("b") * col("b") * col("m20")
              + lit(4) * col("a") * pow(col("b"), 3) * col("m30")
              + pow(col("b"), 4) * col("m40"))
          .withColumn("du", col("n") * col("su2") - col("su") * col("su"))
          .withColumn("cvu", col("n") * col("sxu") - col("m10") * col("su"))
          .withColumn("bp",
            when(col("du") > 0,
              round(col("n") * col("cvu") * col("cvu")
                / (col("dxm") * col("du")), 4)))
        u.withColumn("xx", sqrt(col("bp") / 2))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .select(col("n").cast("long").as("n_rows"),
            round(col("b"), 6).as("slope"),
            col("bp").as("bp_stat"),
            when(col("bp").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("xx") * col("xx")), 6)).as("p_value"))
      },
      Some("""WITH t AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
             |                  l_extendedprice / 10000.0 AS y FROM lineitem),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS m10, sum(y) AS m01, sum(x*x) AS m20,
             |             sum(x*y) AS m11, sum(y*y) AS m02, sum(x*x*x) AS m30,
             |             sum(x*x*y) AS m21, sum(x*y*y) AS m12, sum(y*y*y) AS m03,
             |             sum(x*x*x*x) AS m40, sum(x*x*x*y) AS m31,
             |             sum(x*x*y*y) AS m22, sum(x*y*y*y) AS m13,
             |             sum(y*y*y*y) AS m04
             |      FROM t),
             |c1 AS (SELECT *, n*m20 - m10*m10 AS dxm FROM m WHERE n*m20 - m10*m10 > 0),
             |c2 AS (SELECT *, (n*m11 - m10*m01) / dxm AS b FROM c1),
             |c3 AS (SELECT *, (m01 - b*m10) / n AS a FROM c2),
             |c4 AS (SELECT *,
             |         m02 - 2*a*m01 - 2*b*m11 + n*a*a + 2*a*b*m10 + b*b*m20 AS su,
             |         m12 - 2*a*m11 - 2*b*m21 + a*a*m10 + 2*a*b*m20 + b*b*m30 AS sxu,
             |         m04 - 4*a*m03 - 4*b*m13
             |           + 6*(a*a*m02 + 2*a*b*m12 + b*b*m22)
             |           - 4*(a*a*a*m01 + 3*a*a*b*m11 + 3*a*b*b*m21 + b*b*b*m31)
             |           + n*a*a*a*a + 4*a*a*a*b*m10 + 6*a*a*b*b*m20
             |           + 4*a*b*b*b*m30 + b*b*b*b*m40 AS su2
             |       FROM c3),
             |c5 AS (SELECT *, n*su2 - su*su AS du, n*sxu - m10*su AS cvu FROM c4),
             |c6 AS (SELECT *, CASE WHEN du > 0
             |                 THEN round(n*cvu*cvu / (dxm*du), 4) END AS bp
             |       FROM c5),
             |c7 AS (SELECT *, sqrt(bp / 2) AS xx,
             |              1.0 / (1.0 + 0.3275911 * sqrt(bp / 2)) AS t1
             |       FROM c6)
             |SELECT CAST(n AS BIGINT) AS n_rows, round(b, 6) AS slope,
             |       bp AS bp_stat,
             |       CASE WHEN bp IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value
             |FROM c7""".stripMargin)),

    // Cronbach's alpha internal-consistency of the quality rubric: do
    // the three per-doc quality items (length score, alpha+space
    // fraction, non-punctuation fraction) measure ONE underlying
    // "clean text" trait, or is the composite score averaging
    // unrelated signals? alpha = k/(k-1) * (1 - sum(var_i)/var_total)
    // over population variances - one map-side item projection (the
    // text_charclass regex-strip idiom) and ONE 4-variance aggregate.
    // Cronbach's alpha over three doc-quality items. TWO-PASS centered
    // variances (the stat_moments altitude, round 8): one-shot var_pop
    // over doubles is partial-merge-order dependent and a value on the
    // 4dp boundary flipped the hash between runs (round-10 verdict).
    // Items rounded to 6 and means broadcast ROUNDED to 6 so both
    // engines center on identical values; every addend of the second
    // pass is small, making the 6dp/4dp rounds order-stable.
    "stat_cronbach" -> Q(
      (s, d) => {
        val t = col("text")
        val n = greatest(length(t), lit(1)).cast("double")
        val items = Tables.documents(s, d).select(
          round(least(col("n_chars") / 2000.0, lit(1.0)), 6).as("i1"),
          round(length(regexp_replace(t, "[^A-Za-z ]", "")) / n, 6).as("i2"),
          round(length(regexp_replace(t, "[.,;:!?]", "")) / n, 6).as("i3"))
        val mus = items.agg(
          round(sum("i1") / count(lit(1)), 6).as("m1"),
          round(sum("i2") / count(lit(1)), 6).as("m2"),
          round(sum("i3") / count(lit(1)), 6).as("m3"),
          round(sum(col("i1") + col("i2") + col("i3")) / count(lit(1)), 6)
            .as("mt"))
        items.crossJoin(broadcast(mus))
          .agg(count(lit(1)).as("n_docs"),
            sum(pow(col("i1") - col("m1"), 2)).as("s1"),
            sum(pow(col("i2") - col("m2"), 2)).as("s2"),
            sum(pow(col("i3") - col("m3"), 2)).as("s3"),
            sum(pow(col("i1") + col("i2") + col("i3") - col("mt"), 2))
              .as("st"))
          .select(col("n_docs"),
            round(col("s1") / col("n_docs"), 6).as("var_len"),
            round(col("s2") / col("n_docs"), 6).as("var_alpha"),
            round(col("s3") / col("n_docs"), 6).as("var_nonpunct"),
            when(col("st") > 0,
              round(lit(1.5) * (lit(1.0)
                - (col("s1") + col("s2") + col("s3")) / col("st")), 4))
              .as("alpha"))
      },
      Some("""WITH it AS MATERIALIZED (
             |  SELECT round(CAST(least(n_chars / 2000.0, 1.0) AS DOUBLE), 6) AS i1,
             |         round(length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
             |           / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS i2,
             |         round(length(regexp_replace(text, '[.,;:!?]', '', 'g'))
             |           / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS i3
             |  FROM documents),
             |mus AS (
             |  SELECT round(sum(i1) / count(*), 6) AS m1,
             |         round(sum(i2) / count(*), 6) AS m2,
             |         round(sum(i3) / count(*), 6) AS m3,
             |         round(sum(i1 + i2 + i3) / count(*), 6) AS mt
             |  FROM it),
             |cm AS (
             |  SELECT count(*) AS n_docs,
             |         sum(pow(i1 - m1, 2)) AS s1,
             |         sum(pow(i2 - m2, 2)) AS s2,
             |         sum(pow(i3 - m3, 2)) AS s3,
             |         sum(pow(i1 + i2 + i3 - mt, 2)) AS st
             |  FROM it, mus)
             |SELECT CAST(n_docs AS BIGINT) AS n_docs,
             |       round(s1 / n_docs, 6) AS var_len,
             |       round(s2 / n_docs, 6) AS var_alpha,
             |       round(s3 / n_docs, 6) AS var_nonpunct,
             |       CASE WHEN st > 0
             |            THEN round(1.5 * (1.0 - (s1 + s2 + s3) / st), 4)
             |       END AS alpha
             |FROM cm""".stripMargin)),

    // HITS hubs & authorities on the DIRECTED event-type transition
    // graph (the undirected eigencentrality can't separate "sends
    // users onward" from "receives users"): 4 unrolled rounds of
    // a <- M'h / h <- Ma off the SHARED transitionCells table -
    // corpus-scale work is the one materialized lead() pass; every
    // iteration is joins over <= |types|^2 cells. L1-normalized and
    // rounded to 7 per half-step so the trajectory is engine-pinned.
    "graph_hits" -> Q(
      (s, d) => {
        val e = transitionCells(s, d)
          .filter(col("to_type").isNotNull && col("from_type").isNotNull)
          .select(col("from_type").as("u"), col("to_type").as("v"),
                  col("n").cast("double").as("wt"))
          .localCheckpoint(eager = false) // read in all 8 half-steps
        val nodes = e.select(col("u").as("t"))
          .union(e.select(col("v").as("t"))).distinct()
          .localCheckpoint(eager = false)
        var h = nodes.withColumn("h", lit(1.0))
          .localCheckpoint(eager = false)
        var a: DataFrame = null
        for (_ <- 1 to 4) {
          val ar = e.join(h.select(col("t").as("u"), col("h")), "u")
            .groupBy(col("v").as("t")).agg(sum(col("wt") * col("h")).as("raw"))
          val at = ar.agg(sum("raw").as("sm"))
          a = nodes.join(ar, Seq("t"), "left").na.fill(0.0, Seq("raw"))
            .crossJoin(broadcast(at))
            .select(col("t"), when(col("sm") === 0, lit(null).cast("double"))
              .otherwise(round(col("raw") / col("sm"), 7)).as("a"))
            .localCheckpoint(eager = false)
          val hr = e.join(a.select(col("t").as("v"), col("a")), "v")
            .groupBy(col("u").as("t")).agg(sum(col("wt") * col("a")).as("raw"))
          val ht = hr.agg(sum("raw").as("sm"))
          h = nodes.join(hr, Seq("t"), "left").na.fill(0.0, Seq("raw"))
            .crossJoin(broadcast(ht))
            .select(col("t"), when(col("sm") === 0, lit(null).cast("double"))
              .otherwise(round(col("raw") / col("sm"), 7)).as("h"))
            .localCheckpoint(eager = false)
        }
        h.join(a, "t")
          .select(col("t").as("event_type"), col("h").as("hub"),
                  col("a").as("authority"))
          .orderBy("event_type")
      },
      Some(s"""WITH tr AS (
              |  SELECT event_type AS u,
              |         lead(event_type, 1) OVER (PARTITION BY user_id
              |           ORDER BY ts, event_id) AS v
              |  FROM events),
              |e AS MATERIALIZED (SELECT u, v, CAST(count(*) AS DOUBLE) AS wt
              |      FROM tr WHERE u IS NOT NULL AND v IS NOT NULL GROUP BY 1, 2),
              |nodes AS MATERIALIZED (SELECT DISTINCT t
              |          FROM (SELECT u AS t FROM e UNION ALL SELECT v FROM e)),
              |h0 AS MATERIALIZED (SELECT t, 1.0 AS h FROM nodes),
              |${hitsIterSql(4)}
              |SELECT h4.t AS event_type, h4.h AS hub, a4.a AS authority
              |FROM h4 JOIN a4 ON a4.t = h4.t ORDER BY event_type""".stripMargin)),

    // effective sample size of the DSIR importance weights
    // (samp_importance's hashed-unigram LLR model): ESS =
    // (sum w)^2 / sum w^2 per source, w = exp(llr - max llr) - the
    // "how many uniform docs is this weighted corpus worth" diagnostic
    // that decides whether importance-weighted training is viable or
    // the weights have collapsed onto a few docs. Per-doc log-weights
    // are rounded to 4 BEFORE exp (and the shift is the broadcast
    // global max) so the exponentials are engine-pinned; the per-source
    // rollup is one hash aggregate.
    "samp_ess" -> Q(
      (s, d) => {
        val t = graft.text.TextPrimitives.tokens(col("text"))
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), explode(t).as("tok"))
          .withColumn("b", graft.functions.VectorFunctions.md5Long(col("tok")) % 64)
        val src = tok.groupBy("b").agg(count(lit(1)).as("cs"))
        val tgt = tok.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("ct"))
        val probs = src.join(tgt, Seq("b"), "left")
          .na.fill(0L, Seq("ct"))
          .crossJoin(broadcast(src.agg(sum("cs").as("ts"))))
          .crossJoin(broadcast(tgt.agg(sum("ct").as("tt"))))
          .select(col("b"),
            (log((col("ct") + lit(1.0)) / (col("tt") + lit(64.0)))
             - log((col("cs") + lit(1.0)) / (col("ts") + lit(64.0)))).as("llr"))
        val docw = tok.join(broadcast(probs), "b")
          .groupBy("doc_id", "source")
          .agg(round(sum("llr"), 4).as("lw"))
          .localCheckpoint(eager = false) // global max + per-source rollup
        val mx = docw.agg(max("lw").as("m"))
        docw.crossJoin(broadcast(mx))
          .withColumn("w", round(exp(col("lw") - col("m")), 8))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("w").as("sw"),
               sum(col("w") * col("w")).as("sw2"))
          .select(col("source"), col("n_docs"),
            when(col("sw2") > 0,
              round(col("sw") * col("sw") / col("sw2"), 4)).as("ess"),
            when(col("sw2") > 0,
              round(col("sw") * col("sw") / col("sw2") / col("n_docs"), 4))
              .as("ess_ratio"))
          .orderBy("source")
      },
      Some("""WITH tb AS (
             |  SELECT doc_id, source, lang,
             |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
             |  FROM (SELECT doc_id, source, lang,
             |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)),
             |src AS (SELECT b, CAST(count(*) AS BIGINT) AS cs FROM tb GROUP BY b),
             |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
             |        FROM tb WHERE lang = 'en' GROUP BY b),
             |tot AS (SELECT (SELECT CAST(sum(cs) AS BIGINT) FROM src) AS ts,
             |               (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS tt),
             |probs AS (SELECT b,
             |                 ln((coalesce(ct, 0) + 1.0) / (tt + 64.0))
             |               - ln((cs + 1.0) / (ts + 64.0)) AS llr
             |          FROM src LEFT JOIN tgt USING (b), tot),
             |docw AS (SELECT doc_id, source, round(sum(llr), 4) AS lw
             |         FROM tb JOIN probs USING (b) GROUP BY 1, 2),
             |mx AS (SELECT max(lw) AS m FROM docw),
             |ws AS (SELECT source, round(exp(lw - m), 8) AS w FROM docw, mx)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CASE WHEN sum(w*w) > 0
             |            THEN round(sum(w)*sum(w) / sum(w*w), 4) END AS ess,
             |       CASE WHEN sum(w*w) > 0
             |            THEN round(sum(w)*sum(w) / sum(w*w) / count(*), 4)
             |       END AS ess_ratio
             |FROM ws GROUP BY source ORDER BY source""".stripMargin)))

  private val round10eQ: Seq[(String, Q)] = Seq(
    // Katz centrality of the near-dup graph (x = Σ α^k A^k 1): unlike
    // degree it credits being near hubs, unlike eigencentrality it
    // doesn't starve nodes outside the dominant component — 6 unrolled
    // x ← 1 + α·A·x rounds (α=0.1 << 1/λmax so the series converges)
    // on the SHARED bounded edge build; every iteration is a join over
    // the |E|-row neighbor table, rounded to 7 per round.
    "graph_katz" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read once per round
        val nodes = nbr.select(col("v")).distinct()
          .localCheckpoint(eager = false)
        var x = nodes.withColumn("c", lit(1.0))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 6) {
          val sm = nbr.join(x.select(col("v").as("n"), col("c")), "n")
            .groupBy("v").agg(sum("c").as("sm"))
          x = nodes.join(sm, Seq("v"), "left").na.fill(0.0, Seq("sm"))
            .select(col("v"), round(lit(1.0) + lit(0.1) * col("sm"), 7).as("c"))
            .localCheckpoint(eager = false) // next round + final sort
        }
        x.orderBy(col("c").desc, col("v")).limit(10)
          .select(col("v").as("doc_id"), col("c").as("katz"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS MATERIALIZED (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |nodes AS MATERIALIZED (SELECT DISTINCT v FROM nbr),
              |x0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS c FROM nodes),
              |${katzIterSql(6, 0.1)}
              |SELECT v AS doc_id, c AS katz
              |FROM x6 ORDER BY c DESC, v LIMIT 10""".stripMargin)),

    // harmonic closeness within 4 hops, EVERY node a source: 4
    // unrolled multi-source BFS rounds keyed by (src, node) — the
    // graph_bfs frontier loop on a pair table bounded by |V|² of the
    // bounded dup subgraph (never by document rows). Harmonic form
    // (Σ 1/d) so disconnected pairs contribute 0 instead of ∞ —
    // truncation at 4 hops is exact on this graph class because
    // near-dup components are shallow.
    "graph_closeness" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read once per round
        var dt = nbr.select(col("v")).distinct()
          .select(col("v").as("src"), col("v").as("nd"))
          .withColumn("depth", lit(0L))
          .localCheckpoint(eager = false)
        for (k <- 1 to 4) {
          val fr = dt.filter(col("depth") === (k - 1).toLong)
          val nxt = fr.join(nbr, col("nd") === col("v"))
            .select(col("src"), col("n").as("nd")).distinct()
            .join(dt, Seq("src", "nd"), "left_anti")
            .withColumn("depth", lit(k.toLong))
          dt = dt.union(nxt)
            .localCheckpoint(eager = false) // next round reads twice
        }
        dt.filter(col("depth") > 0)
          .groupBy("src")
          .agg(count(lit(1)).as("n_reached"),
               round(sum(lit(1.0) / col("depth")), 4).as("harmonic"))
          .orderBy(col("harmonic").desc, col("src"))
          .limit(10)
          .select(col("src").as("doc_id"), col("n_reached"), col("harmonic"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS MATERIALIZED (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |c0 AS MATERIALIZED (SELECT v AS src, v AS nd, CAST(0 AS BIGINT) AS depth
              |       FROM (SELECT DISTINCT v FROM nbr)),
              |${closeIterSql(4)}
              |SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n_reached,
              |       round(sum(1.0 / depth), 4) AS harmonic
              |FROM c4 WHERE depth > 0 GROUP BY src
              |ORDER BY harmonic DESC, doc_id LIMIT 10""".stripMargin)),

    // hubness audit of the embedding space (Radovanović 2010): the
    // k-occurrence distribution N_5(x) off the dense-kernel 5-NN
    // graph — high-dim spaces grow "hubs" that appear in everyone's
    // neighbor lists and antihubs that appear in none, which silently
    // skews kNN-based dedup/eval. Occurrence moments come from exact
    // integer power sums (mean is k BY CONSTRUCTION — a free
    // invariant); corpus-scale work is the one TopK kernel pass.
    "emb_hubness" -> Q(
      (s, d) => {
        import graft.ann.Ann
        val emb = Tables.embeddings(s, d)
        val edges = Ann.bruteForceTopKDense(emb,
            emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), 5)
          .select(col("qid"), col("vec_id").as("nid"))
        val occ = emb.select(col("vec_id"))
          .join(edges.groupBy("nid").agg(count(lit(1)).as("occ")),
            col("vec_id") === col("nid"), "left")
          .na.fill(0L, Seq("occ"))
        occ.agg(count(lit(1)).cast("double").as("n"),
            sum("occ").as("s1"),
            sum(col("occ") * col("occ")).as("s2"),
            sum(col("occ") * col("occ") * col("occ")).as("s3"),
            max("occ").as("mx"),
            sum(when(col("occ") === 0, 1L).otherwise(0L)).as("anti"),
            sum(when(col("occ") >= 10, 1L).otherwise(0L)).as("hubs"))
          .withColumn("mu", col("s1") / col("n"))
          .withColumn("m2", col("s2") / col("n") - col("mu") * col("mu"))
          .withColumn("m3", col("s3") / col("n")
            - lit(3.0) * col("mu") * col("s2") / col("n")
            + lit(2.0) * col("mu") * col("mu") * col("mu"))
          .select(col("n").cast("long").as("n_vecs"),
            round(col("mu"), 4).as("mean_occ"),
            col("mx").as("max_occ"),
            col("anti").as("n_antihubs"),
            col("hubs").as("n_hubs"),
            when(col("m2") > 0,
              round(col("m3") / pow(col("m2"), 1.5), 4)).as("skew_occ"))
      },
      Some("""WITH sc AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS nid,
             |         round(list_cosine_similarity(e.embedding::DOUBLE[],
             |               q.embedding::DOUBLE[]), 6) + 0.0 AS score
             |  FROM embeddings e, embeddings q WHERE e.vec_id <> q.vec_id),
             |ed AS MATERIALIZED (SELECT qid, nid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |           ORDER BY score DESC, nid) AS rnk FROM sc)
             |  WHERE rnk <= 5),
             |oc AS (SELECT e.vec_id,
             |              coalesce(g.occ, 0) AS occ
             |       FROM embeddings e LEFT JOIN
             |         (SELECT nid, CAST(count(*) AS BIGINT) AS occ
             |          FROM ed GROUP BY nid) g ON g.nid = e.vec_id),
             |ag AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(occ) AS s1,
             |              sum(occ*occ) AS s2, sum(occ*occ*occ) AS s3,
             |              max(occ) AS mx,
             |              sum(CASE WHEN occ = 0 THEN 1 ELSE 0 END) AS nanti,
             |              sum(CASE WHEN occ >= 10 THEN 1 ELSE 0 END) AS hubs
             |       FROM oc),
             |mm AS (SELECT *, s1/n AS mu, s2/n - (s1/n)*(s1/n) AS m2,
             |              s3/n - 3.0*(s1/n)*s2/n + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3
             |       FROM ag)
             |SELECT CAST(n AS BIGINT) AS n_vecs, round(mu, 4) AS mean_occ,
             |       CAST(mx AS BIGINT) AS max_occ,
             |       CAST(nanti AS BIGINT) AS n_antihubs,
             |       CAST(hubs AS BIGINT) AS n_hubs,
             |       CASE WHEN m2 > 0 THEN round(m3 / power(m2, 1.5), 4)
             |       END AS skew_occ
             |FROM mm""".stripMargin)),

    // top eigenvalue of the embedding covariance by 8 unrolled power
    // iterations over the SAME 4096-cell cross-moment aggregate as
    // emb_participation_ratio — λ₁/tr(C) is the "one direction owns
    // the variance" share that PCA would report, without ever forming
    // a dense matrix outside the bounded cell table. Corpus-scale work
    // is ONE map-side-combinable aggregate; every iteration is a join
    // over 4096 rows, L1-normalized (abs: eigenvector components carry
    // sign) and rounded to 7.
    "emb_top_eigen" -> Q(
      (s, d) => {
        // ONE array-sum aggregate over the embeddings scan (no N·d²
        // row fan-out), then the 8 power steps run driver-side on the
        // bounded d² cells — kills both scale problems the
        // double-posexplode + 8-cluster-job form had (CovMoments doc)
        import graft.embed.CovMoments._
        import s.implicits._
        val cv = covCells(moments(Tables.embeddings(s, d)))
        val dim = cv.length
        val v = powerIterate(cv, 8)
        val ray = rayleigh(cv, v)
        var trc = 0.0
        (0 until dim).foreach(i => trc += cv(i)(i))
        Seq((dim.toLong, r(trc, 6),
             ray.map(x => r(x, 6)),
             ray.filter(_ => trc > 0).map(x => r(x / trc, 4))))
          .toDF("dim", "tr_c", "lambda1", "top_share")
      },
      Some(s"""WITH px AS (SELECT vec_id,
              |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
              |              CAST(unnest(embedding) AS DOUBLE) AS xa
              |            FROM embeddings WHERE embedding IS NOT NULL),
              |cells AS MATERIALIZED (
              |  SELECT p.a, q.a AS b,
              |         round(sum(p.xa * q.xa) / count(*) -
              |               (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
              |  FROM px p JOIN px q ON p.vec_id = q.vec_id
              |  GROUP BY 1, 2),
              |v0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells WHERE a = b),
              |${covPowIterSql(8)},
              |num AS (SELECT sum(c.cv * va.x * vb.x) AS num
              |        FROM cells c JOIN v8 va ON va.i = c.a
              |                     JOIN v8 vb ON vb.i = c.b),
              |den AS (SELECT sum(x*x) AS den FROM v8),
              |tr AS (SELECT sum(cv) AS trc, max(a) + 1 AS dim
              |       FROM cells WHERE a = b)
              |SELECT CAST(dim AS BIGINT) AS dim, round(trc, 6) AS tr_c,
              |       CASE WHEN den > 0 THEN round(num / den, 6) END AS lambda1,
              |       CASE WHEN den > 0 AND trc > 0
              |            THEN round(num / den / trc, 4) END AS top_share
              |FROM tr, num, den""".stripMargin)),

    // partial autocorrelation at lags 1..3 per event type via the
    // closed-form Durbin-Levinson recursion on ts_acf's aligned-pair
    // correlations — PACF is what separates "AR(1) echo" from real
    // higher-order memory when picking a forecast model. The r_k basis
    // is rounded to 4 (ts_acf's published precision) BEFORE the
    // recursion so every engine runs identical arithmetic; zero
    // denominators (degenerate constant series) yield NULL.
    "ts_pacf" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // both sides of the lag alignment
        val a = hourly
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        val r = a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(round(corr("c", "cb"), 4).as("r"))
        val piv = r.groupBy("event_type")
          .agg(max(when(col("k") === 1, col("r"))).as("r1"),
               max(when(col("k") === 2, col("r"))).as("r2"),
               max(when(col("k") === 3, col("r"))).as("r3"))
        piv
          .withColumn("d2", lit(1.0) - col("r1") * col("r1"))
          .withColumn("p22", when(col("d2") =!= 0,
            round((col("r2") - col("r1") * col("r1")) / col("d2"), 6)))
          .withColumn("p21", round(col("r1") - col("p22") * col("r1"), 6))
          .withColumn("d3",
            lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2"))
          .withColumn("p33", when(col("d3") =!= 0,
            round((col("r3") - col("p21") * col("r2") - col("p22") * col("r1"))
              / col("d3"), 6)))
          .select(col("event_type"),
            round(col("r1"), 4).as("pacf_1"),
            round(col("p22"), 4).as("pacf_2"),
            round(col("p33"), 4).as("pacf_3"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, ts // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |p AS (SELECT a.event_type, l.k, a.c AS ca, b.c AS cb
             |      FROM hourly a CROSS JOIN l
             |      JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k),
             |r AS (SELECT event_type, k, round(corr(ca, cb), 4) AS r
             |      FROM p GROUP BY event_type, k),
             |piv AS (SELECT event_type,
             |               max(CASE WHEN k = 1 THEN r END) AS r1,
             |               max(CASE WHEN k = 2 THEN r END) AS r2,
             |               max(CASE WHEN k = 3 THEN r END) AS r3
             |        FROM r GROUP BY event_type),
             |s1 AS (SELECT *, 1.0 - r1*r1 AS d2 FROM piv),
             |s2 AS (SELECT *, CASE WHEN d2 <> 0
             |              THEN round((r2 - r1*r1) / d2, 6) END AS p22
             |       FROM s1),
             |s3 AS (SELECT *, round(r1 - p22*r1, 6) AS p21 FROM s2),
             |s4 AS (SELECT *, 1.0 - p21*r1 - p22*r2 AS d3 FROM s3),
             |s5 AS (SELECT *, CASE WHEN d3 <> 0
             |              THEN round((r3 - p21*r2 - p22*r1) / d3, 6) END AS p33
             |       FROM s4)
             |SELECT event_type, round(r1, 4) AS pacf_1, round(p22, 4) AS pacf_2,
             |       round(p33, 4) AS pacf_3
             |FROM s5 ORDER BY event_type""".stripMargin)),

    // ε=1 differentially-private MEDIAN of per-doc token counts via
    // the exponential mechanism over the DISTINCT-value grid (the
    // stat_gini bound: values, never rows): utility −|midpos − n/2|,
    // weights cnt·exp(ε·u/2) max-shifted before exp, selection by ONE
    // deterministic inverse-CDF draw (md5 of a fixed seed) so both
    // engines pick the same value. The release-vs-truth gap is the
    // privacy cost a data card would publish next to priv_dp_counts.
    "priv_dp_quantile" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.documents(s, d)
          .select(size(graft.text.TextPrimitives.tokens(col("text")))
            .cast("long").as("v"))
          .groupBy("v").agg(count(lit(1)).cast("double").as("cnt"))
          .localCheckpoint(eager = false) // below-window + totals
        val wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        val tot = g.agg(sum("cnt").as("n"))
        val base = g.withColumn("below", coalesce(sum("cnt").over(wv), lit(0.0)))
          .crossJoin(broadcast(tot))
          .withColumn("u",
            -abs(col("below") + col("cnt") / 2 - col("n") / 2))
          .localCheckpoint(eager = false) // umax + weight pass
        val um = base.agg(max("u").as("um"))
        val wts = base.crossJoin(broadcast(um))
          .withColumn("w", round(col("cnt") * exp((col("u") - col("um")) / 2), 10))
        val cum = wts
          .withColumn("cw", sum("w").over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
        val wtot = wts.agg(sum("w").as("wt"))
        val u0 = (md5Long(lit("dpq:seed")) % 1000000).cast("double") / 1000000.0
        val dp = cum.crossJoin(broadcast(wtot))
          .filter(col("cw") >= u0 * col("wt"))
          .agg(min("v").as("dp_median"))
        val tm = base.filter(col("below") + col("cnt") >= col("n") / 2)
          .agg(min("v").as("true_median"))
        dp.crossJoin(tm).crossJoin(broadcast(tot))
          .select(col("n").cast("long").as("n_docs"),
            lit(1.0).as("eps"), col("true_median"), col("dp_median"),
            abs(col("dp_median") - col("true_median")).as("abs_err"))
      },
      Some("""WITH g AS (
             |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS v,
             |         CAST(count(*) AS DOUBLE) AS cnt
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT sum(cnt) AS n FROM g),
             |base AS MATERIALIZED (
             |  SELECT v, cnt,
             |         coalesce(sum(cnt) OVER (ORDER BY v
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             |         n
             |  FROM g, tot),
             |ub AS (SELECT *, -abs(below + cnt/2 - n/2) AS u FROM base),
             |um AS (SELECT max(u) AS um FROM ub),
             |wts AS MATERIALIZED (
             |  SELECT v, cnt, below, n,
             |         round(cnt * exp((u - um) / 2), 10) AS w
             |  FROM ub, um),
             |cum AS (SELECT *, sum(w) OVER (ORDER BY v
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
             |        FROM wts),
             |wtot AS (SELECT sum(w) AS wt FROM wts),
             |dp AS (SELECT min(v) AS dp_median FROM cum, wtot
             |       WHERE cw >= (('0x' || substr(md5('dpq:seed'), 1, 15))::BIGINT
             |                    % 1000000) / 1000000.0 * wt),
             |tm AS (SELECT min(v) AS true_median FROM ub WHERE below + cnt >= n/2)
             |SELECT CAST(n AS BIGINT) AS n_docs, CAST(1.0 AS DOUBLE) AS eps,
             |       true_median, dp_median,
             |       abs(dp_median - true_median) AS abs_err
             |FROM dp, tm, tot""".stripMargin)))

  private val round10fQ: Seq[(String, Q)] = Seq(
    // deterministic 5-fold cross-validation assignment + balance
    // audit: folds are md5(doc_id) — stable under re-runs and
    // repartitioning (the samp_hash_split contract) — and the audit
    // reports what fold assignment actually controls: doc share,
    // token share, and per-fold drift of the en-language share vs the
    // corpus. ONE map-side projection + one grouped pass; the corpus
    // share is a broadcast 1-row aggregate.
    "samp_kfold" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d).select(
          pmod(md5Long(concat(lit("kfold:"), col("doc_id").cast("string"))),
            lit(5)).as("fold"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("n_tok"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
          .localCheckpoint(eager = false) // global share + per-fold rollup
        val g = t.agg((sum("is_en") / count(lit(1))).as("g_en"),
                      sum("n_tok").as("g_tok"))
        t.groupBy("fold")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
               (sum("is_en") / count(lit(1))).as("en_s"))
          .crossJoin(broadcast(g))
          .select(col("fold"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens") / col("g_tok").cast("double"), 4)
              .as("tok_share"),
            round(col("en_s"), 4).as("en_share"),
            round(abs(col("en_s") - col("g_en")), 4).as("en_dev"))
          .orderBy("fold")
      },
      Some("""WITH t AS (
             |  SELECT ('0x' || substr(md5('kfold:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |           % 5 AS fold,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok,
             |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
             |  FROM documents),
             |g AS (SELECT sum(is_en) * 1.0 / count(*) AS g_en,
             |             CAST(sum(n_tok) AS BIGINT) AS g_tok FROM t)
             |SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |       round(sum(n_tok) / CAST(g_tok AS DOUBLE), 4) AS tok_share,
             |       round(sum(is_en) * 1.0 / count(*), 4) AS en_share,
             |       round(abs(sum(is_en) * 1.0 / count(*) - g_en), 4) AS en_dev
             |FROM t, g GROUP BY fold, g_tok, g_en ORDER BY fold""".stripMargin)),

    // bloom-filter incremental dedup (the 100 TB daily-increment
    // screen): a 2^16-bit / 3-hash bloom over the EXISTING corpus's
    // content hashes, probed by the new batch — the filter is a
    // DISTINCT bit-position table bounded by m (broadcastable at any
    // corpus size), membership is "all 3 positions present" via one
    // semi-join + HAVING, and the report quantifies exactly what a
    // bloom buys: hits vs true dups vs false positives at the
    // measured load factor. All-md5 arithmetic, bit-exact on both
    // engines; the exact-dup flag comes from the content-hash set.
    "dedup_bloom_incremental" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ks = array(lit(0), lit(1), lit(2))
        def positions(df: DataFrame) = df
          .withColumn("h", md5(col("text")))
          .select(col("doc_id"), col("h"), explode(ks).as("k"))
          .withColumn("pos",
            pmod(md5Long(concat(col("h"), lit(":"), col("k").cast("string"))),
              lit(65536)))
        val corpus = Tables.documents(s, d).filter(col("doc_id") < 150)
        val batch = Tables.documents(s, d)
          .filter(col("doc_id") >= 150 && col("doc_id") < 250)
        val bloom = positions(corpus).select("pos").distinct()
          .localCheckpoint(eager = false) // bits_set + the probe join
        val corpusH = corpus.select(md5(col("text")).as("h")).distinct()
        val probed = positions(batch)
          .join(broadcast(bloom), Seq("pos"), "left_semi")
          .groupBy("doc_id", "h").agg(count(lit(1)).as("n_pos_hit"))
        val flags = batch.select(col("doc_id"), md5(col("text")).as("h"))
          .join(probed.select(col("doc_id"), col("n_pos_hit")), Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_pos_hit"))
          .withColumn("bloom_hit", (col("n_pos_hit") === 3).cast("long"))
          .join(broadcast(corpusH.withColumn("exact", lit(1L))), Seq("h"), "left")
          .na.fill(0L, Seq("exact"))
        val bits = bloom.agg(count(lit(1)).as("bits_set"))
        flags.agg(count(lit(1)).as("n_batch"),
            sum("bloom_hit").as("n_bloom_hits"),
            sum("exact").as("n_exact_dups"),
            sum(when(col("bloom_hit") === 1 && col("exact") === 0, 1L)
              .otherwise(0L)).as("n_false_pos"))
          .crossJoin(broadcast(bits))
          .select(col("n_batch"), col("n_bloom_hits"), col("n_exact_dups"),
            col("n_false_pos"),
            round(col("n_false_pos") / col("n_batch").cast("double"), 6)
              .as("fp_rate"),
            col("bits_set"),
            round(col("bits_set") / lit(65536.0), 4).as("load_factor"))
      },
      Some("""WITH ks AS (SELECT CAST(unnest([0, 1, 2]) AS INT) AS k),
             |cp AS (SELECT DISTINCT
             |         ('0x' || substr(md5(md5(text) || ':' || k::VARCHAR), 1, 15))::BIGINT
             |           % 65536 AS pos
             |       FROM documents, ks WHERE doc_id < 150),
             |bh AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 150),
             |bp AS (SELECT doc_id, md5(text) AS h, k,
             |         ('0x' || substr(md5(md5(text) || ':' || k::VARCHAR), 1, 15))::BIGINT
             |           % 65536 AS pos
             |       FROM documents, ks WHERE doc_id >= 150 AND doc_id < 250),
             |pr AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS n_pos_hit
             |       FROM bp WHERE pos IN (SELECT pos FROM cp)
             |       GROUP BY doc_id, h),
             |fl AS (SELECT b.doc_id,
             |              CASE WHEN coalesce(pr.n_pos_hit, 0) = 3 THEN 1 ELSE 0 END AS bloom_hit,
             |              CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END AS exact
             |       FROM (SELECT doc_id, md5(text) AS h FROM documents
             |             WHERE doc_id >= 150 AND doc_id < 250) b
             |       LEFT JOIN pr ON pr.doc_id = b.doc_id
             |       LEFT JOIN bh ON bh.h = b.h),
             |bits AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM cp)
             |SELECT CAST(count(*) AS BIGINT) AS n_batch,
             |       CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
             |       CAST(sum(exact) AS BIGINT) AS n_exact_dups,
             |       CAST(sum(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_false_pos,
             |       round(sum(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 6) AS fp_rate,
             |       bits_set, round(bits_set / 65536.0, 4) AS load_factor
             |FROM fl, bits GROUP BY bits_set""".stripMargin)),

    // process-conformance audit (process mining): which observed
    // event-type transitions fall OUTSIDE the declared process model?
    // Pure projection over the SHARED transition cells — zero
    // additional fact scans — with the model as a literal allowlist
    // (the form a process owner writes down). The rate column is the
    // one-number conformance KPI; the rows localize the deviations.
    "ev_conformance" -> Q(
      (s, d) => {
        val allowed = Seq("signup>click", "click>click", "click>purchase",
          "click>error", "error>click")
        val cells = transitionCells(s, d).filter(col("to_type").isNotNull)
          .select(col("from_type"), col("to_type"), col("n"))
          .withColumn("is_allowed",
            when(concat(col("from_type"), lit(">"), col("to_type"))
              .isin(allowed: _*), 1L).otherwise(0L))
          .localCheckpoint(eager = false) // totals + output rows
        val tot = cells.agg(sum("n").as("tn"),
          sum(when(col("is_allowed") === 1, col("n")).otherwise(0L)).as("cn"))
        cells.crossJoin(broadcast(tot))
          .select(col("from_type"), col("to_type"), col("n"), col("is_allowed"),
            round(col("cn") / col("tn").cast("double"), 4)
              .as("conformance_rate"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type, 1) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cells AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
             |                 CASE WHEN from_type || '>' || to_type IN
             |                   ('signup>click', 'click>click', 'click>purchase',
             |                    'click>error', 'error>click')
             |                 THEN 1 ELSE 0 END AS is_allowed
             |          FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT sum(n) AS tn,
             |               sum(CASE WHEN is_allowed = 1 THEN n ELSE 0 END) AS cn
             |        FROM cells)
             |SELECT from_type, to_type, n, CAST(is_allowed AS BIGINT) AS is_allowed,
             |       round(cn / CAST(tn AS DOUBLE), 4) AS conformance_rate
             |FROM cells, tot ORDER BY from_type, to_type""".stripMargin)),

    // video keyframe selection: one keyframe per detected shot (frame
    // 0 + every mm_shot_bounds cut) — the frame set a vision encoder
    // would actually ingest, with the compression it buys. Same
    // decode-stub feature stream; per-video fan-out bounded at 240
    // frames; the keyframe pick is the same per-video lag window.
    "mm_video_keyframes" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val frames = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2) // kind = video
          .select(col("doc_id"),
            (md5Long(col("text")) % 240 + 1).as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0L), col("n_frames") - 1)).as("f"))
          .withColumn("feat",
            md5Long(concat(col("doc_id").cast("string"), lit("#"),
              col("f").cast("string"))) % 1000)
        val w = Window.partitionBy("doc_id").orderBy("f")
        frames.withColumn("pf", lag(col("feat"), 1).over(w))
          .withColumn("kf",
            when(col("pf").isNull || abs(col("feat") - col("pf")) > 600, 1L)
              .otherwise(0L))
          .groupBy("doc_id", "n_frames")
          .agg(sum("kf").as("n_keyframes"),
               max(when(col("kf") === 1, col("f"))).as("last_keyframe"))
          .select(col("doc_id"), col("n_frames"), col("n_keyframes"),
            col("last_keyframe"),
            round(col("n_keyframes") / col("n_frames").cast("double"), 4)
              .as("keep_ratio"),
            round(col("n_frames") / col("n_keyframes").cast("double"), 2)
              .as("mean_shot_len"))
          .orderBy("doc_id")
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, n_frames,
             |         CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS f
             |  FROM (SELECT doc_id,
             |               ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |        FROM documents WHERE doc_id % 3 = 2)),
             |ft AS (SELECT doc_id, n_frames, f,
             |         ('0x' || substr(md5(doc_id::VARCHAR || '#' || f::VARCHAR), 1, 15))::BIGINT
             |           % 1000 AS feat
             |       FROM fr),
             |lg AS (SELECT doc_id, n_frames, f, feat,
             |         lag(feat) OVER (PARTITION BY doc_id ORDER BY f) AS pf FROM ft),
             |kf AS (SELECT doc_id, n_frames, f,
             |         CASE WHEN pf IS NULL OR abs(feat - pf) > 600 THEN 1 ELSE 0 END AS kf
             |       FROM lg)
             |SELECT doc_id, n_frames, CAST(sum(kf) AS BIGINT) AS n_keyframes,
             |       CAST(max(CASE WHEN kf = 1 THEN f END) AS BIGINT) AS last_keyframe,
             |       round(sum(kf) / CAST(n_frames AS DOUBLE), 4) AS keep_ratio,
             |       round(n_frames / CAST(sum(kf) AS DOUBLE), 2) AS mean_shot_len
             |FROM kf GROUP BY doc_id, n_frames ORDER BY doc_id""".stripMargin)),

    // Theil's U2 forecast-quality ratio per type: the trailing-7-day
    // mean (ts_backtest's model) scored against the no-change naive
    // forecast — U2 < 1 is the only evidence a forecasting model has
    // earned its complexity. ONE daily rollup; both forecasts are
    // per-type windows over O(days) rows; integer count sums make
    // every residual engine-exact before the 4dp output round.
    "ts_theil_u" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val wf = w.rowsBetween(-7, -1)
        val scored = daily
          .withColumn("f", when(count(lit(1)).over(wf) === 7, avg("y").over(wf)))
          .withColumn("yl", lag("y", 1).over(w))
          .filter(col("f").isNotNull && col("yl").isNotNull)
        scored.groupBy("event_type")
          .agg(count(lit(1)).as("n_scored"),
               sum(pow(col("f") - col("y"), 2)).as("sm"),
               sum(pow(col("yl") - col("y"), 2)).as("sn"))
          .select(col("event_type"), col("n_scored"),
            round(sqrt(col("sm") / col("n_scored")), 4).as("rmse_model"),
            round(sqrt(col("sn") / col("n_scored")), 4).as("rmse_naive"),
            when(col("sn") > 0, round(sqrt(col("sm") / col("sn")), 4))
              .as("theil_u2"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |sc AS (SELECT event_type, y,
             |         CASE WHEN count(*) OVER w7 = 7
             |              THEN avg(y) OVER w7 END AS f,
             |         lag(y) OVER (PARTITION BY event_type ORDER BY day) AS yl
             |       FROM daily
             |       WINDOW w7 AS (PARTITION BY event_type ORDER BY day
             |                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
             |       round(sqrt(sum((f - y)*(f - y)) / count(*)), 4) AS rmse_model,
             |       round(sqrt(sum((yl - y)*(yl - y)) / count(*)), 4) AS rmse_naive,
             |       CASE WHEN sum((yl - y)*(yl - y)) > 0
             |            THEN round(sqrt(sum((f - y)*(f - y))
             |                       / sum((yl - y)*(yl - y))), 4)
             |       END AS theil_u2
             |FROM sc WHERE f IS NOT NULL AND yl IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Wald-Wolfowitz runs test per type: are the daily up/down moves
    // random, or does the series trend/oscillate beyond chance? Signs
    // come from one lag window on the daily rollup (zero-change days
    // dropped, standard practice); the run count is a second bounded
    // window over the nonzero signs; z uses the exact run-count
    // moments and p the shared A&S erfc. Everything after the rollup
    // is O(days) per type.
    "ts_runs_test" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val sg = daily
          .withColumn("dlt", col("c") - lag("c", 1).over(w))
          .filter(col("dlt").isNotNull && col("dlt") =!= 0)
          .withColumn("sgn", when(col("dlt") > 0, 1L).otherwise(-1L))
        val runs = sg
          .withColumn("ps", lag("sgn", 1).over(w))
          .groupBy("event_type")
          .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
               sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
               (sum(when(col("ps").isNotNull && col("ps") =!= col("sgn"), 1L)
                 .otherwise(0L)) + 1).as("n_runs"))
        val nn = (col("n_up") + col("n_down")).cast("double")
        val p2 = lit(2.0) * col("n_up") * col("n_down")
        val mu = p2 / nn + 1.0
        val s2 = p2 * (p2 - nn) / (nn * nn * (nn - 1.0))
        val zc = runs
          .withColumn("z",
            when(col("n_up") > 0 && col("n_down") > 0 && nn > 1 && s2 > 0,
              round((col("n_runs") - mu) / sqrt(s2), 4)))
        val xx = abs(col("z")) / sqrt(lit(2.0))
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        zc.select(col("event_type"), col("n_up"), col("n_down"), col("n_runs"),
            col("z"),
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                + t1 * lit(1.061405429)))))
              * exp(-xx * xx), 6)).as("p_value"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |df AS (SELECT event_type, day,
             |         c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS dlt
             |       FROM daily),
             |sg AS (SELECT event_type, day,
             |         CASE WHEN dlt > 0 THEN 1 ELSE -1 END AS sgn
             |       FROM df WHERE dlt IS NOT NULL AND dlt <> 0),
             |rn AS (SELECT event_type,
             |         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             |         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
             |         CAST(sum(CASE WHEN ps IS NOT NULL AND ps <> sgn
             |                       THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
             |       FROM (SELECT event_type, sgn,
             |               lag(sgn) OVER (PARTITION BY event_type ORDER BY day) AS ps
             |             FROM sg)
             |       GROUP BY event_type),
             |zc AS (SELECT *,
             |         CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1
             |               AND 2.0*n_up*n_down * (2.0*n_up*n_down - (n_up + n_down))
             |                   / (CAST(n_up + n_down AS DOUBLE)
             |                      * (n_up + n_down) * (n_up + n_down - 1.0)) > 0
             |              THEN round((n_runs - (2.0*n_up*n_down
             |                          / CAST(n_up + n_down AS DOUBLE) + 1.0))
             |                / sqrt(2.0*n_up*n_down
             |                       * (2.0*n_up*n_down - (n_up + n_down))
             |                       / (CAST(n_up + n_down AS DOUBLE)
             |                          * (n_up + n_down) * (n_up + n_down - 1.0))), 4)
             |         END AS z
             |       FROM rn),
             |pv AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |              1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t1
             |       FROM zc)
             |SELECT event_type, n_up, n_down, n_runs, z,
             |       CASE WHEN z IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value
             |FROM pv ORDER BY event_type""".stripMargin)))

  /** ln Γ(x) for x ≥ 1 as a FIXED closed-form expression (Stirling at
    * x+6 with three correction terms, shift-down product): both
    * engines evaluate the identical tree on identical integer inputs,
    * so parity is structural — deliberately NOT DuckDB's built-in
    * lgamma, whose libm differs from anything Spark can express.
    * Absolute error < 1e-9 over the whole support.
    */
  private[graft] def lgammaCol(x: Column): Column = {
    val z = x + lit(6.0)
    val z5 = z * z * z * z * z
    (z - 0.5) * log(z) - z + lit(0.9189385332046727) +
      lit(1.0) / (lit(12.0) * z) - lit(1.0) / (lit(360.0) * z * z * z) +
      lit(1.0) / (lit(1260.0) * z5) -
      log(x * (x + 1) * (x + 2) * (x + 3) * (x + 4) * (x + 5))
  }
  private[graft] def lfCol(x: Column): Column = lgammaCol(x + lit(1.0))

  /** The same Stirling ln Γ(e+1) (log-factorial) as SQL text. */
  private def sqlLf(e: String): String = {
    val x = s"(($e) + 1.0)"
    val z = s"(($e) + 7.0)"
    s"(($z - 0.5) * ln($z) - $z + 0.9189385332046727" +
      s" + 1.0/(12.0*$z) - 1.0/(360.0*$z*$z*$z)" +
      s" + 1.0/(1260.0*($z*$z*$z*$z*$z))" +
      s" - ln($x*($x+1)*($x+2)*($x+3)*($x+4)*($x+5)))"
  }

  private val round10gQ: Seq[(String, Q)] = Seq(
    // Fisher's EXACT test on the 2×2 (arm × converted-user) table —
    // the test that stays valid when a segment's conversions are too
    // few for the χ²/z machinery (ev_ab_test, ev_srm). One per-user
    // rollup → 4 counts; the hypergeometric tail is an explicit sum
    // over the ≤min(margin) support (explode of a bounded sequence —
    // conversions, never users), every term closed-form through the
    // shared Stirling lgamma so both engines run the identical tree.
    // Two-sided by the standard "sum all tables no more likely than
    // observed" rule with a 1e-7 log-slack absorbing libm ulp drift.
    "stat_fisher_exact" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ab = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val cts = ab.agg(
          sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("dd"))
          .withColumn("r1", col("a") + col("b"))
          .withColumn("r2", col("c") + col("dd"))
          .withColumn("c1", col("a") + col("c"))
          .withColumn("c2", col("b") + col("dd"))
          .withColumn("n", col("r1") + col("r2"))
        val base = cts
          .withColumn("lconst",
            lfCol(col("r1").cast("double")) + lfCol(col("r2").cast("double")) +
            lfCol(col("c1").cast("double")) + lfCol(col("c2").cast("double")) -
            lfCol(col("n").cast("double")))
          .withColumn("lobs",
            col("lconst") - lfCol(col("a").cast("double")) -
            lfCol((col("r1") - col("a")).cast("double")) -
            lfCol((col("c1") - col("a")).cast("double")) -
            lfCol((col("r2") - col("c1") + col("a")).cast("double")))
        val based = base.localCheckpoint(eager = false) // bounds + terms
        // hypergeometric support as a DISTRIBUTED spark.range (same
        // rationale as stat_bayes_ab: one-row sequence() arrays don't
        // survive production counts); 1-row bounded collect for bounds.
        val bnd = based.select(
          greatest(lit(0L), col("c1") - col("r2")).as("lo"),
          least(col("r1"), col("c1")).as("hi")).collect()(0)
        // empty events → NULL bounds → empty support → 0 rows out
        val (bLo, bHi) =
          if (bnd.isNullAt(0) || bnd.isNullAt(1)) (0L, -1L)
          else (bnd.getLong(0), bnd.getLong(1))
        val terms = s.range(bLo, bHi + 1L).toDF("k")
          .crossJoin(broadcast(based))
          .withColumn("lpk",
            col("lconst") - lfCol(col("k").cast("double")) -
            lfCol((col("r1") - col("k")).cast("double")) -
            lfCol((col("c1") - col("k")).cast("double")) -
            lfCol((col("r2") - col("c1") + col("k")).cast("double")))
        terms.groupBy("a", "b", "c", "dd")
          .agg(round(sum(when(col("lpk") <= col("lobs") + 1e-7,
            exp(col("lpk"))).otherwise(0.0)), 6).as("p_two_sided"))
          .select(col("a").as("n_t_conv"), col("b").as("n_t_no"),
            col("c").as("n_c_conv"), col("dd").as("n_c_no"),
            when(col("b") * col("c") > 0,
              round(col("a") * col("dd") / (col("b") * col("c")).cast("double"), 4))
              .as("odds_ratio"),
            col("p_two_sided"))
      },
      Some(s"""WITH ab AS (
              |  SELECT user_id,
              |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
              |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
              |  FROM events GROUP BY 1, 2),
              |ct AS (SELECT
              |         CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
              |         CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
              |         CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
              |         CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
              |       FROM ab),
              |mg AS (SELECT *, a + b AS r1, c + dd AS r2, a + c AS c1, b + dd AS c2,
              |              a + b + c + dd AS n
              |       FROM ct),
              |bs AS (SELECT *,
              |         ${sqlLf("r1")} + ${sqlLf("r2")} + ${sqlLf("c1")}
              |           + ${sqlLf("c2")} - ${sqlLf("n")} AS lconst
              |       FROM mg),
              |ob AS (SELECT *, lconst - ${sqlLf("a")} - ${sqlLf("r1 - a")}
              |           - ${sqlLf("c1 - a")} - ${sqlLf("r2 - c1 + a")} AS lobs
              |       FROM bs),
              |tm AS (SELECT *,
              |         lconst - ${sqlLf("k")} - ${sqlLf("r1 - k")}
              |           - ${sqlLf("c1 - k")} - ${sqlLf("r2 - c1 + k")} AS lpk
              |       FROM (SELECT *, CAST(unnest(generate_series(
              |               greatest(0, c1 - r2), least(r1, c1))) AS BIGINT) AS k
              |             FROM ob))
              |SELECT a AS n_t_conv, b AS n_t_no, c AS n_c_conv, dd AS n_c_no,
              |       CASE WHEN b * c > 0
              |            THEN round(a * dd / CAST(b * c AS DOUBLE), 4)
              |       END AS odds_ratio,
              |       round(sum(CASE WHEN lpk <= lobs + 1e-7
              |                      THEN exp(lpk) ELSE 0.0 END), 6) AS p_two_sided
              |FROM tm GROUP BY 1, 2, 3, 4, 5""".stripMargin)),

    // extractive summarization (SumBasic-style): per doc, the top-3
    // sentences by mean corpus token frequency — the "what to show a
    // labeler" primitive. Sentence split + scoring are map-side over
    // the bounded subset; the frequency table is a broadcast join;
    // the pick is a per-doc bounded window. Scores are rounded BEFORE
    // ranking so order ties break identically on both engines.
    "text_extract_summary" -> Q(
      (s, d) => {
        val sub = Tables.documents(s, d).filter(col("doc_id") < 100)
        val sents = sub.select(col("doc_id"),
            posexplode(split(col("text"), "[.!?]+")).as(Seq("pos", "sent")))
          .withColumn("sent", trim(col("sent")))
          .filter(length(col("sent")) > 0)
        val stok = sents.select(col("doc_id"), col("pos"),
            explode(graft.text.TextPrimitives.tokens(col("sent"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .localCheckpoint(eager = false) // vocab + the scoring join
        val freq = stok.groupBy("tok").agg(count(lit(1)).as("tf"))
        val scored = stok.join(broadcast(freq), "tok")
          .groupBy("doc_id", "pos")
          .agg(count(lit(1)).as("n_tok_sent"),
               round(avg(col("tf").cast("double")), 4).as("score"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("pos"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("long").as("rk"),
            col("pos").cast("long").as("sent_pos"), col("n_tok_sent"),
            col("score"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
             |sents AS (
             |  SELECT doc_id, i - 1 AS pos, trim(arr[i]) AS sent
             |  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
             |        FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS arr
             |              FROM sub))
             |  WHERE length(trim(arr[i])) > 0),
             |stok AS (
             |  SELECT doc_id, pos, tok
             |  FROM (SELECT doc_id, pos,
             |          unnest(regexp_split_to_array(lower(trim(sent)), '\s+')) AS tok
             |        FROM sents)
             |  WHERE length(tok) > 0),
             |freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf
             |         FROM stok GROUP BY tok),
             |scored AS (
             |  SELECT doc_id, pos, CAST(count(*) AS BIGINT) AS n_tok_sent,
             |         round(avg(CAST(tf AS DOUBLE)), 4) AS score
             |  FROM stok JOIN freq USING (tok) GROUP BY doc_id, pos)
             |SELECT doc_id, CAST(rk AS BIGINT) AS rk,
             |       CAST(pos AS BIGINT) AS sent_pos, n_tok_sent, score
             |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY score DESC, pos) AS rk
             |      FROM scored)
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // n-gram novelty by crawl order: what share of each doc's
    // 3-token shingles appear for the FIRST time at that doc — the
    // "is more crawl still adding content" curve, bucketed by doc_id
    // decile. Two gram-hash keyed aggregates over the shared distinct
    // shingle table (materialized once); nothing is quadratic and the
    // first-occurrence table shrinks as duplication rises.
    "text_ngram_novelty" -> Q(
      (s, d) => {
        val grams = graft.text.TextPrimitives.tokenShingles(
            Tables.documents(s, d), "doc_id", "text", 3)
          .localCheckpoint(eager = false) // first-occurrence + share join
        val first = grams.groupBy("sh").agg(min("doc_id").as("fd"))
        val perDoc = grams.join(first, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n"),
               sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("nov"))
          .localCheckpoint(eager = false) // max + bucket rollup
        val mx = perDoc.agg(max("doc_id").as("mx"))
        perDoc.crossJoin(broadcast(mx))
          .withColumn("bucket", expr("(doc_id * 10) div (mx + 1)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("n_grams"),
               round(sum("nov") / sum("n").cast("double"), 4).as("novelty_rate"))
          .orderBy("bucket")
      },
      Some(s"""WITH g AS (
              |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 3)}),
              |fo AS (SELECT sh, CAST(min(doc_id) AS BIGINT) AS fd FROM g GROUP BY sh),
              |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
              |              CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS nov
              |       FROM g JOIN fo USING (sh) GROUP BY doc_id),
              |mx AS (SELECT max(doc_id) AS mx FROM pd)
              |SELECT (doc_id * 10) // (mx + 1) AS bucket,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n) AS BIGINT) AS n_grams,
              |       round(sum(nov) / CAST(sum(n) AS DOUBLE), 4) AS novelty_rate
              |FROM pd, mx GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // second covariance eigenvalue by DEFLATION: converge v₁ (8
    // rounds), subtract λ₁v₁v₁ᵀ cell-wise (λ₁ and v₁ rounded first so
    // the deflated cells are engine-pinned), converge again — the
    // spectral gap λ₂/λ₁ says whether emb_top_eigen's "one direction"
    // story is real or the top two directions are degenerate. Still
    // ONE corpus-scale aggregate; both iteration chains are joins
    // over 4096 cells.
    "emb_deflated_eigen" -> Q(
      (s, d) => {
        // ONE cross-moment aggregate over the embeddings scan; both
        // 8-step power iterations AND the deflation run driver-side
        // on the bounded d² cells (CovMoments doc) — was the suite's
        // slowest query purely from ~16 scheduled cluster jobs over a
        // ≤4096-row frame
        import graft.embed.CovMoments._
        import s.implicits._
        val cells = covCells(moments(Tables.embeddings(s, d)))
        val dim = cells.length
        def converge(cl: Array[Array[Double]])
            : (Array[Double], Option[Double]) = {
          val v = powerIterate(cl, 8)
          (v, rayleigh(cl, v).map(x => r(x, 6)))
        }
        val (v1, l1) = converge(cells)
        val res = l1 match {
          case Some(lam1) if v1 != null =>
            val cells2 = Array.tabulate(dim, dim)((a, b) =>
              r(cells(a)(b) - lam1 * v1(a) * v1(b), 7))
            val (_, l2) = converge(cells2)
            var trc = 0.0
            (0 until dim).foreach(i => trc += cells(i)(i))
            (Some(lam1), l2,
             l2.filter(_ => lam1 > 0).map(x => r(1.0 - x / lam1, 4)),
             l2.filter(_ => trc > 0).map(x => r((lam1 + x) / trc, 4)))
          case _ => (l1, None, None, None)
        }
        Seq(res).toDF("lambda1", "lambda2", "spectral_gap", "top2_share")
      },
      Some(s"""WITH px AS (SELECT vec_id,
              |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
              |              CAST(unnest(embedding) AS DOUBLE) AS xa
              |            FROM embeddings WHERE embedding IS NOT NULL),
              |cells AS MATERIALIZED (
              |  SELECT p.a, q.a AS b,
              |         round(sum(p.xa * q.xa) / count(*) -
              |               (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
              |  FROM px p JOIN px q ON p.vec_id = q.vec_id
              |  GROUP BY 1, 2),
              |v0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells WHERE a = b),
              |${covPowIterSql(8)},
              |l1 AS (SELECT CASE WHEN den > 0 THEN round(num / den, 6) END AS lam
              |       FROM (SELECT sum(c.cv * va.x * vb.x) AS num
              |             FROM cells c JOIN v8 va ON va.i = c.a
              |                          JOIN v8 vb ON vb.i = c.b),
              |            (SELECT sum(x*x) AS den FROM v8)),
              |cells2 AS MATERIALIZED (
              |  SELECT c.a, c.b, round(c.cv - l1.lam * va.x * vb.x, 7) AS cv
              |  FROM cells c JOIN v8 va ON va.i = c.a
              |               JOIN v8 vb ON vb.i = c.b, l1),
              |dv0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells2 WHERE a = b),
              |${covPowIterSql(8, "cells2", "d")},
              |l2 AS (SELECT CASE WHEN den > 0 THEN round(num / den, 6) END AS lam
              |       FROM (SELECT sum(c.cv * va.x * vb.x) AS num
              |             FROM cells2 c JOIN dv8 va ON va.i = c.a
              |                           JOIN dv8 vb ON vb.i = c.b),
              |            (SELECT sum(x*x) AS den FROM dv8)),
              |tr AS (SELECT sum(cv) AS trc FROM cells WHERE a = b)
              |SELECT l1.lam AS lambda1, l2.lam AS lambda2,
              |       CASE WHEN l1.lam > 0
              |            THEN round(1.0 - l2.lam / l1.lam, 4) END AS spectral_gap,
              |       CASE WHEN trc > 0
              |            THEN round((l1.lam + l2.lam) / trc, 4) END AS top2_share
              |FROM l1, l2, tr""".stripMargin)))

  private val round10hQ: Seq[(String, Q)] = Seq(
    // exact Bayesian A/B: P(p_B > p_A) under independent Beta(1,1)
    // posteriors, by the closed-form finite sum (support bounded by
    // arm-B CONVERSIONS, never users) with every log-Beta going
    // through the shared Stirling lgamma — the "probability B is
    // better" number product teams actually want next to ev_ab_test's
    // p-value. One per-user rollup → 4 counts; the sum is an explode
    // of a bounded sequence.
    "stat_bayes_ab" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        def lnB(x: Column, y: Column): Column =
          lgammaCol(x) + lgammaCol(y) - lgammaCol(x + y)
        val ab = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val cts = ab.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("c_b"))
          .withColumn("aa", (col("c_a") + 1).cast("double"))
          .withColumn("ba", (col("n_a") - col("c_a") + 1).cast("double"))
          .withColumn("bb", (col("n_b") - col("c_b") + 1).cast("double"))
          .localCheckpoint(eager = false) // reused: bound read + terms
        // support 0..c_b as a DISTRIBUTED spark.range — a one-row
        // sequence() array caps at Spark's max array size and puts
        // millions of elements on one task once c_b is production-
        // scale. Reading the bound is a 1-row bounded collect (the
        // graph_pagerank altitude).
        val ctsRow = cts.select(col("c_b")).collect()(0)
        // empty events → NULL counts → empty support → 0 rows out
        // (exactly what explode(sequence(0, NULL)) used to produce)
        val cB = if (ctsRow.isNullAt(0)) -1L else ctsRow.getLong(0)
        val terms = s.range(0L, cB + 1L).toDF("i")
          .crossJoin(broadcast(cts))
          .withColumn("lt",
            lnB(col("aa") + col("i"), col("ba") + col("bb"))
              - log(col("bb") + col("i"))
              - lnB(lit(1.0) + col("i"), col("bb"))
              - lnB(col("aa"), col("ba")))
        terms.groupBy("n_a", "c_a", "n_b", "c_b")
          .agg(round(sum(exp(col("lt"))), 6).as("prob_b_beats_a"))
          .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
            round(col("c_a") / col("n_a").cast("double"), 4).as("rate_a"),
            round(col("c_b") / col("n_b").cast("double"), 4).as("rate_b"),
            col("prob_b_beats_a"))
      },
      Some {
        def lnB(x: String, y: String) = {
          def lg(e: String) = sqlLf(s"($e) - 1.0") // lgamma(e) = lf(e-1)
          s"(${lg(x)} + ${lg(y)} - ${lg(s"($x) + ($y)")})"
        }
        s"""WITH ab AS (
           |  SELECT user_id,
           |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
           |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
           |  FROM events GROUP BY 1, 2),
           |ct AS (SELECT
           |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |         CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |         CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
           |       FROM ab),
           |pr AS (SELECT *, CAST(c_a + 1 AS DOUBLE) AS aa,
           |              CAST(n_a - c_a + 1 AS DOUBLE) AS ba,
           |              CAST(n_b - c_b + 1 AS DOUBLE) AS bb
           |       FROM ct),
           |tm AS (SELECT *,
           |         ${lnB("aa + i", "ba + bb")} - ln(bb + i)
           |           - ${lnB("1.0 + i", "bb")} - ${lnB("aa", "ba")} AS lt
           |       FROM (SELECT *, CAST(unnest(generate_series(0, c_b)) AS BIGINT) AS i
           |             FROM pr))
           |SELECT n_a, c_a, n_b, c_b,
           |       round(c_a / CAST(n_a AS DOUBLE), 4) AS rate_a,
           |       round(c_b / CAST(n_b AS DOUBLE), 4) AS rate_b,
           |       round(sum(exp(lt)), 6) AS prob_b_beats_a
           |FROM tm GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin
      }),

    // sequential probability ratio test (Wald): daily purchase-share
    // LLR under H1 = 10% lift over the pooled rate vs H0, accumulated
    // day by day against the ±ln 19 bounds (α=β=0.05) — the
    // always-valid "stop the experiment NOW" monitor next to
    // stat_group_seq's scheduled looks. ONE daily conditional rollup;
    // the cumulative sum runs over the calendar-bounded day frame
    // (the ts_pettitt window bound). p0 is broadcast and rounded
    // before the log-ratios so both engines accumulate identical
    // terms.
    "stat_sprt" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"),
               count(lit(1)).as("n"))
          .localCheckpoint(eager = false) // pooled rate + the cum pass
        val p0r = daily.agg(
          round(sum("x") / sum("n").cast("double"), 6).as("p0"))
          .withColumn("p1", round(col("p0") * 1.1, 6))
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        daily.crossJoin(broadcast(p0r))
          .withColumn("ok",
            col("p0") > 0 && col("p1") < 1 && col("p1") > col("p0"))
          .withColumn("llr", when(col("ok"),
            col("x") * (log(col("p1")) - log(col("p0"))) +
            (col("n") - col("x")) *
              (log(lit(1.0) - col("p1")) - log(lit(1.0) - col("p0")))))
          .withColumn("cum_llr", round(sum("llr").over(w), 4))
          .select(col("day"), col("x"), col("n"), col("p0"), col("p1"),
            col("cum_llr"),
            when(col("cum_llr") >= 2.9444, lit("accept_h1"))
              .when(col("cum_llr") <= -2.9444, lit("accept_h0"))
              .otherwise(lit("continue")).as("decision"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |p0r AS (SELECT round(sum(x) / CAST(sum(n) AS DOUBLE), 6) AS p0,
             |               round(sum(x) / CAST(sum(n) AS DOUBLE) * 1.1, 6) AS p1
             |        FROM daily),
             |ll AS (SELECT day, x, n, p0, p1,
             |         CASE WHEN p0 > 0 AND p1 < 1 AND p1 > p0
             |              THEN x * (ln(p1) - ln(p0))
             |                   + (n - x) * (ln(1.0 - p1) - ln(1.0 - p0))
             |         END AS llr
             |       FROM daily, p0r),
             |cm AS (SELECT *, round(sum(llr) OVER (ORDER BY day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_llr
             |       FROM ll)
             |SELECT day, x, n, p0, p1, cum_llr,
             |       CASE WHEN cum_llr >= 2.9444 THEN 'accept_h1'
             |            WHEN cum_llr <= -2.9444 THEN 'accept_h0'
             |            ELSE 'continue' END AS decision
             |FROM cm ORDER BY day""".stripMargin)),

    // MinHash band-configuration tuning curve: the SAME 16-hash
    // signatures grouped under (b,r) ∈ {(8,2),(4,4),(2,8)} — how many
    // candidate pairs each config generates and how similar they
    // estimate (mean matching-component share), next to the theory
    // threshold (1/b)^(1/r). The tuning table behind
    // dedup_minhash_lsh's fixed choice; signatures are computed ONCE,
    // candidates stay bounded by the banding itself.
    "dedup_band_curve" -> Q(
      (s, d) => {
        val sig = graft.dedup.Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 16)
          .localCheckpoint(eager = false) // 3 band groupings + est join
        val configs = Seq((8, 2), (4, 4), (2, 8))
        val estCols = (0 until 16).map(i =>
          when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / 16.0
        val parts = configs.map { case (b, r) =>
          val bands = (0 until b).map { band =>
            sig.select(col("doc_id"),
              lit(band).as("band"),
              concat_ws("_", (0 until r).map(j => col(s"m${band * r + j}")): _*)
                .as("bv"))
          }.reduce(_ union _)
          val pairs = bands.as("x").join(bands.as("y"),
              col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
              col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
            .distinct()
          val sa = sig.toDF(sig.columns.map(c =>
            if (c == "doc_id") "da" else s"a_$c"): _*)
          val sb = sig.toDF(sig.columns.map(c =>
            if (c == "doc_id") "db" else s"b_$c"): _*)
          pairs.join(sa, "da").join(sb, "db")
            .agg(count(lit(1)).as("n_cand"),
                 round(avg(estCols), 4).as("avg_est_j"))
            .select(lit(b.toLong).as("b"), lit(r.toLong).as("r"),
              round(pow(lit(1.0) / b, lit(1.0) / r), 4).as("est_threshold"),
              col("n_cand"), col("avg_est_j"))
        }
        parts.reduce(_ union _).orderBy("b")
      },
      Some {
        val sigSql = graft.dedup.Dedup.minhashSigSql(5, 16, "doc_id < 200")
        val est = (0 until 16).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        def cfg(b: Int, r: Int): String = {
          val bandSel = (0 until b).map { band =>
            val bv = (0 until r).map(j => s"m${band * r + j}").mkString(", ")
            s"SELECT doc_id, $band AS band, concat_ws('_', $bv) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
             |       round(power(1.0 / $b, 1.0 / $r), 4) AS est_threshold,
             |       CAST(count(*) AS BIGINT) AS n_cand,
             |       round(avg(($est) / 16.0), 4) AS avg_est_j
             |FROM (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
             |      FROM ($bandSel) x JOIN ($bandSel) y
             |        ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
             |JOIN sig sa ON sa.doc_id = da
             |JOIN sig sb ON sb.doc_id = db""".stripMargin
        }
        s"""WITH sig AS MATERIALIZED (
           |$sigSql)
           |${Seq((8, 2), (4, 4), (2, 8)).map { case (b, r) => cfg(b, r) }
              .mkString("\n UNION ALL \n")}
           |ORDER BY b""".stripMargin
      }),

    // tokenizer fertility per language: BPE-ish tokens per whitespace
    // word and bytes per BPE token — the "how expensive is this
    // language for the tokenizer" table (fertility >> 1 means the
    // vocab underserves the language). Reuses text_token_count's two
    // tokenizations in ONE grouped map-side pass.
    "pipe_tokenizer_fertility" -> Q(
      (s, d) => {
        val t = graft.text.TextAnalytics.tokenCounts(Tables.documents(s, d))
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("n_chars"))
          .join(t, "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
               sum("n_ws").as("n_ws_tokens"),
               sum("n_bpe").as("n_bpe_tokens"),
               sum("n_chars").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_ws_tokens"),
            col("n_bpe_tokens"),
            round(col("n_bpe_tokens") / col("n_ws_tokens").cast("double"), 4)
              .as("fertility"),
            round(col("n_chars") / col("n_bpe_tokens").cast("double"), 4)
              .as("chars_per_token"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
             |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
             |  FROM documents)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
             |       CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
             |       round(sum(n_bpe) / CAST(sum(n_ws) AS DOUBLE), 4) AS fertility,
             |       round(sum(n_chars) / CAST(sum(n_bpe) AS DOUBLE), 4) AS chars_per_token
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)))

  private val round10iQ: Seq[(String, Q)] = Seq(
    // "All-but-the-top" embedding post-processing (Mu & Viswanath
    // 2018): remove the mean and project out the top covariance
    // direction, then re-measure anisotropy — the standard fix for
    // the "all vectors point the same way" pathology emb_anisotropy
    // diagnoses. μ and v₁ come from the SAME bounded machinery as
    // emb_top_eigen (4096-cell aggregate + 8 pinned power rounds);
    // the transform is an index-join over the 64-rows-per-vector
    // explode — both engines run the identical relational shape, and
    // the before/after scores use emb_anisotropy's exact Σ identity.
    "emb_abtt" -> Q(
      (s, d) => {
        // all-but-the-top without the N·d² explode OR the exploded
        // self-join: per-dim means (pass 1), CENTERED cross-moments
        // (pass 2, Gramian kernel — centered so the addends match the
        // oracle's join form, no raw-sum cancellation), power
        // iteration driver-side on the bounded d² cells, then ONE
        // kernel pass computes projection / residual / both
        // anisotropy sums per row (CovMoments doc)
        import graft.embed.CovMoments._
        import s.implicits._
        val embT = Tables.embeddings(s, d)
        val m1 = moments(embT) // sxx unused here; same single pass
        val vTop =
          if (m1.n < 2) null
          else {
            val mu0 = m1.sx.map(x => r(x / m1.n, 7))
            powerIterate(centeredCells(moments(embT, center = Some(mu0))), 8)
          }
        if (vTop == null) // degenerate corpus: the oracle emits 0 rows
          Seq.empty[(Long, Double, Double, Double)]
            .toDF("n_vecs", "aniso_before", "aniso_after", "reduction")
        else {
          val mu = m1.sx.map(x => r(x / m1.n, 7))
          // one pass: per row xc = x − mu, p = round(Σ xc·v, 7),
          // xr = xc − p·v; accumulate unit-vector per-dim sums +
          // counts for BOTH the raw and residual anisotropy
          type Acc = (Long, Array[Double], Long, Array[Double])
          val (nB, suB, nA, suA) =
            vectors(embT).rdd.treeAggregate(
              (0L, null: Array[Double], 0L, null: Array[Double]): Acc)(
              seqOp = { case ((nb0, sb0, na0, sa0), x) =>
                val dd = x.length
                val sb = if (sb0 == null) new Array[Double](dd) else sb0
                val sa = if (sa0 == null) new Array[Double](dd) else sa0
                val xc = new Array[Double](dd)
                var i = 0; var p = 0.0
                while (i < dd) {
                  xc(i) = x(i) - mu(i); p += xc(i) * vTop(i); i += 1
                }
                val pr = r(p, 7)
                val xr = new Array[Double](dd)
                var nb = 0.0; var na = 0.0
                i = 0
                while (i < dd) {
                  xr(i) = xc(i) - pr * vTop(i)
                  nb += x(i) * x(i); na += xr(i) * xr(i); i += 1
                }
                nb = math.sqrt(nb); na = math.sqrt(na)
                if (nb > 0) { i = 0; while (i < dd) { sb(i) += x(i) / nb; i += 1 } }
                if (na > 0) { i = 0; while (i < dd) { sa(i) += xr(i) / na; i += 1 } }
                (nb0 + (if (nb > 0) 1L else 0L), sb,
                 na0 + (if (na > 0) 1L else 0L), sa)
              },
              combOp = { case ((n1, s1, m1c, t1), (n2, s2, m2c, t2)) =>
                def madd(a: Array[Double], b: Array[Double]) =
                  if (a == null) b else if (b == null) a
                  else { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }
                (n1 + n2, madd(s1, s2), m1c + m2c, madd(t1, t2))
              })
          def aniso(n: Long, su: Array[Double]): Double = {
            var s2 = 0.0; su.foreach(x => s2 += x * x)
            r((s2 - n) / (n * (n - 1.0)), 6)
          }
          if (nB < 2 || nA < 2)
            Seq.empty[(Long, Double, Double, Double)]
              .toDF("n_vecs", "aniso_before", "aniso_after", "reduction")
          else {
            val ab = aniso(nB, suB)
            val aa = aniso(nA, suA)
            Seq((nB, ab, aa, r(ab - aa, 6)))
              .toDF("n_vecs", "aniso_before", "aniso_after", "reduction")
          }
        }
      },
      Some(s"""WITH ex0 AS MATERIALIZED (
              |  SELECT vec_id,
              |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
              |         CAST(unnest(embedding) AS DOUBLE) AS x
              |  FROM embeddings WHERE embedding IS NOT NULL),
              |mu AS MATERIALIZED (
              |  SELECT i, round(sum(x) / count(*), 7) AS m FROM ex0 GROUP BY i),
              |exc AS MATERIALIZED (
              |  SELECT vec_id, i, x - m AS xc FROM ex0 JOIN mu USING (i)),
              |cells AS MATERIALIZED (
              |  SELECT p.i AS a, q.i AS b,
              |         round(sum(p.xc * q.xc) / count(*), 7) AS cv
              |  FROM exc p JOIN exc q ON p.vec_id = q.vec_id
              |  GROUP BY 1, 2),
              |v0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells WHERE a = b),
              |${covPowIterSql(8)},
              |vv AS MATERIALIZED (SELECT i, x AS v FROM v8),
              |proj AS MATERIALIZED (
              |  SELECT vec_id, round(sum(xc * v), 7) AS p
              |  FROM exc JOIN vv USING (i) GROUP BY vec_id),
              |resid AS MATERIALIZED (
              |  SELECT vec_id, i, xc - p * v AS xr
              |  FROM exc JOIN vv USING (i) JOIN proj USING (vec_id)),
              |nb AS MATERIALIZED (
              |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex0
              |  GROUP BY vec_id HAVING sqrt(sum(x * x)) > 0),
              |sb AS (SELECT i, sum(x / nrm) AS su
              |       FROM ex0 JOIN nb USING (vec_id) GROUP BY i),
              |tb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nb),
              |ab AS (SELECT n, round((sum(su * su) - n) / (n * (n - 1.0)), 6) AS ac
              |       FROM sb, tb GROUP BY n),
              |na AS MATERIALIZED (
              |  SELECT vec_id, sqrt(sum(xr * xr)) AS nrm FROM resid
              |  GROUP BY vec_id HAVING sqrt(sum(xr * xr)) > 0),
              |sa AS (SELECT i, sum(xr / nrm) AS su
              |       FROM resid JOIN na USING (vec_id) GROUP BY i),
              |ta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM na),
              |aa AS (SELECT round((sum(su * su) - n) / (n * (n - 1.0)), 6) AS ac
              |       FROM sa, ta GROUP BY n)
              |SELECT ab.n AS n_vecs, ab.ac AS aniso_before, aa.ac AS aniso_after,
              |       round(ab.ac - aa.ac, 6) AS reduction
              |FROM ab, aa""".stripMargin)),

    // Cochran-Mantel-Haenszel stratified 2×2 test + Mantel-Haenszel
    // common odds ratio: the arm effect on conversion CONTROLLING for
    // signup-day-of-week strata — the Simpson's-paradox-proof
    // companion to ev_ab_test (and the formal version of ev_simpson's
    // audit). Per-user first-day rollup → 7 strata × 4 counts;
    // everything after is arithmetic over ≤7 rows. Continuity-
    // corrected χ²₁, p via the shared A&S erfc.
    "stat_cmh" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(min(expr("ts div 86400000000000")).as("fd"),
               max(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("conv"))
        val strata = u.withColumn("stratum", pmod(col("fd"), lit(7)))
          .groupBy("stratum")
          .agg(sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
               sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
               sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
               sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("dd"))
          .withColumn("n", (col("a") + col("b") + col("c") + col("dd")).cast("double"))
          .filter(col("n") >= 2)
        val agg = strata.agg(
          count(lit(1)).as("n_strata"),
          sum(col("a") - (col("a") + col("b")) * (col("a") + col("c")) / col("n"))
            .as("num"),
          sum((col("a") + col("b")) * (col("c") + col("dd")) *
              (col("a") + col("c")) * (col("b") + col("dd")) /
              (col("n") * col("n") * (col("n") - 1.0))).as("vr"),
          sum(col("a") * col("dd") / col("n")).as("rs"),
          sum(col("b") * col("c") / col("n")).as("ss"))
        // continuity correction clamped at 0: when |num| < 0.5 the
        // unclamped form would INFLATE chi2 to 0.25/vr on a near-
        // perfect null instead of shrinking it toward 0
        val chi = agg.withColumn("chi2",
          when(col("vr") > 0,
            round(pow(greatest(abs(col("num")) - 0.5, lit(0.0)), 2)
              / col("vr"), 4)))
        val xx = sqrt(col("chi2") / 2)
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        chi.select(col("n_strata"), col("chi2"),
          when(col("chi2").isNull, lit(null).cast("double")).otherwise(round(
            t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
              + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
              + t1 * lit(1.061405429)))))
            * exp(-xx * xx), 6)).as("p_value"),
          when(col("ss") > 0, round(col("rs") / col("ss"), 4)).as("or_mh"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
             |         min(ts // 86400000000000) AS fd,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT fd % 7 AS stratum,
             |         sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS a,
             |         sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS b,
             |         sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS c,
             |         sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS dd
             |       FROM u GROUP BY 1),
             |sf AS (SELECT *, CAST(a + b + c + dd AS DOUBLE) AS n FROM st
             |       WHERE a + b + c + dd >= 2),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             |              sum(a - (a + b) * (a + c) / n) AS num,
             |              sum((a + b) * (c + dd) * (a + c) * (b + dd)
             |                  / (n * n * (n - 1.0))) AS vr,
             |              sum(a * dd / n) AS rs, sum(b * c / n) AS ss
             |       FROM sf),
             |ch AS (SELECT *, CASE WHEN vr > 0
             |              THEN round(pow(greatest(abs(num) - 0.5, 0), 2) / vr, 4)
             |              END AS chi2
             |       FROM ag),
             |pv AS (SELECT *, sqrt(chi2 / 2) AS xx,
             |              1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2)) AS t1
             |       FROM ch)
             |SELECT n_strata, chi2,
             |       CASE WHEN chi2 IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value,
             |       CASE WHEN ss > 0 THEN round(rs / ss, 4) END AS or_mh
             |FROM pv""".stripMargin)),

    // Deming (orthogonal / total-least-squares) regression per return
    // flag: when BOTH variables carry error, the OLS slope is biased
    // toward zero — the TLS slope is the closed-form top eigendirection
    // of the 2×2 centered covariance, reported NEXT to OLS so the
    // attenuation is visible. ONE hash aggregate of 5 sums per group.
    "stat_deming" -> Q(
      (s, d) => {
        val t = Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 1000.0).as("y"))
        t.groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
               sum("x").as("sx"), sum("y").as("sy"),
               sum(expr("x*x")).as("sxx"), sum(expr("x*y")).as("sxy"),
               sum(expr("y*y")).as("syy"))
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dyy", col("syy") - col("sy") * col("sy") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
            when(col("dxx") > 0, round(col("dxy") / col("dxx"), 6))
              .as("slope_ols"),
            when(col("dxy") =!= 0, round(
              (col("dyy") - col("dxx") +
                sqrt(pow(col("dyy") - col("dxx"), 2)
                  + lit(4.0) * col("dxy") * col("dxy")))
              / (lit(2.0) * col("dxy")), 6)).as("slope_tls"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
             |                  l_extendedprice / 1000.0 AS y FROM lineitem),
             |g AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
             |             sum(x*y) AS sxy, sum(y*y) AS syy
             |      FROM t GROUP BY 1),
             |c AS (SELECT *, sxx - sx*sx/n AS dxx, syy - sy*sy/n AS dyy,
             |             sxy - sx*sy/n AS dxy
             |      FROM g)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             |       CASE WHEN dxx > 0 THEN round(dxy / dxx, 6) END AS slope_ols,
             |       CASE WHEN dxy <> 0 THEN round(
             |         (dyy - dxx + sqrt(pow(dyy - dxx, 2) + 4.0*dxy*dxy))
             |         / (2.0 * dxy), 6) END AS slope_tls
             |FROM c ORDER BY l_returnflag""".stripMargin)))

  private val round10jQ: Seq[(String, Q)] = Seq(
    // interrupted-time-series (segmented regression): fit daily
    // purchases ~ day SEPARATELY before and after the calendar
    // midpoint and report the level and slope discontinuities at the
    // cut — the first-line causal read-out for "did the launch bend
    // the curve". Both segment fits are CASE-filtered Gram sums in
    // ONE aggregate over the daily rollup; exact integer sums feed
    // the closed forms.
    "ev_intervention_its" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // bounds + the segment sums
        val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
        val t = daily.crossJoin(broadcast(bounds))
          .withColumn("t", (col("day") - col("mn")).cast("double"))
          .withColumn("t0", expr("CAST((mx - mn + 1) div 2 AS DOUBLE)"))
          .withColumn("post", (col("t") >= col("t0")).cast("long"))
        def seg(p: Int, c: String) = sum(when(col("post") === p,
          expr(c)).otherwise(0.0))
        val g = t.agg(max("t0").as("t0"),
          sum(when(col("post") === 0, 1L).otherwise(0L)).cast("double").as("n1"),
          seg(0, "t").as("sx1"), seg(0, "y").as("sy1"),
          seg(0, "t*t").as("sxx1"), seg(0, "t*y").as("sxy1"),
          sum(when(col("post") === 1, 1L).otherwise(0L)).cast("double").as("n2"),
          seg(1, "t").as("sx2"), seg(1, "y").as("sy2"),
          seg(1, "t*t").as("sxx2"), seg(1, "t*y").as("sxy2"))
        def fit(n: String, sx: String, sy: String, sxx: String, sxy: String) = {
          val dx = col(n) * col(sxx) - col(sx) * col(sx)
          val b = (col(n) * col(sxy) - col(sx) * col(sy)) / dx
          (dx, round(b, 6), round((col(sy) - b * col(sx)) / col(n), 6))
        }
        val (dx1, b1, a1) = fit("n1", "sx1", "sy1", "sxx1", "sxy1")
        val (dx2, b2, a2) = fit("n2", "sx2", "sy2", "sxx2", "sxy2")
        g.withColumn("ok", col("n1") >= 2 && col("n2") >= 2 &&
            dx1 > 0 && dx2 > 0)
          .select(col("n1").cast("long").as("n_pre"),
            col("n2").cast("long").as("n_post"),
            when(col("ok"), b1).as("slope_pre"),
            when(col("ok"), b2).as("slope_post"),
            when(col("ok"), round(b2 - b1, 6)).as("slope_change"),
            when(col("ok"), round((a2 + b2 * col("t0")) - (a1 + b1 * col("t0")), 4))
              .as("level_change"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
             |t AS (SELECT CAST(day - mn AS DOUBLE) AS t,
             |             CAST((mx - mn + 1) // 2 AS DOUBLE) AS t0, y,
             |             CASE WHEN day - mn >= (mx - mn + 1) // 2
             |                  THEN 1 ELSE 0 END AS post
             |      FROM daily, b),
             |g AS (SELECT max(t0) AS t0,
             |        CAST(sum(CASE WHEN post = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             |        sum(CASE WHEN post = 0 THEN t ELSE 0 END) AS sx1,
             |        sum(CASE WHEN post = 0 THEN y ELSE 0 END) AS sy1,
             |        sum(CASE WHEN post = 0 THEN t*t ELSE 0 END) AS sxx1,
             |        sum(CASE WHEN post = 0 THEN t*y ELSE 0 END) AS sxy1,
             |        CAST(sum(CASE WHEN post = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
             |        sum(CASE WHEN post = 1 THEN t ELSE 0 END) AS sx2,
             |        sum(CASE WHEN post = 1 THEN y ELSE 0 END) AS sy2,
             |        sum(CASE WHEN post = 1 THEN t*t ELSE 0 END) AS sxx2,
             |        sum(CASE WHEN post = 1 THEN t*y ELSE 0 END) AS sxy2
             |      FROM t),
             |f AS (SELECT *,
             |        n1*sxx1 - sx1*sx1 AS dx1, n2*sxx2 - sx2*sx2 AS dx2,
             |        (n1 >= 2 AND n2 >= 2 AND n1*sxx1 - sx1*sx1 > 0
             |         AND n2*sxx2 - sx2*sx2 > 0) AS ok
             |      FROM g),
             |c AS (SELECT *,
             |        round((n1*sxy1 - sx1*sy1) / dx1, 6) AS b1,
             |        round((n2*sxy2 - sx2*sy2) / dx2, 6) AS b2,
             |        round((sy1 - (n1*sxy1 - sx1*sy1) / dx1 * sx1) / n1, 6) AS a1,
             |        round((sy2 - (n2*sxy2 - sx2*sy2) / dx2 * sx2) / n2, 6) AS a2
             |      FROM f)
             |SELECT CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
             |       CASE WHEN ok THEN b1 END AS slope_pre,
             |       CASE WHEN ok THEN b2 END AS slope_post,
             |       CASE WHEN ok THEN round(b2 - b1, 6) END AS slope_change,
             |       CASE WHEN ok THEN round((a2 + b2*t0) - (a1 + b1*t0), 4)
             |       END AS level_change
             |FROM c""".stripMargin)),

    // Engle-Granger cointegration check clicks ↔ purchases: OLS the
    // two daily series against each other, then a lag-0 Dickey-Fuller
    // regression of Δe on e_{t-1} over the residuals — a deeply
    // negative t says the series share a common trend (forecast one
    // from the other), near-zero says the relation is spurious. The
    // residual pass reuses the PINNED (rounded-6) OLS coefficients;
    // lag alignment is the Granger day=day+1 equi-join (no window).
    "ts_cointegration" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"),
               sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"))
          .localCheckpoint(eager = false) // OLS + residual + alignment
        val cf = daily.agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("dx") > 0)
          .select(col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / col("dx"), 6)
              .as("beta"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6).as("alpha"))
        val e = daily.crossJoin(broadcast(cf))
          .select(col("day"), col("n"),
            (col("y") - col("alpha") - col("beta") * col("x")).as("e"),
            col("beta"))
          .localCheckpoint(eager = false) // both sides of the lag join
        val prev = e.select(col("day").as("dp"), col("e").as("el"))
        val adf = e.join(prev, col("dp") === col("day") - 1)
          .agg(max("n").as("n"), max("beta").as("beta"),
               count(lit(1)).cast("double").as("m"),
               sum(col("el") * (col("e") - col("el"))).as("sed"),
               sum(col("el") * col("el")).as("see"),
               sum(col("e") * col("e")).as("s2"),
               sum(col("e") * col("el")).as("sel"))
        adf.withColumn("rho", when(col("see") > 0, col("sed") / col("see")))
          .withColumn("rss",
            col("s2") - lit(2.0) * (lit(1.0) + col("rho")) * col("sel")
              + pow(lit(1.0) + col("rho"), 2) * col("see"))
          .withColumn("se2",
            when(col("m") > 1 && col("see") > 0,
              col("rss") / (col("m") - 1) / col("see")))
          .select(col("n").cast("long").as("n_days"), col("beta"),
            round(col("rho"), 6).as("rho"),
            when(col("se2") > 0, round(col("rho") / sqrt(col("se2")), 4))
              .as("adf_t"),
            when(col("se2") > 0,
              (col("rho") / sqrt(col("se2")) < -2.86).cast("long"))
              .as("cointegrated_05"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |cf AS (SELECT n, round((n*sxy - sx*sy) / dx, 6) AS beta,
             |              round((sy - (n*sxy - sx*sy) / dx * sx) / n, 6) AS alpha
             |       FROM (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
             |                    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
             |                    count(*) * sum(x*x) - sum(x) * sum(x) AS dx
             |             FROM daily)
             |       WHERE dx > 0),
             |e AS (SELECT day, n, beta, y - alpha - beta * x AS e
             |      FROM daily, cf),
             |p AS (SELECT a.n, a.beta, a.e, b.e AS el
             |      FROM e a JOIN e b ON b.day = a.day - 1),
             |ag AS (SELECT max(n) AS n, max(beta) AS beta,
             |              CAST(count(*) AS DOUBLE) AS m,
             |              sum(el * (e - el)) AS sed, sum(el * el) AS see,
             |              sum(e * e) AS s2, sum(e * el) AS sel
             |       FROM p),
             |rr AS (SELECT *, CASE WHEN see > 0 THEN sed / see END AS rho FROM ag),
             |rs AS (SELECT *,
             |         s2 - 2.0 * (1.0 + rho) * sel + (1.0 + rho) * (1.0 + rho) * see AS rss
             |       FROM rr),
             |sz AS (SELECT *, CASE WHEN m > 1 AND see > 0
             |              THEN rss / (m - 1) / see END AS se2
             |       FROM rs)
             |SELECT CAST(n AS BIGINT) AS n_days, beta, round(rho, 6) AS rho,
             |       CASE WHEN se2 > 0 THEN round(rho / sqrt(se2), 4) END AS adf_t,
             |       CASE WHEN se2 > 0 THEN
             |         CAST(CASE WHEN rho / sqrt(se2) < -2.86 THEN 1 ELSE 0 END AS BIGINT)
             |       END AS cointegrated_05
             |FROM sz""".stripMargin)),

    // one-sample Lilliefors/KS normality check of daily event totals:
    // sup-distance between the daily-count ECDF and the normal CDF at
    // the FITTED (μ̂, σ̂) — both ECDF steps checked, Φ through the
    // shared A&S erf polynomial, all on the DISTINCT-value histogram
    // (values, never rows). The "is a z-test even admissible" gate in
    // front of the parametric monitors.
    "stat_lilliefors" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // moments + the value grid
        val m = daily.agg(count(lit(1)).cast("double").as("n"),
            round(avg("y"), 6).as("mu"),
            round(sqrt(var_pop("y")), 6).as("sg"))
        val g = daily.groupBy("y").agg(count(lit(1)).cast("double").as("c"))
        val wv = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
        val steps = g.withColumn("below", coalesce(sum("c").over(wv), lit(0.0)))
          .crossJoin(broadcast(m))
          .filter(col("sg") > 0 && col("n") > 1)
          .withColumn("z", (col("y") - col("mu")) / col("sg"))
          .withColumn("xx", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .withColumn("erf2",
            lit(1.0) - col("t1") * (lit(0.254829592) + col("t1")
              * (lit(-0.284496736) + col("t1") * (lit(1.421413741)
              + col("t1") * (lit(-1.453152027)
              + col("t1") * lit(1.061405429))))) * exp(-col("xx") * col("xx")))
          .withColumn("phi",
            when(col("z") >= 0, (lit(1.0) + col("erf2")) / 2)
              .otherwise((lit(1.0) - col("erf2")) / 2))
          .withColumn("dv", greatest(
            abs((col("below") + col("c")) / col("n") - col("phi")),
            abs(col("below") / col("n") - col("phi"))))
        steps.agg(max(col("n")).cast("long").as("n_days"),
            max("mu").as("mu"), max("sg").as("sigma"),
            round(max("dv"), 4).as("d_stat"))
          .withColumn("d_crit_05",
            round(lit(0.895) / sqrt(col("n_days").cast("double")), 4))
          .withColumn("reject_normal",
            (col("d_stat") > col("d_crit_05")).cast("long"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n, round(avg(y), 6) AS mu,
             |             round(sqrt(var_pop(y)), 6) AS sg
             |      FROM daily),
             |g AS (SELECT y, CAST(count(*) AS DOUBLE) AS c FROM daily GROUP BY y),
             |st AS (SELECT y, c,
             |         coalesce(sum(c) OVER (ORDER BY y
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             |         n, mu, sg
             |       FROM g, m WHERE sg > 0 AND n > 1),
             |zz AS (SELECT *, (y - mu) / sg AS z,
             |              abs((y - mu) / sg) / sqrt(2.0) AS xx
             |       FROM st),
             |tt AS (SELECT *, 1.0 / (1.0 + 0.3275911 * xx) AS t1 FROM zz),
             |ph AS (SELECT *,
             |         CASE WHEN z >= 0 THEN (1.0 + ef) / 2
             |              ELSE (1.0 - ef) / 2 END AS phi
             |       FROM (SELECT *,
             |               1.0 - t1 * (0.254829592 + t1 * (-0.284496736
             |                 + t1 * (1.421413741 + t1 * (-1.453152027
             |                 + t1 * 1.061405429)))) * exp(-xx*xx) AS ef
             |             FROM tt)),
             |dv AS (SELECT *, greatest(abs((below + c) / n - phi),
             |                          abs(below / n - phi)) AS dv
             |       FROM ph)
             |SELECT CAST(max(n) AS BIGINT) AS n_days, max(mu) AS mu,
             |       max(sg) AS sigma, round(max(dv), 4) AS d_stat,
             |       round(0.895 / sqrt(max(n)), 4) AS d_crit_05,
             |       CAST(CASE WHEN round(max(dv), 4) > round(0.895 / sqrt(max(n)), 4)
             |            THEN 1 ELSE 0 END AS BIGINT) AS reject_normal
             |FROM dv""".stripMargin)),

    // Hosmer-Lemeshow calibration test of the quality score read AS a
    // duplicate-probability predictor (samp_reliability_bins' exact
    // pairing): observed vs expected dup counts over the same 10
    // fixed-width score bins, HL χ² with the closed-form χ²₈ survival
    // (even df ⇒ finite Poisson sum — no incomplete gamma needed).
    // The formal p-value on top of the reliability table.
    "stat_hosmer_lemeshow" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val q = graft.text.TextAnalytics.qualityScores(docs)
          .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
        val dupc = docs.groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("nh"))
        val bins = q.join(dupc, "h")
          .withColumn("bin", least(floor(col("quality") * 10), lit(9L)))
          .groupBy("bin")
          .agg(count(lit(1)).cast("double").as("nb"),
               sum(when(col("nh") > 1, 1.0).otherwise(0.0)).as("obs"),
               sum("quality").as("exps"))
          .filter(col("exps") > 0 && col("exps") < col("nb"))
        val hl = bins.agg(count(lit(1)).as("n_bins"),
          round(sum(pow(col("obs") - col("exps"), 2)
            / (col("exps") * (lit(1.0) - col("exps") / col("nb")))), 4)
            .as("hl_chi2"))
        // HL df = n_bins - 2, NOT a hardcoded 8: the exps>0 filter can
        // drop bins. Even-df chi-square survival exp(-h)·Σ_{k<m} h^k/k!
        // with m = df/2 terms, CASE-gated so both engines unroll the
        // same truncated sum (df floored to even, clamped ≥ 2).
        val h = col("hl_chi2") / 2
        val m = greatest(floor((col("n_bins") - lit(2)) / lit(2.0)), lit(1.0))
        hl.select(col("n_bins"),
          (m * 2).cast("long").as("df"), col("hl_chi2"),
          round(exp(-h) * (lit(1.0)
            + when(m > 1, h).otherwise(lit(0.0))
            + when(m > 2, h * h / 2).otherwise(lit(0.0))
            + when(m > 3, h * h * h / 6).otherwise(lit(0.0))), 6)
            .as("p_value"))
      },
      Some {
        val stopList = graft.text.TextAnalytics.Stopwords
          .map(w => s"'$w'").mkString(",")
        s"""WITH q AS (
           |  SELECT doc_id, md5(text) AS h,
           |         round((least(n_tok, 100) / 100.0) *
           |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
           |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
           |  FROM (
           |    SELECT doc_id, text, length(text) AS n_chars,
           |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
           |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
           |               t -> t IN ($stopList))) AS stop_cnt,
           |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
           |    FROM documents)),
           |dupc AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS nh
           |         FROM documents GROUP BY md5(text)),
           |bins AS (SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS bin,
           |                CAST(count(*) AS DOUBLE) AS nb,
           |                sum(CASE WHEN nh > 1 THEN 1.0 ELSE 0.0 END) AS obs,
           |                sum(quality) AS exps
           |         FROM q JOIN dupc USING (h)
           |         GROUP BY 1),
           |fb AS (SELECT * FROM bins WHERE exps > 0 AND exps < nb),
           |hl AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
           |              round(sum((obs - exps)*(obs - exps)
           |                    / (exps * (1.0 - exps / nb))), 4) AS hl_chi2
           |       FROM fb),
           |mm AS (SELECT *, greatest(floor((n_bins - 2) / 2.0), 1.0) AS m,
           |              hl_chi2 / 2 AS h
           |       FROM hl)
           |SELECT n_bins, CAST(m * 2 AS BIGINT) AS df, hl_chi2,
           |       round(exp(-h) * (1.0
           |             + CASE WHEN m > 1 THEN h ELSE 0.0 END
           |             + CASE WHEN m > 2 THEN h*h/2 ELSE 0.0 END
           |             + CASE WHEN m > 3 THEN h*h*h/6 ELSE 0.0 END), 6) AS p_value
           |FROM mm""".stripMargin
      }),

    // ε=1 report-noisy-max release of the most common event type:
    // per-type Laplace(2/ε) noise by deterministic inverse-CDF draws
    // (md5 of the type name), the released argmax next to the true
    // one — the selection-mechanism sibling of priv_dp_counts (which
    // noises the WHOLE histogram; noisy-max pays less privacy budget
    // to release just the winner). |types| rows of arithmetic after
    // one grouped pass.
    "priv_noisy_max" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.events(s, d).filter(col("event_type").isNotNull)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("u",
            (pmod(md5Long(concat(lit("nm:"), col("event_type"))), lit(1000000))
              .cast("double") + 0.5) / 1000000.0 - 0.5)
          .withColumn("noise",
            round(lit(-2.0) * signum(col("u"))
              * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
          .withColumn("noisy_n", round(col("n") + col("noise"), 6))
        val w = Window.orderBy(col("noisy_n").desc, col("event_type"))
        val wt = Window.orderBy(col("n").desc, col("event_type"))
        g.withColumn("released_rank", row_number().over(w))
          .withColumn("true_rank", row_number().over(wt))
          .select(col("event_type"), col("n"), col("noisy_n"),
            (col("released_rank") === 1).cast("long").as("is_released_max"),
            (col("true_rank") === 1).cast("long").as("is_true_max"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
             |u AS (SELECT *,
             |        ((('0x' || substr(md5('nm:' || event_type), 1, 15))::BIGINT
             |          % 1000000) + 0.5) / 1000000.0 - 0.5 AS u
             |      FROM g),
             |nz AS (SELECT *,
             |         round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS noise
             |       FROM u),
             |nn AS (SELECT *, round(n + noise, 6) AS noisy_n FROM nz),
             |rk AS (SELECT *,
             |         row_number() OVER (ORDER BY noisy_n DESC, event_type) AS rr,
             |         row_number() OVER (ORDER BY n DESC, event_type) AS tr
             |       FROM nn)
             |SELECT event_type, n, noisy_n,
             |       CAST(CASE WHEN rr = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_released_max,
             |       CAST(CASE WHEN tr = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_true_max
             |FROM rk ORDER BY event_type""".stripMargin)))

  private val round10kQ: Seq[(String, Q)] = Seq(
    // Wang-Isola alignment & uniformity (ICML 2020) — THE two-number
    // contrastive-embedding report: alignment = mean squared distance
    // of same-label pairs (want small), uniformity = ln mean
    // exp(−2‖x̂−ŷ‖²) over all pairs (want very negative = spread
    // out). Computed exactly on the bounded oracle subset via the
    // shared 6dp cosine (‖x̂−ŷ‖² = 2−2cos); the at-scale path is the
    // same formula over LSH-bucket-sampled pairs (documented
    // deliberate altitude, like dedup_embed_cosine).
    "emb_align_uniform" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val f = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull && col("vec_id") < 200)
          .select(col("vec_id"), col("label"), col("embedding"))
        val pairs = f.select(col("vec_id").as("va"), col("label").as("la"),
            col("embedding").as("ea"))
          .join(f.select(col("vec_id").as("vb"), col("label").as("lb"),
            col("embedding").as("eb")), col("va") < col("vb"))
          .withColumn("d2", lit(2.0) - lit(2.0) * score(col("ea"), col("eb")))
        pairs.agg(count(lit(1)).as("n_pairs"),
            sum(when(col("la") === col("lb"), 1L).otherwise(0L))
              .as("n_align_pairs"),
            avg(when(col("la") === col("lb"), col("d2"))).as("al"),
            avg(exp(lit(-2.0) * col("d2"))).as("un"))
          .select(col("n_pairs"), col("n_align_pairs"),
            round(col("al"), 4).as("alignment"),
            round(log(col("un")), 4).as("uniformity"))
      },
      Some("""WITH f AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
             |           FROM embeddings
             |           WHERE embedding IS NOT NULL AND vec_id < 200),
             |p AS (SELECT a.label AS la, b.label AS lb,
             |             2.0 - 2.0 * (round(list_cosine_similarity(a.emb, b.emb), 6) + 0.0) AS d2
             |      FROM f a JOIN f b ON a.vec_id < b.vec_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_align_pairs,
             |       round(avg(CASE WHEN la = lb THEN d2 END), 4) AS alignment,
             |       round(ln(avg(exp(-2.0 * d2))), 4) AS uniformity
             |FROM p""".stripMargin)),

    // data-contract audit of the events table — the rules a feed
    // owner would declare, checked in ONE conditional map-side
    // aggregate: null keys, unknown enum values, out-of-range
    // measures, NaN poisoning, malformed JSON payloads, timestamps
    // outside the believable window. The wide one-row report is what
    // a pipeline gate consumes; any nonzero cell is an alert.
    "pipe_contract_events" -> Q(
      (s, d) => {
        val known = Seq("click", "view", "purchase", "signup", "error")
        Tables.events(s, d).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("event_type").isNull, 1L).otherwise(0L))
            .as("n_null_type"),
          sum(when(col("event_type").isNotNull &&
            !col("event_type").isin(known: _*), 1L).otherwise(0L))
            .as("n_unknown_type"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L))
            .as("n_null_user"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
          sum(when(isnan(col("value")), 1L).otherwise(0L)).as("n_nan_value"),
          sum(when(col("value") < 0 || col("value") > 1000, 1L).otherwise(0L))
            .as("n_value_range"),
          sum(when(col("props").isNotNull && !col("props").like("{%"), 1L)
            .otherwise(0L)).as("n_bad_props"),
          sum(when(col("ts") < lit(1577836800000000000L) ||
            col("ts") > lit(1893456000000000000L), 1L).otherwise(0L))
            .as("n_ts_range"))
          .withColumn("n_violations",
            col("n_null_type") + col("n_unknown_type") + col("n_null_user") +
            col("n_null_value") + col("n_nan_value") + col("n_value_range") +
            col("n_bad_props") + col("n_ts_range"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_type,
             |  CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
             |    ('click', 'view', 'purchase', 'signup', 'error')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown_type,
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user,
             |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
             |  CAST(sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_value,
             |  CAST(sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_value_range,
             |  CAST(sum(CASE WHEN props IS NOT NULL AND props NOT LIKE '{%'
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_props,
             |  CAST(sum(CASE WHEN ts < 1577836800000000000 OR ts > 1893456000000000000
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ts_range,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
             |        ('click', 'view', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN props IS NOT NULL AND props NOT LIKE '{%' THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN ts < 1577836800000000000 OR ts > 1893456000000000000
             |        THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
             |FROM events""".stripMargin)),

    // Dunn's post-hoc test: WHICH language pairs differ after
    // stat_kruskal rejects — pairwise z on tie-corrected mean
    // midranks (the same VALUE-level rank machinery, never a row
    // rank), Bonferroni-adjusted over the k(k-1)/2 comparisons. The
    // pair frame is |langs|², bounded by the language domain.
    "stat_dunn_test" -> Q(
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("lang"), col("n_chars").cast("long").as("x"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // value ranks + group sums
        val wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
        val ranks = cells.groupBy("x").agg(sum("cnt").as("t"))
          .withColumn("f", coalesce(sum("t").over(wx), lit(0L)))
          .select(col("x"), col("t"), (col("f") * 2 + col("t") + 1).as("rank2"))
          .localCheckpoint(eager = false) // rank join + tie term
        val grp = cells.join(broadcast(ranks), "x")
          .groupBy("lang").agg(sum("cnt").as("n_g"),
            (sum(col("cnt") * col("rank2")) / 2.0 / sum("cnt")).as("mr"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val tot = cells.agg(sum("cnt").cast("double").as("nn"))
          .crossJoin(broadcast(ranks.agg(
            sum(col("t").cast("double") * col("t") * col("t") - col("t"))
              .as("tie"))))
        val k = grp.agg(count(lit(1)).cast("double").as("k"))
        val pairs = grp.select(col("lang").as("la"), col("n_g").as("na"),
            col("mr").as("ma"))
          .join(grp.select(col("lang").as("lb"), col("n_g").as("nb"),
            col("mr").as("mb")), col("la") < col("lb"))
          .crossJoin(broadcast(tot)).crossJoin(broadcast(k))
        val s2 = (col("nn") * (col("nn") + 1)
          - col("tie") / (col("nn") - 1)) / 12.0 *
          (lit(1.0) / col("na") + lit(1.0) / col("nb"))
        val zc = pairs.withColumn("z",
          when(s2 > 0, round((col("ma") - col("mb")) / sqrt(s2), 4)))
        val xx = abs(col("z")) / sqrt(lit(2.0))
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        zc.withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                + t1 * lit(1.061405429)))))
              * exp(-xx * xx), 6)))
          .withColumn("m", col("k") * (col("k") - 1) / 2)
          .select(col("la"), col("lb"),
            col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
            col("z"), col("p"),
            when(col("p").isNotNull,
              round(least(col("p") * col("m"), lit(1.0)), 6)).as("p_bonf"),
            when(col("p").isNotNull,
              (round(least(col("p") * col("m"), lit(1.0)), 6) < 0.05)
                .cast("long")).as("reject_05"))
          .orderBy("la", "lb")
      },
      Some("""WITH cells AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
             |                      count(*) AS cnt
             |               FROM documents GROUP BY lang, x),
             |hx AS (SELECT x, sum(cnt) AS t FROM cells GROUP BY x),
             |rk AS (SELECT x, t,
             |         coalesce(sum(t) OVER (ORDER BY x ROWS BETWEEN
             |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
             |           + t + 1 AS rank2
             |       FROM hx),
             |g AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_g,
             |             sum(cnt * rank2) / 2.0 / sum(cnt) AS mr
             |      FROM cells JOIN rk USING (x) GROUP BY lang),
             |tt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nn FROM cells),
             |te AS (SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie FROM rk),
             |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM g),
             |pr AS (SELECT a.lang AS la, b.lang AS lb, a.n_g AS na, b.n_g AS nb,
             |              a.mr AS ma, b.mr AS mb, nn, tie, k
             |       FROM g a JOIN g b ON a.lang < b.lang, tt, te, kk),
             |zz AS (SELECT *,
             |         (nn * (nn + 1) - tie / (nn - 1)) / 12.0
             |           * (1.0 / na + 1.0 / nb) AS s2
             |       FROM pr),
             |zc AS (SELECT *, CASE WHEN s2 > 0
             |              THEN round((ma - mb) / sqrt(s2), 4) END AS z
             |       FROM zz),
             |pv AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |              1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t1
             |       FROM zc),
             |pp AS (SELECT *,
             |         CASE WHEN z IS NULL THEN NULL ELSE round(
             |           t1 * (0.254829592 + t1 * (-0.284496736
             |             + t1 * (1.421413741 + t1 * (-1.453152027
             |             + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p
             |       FROM pv)
             |SELECT la, lb, na AS n_a, nb AS n_b, z, p,
             |       CASE WHEN p IS NOT NULL
             |            THEN round(least(p * (k * (k - 1) / 2), 1.0), 6)
             |       END AS p_bonf,
             |       CASE WHEN p IS NOT NULL THEN CAST(CASE WHEN
             |         round(least(p * (k * (k - 1) / 2), 1.0), 6) < 0.05
             |         THEN 1 ELSE 0 END AS BIGINT)
             |       END AS reject_05
             |FROM pp ORDER BY la, lb""".stripMargin)))

  private val round10lQ: Seq[(String, Q)] = Seq(
    // exact sign test on paired pre/post per-user mean values
    // (ev_cuped's calendar halves): distribution-free "did users
    // move" with an EXACT two-sided binomial p — ties dropped, the
    // tail sum bounded by min(n+, n-) runs through the shared
    // Stirling lgamma (ln C(n,k) - n ln 2). The assumption-free
    // companion to stat_mcnemar's χ² on a continuous outcome.
    "stat_sign_test" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("day", expr("ts div 86400000000000"))
          .localCheckpoint(eager = false) // bounds + the per-user halves
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val diffs = ud.crossJoin(broadcast(bounds))
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(avg(when(col("post") === 0, col("value"))).as("pre"),
               avg(when(col("post") === 1, col("value"))).as("post_v"))
          .filter(col("pre").isNotNull && col("post_v").isNotNull &&
            col("pre") =!= col("post_v"))
        val cts = diffs.agg(
          sum(when(col("post_v") > col("pre"), 1L).otherwise(0L)).as("n_up"),
          sum(when(col("post_v") < col("pre"), 1L).otherwise(0L)).as("n_down"))
          .withColumn("n", col("n_up") + col("n_down"))
          .withColumn("kmin", least(col("n_up"), col("n_down")))
        val terms = cts
          .withColumn("k", explode(sequence(lit(0L), col("kmin"))))
          .withColumn("lp",
            lfCol(col("n").cast("double")) - lfCol(col("k").cast("double")) -
            lfCol((col("n") - col("k")).cast("double")) -
            col("n") * lit(math.log(2.0)))
        terms.groupBy("n_up", "n_down", "n")
          .agg(sum(exp(col("lp"))).as("tail"))
          .select(col("n_up"), col("n_down"),
            when(col("n") > 0,
              round(least(lit(2.0) * col("tail"), lit(1.0)), 6)).as("p_exact"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, value, ts // 86400000000000 AS day
              |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
              |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
              |ud AS (SELECT user_id,
              |         avg(CASE WHEN day < (mn + mx + 1) // 2 THEN value END) AS pre,
              |         avg(CASE WHEN day >= (mn + mx + 1) // 2 THEN value END) AS post_v
              |       FROM ev, b GROUP BY user_id),
              |df AS (SELECT * FROM ud
              |       WHERE pre IS NOT NULL AND post_v IS NOT NULL AND pre <> post_v),
              |ct AS (SELECT
              |         CAST(sum(CASE WHEN post_v > pre THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
              |         CAST(sum(CASE WHEN post_v < pre THEN 1 ELSE 0 END) AS BIGINT) AS n_down
              |       FROM df),
              |nn AS (SELECT *, n_up + n_down AS n, least(n_up, n_down) AS kmin
              |       FROM ct),
              |tm AS (SELECT *,
              |         ${sqlLf("n")} - ${sqlLf("k")} - ${sqlLf("n - k")}
              |           - n * ln(2.0) AS lp
              |       FROM (SELECT *, CAST(unnest(generate_series(0, kmin)) AS BIGINT) AS k
              |             FROM nn))
              |SELECT n_up, n_down,
              |       CASE WHEN n > 0
              |            THEN round(least(2.0 * sum(exp(lp)), 1.0), 6)
              |       END AS p_exact
              |FROM tm GROUP BY n_up, n_down, n""".stripMargin)),

    // DAU/MAU stickiness per 30-day window: the "how often do monthly
    // users show up daily" engagement ratio — avg daily actives over
    // the window's distinct actives. Two DISTINCT rollups (day grain
    // and window grain) off one pass each; windows are fixed
    // calendar buckets, never sliding fan-outs.
    "ev_stickiness" -> Q(
      (s, d) => {
        val dd = Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"), col("user_id"))
          .distinct()
          .localCheckpoint(eager = false) // day grain + window grain
        val dau = dd.groupBy("day").agg(count(lit(1)).as("dau"))
          .withColumn("w", expr("day div 30"))
          .groupBy("w").agg(count(lit(1)).as("n_days"),
            round(avg("dau"), 2).as("avg_dau"))
        val mau = dd.withColumn("w", expr("day div 30"))
          .groupBy("w").agg(countDistinct("user_id").as("mau"))
        dau.join(mau, "w")
          .select(col("w").as("window30"), col("n_days"), col("avg_dau"),
            col("mau"),
            round(col("avg_dau") / col("mau").cast("double"), 4)
              .as("stickiness"))
          .orderBy("window30")
      },
      Some("""WITH dd AS (SELECT DISTINCT ts // 86400000000000 AS day, user_id
             |            FROM events),
             |dau AS (SELECT day // 30 AS w, CAST(count(*) AS BIGINT) AS n_days,
             |               round(avg(dau), 2) AS avg_dau
             |        FROM (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |              FROM dd GROUP BY day)
             |        GROUP BY 1),
             |mau AS (SELECT day // 30 AS w,
             |               CAST(count(DISTINCT user_id) AS BIGINT) AS mau
             |        FROM dd GROUP BY 1)
             |SELECT w AS window30, n_days, avg_dau, mau,
             |       round(avg_dau / CAST(mau AS DOUBLE), 4) AS stickiness
             |FROM dau JOIN mau USING (w) ORDER BY window30""".stripMargin)),

    // post-stratified estimation: a 10% hash sample's mean tokens/doc
    // re-weighted so language strata match the corpus margins (the
    // one-step raking every survey-grade metric pipeline applies
    // before quoting sampled numbers) — reported NEXT to the naive
    // sample mean and the true value, so the variance reduction is
    // auditable. Margins are a |langs|-row broadcast; the sample scan
    // is the only doc-scale pass.
    "samp_poststratify" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("double")
            .as("n_tok"))
          .localCheckpoint(eager = false) // margins + truth + the sample
        val marg = t.groupBy("lang").agg(count(lit(1)).cast("double").as("nl"))
        val truth = t.agg(count(lit(1)).as("nn"),
          round(avg("n_tok"), 4).as("truth"))
        val samp = t.filter(
          pmod(md5Long(concat(lit("ps:"), col("doc_id").cast("string"))),
            lit(10)) === 0)
        val perLang = samp.groupBy("lang")
          .agg(count(lit(1)).cast("double").as("ml"),
               avg("n_tok").as("mean_l"))
        val est = perLang.join(broadcast(marg), "lang")
          .crossJoin(broadcast(truth))
          .agg(sum("ml").cast("long").as("n_sample"),
               round(sum(col("ml") * col("mean_l")) / sum("ml"), 4)
                 .as("est_unweighted"),
               round(sum(col("nl") * col("mean_l")) / sum("nl"), 4)
                 .as("est_poststrat"),
               max("truth").as("truth"))
        est.select(col("n_sample"), col("est_unweighted"),
          col("est_poststrat"), col("truth"),
          round(abs(col("est_unweighted") - col("truth")), 4).as("err_unw"),
          round(abs(col("est_poststrat") - col("truth")), 4).as("err_ps"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS n_tok
             |  FROM documents),
             |marg AS (SELECT lang, CAST(count(*) AS DOUBLE) AS nl FROM t GROUP BY lang),
             |tr AS (SELECT round(avg(n_tok), 4) AS truth FROM t),
             |s AS (SELECT * FROM t
             |      WHERE ('0x' || substr(md5('ps:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |            % 10 = 0),
             |pl AS (SELECT lang, CAST(count(*) AS DOUBLE) AS ml,
             |              avg(n_tok) AS mean_l
             |       FROM s GROUP BY lang),
             |e AS (SELECT CAST(sum(ml) AS BIGINT) AS n_sample,
             |             round(sum(ml * mean_l) / sum(ml), 4) AS est_unweighted,
             |             round(sum(nl * mean_l) / sum(nl), 4) AS est_poststrat,
             |             max(truth) AS truth
             |      FROM pl JOIN marg USING (lang), tr)
             |SELECT n_sample, est_unweighted, est_poststrat, truth,
             |       round(abs(est_unweighted - truth), 4) AS err_unw,
             |       round(abs(est_poststrat - truth), 4) AS err_ps
             |FROM e""".stripMargin)))

  private val round10mQ: Seq[(String, Q)] = Seq(
    // purchase-segment migration matrix between calendar halves: each
    // user classified none/one/repeat in BOTH halves from ONE
    // conditional per-user rollup, then the 3×3 transition counts —
    // the "are repeat buyers persisting or churning" table next to
    // ev_growth_accounting's new/retained/churned flow. Fixed
    // thresholds, no quantile machinery, exact integer counts.
    "ev_segment_migration" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
          .localCheckpoint(eager = false) // bounds + the per-user halves
        val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
        val u = ev.crossJoin(broadcast(bounds))
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(sum(when(col("post") === 0 && col("event_type") === "purchase",
                 1L).otherwise(0L)).as("pre_n"),
               sum(when(col("post") === 1 && col("event_type") === "purchase",
                 1L).otherwise(0L)).as("post_n"))
        def seg(c: Column) = when(c === 0, "none")
          .when(c === 1, "one").otherwise("repeat")
        val m = u.select(seg(col("pre_n")).as("seg_pre"),
          seg(col("post_n")).as("seg_post"))
        val tot = m.agg(count(lit(1)).cast("double").as("nn"))
        m.groupBy("seg_pre", "seg_post")
          .agg(count(lit(1)).as("n_users"))
          .crossJoin(broadcast(tot))
          .select(col("seg_pre"), col("seg_post"), col("n_users"),
            round(col("n_users") / col("nn"), 4).as("share"))
          .orderBy("seg_pre", "seg_post")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |                   ts // 86400000000000 AS day FROM events),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |u AS (SELECT user_id,
             |        sum(CASE WHEN day < (mn + mx + 1) // 2
             |                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS pre_n,
             |        sum(CASE WHEN day >= (mn + mx + 1) // 2
             |                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS post_n
             |      FROM ev, b GROUP BY user_id),
             |m AS (SELECT CASE WHEN pre_n = 0 THEN 'none'
             |                  WHEN pre_n = 1 THEN 'one' ELSE 'repeat' END AS seg_pre,
             |             CASE WHEN post_n = 0 THEN 'none'
             |                  WHEN post_n = 1 THEN 'one' ELSE 'repeat' END AS seg_post
             |      FROM u),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM m)
             |SELECT seg_pre, seg_post, CAST(count(*) AS BIGINT) AS n_users,
             |       round(count(*) / nn, 4) AS share
             |FROM m, t GROUP BY seg_pre, seg_post, nn
             |ORDER BY seg_pre, seg_post""".stripMargin)),

    // seasonal-naive (y_{t-7}) forecast backtest per type — the
    // weekly-pattern baseline ts_backtest's trailing mean and
    // ts_theil_u's naive-1 both need to beat before any model ships.
    // Scored only where BOTH lag-7 and lag-1 exist so the skill ratio
    // compares on identical days; ONE rollup, two per-type lag
    // windows over O(days) rows.
    "ts_backtest_snaive" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val sc = daily
          .withColumn("f7", lag("y", 7).over(w))
          .withColumn("f1", lag("y", 1).over(w))
          .filter(col("f7").isNotNull && col("f1").isNotNull)
        sc.groupBy("event_type")
          .agg(count(lit(1)).as("n_scored"),
               sum(pow(col("f7") - col("y"), 2)).as("s7"),
               sum(pow(col("f1") - col("y"), 2)).as("s1"),
               sum(abs(col("f7") - col("y")) / col("y")).as("ape"))
          .select(col("event_type"), col("n_scored"),
            round(sqrt(col("s7") / col("n_scored")), 4).as("rmse_snaive"),
            round(col("ape") / col("n_scored") * 100, 4).as("mape_snaive"),
            round(sqrt(col("s1") / col("n_scored")), 4).as("rmse_naive1"),
            when(col("s1") > 0,
              round(lit(1.0) - sqrt(col("s7") / col("s1")), 4))
              .as("skill_vs_naive1"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |sc AS (SELECT event_type, y,
             |         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS f7,
             |         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1
             |       FROM daily)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
             |       round(sqrt(sum((f7 - y)*(f7 - y)) / count(*)), 4) AS rmse_snaive,
             |       round(sum(abs(f7 - y) / y) / count(*) * 100, 4) AS mape_snaive,
             |       round(sqrt(sum((f1 - y)*(f1 - y)) / count(*)), 4) AS rmse_naive1,
             |       CASE WHEN sum((f1 - y)*(f1 - y)) > 0
             |            THEN round(1.0 - sqrt(sum((f7 - y)*(f7 - y))
             |                       / sum((f1 - y)*(f1 - y))), 4)
             |       END AS skill_vs_naive1
             |FROM sc WHERE f7 IS NOT NULL AND f1 IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // dedup impact report per source: docs/tokens before vs after
    // canonical (min-id) dedup on the SHARED cluster-label table —
    // "what did dedup cost each source" is the number a data-mix
    // owner signs off on. Labels are computed once (the
    // dedup_clusters materialization); this query is two grouped
    // passes over the bounded labeled subset.
    "text_dedup_impact" -> Q(
      (s, d) => {
        val docs200 = docsUnder(s, d, 200)
        val lbl = graft.dedup.Dedup.clusterLabelsShared(docs200, d, 5, 8, 2)
        val t = docs200.select(col("doc_id"), col("source"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("n_tok"))
        t.join(lbl, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               countDistinct("cluster").as("n_kept"),
               sum("n_tok").as("tokens_total"),
               sum(when(col("doc_id") === col("cluster"), col("n_tok"))
                 .otherwise(0L)).as("tokens_kept"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            (col("n_docs") - col("n_kept")).as("n_removed"),
            col("tokens_total"), col("tokens_kept"),
            round((col("tokens_total") - col("tokens_kept"))
              / col("tokens_total").cast("double"), 4)
              .as("token_removed_share"))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE sig AS (
              |${graft.dedup.Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
              |bands AS (${(0 until 4).map(b =>
                 s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                 .mkString(" UNION ALL ")}),
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
              |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
              |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
              |reach(src, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
              |  UNION
              |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
              |cl AS (SELECT src AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
              |       FROM reach GROUP BY src),
              |t AS (SELECT doc_id, source,
              |        CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
              |      FROM documents WHERE doc_id < 200)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(count(DISTINCT cluster) AS BIGINT) AS n_kept,
              |       CAST(count(*) - count(DISTINCT cluster) AS BIGINT) AS n_removed,
              |       CAST(sum(n_tok) AS BIGINT) AS tokens_total,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN n_tok ELSE 0 END) AS BIGINT)
              |         AS tokens_kept,
              |       round((sum(n_tok) - sum(CASE WHEN doc_id = cluster THEN n_tok ELSE 0 END))
              |             / CAST(sum(n_tok) AS DOUBLE), 4) AS token_removed_share
              |FROM t JOIN cl USING (doc_id)
              |GROUP BY source ORDER BY source""".stripMargin)),

    // multimodal data card: per modality (the engine's doc_id mod 3
    // convention — text/audio/video), asset counts and total content
    // units from the SAME deterministic stub metadata every mm_*
    // operator derives (frames for video, samples+seconds for audio,
    // chars for text) — ONE conditional map-side pass.
    "mm_modality_card" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d)
          .withColumn("hm", md5Long(col("text")))
          .withColumn("modality",
            when(col("doc_id") % 3 === 0, "text")
              .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
          .withColumn("units",
            when(col("doc_id") % 3 === 0, length(col("text")).cast("long"))
              .when(col("doc_id") % 3 === 1, col("hm") % 2000000 + 1)
              .otherwise(col("hm") % 240 + 1))
          .withColumn("sr", when(col("doc_id") % 3 === 1,
            element_at(array(lit(8000L), lit(16000L), lit(44100L)),
              (col("hm") % 3 + 1).cast("int"))))
        t.groupBy("modality")
          .agg(count(lit(1)).as("n_assets"),
               sum("units").as("total_units"),
               round(avg(col("units").cast("double")), 2).as("avg_units"),
               round(sum(when(col("sr").isNotNull,
                 col("units") / col("sr").cast("double")).otherwise(0.0)), 2)
                 .as("total_audio_sec"))
          .orderBy("modality")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm,
             |         CASE WHEN doc_id % 3 = 0 THEN 'text'
             |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             |         CASE WHEN doc_id % 3 = 0 THEN CAST(length(text) AS BIGINT)
             |              WHEN doc_id % 3 = 1
             |                THEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 2000000 + 1
             |              ELSE ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1
             |         END AS units,
             |         CASE WHEN doc_id % 3 = 1 THEN
             |           ([8000, 16000, 44100])[CAST(('0x' || substr(md5(text), 1, 15))::BIGINT
             |             % 3 AS INTEGER) + 1]
             |         END AS sr
             |  FROM documents)
             |SELECT modality, CAST(count(*) AS BIGINT) AS n_assets,
             |       CAST(sum(units) AS BIGINT) AS total_units,
             |       round(avg(CAST(units AS DOUBLE)), 2) AS avg_units,
             |       round(sum(CASE WHEN sr IS NOT NULL
             |                 THEN units / CAST(sr AS DOUBLE) ELSE 0.0 END), 2)
             |         AS total_audio_sec
             |FROM t GROUP BY modality ORDER BY modality""".stripMargin)))

  private val round10nQ: Seq[(String, Q)] = Seq(
    // Burrows' Delta stylometric distance between sources (the
    // authorship-attribution classic): per-source relative
    // frequencies of the top-50 corpus words, z-scored per word
    // across sources, Δ(a,b) = mean |z_a − z_b| — which sources
    // "write alike" (near-duplicate FEEDS, not documents). Corpus
    // work is two hash aggregates; the vocab is TakeOrdered-bounded
    // at 50 and the pair frame is |sources|²·50.
    "text_burrows_delta" -> Q(
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .localCheckpoint(eager = false) // vocab + per-source counts
        val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cf"))
          .orderBy(col("cf").desc, col("tok")).limit(50)
          .select("tok")
        val stot = tok.groupBy("source").agg(count(lit(1)).as("nt"))
        val f = tok.join(broadcast(vocab), "tok")
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .join(broadcast(stot), "source")
          .select(col("source"), col("tok"),
            round(col("c") * 1000.0 / col("nt"), 6).as("f"))
          .localCheckpoint(eager = false) // stats + both pair sides
        val st = f.groupBy("tok")
          .agg(avg("f").as("mu"), sqrt(var_pop("f")).as("sg"))
          .filter(col("sg") > 0)
        val z = f.join(broadcast(st), "tok")
          .select(col("source"), col("tok"),
            round((col("f") - col("mu")) / col("sg"), 6).as("z"))
          .localCheckpoint(eager = false)
        z.select(col("source").as("sa"), col("tok"), col("z").as("za"))
          .join(z.select(col("source").as("sb"), col("tok"), col("z").as("zb")),
            Seq("tok"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb")
          .agg(count(lit(1)).as("n_terms"),
               round(avg(abs(col("za") - col("zb"))), 4).as("delta"))
          .orderBy(col("delta"), col("sa"), col("sb"))
          .limit(15)
      },
      Some("""WITH tok AS (
             |  SELECT source,
             |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents),
             |vocab AS (SELECT tok FROM (
             |    SELECT tok, count(*) AS cf FROM tok GROUP BY tok
             |    ORDER BY cf DESC, tok LIMIT 50)),
             |stot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt
             |         FROM tok GROUP BY source),
             |f AS MATERIALIZED (
             |  SELECT source, tok, round(c * 1000.0 / nt, 6) AS f
             |  FROM (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             |        FROM tok JOIN vocab USING (tok) GROUP BY 1, 2)
             |  JOIN stot USING (source)),
             |st AS (SELECT tok, avg(f) AS mu, sqrt(var_pop(f)) AS sg
             |       FROM f GROUP BY tok HAVING sqrt(var_pop(f)) > 0),
             |z AS MATERIALIZED (
             |  SELECT source, f.tok, round((f - mu) / sg, 6) AS z
             |  FROM f JOIN st ON st.tok = f.tok)
             |SELECT a.source AS sa, b.source AS sb,
             |       CAST(count(*) AS BIGINT) AS n_terms,
             |       round(avg(abs(a.z - b.z)), 4) AS delta
             |FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY delta, sa, sb LIMIT 15""".stripMargin)),

    // nearest-centroid classification accuracy per label: assign each
    // embedding to its closest label centroid (the Rocchio
    // classifier) and score against the true labels — the LINEAR
    // separability read-out between emb_label_cohesion (how tight)
    // and emb_knn_accuracy (how locally consistent). Centroids are a
    // broadcast |labels|×64 table; per-vector work is an index join +
    // one bounded per-vector rank window over |labels| rows.
    "emb_centroid_classifier" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
        val dims = emb.select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          .select(col("vec_id"), col("label"), col("i").cast("long").as("i"),
                  col("x").cast("double").as("x"))
          .localCheckpoint(eager = false) // centroids + distance pass
        val cent = dims.groupBy(col("label").as("cl"), col("i"))
          .agg(round(avg("x"), 7).as("c"))
        val d2 = dims.join(broadcast(cent), "i")
          .groupBy("vec_id", "label", "cl")
          .agg(round(sum(pow(col("x") - col("c"), 2)), 6).as("d2"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cl"))
        d2.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
               sum(when(col("cl") === col("label"), 1L).otherwise(0L))
                 .as("n_correct"))
          .select(col("label"), col("n"), col("n_correct"),
            round(col("n_correct") / col("n").cast("double"), 4).as("accuracy"))
          .orderBy("label")
      },
      Some("""WITH dims AS MATERIALIZED (
             |  SELECT vec_id, label,
             |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |         CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |cent AS MATERIALIZED (
             |  SELECT label AS cl, i, round(avg(x), 7) AS c
             |  FROM dims GROUP BY 1, 2),
             |d2 AS (SELECT vec_id, label, cl,
             |              round(sum((x - c) * (x - c)), 6) AS d2
             |       FROM dims JOIN cent USING (i) GROUP BY 1, 2, 3),
             |pk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
             |         ORDER BY d2, cl) AS rk
             |       FROM d2)
             |SELECT label, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN cl = label THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_correct,
             |       round(sum(CASE WHEN cl = label THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS accuracy
             |FROM pk WHERE rk = 1 GROUP BY label ORDER BY label""".stripMargin)),

    // binomial overdispersion check of daily conversion: Pearson
    // dispersion φ = Σ(x_d − n_d·p̂)²/(n_d·p̂(1−p̂)) / (D−1) over the
    // per-day (active users, converted users) rollup — φ ≈ 1 means
    // the binomial z-tests upstream are honest, φ >> 1 means
    // clustered conversions and understated error bars. One DISTINCT
    // per-(day,user) pass; everything after is |days| arithmetic.
    "stat_overdispersion" -> Q(
      (s, d) => {
        val du = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"), col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val daily = du.groupBy("day")
          .agg(count(lit(1)).cast("double").as("n"),
               sum("conv").cast("double").as("x"))
          .localCheckpoint(eager = false) // pooled rate + the sum
        val pool = daily.agg((sum("x") / sum("n")).as("p"),
          count(lit(1)).cast("double").as("dd"))
        daily.crossJoin(broadcast(pool))
          .filter(col("p") > 0 && col("p") < 1 && col("dd") > 1)
          .agg(max("dd").cast("long").as("n_days"),
               round(max("p"), 6).as("p_pool"),
               round(sum(pow(col("x") - col("n") * col("p"), 2)
                 / (col("n") * col("p") * (lit(1.0) - col("p"))))
                 / (max("dd") - 1), 4).as("phi"))
          .withColumn("overdispersed", (col("phi") > 1.5).cast("long"))
      },
      Some("""WITH du AS (
             |  SELECT ts // 86400000000000 AS day, user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY 1, 2),
             |daily AS (SELECT day, CAST(count(*) AS DOUBLE) AS n,
             |                 CAST(sum(conv) AS DOUBLE) AS x
             |          FROM du GROUP BY day),
             |pool AS (SELECT sum(x) / sum(n) AS p,
             |                CAST(count(*) AS DOUBLE) AS dd
             |         FROM daily),
             |ag AS (SELECT CAST(max(dd) AS BIGINT) AS n_days,
             |              round(max(p), 6) AS p_pool,
             |              round(sum((x - n*p)*(x - n*p) / (n*p*(1.0 - p)))
             |                    / (max(dd) - 1), 4) AS phi
             |       FROM daily, pool
             |       WHERE p > 0 AND p < 1 AND dd > 1)
             |SELECT n_days, p_pool, phi,
             |       CAST(CASE WHEN phi > 1.5 THEN 1 ELSE 0 END AS BIGINT)
             |         AS overdispersed
             |FROM ag""".stripMargin)))

  private val round10oQ: Seq[(String, Q)] = Seq(
    // Hampel filter per type: a day is an outlier when it sits more
    // than 3 scaled-MADs from the CENTERED rolling median (±3 days) —
    // the robust spike detector that, unlike the 3σ ev_outliers, a
    // single spike can't poison. Both the median and the MAD come
    // from ONE bounded 7-element window list per row (sort + HOF
    // arithmetic, identical element math on both engines); report is
    // the per-type flag-rate rollup.
    "ts_hampel" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3)
        val sc = daily
          .withColumn("arr", collect_list("y").over(w))
          .filter(size(col("arr")) === 7)
          .withColumn("med", element_at(sort_array(col("arr")), 4))
          .withColumn("mad", element_at(sort_array(
            expr("transform(arr, v -> abs(v - med))")), 4))
          .withColumn("flag",
            (abs(col("y") - col("med")) > lit(4.4478) * col("mad") &&
             abs(col("y") - col("med")) > 0).cast("long"))
        sc.groupBy("event_type")
          .agg(count(lit(1)).as("n_days_scored"),
               sum("flag").as("n_flagged"),
               round(sum("flag") / count(lit(1)).cast("double"), 4)
                 .as("flag_rate"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |win AS (SELECT event_type, day, y,
             |          list(y) OVER (PARTITION BY event_type ORDER BY day
             |            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr
             |        FROM daily),
             |sc AS (SELECT *,
             |         list_sort(arr)[4] AS med
             |       FROM win WHERE len(arr) = 7),
             |md AS (SELECT *,
             |         list_sort(list_transform(arr, v -> abs(v - med)))[4] AS mad
             |       FROM sc),
             |fl AS (SELECT event_type,
             |         CASE WHEN abs(y - med) > 4.4478 * mad AND abs(y - med) > 0
             |              THEN 1 ELSE 0 END AS flag
             |       FROM md)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_scored,
             |       CAST(sum(flag) AS BIGINT) AS n_flagged,
             |       round(sum(flag) / CAST(count(*) AS DOUBLE), 4) AS flag_rate
             |FROM fl GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // A/B covariate balance table: standardized mean differences of
    // per-user activity covariates between the hash arms — the
    // randomization-health check causal analysis starts with
    // (|SMD| < 0.1 = balanced). ONE per-user rollup, one wide
    // conditional aggregate, then 3 rows of arithmetic; variances
    // from raw sums so both engines run identical expressions.
    "ev_covariate_balance" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(count(lit(1)).cast("double").as("x1"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("x2"),
               countDistinct(expr("ts div 86400000000000")).cast("double")
                 .as("x3"))
        def sums(a: Int, c: String) = Seq(
          sum(when(col("arm") === a, 1.0).otherwise(0.0)),
          sum(when(col("arm") === a, col(c)).otherwise(0.0)),
          sum(when(col("arm") === a, col(c) * col(c)).otherwise(0.0)))
        val g = u.agg(
          sums(1, "x1")(0).as("n1"), sums(1, "x1")(1).as("s1_1"),
          sums(1, "x1")(2).as("q1_1"), sums(0, "x1")(1).as("s0_1"),
          sums(0, "x1")(2).as("q0_1"), sums(0, "x1")(0).as("n0"),
          sums(1, "x2")(1).as("s1_2"), sums(1, "x2")(2).as("q1_2"),
          sums(0, "x2")(1).as("s0_2"), sums(0, "x2")(2).as("q0_2"),
          sums(1, "x3")(1).as("s1_3"), sums(1, "x3")(2).as("q1_3"),
          sums(0, "x3")(1).as("s0_3"), sums(0, "x3")(2).as("q0_3"))
        val rows = g.select(explode(array(
          struct(lit("n_events").as("covariate"),
            col("n1"), col("n0"), col("s1_1").as("s1"), col("q1_1").as("q1"),
            col("s0_1").as("s0"), col("q0_1").as("q0")),
          struct(lit("n_purchases").as("covariate"),
            col("n1"), col("n0"), col("s1_2").as("s1"), col("q1_2").as("q1"),
            col("s0_2").as("s0"), col("q0_2").as("q0")),
          struct(lit("n_active_days").as("covariate"),
            col("n1"), col("n0"), col("s1_3").as("s1"), col("q1_3").as("q1"),
            col("s0_3").as("s0"), col("q0_3").as("q0")))).as("r"))
          .select(col("r.*"))
        rows.filter(col("n1") > 1 && col("n0") > 1)
          .withColumn("m1", col("s1") / col("n1"))
          .withColumn("m0", col("s0") / col("n0"))
          .withColumn("v1",
            (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1))
          .withColumn("v0",
            (col("q0") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1))
          .withColumn("sp", sqrt((col("v1") + col("v0")) / 2))
          .select(col("covariate"),
            col("n1").cast("long").as("n_t"), col("n0").cast("long").as("n_c"),
            round(col("m1"), 4).as("mean_t"), round(col("m0"), 4).as("mean_c"),
            when(col("sp") > 0,
              round((col("m1") - col("m0")) / col("sp"), 4)).as("smd"),
            when(col("sp") > 0,
              (abs((col("m1") - col("m0")) / col("sp")) < 0.1).cast("long"))
              .as("balanced"))
          .orderBy("covariate")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(count(*) AS DOUBLE) AS x1,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS x2,
             |         CAST(count(DISTINCT ts // 86400000000000) AS DOUBLE) AS x3
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT
             |        sum(CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END) AS n1,
             |        sum(CASE WHEN arm = 0 THEN 1.0 ELSE 0.0 END) AS n0,
             |        sum(CASE WHEN arm = 1 THEN x1 ELSE 0 END) AS s1_1,
             |        sum(CASE WHEN arm = 1 THEN x1*x1 ELSE 0 END) AS q1_1,
             |        sum(CASE WHEN arm = 0 THEN x1 ELSE 0 END) AS s0_1,
             |        sum(CASE WHEN arm = 0 THEN x1*x1 ELSE 0 END) AS q0_1,
             |        sum(CASE WHEN arm = 1 THEN x2 ELSE 0 END) AS s1_2,
             |        sum(CASE WHEN arm = 1 THEN x2*x2 ELSE 0 END) AS q1_2,
             |        sum(CASE WHEN arm = 0 THEN x2 ELSE 0 END) AS s0_2,
             |        sum(CASE WHEN arm = 0 THEN x2*x2 ELSE 0 END) AS q0_2,
             |        sum(CASE WHEN arm = 1 THEN x3 ELSE 0 END) AS s1_3,
             |        sum(CASE WHEN arm = 1 THEN x3*x3 ELSE 0 END) AS q1_3,
             |        sum(CASE WHEN arm = 0 THEN x3 ELSE 0 END) AS s0_3,
             |        sum(CASE WHEN arm = 0 THEN x3*x3 ELSE 0 END) AS q0_3
             |      FROM u),
             |rows_ AS (
             |  SELECT 'n_events' AS covariate, n1, n0, s1_1 AS s1, q1_1 AS q1,
             |         s0_1 AS s0, q0_1 AS q0 FROM g
             |  UNION ALL
             |  SELECT 'n_purchases', n1, n0, s1_2, q1_2, s0_2, q0_2 FROM g
             |  UNION ALL
             |  SELECT 'n_active_days', n1, n0, s1_3, q1_3, s0_3, q0_3 FROM g),
             |c AS (SELECT *, s1/n1 AS m1, s0/n0 AS m0,
             |             (q1 - s1*s1/n1) / (n1 - 1) AS v1,
             |             (q0 - s0*s0/n0) / (n0 - 1) AS v0
             |      FROM rows_ WHERE n1 > 1 AND n0 > 1),
             |sm AS (SELECT *, sqrt((v1 + v0) / 2) AS sp FROM c)
             |SELECT covariate, CAST(n1 AS BIGINT) AS n_t, CAST(n0 AS BIGINT) AS n_c,
             |       round(m1, 4) AS mean_t, round(m0, 4) AS mean_c,
             |       CASE WHEN sp > 0 THEN round((m1 - m0) / sp, 4) END AS smd,
             |       CASE WHEN sp > 0 THEN CAST(CASE WHEN abs((m1 - m0) / sp) < 0.1
             |            THEN 1 ELSE 0 END AS BIGINT) END AS balanced
             |FROM sm ORDER BY covariate""".stripMargin)))

  private val round10pQ: Seq[(String, Q)] = Seq(
    // Lincoln-Petersen / Chapman capture-recapture estimate of corpus
    // size from TWO independent 10% hash samples — the "how big is
    // the population really" estimator a crawler uses when it can
    // only sample (and the sanity check that two sampling frames
    // agree). Both marks and the overlap come from ONE map-side
    // conditional aggregate; the Chapman correction removes the
    // classic small-overlap bias. Reported next to the true count so
    // the estimator's error is auditable.
    "samp_capture_recapture" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d).select(
          (pmod(md5Long(concat(lit("cra:"), col("doc_id").cast("string"))),
            lit(10)) === 0).cast("long").as("a"),
          (pmod(md5Long(concat(lit("crb:"), col("doc_id").cast("string"))),
            lit(10)) === 0).cast("long").as("b"))
        t.agg(count(lit(1)).as("n_true"),
            sum("a").as("n1"), sum("b").as("n2"),
            sum(col("a") * col("b")).as("n12"))
          .select(col("n_true"), col("n1"), col("n2"), col("n12"),
            when(col("n12") > 0,
              round(col("n1") * col("n2") / col("n12").cast("double"), 2))
              .as("n_lincoln"),
            round((col("n1") + 1) * (col("n2") + 1)
              / (col("n12") + 1).cast("double") - 1, 2).as("n_chapman"),
            when(col("n12") > 0,
              round(abs((col("n1") + 1) * (col("n2") + 1)
                / (col("n12") + 1).cast("double") - 1 - col("n_true"))
                / col("n_true"), 4)).as("rel_err_chapman"))
      },
      Some("""WITH t AS (
             |  SELECT CASE WHEN ('0x' || substr(md5('cra:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |                   % 10 = 0 THEN 1 ELSE 0 END AS a,
             |         CASE WHEN ('0x' || substr(md5('crb:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |                   % 10 = 0 THEN 1 ELSE 0 END AS b
             |  FROM documents)
             |SELECT CAST(count(*) AS BIGINT) AS n_true,
             |       CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
             |       CAST(sum(a * b) AS BIGINT) AS n12,
             |       CASE WHEN sum(a * b) > 0
             |            THEN round(sum(a) * sum(b) / CAST(sum(a * b) AS DOUBLE), 2)
             |       END AS n_lincoln,
             |       round((sum(a) + 1) * (sum(b) + 1)
             |             / CAST(sum(a * b) + 1 AS DOUBLE) - 1, 2) AS n_chapman,
             |       CASE WHEN sum(a * b) > 0 THEN
             |         round(abs((sum(a) + 1) * (sum(b) + 1)
             |               / CAST(sum(a * b) + 1 AS DOUBLE) - 1 - count(*))
             |               / count(*), 4)
             |       END AS rel_err_chapman
             |FROM t""".stripMargin)),

    // session-duration distribution: ev_sessionize's gap>30min ids
    // rolled into wall-clock durations and bucketed into the product
    // bands (<1m / 1-5m / 5-30m / 30m+) — the engagement-depth table
    // next to ev_session_paths' what-they-did. One per-user window
    // pass + one grouped rollup; single-event sessions land in <1m.
    "ev_session_durations" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("sid", sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          // integer floor division: `/` on longs is DOUBLE in Spark
          // while the oracle's // floors
          .agg(expr("(max(ts) - min(ts)) div 1000000000").as("dur_sec"))
        val b = sess.withColumn("bucket",
            when(col("dur_sec") < 60, "a_under_1m")
              .when(col("dur_sec") < 300, "b_1m_to_5m")
              .when(col("dur_sec") < 1800, "c_5m_to_30m")
              .otherwise("d_over_30m"))
          .localCheckpoint(eager = false) // totals + the bucket rollup
        val tot = b.agg(count(lit(1)).cast("double").as("nn"))
        b.groupBy("bucket").agg(count(lit(1)).as("n_sessions"),
            round(avg(col("dur_sec").cast("double")), 2).as("avg_dur_sec"))
          .crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_sessions"),
            col("avg_dur_sec"),
            round(col("n_sessions") / col("nn"), 4).as("share"))
          .orderBy("bucket")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sid AS (SELECT user_id, ts,
             |          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |        FROM g),
             |sess AS (SELECT user_id, sid,
             |           (max(ts) - min(ts)) // 1000000000 AS dur_sec
             |         FROM sid GROUP BY user_id, sid),
             |bk AS (SELECT *,
             |         CASE WHEN dur_sec < 60 THEN 'a_under_1m'
             |              WHEN dur_sec < 300 THEN 'b_1m_to_5m'
             |              WHEN dur_sec < 1800 THEN 'c_5m_to_30m'
             |              ELSE 'd_over_30m' END AS bucket
             |       FROM sess),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM bk)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
             |       round(avg(CAST(dur_sec AS DOUBLE)), 2) AS avg_dur_sec,
             |       round(count(*) / nn, 4) AS share
             |FROM bk, t GROUP BY bucket, nn ORDER BY bucket""".stripMargin)),

    // Matryoshka recall-vs-dimension curve: top-10 recall of
    // prefix-truncated cosine search at dims {8,16,32,64} against the
    // full-dim truth for 3 probes — WHERE to cut the nested
    // representation (vec_matryoshka fixes 16; this is the table that
    // justifies it). One slice + one broadcast-score pass per dim;
    // everything rank-bounded, no quadratic work.
    "vec_matryoshka_curve" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
        val qids = Seq(7L, 42L, 99L)
        val truthW = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val full = emb.crossJoin(broadcast(emb.filter(col("vec_id").isin(qids: _*))
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (round(score(col("embedding"), col("qv")), 6) + lit(0.0)).as("sc"))
          .withColumn("rk", row_number().over(truthW)).filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
          .localCheckpoint(eager = false) // joined by all 4 dims
        val parts = Seq(8, 16, 32, 64).map { dim =>
          val e = emb.select(col("vec_id"), slice(col("embedding"), 1, dim).as("ed"))
          val got = e.crossJoin(broadcast(e.filter(col("vec_id").isin(qids: _*))
              .select(col("vec_id").as("qid"), col("ed").as("qv"))))
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id"),
              (round(score(col("ed"), col("qv")), 6) + lit(0.0)).as("sc"))
            .withColumn("rk", row_number().over(truthW)).filter(col("rk") <= 10)
            .select(col("qid"), col("vec_id"))
          got.join(full, Seq("qid", "vec_id"), "left_semi")
            .groupBy("qid").agg(count(lit(1)).as("n_hits"))
            .select(col("qid"), lit(dim.toLong).as("dim"),
              round(col("n_hits") / 10.0, 4).as("recall_at_10"))
        }
        parts.reduce(_ union _).orderBy("qid", "dim")
      },
      Some {
        def top(name: String, d: Int) = {
          val es = if (d == 64) "e.emb" else s"(e.emb)[1:$d]"
          val qs = if (d == 64) "q.emb" else s"(q.emb)[1:$d]"
          s"""$name AS MATERIALIZED (SELECT qid, vec_id FROM (
             |  SELECT q.vec_id AS qid, e.vec_id,
             |         row_number() OVER (PARTITION BY q.vec_id
             |           ORDER BY round(list_cosine_similarity($es, $qs), 6) + 0.0 DESC,
             |                    e.vec_id) AS rk
             |  FROM emb e, emb q
             |  WHERE q.vec_id IN (7, 42, 99) AND e.vec_id <> q.vec_id)
             |  WHERE rk <= 10)""".stripMargin
        }
        val dimCtes = Seq(8, 16, 32, 64).map(d => top(s"t$d", d)).mkString(",\n")
        val unions = Seq(8, 16, 32, 64).map { d =>
          s"""SELECT t.qid, CAST($d AS BIGINT) AS dim,
             |       round(count(*) / 10.0, 4) AS recall_at_10
             |FROM t$d t JOIN truth USING (qid, vec_id) GROUP BY t.qid""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH emb AS MATERIALIZED (
           |  SELECT vec_id, embedding::DOUBLE[] AS emb
           |  FROM embeddings WHERE embedding IS NOT NULL),
           |${top("truth", 64)},
           |$dimCtes
           |$unions
           |ORDER BY qid, dim""".stripMargin
      }))

  private val round11Q: Seq[(String, Q)] = Seq(
    // order-invariant dataset fingerprint per source: bit_xor of a
    // per-row content hash + exact counts — the reproducibility
    // manifest entry a training run pins ("same data?" answers in one
    // scan, invariant to partitioning/file order/executor count,
    // unlike any first-N or concatenation scheme). ONE hash aggregate.
    "pipe_dataset_hash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val h = md5Long(concat_ws("#", col("doc_id").cast("string"),
          coalesce(col("lang"), lit("")), coalesce(col("text"), lit(""))))
        Tables.documents(s, d)
          .select(col("source"), h.as("h"), col("n_chars"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               expr("bit_xor(h)").as("fingerprint"),
               sum("n_chars").as("n_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(bit_xor(('0x' || substr(md5(concat_ws('#',
             |         CAST(doc_id AS VARCHAR), coalesce(lang, ''),
             |         coalesce(text, ''))), 1, 15))::BIGINT) AS BIGINT)
             |         AS fingerprint,
             |       CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // unbiased Simpson diversity 1 − Σc(c−1)/(n(n−1)) of the token
    // distribution per language — the concentration complement to
    // text_entropy/text_ttr, EXACT in integers (no float sums to
    // order-pin). Two hash aggregates.
    "text_simpson" -> Q(
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("lang"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
        tok.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
          .groupBy("lang")
          .agg(sum("c").as("n"), sum(col("c") * (col("c") - 1)).as("rep"))
          .filter(col("n") > 1)
          .select(col("lang"), col("n").as("n_tok"),
            round(lit(1.0) - col("rep") / (col("n") * (col("n") - 1))
              .cast("double"), 6).as("simpson"))
          .orderBy("lang")
      },
      Some("""WITH tc AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY lang, tok),
             |ag AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
             |              CAST(sum(c * (c - 1)) AS BIGINT) AS rep
             |       FROM tc GROUP BY lang)
             |SELECT lang, n AS n_tok,
             |       round(1.0 - rep / CAST(n * (n - 1) AS DOUBLE), 6) AS simpson
             |FROM ag WHERE n > 1 ORDER BY lang""".stripMargin)),

    // per-source KL(source ‖ corpus) over 64 hashed unigram buckets
    // with add-one smoothing — "how far is this source's language
    // from the mix" in nats, the divergence twin of samp_importance's
    // LLR weights (same bucket basis). Per-source work is a 64-row
    // broadcast join; the corpus side aggregates once.
    "samp_kl" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val tok = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .withColumn("b", md5Long(col("tok")) % 64)
        // NOT checkpointed: the exploded token table is corpus-sized —
        // recomputing the map-side explode for the corpus and
        // per-source passes is far cheaper at 100 TB than
        // materializing it (the samp_importance precedent)
        val corpus0 = tok.groupBy("b").agg(count(lit(1)).as("cc"))
        // smooth over the OCCUPIED bucket support (nb ≤ 64, and a
        // small-vocab corpus occupies far fewer): add-one over a
        // fixed 64 would leave both distributions sub-normalized on
        // the dense grid and Gibbs' KL ≥ 0 silently breaks
        val corpus = corpus0.crossJoin(broadcast(
          corpus0.agg(sum("cc").as("tc"), count(lit(1)).as("nb"))))
        val bySrc = tok.groupBy("source", "b").agg(count(lit(1)).as("cs"))
        val tot = bySrc.groupBy("source").agg(sum("cs").as("ts"))
        // DENSE source × occupied-bucket grid (≤ |sources|·64 rows):
        // smoothing assigns mass to a source's EMPTY buckets too —
        // dropping those terms also breaks KL ≥ 0
        tot.crossJoin(broadcast(corpus))
          .join(bySrc, Seq("source", "b"), "left").na.fill(0L, Seq("cs"))
          .select(col("source"), col("ts"),
            (((col("cs") + 1.0) / (col("ts") + col("nb"))) *
             (log((col("cs") + 1.0) / (col("ts") + col("nb")))
              - log((col("cc") + 1.0) / (col("tc") + col("nb"))))).as("term"))
          .groupBy("source")
          .agg(max("ts").as("n_tok"), round(sum("term"), 6).as("kl"))
          .orderBy("source")
      },
      Some("""WITH tb AS (
             |  SELECT source,
             |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
             |  FROM (SELECT source,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)),
             |corpus AS (SELECT b, CAST(count(*) AS BIGINT) AS cc FROM tb GROUP BY b),
             |ctot AS (SELECT CAST(sum(cc) AS BIGINT) AS tc,
             |                CAST(count(*) AS BIGINT) AS nb FROM corpus),
             |bysrc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cs
             |          FROM tb GROUP BY source, b),
             |stot AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ts
             |         FROM bysrc GROUP BY source),
             |dense AS (SELECT source, ts, b, cc, tc, nb FROM stot, corpus, ctot),
             |j AS (SELECT dense.*, coalesce(cs, 0) AS cs
             |      FROM dense LEFT JOIN bysrc USING (source, b))
             |SELECT source, CAST(max(ts) AS BIGINT) AS n_tok,
             |       round(sum(((cs + 1.0) / (ts + nb)) *
             |         (ln((cs + 1.0) / (ts + nb))
             |          - ln((cc + 1.0) / (tc + nb)))), 6) AS kl
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // deterministic Poisson bootstrap (the distributed bootstrap:
    // Chamandy et al. / the standard Spark resampling trick): each
    // row joins replicate b with weight ~ Poisson(1) drawn by
    // inverse-CDF on a hash of (event_id, b) — no per-replicate
    // shuffle, ×32 map-side fan-out, one hash aggregate to 32
    // replicate means, CI = type-7 percentiles of the bounded
    // 32-row frame. Replicate means rounded to 6 BEFORE the
    // quantile so engines interpolate identical values.
    "stat_bootstrap" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .filter(col("event_type") === "purchase")
        val u = (pmod(md5Long(concat(lit("bs:"),
            col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
            lit(1000000)).cast("double") + 0.5) / 1000000.0
        val w = when(u < 0.367879, 0).when(u < 0.735759, 1)
          .when(u < 0.919699, 2).when(u < 0.981012, 3)
          .when(u < 0.996340, 4).when(u < 0.999406, 5).otherwise(6)
        val reps = ev
          .withColumn("b", explode(sequence(lit(0L), lit(31L))))
          .withColumn("w", w.cast("double"))
          .groupBy("b")
          .agg(sum(col("w") * col("value")).as("sv"), sum("w").as("sw"))
          .filter(col("sw") > 0)
          .select(round(col("sv") / col("sw"), 6).as("mb"))
        val obs = ev.agg(count(lit(1)).as("n_rows"),
          round(avg("value"), 6).as("mean_value"))
        obs.crossJoin(broadcast(reps.agg(
            expr("percentile(mb, array(0.025D, 0.975D))").as("ps"))))
          .select(col("n_rows"), col("mean_value"),
            round(element_at(col("ps"), 1), 4).as("ci_lo"),
            round(element_at(col("ps"), 2), 4).as("ci_hi"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, value FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)
             |    AND event_type = 'purchase'),
             |reps AS (
             |  SELECT b,
             |    CASE WHEN u < 0.367879 THEN 0 WHEN u < 0.735759 THEN 1
             |         WHEN u < 0.919699 THEN 2 WHEN u < 0.981012 THEN 3
             |         WHEN u < 0.996340 THEN 4 WHEN u < 0.999406 THEN 5
             |         ELSE 6 END AS w, value
             |  FROM (SELECT event_id, value, CAST(b AS BIGINT) AS b,
             |          ((('0x' || substr(md5('bs:' || CAST(event_id AS VARCHAR)
             |            || ':' || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 1000000)
             |           + 0.5) / 1000000.0 AS u
             |        FROM ev, (SELECT unnest(generate_series(0, 31)) AS b))),
             |mb AS (SELECT round(sum(w * value) / sum(w), 6) AS mb
             |       FROM reps GROUP BY b HAVING sum(w) > 0),
             |ci AS (SELECT quantile_cont(mb, 0.025) AS lo,
             |              quantile_cont(mb, 0.975) AS hi FROM mb),
             |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |               round(avg(value), 6) AS mean_value FROM ev)
             |SELECT n_rows, mean_value, round(lo, 4) AS ci_lo,
             |       round(hi, 4) AS ci_hi
             |FROM obs, ci""".stripMargin)),

    // self-normalized IPW (Hájek) estimate of the treatment effect on
    // conversion, propensity stratified by activity band — the
    // covariate-adjusted companion to ev_ab_test (here arms are
    // hash-random so IPW ≈ the raw diff; the machinery is what a
    // biased-assignment log needs). Per-user rollup → per-band
    // propensities as ONE broadcast frame → conditional sums.
    "ev_ipw" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(count(lit(1)).as("n_ev"),
               max(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("y"))
          .withColumn("band", least(expr("n_ev div 5"), lit(9L)))
          .localCheckpoint(eager = false) // propensities + the sums
        val prop = u.groupBy("band")
          .agg(round(sum(when(col("arm") === 1, 1.0).otherwise(0.0))
            / count(lit(1)), 6).as("e"))
        val j = u.join(broadcast(prop), "band")
          .filter(col("e") > 0 && col("e") < 1)
        j.agg(count(lit(1)).as("n_users"),
            round(sum(when(col("arm") === 1, col("y") / col("e"))
                .otherwise(0.0))
              / sum(when(col("arm") === 1, lit(1.0) / col("e"))
                .otherwise(0.0)), 6).as("mu_t"),
            round(sum(when(col("arm") === 0, col("y") / (lit(1.0) - col("e")))
                .otherwise(0.0))
              / sum(when(col("arm") === 0, lit(1.0) / (lit(1.0) - col("e")))
                .otherwise(0.0)), 6).as("mu_c"))
          .select(col("n_users"), col("mu_t"), col("mu_c"),
            round(col("mu_t") - col("mu_c"), 6).as("ipw_ate"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(count(*) AS BIGINT) AS n_ev,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |  FROM events GROUP BY 1, 2),
             |ub AS (SELECT *, least(n_ev // 5, 9) AS band FROM u),
             |prop AS (SELECT band,
             |           round(sum(CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END)
             |                 / count(*), 6) AS e
             |         FROM ub GROUP BY band),
             |j AS (SELECT * FROM ub JOIN prop USING (band)
             |      WHERE e > 0 AND e < 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |         round(sum(CASE WHEN arm = 1 THEN y / e ELSE 0.0 END)
             |           / sum(CASE WHEN arm = 1 THEN 1.0 / e ELSE 0.0 END), 6) AS mu_t,
             |         round(sum(CASE WHEN arm = 0 THEN y / (1.0 - e) ELSE 0.0 END)
             |           / sum(CASE WHEN arm = 0 THEN 1.0 / (1.0 - e) ELSE 0.0 END), 6) AS mu_c
             |       FROM j)
             |SELECT n_users, mu_t, mu_c, round(mu_t - mu_c, 6) AS ipw_ate
             |FROM ag""".stripMargin)),

    // bounce rate by session entry type: share of sessions that end
    // after ONE event, keyed by what the session STARTED with — the
    // landing-page health metric. Reuses the ev_sessionize gap
    // machinery (per-user windows only); per-session rollup keeps
    // first-event type via the min (ts, event_id, type) struct — no
    // extra window pass.
    "ev_bounce_rate" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               min(struct(col("ts"), col("event_id"), col("event_type")))
                 .as("first_ev"))
        sess.groupBy(col("first_ev.event_type").as("entry_type"))
          .agg(count(lit(1)).as("n_sessions"),
               sum(when(col("n_events") === 1, 1L).otherwise(0L))
                 .as("n_bounced"))
          .select(col("entry_type"), col("n_sessions"), col("n_bounced"),
            round(col("n_bounced") / col("n_sessions").cast("double"), 4)
              .as("bounce_rate"))
          .orderBy("entry_type")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |se AS (
             |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
             |         min({'ts': ts, 'eid': event_id, 'et': event_type}) AS first_ev
             |  FROM s GROUP BY user_id, session_id),
             |fe AS (SELECT (first_ev).et AS entry_type, n_events FROM se)
             |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
             |       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS bounce_rate
             |FROM fe GROUP BY entry_type ORDER BY entry_type""".stripMargin)))

  private val round11bQ: Seq[(String, Q)] = Seq(
    // C4-style intra-document dedup audit: per doc, sentence units
    // (normalized) vs distinct units — the "repeated boilerplate
    // inside one page" counter that precedes cross-doc dedup in every
    // web-corpus pipeline. Pure map-side array math, exact integers.
    "text_para_dedup" -> Q(
      (s, d) => {
        val units = transform(split(col("text"), "\\. "),
          x => trim(lower(x)))
        docsUnder(s, d, 200)
          .select(col("doc_id"), size(units).cast("long").as("n_units"),
            (size(units) - size(array_distinct(units))).cast("long")
              .as("n_dup_units"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |       CAST(len(us) AS BIGINT) AS n_units,
             |       CAST(len(us) - len(list_distinct(us)) AS BIGINT) AS n_dup_units
             |FROM (SELECT doc_id,
             |        list_transform(regexp_split_to_array(text, '\. '),
             |          x -> trim(lower(x))) AS us
             |      FROM documents WHERE doc_id < 200)
             |ORDER BY doc_id""".stripMargin)),

    // cross-document boilerplate phrase mining: the token 8-grams
    // shared by the most documents (df ≥ 3) — the REPORT twin of
    // dedup_span_ngrams (which rewrites docs; this surfaces WHAT the
    // boilerplate is, for a cleaning rule). One shingle explode + one
    // hash aggregate; top-15 by document frequency, full-gram
    // tiebreak so the limit cut is engine-deterministic.
    "text_boilerplate" -> Q(
      (s, d) => graft.text.TextPrimitives
        .tokenShingles(Tables.documents(s, d), "doc_id", "text", 8)
        .groupBy("sh")
        .agg(countDistinct("doc_id").as("df"))
        .filter(col("df") >= 3)
        .orderBy(col("df").desc, col("sh"))
        .limit(15)
        .select(substring(col("sh"), 1, 40).as("gram_prefix"), col("df")),
      Some(s"""SELECT substr(sh, 1, 40) AS gram_prefix, df FROM (
              |  SELECT sh, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              |  FROM (
              |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 8)})
              |  GROUP BY sh HAVING count(DISTINCT doc_id) >= 3
              |  ORDER BY df DESC, sh LIMIT 15)""".stripMargin)),

    // what dedup buys: token counts before vs after canonical-doc
    // selection on the SHARED cluster-label table (one CC pass,
    // reused by dedup_clusters/keep_best/cluster_sizes — this row is
    // ~free) — the headline number a dedup stage reports upward.
    "pipe_dedup_savings" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
        val toks = docsUnder(s, d, 200).select(col("doc_id"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("nt"))
        labels.join(toks, "doc_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("doc_id") === col("cluster"), 1L).otherwise(0L))
              .as("n_kept"),
            sum("nt").as("tok_raw"),
            sum(when(col("doc_id") === col("cluster"), col("nt"))
              .otherwise(0L)).as("tok_kept"))
          .select(col("n_docs"), col("n_kept"), col("tok_raw"),
            col("tok_kept"),
            round(lit(1.0) - col("tok_kept") / col("tok_raw").cast("double"), 4)
              .as("savings_pct"))
      },
      Some(s"""WITH RECURSIVE sig AS (
              |${graft.dedup.Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
              |bands AS (${(0 until 4).map(b =>
                 s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                 .mkString(" UNION ALL ")}),
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
              |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
              |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
              |reach(src, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
              |  UNION
              |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
              |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
              |tk AS (SELECT doc_id,
              |         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS nt
              |       FROM documents WHERE doc_id < 200)
              |SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       CAST(sum(nt) AS BIGINT) AS tok_raw,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN nt ELSE 0 END) AS BIGINT) AS tok_kept,
              |       round(1.0 - sum(CASE WHEN doc_id = cluster THEN nt ELSE 0 END)
              |             / CAST(sum(nt) AS DOUBLE), 4) AS savings_pct
              |FROM cc JOIN tk USING (doc_id)""".stripMargin)),

    // generalized-ESD-style anomaly peeling on daily event counts:
    // 3 unrolled rounds of (μ, σ over the REMAINING days → flag the
    // max |x−μ|/σ day → peel it) — the multi-outlier detector that
    // survives masking, which one-shot 3σ (ev_outliers) does not.
    // Every round is an aggregate + broadcast over the
    // calendar-bounded daily frame; μ/σ rounded to 6 so both engines
    // peel the identical trajectory.
    "stat_esd" -> Q(
      (s, d) => {
        var daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false)
        val tops = (1 to 3).map { i =>
          val st = daily.agg(round(avg("c"), 6).as("mu"),
            round(stddev_pop(col("c")), 6).as("sd"))
          val top = daily.crossJoin(broadcast(st))
            .select(col("day"), col("c"),
              when(col("sd") === 0, lit(null).cast("double"))
                .otherwise(round(abs(col("c") - col("mu")) / col("sd"), 4))
                .as("r_stat"))
            .orderBy(col("r_stat").desc_nulls_last, col("day"))
            .limit(1)
            .select(lit(i.toLong).as("peel_round"), col("day"),
              col("c").cast("long").as("n_events"), col("r_stat"))
            .localCheckpoint(eager = false)
          daily = daily.join(top.select("day"), Seq("day"), "left_anti")
            .localCheckpoint(eager = false)
          top
        }
        tops.reduce(_.union(_))
          .withColumn("flagged", col("r_stat") > 3.0)
          .orderBy("peel_round")
      },
      Some {
        def rnd(i: Int, src: String) =
          s"""s$i AS (SELECT round(avg(c), 6) AS mu,
             |           round(stddev_pop(c), 6) AS sd FROM $src),
             |t$i AS (SELECT CAST($i AS BIGINT) AS peel_round, day, c,
             |          CASE WHEN sd = 0 THEN NULL
             |               ELSE round(abs(c - mu) / sd, 4) END AS r_stat
             |        FROM $src, s$i
             |        ORDER BY r_stat DESC NULLS LAST, day LIMIT 1),
             |d$i AS MATERIALIZED (SELECT $src.* FROM $src
             |        WHERE day NOT IN (SELECT day FROM t$i))""".stripMargin
        s"""WITH d0 AS MATERIALIZED (
           |  SELECT ts // 86400000000000 AS day,
           |         CAST(count(*) AS DOUBLE) AS c
           |  FROM events GROUP BY 1),
           |${rnd(1, "d0")},
           |${rnd(2, "d1")},
           |${rnd(3, "d2")}
           |SELECT peel_round, CAST(day AS BIGINT) AS day,
           |       CAST(c AS BIGINT) AS n_events, r_stat,
           |       r_stat > 3.0 AS flagged
           |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2
           |      UNION ALL SELECT * FROM t3)
           |ORDER BY peel_round""".stripMargin
      }))

  private val round11cQ: Seq[(String, Q)] = Seq(
    // last-observation-carried-forward imputation per user (the
    // telemetry-gap filler next to ts_gap_fill's dense spine):
    // Spark's last(ignoreNulls) over the per-user ordered frame ==
    // DuckDB's last_value IGNORE NULLS — no self-join, no fact-scale
    // state beyond the running window. Per-user rollup keeps the
    // report bounded.
    "ts_locf" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, d).filter(col("user_id") < 20)
          .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
            sum(when(col("value").isNull && col("filled").isNotNull, 1L)
              .otherwise(0L)).as("n_filled"),
            round(sum("filled"), 4).as("sum_filled"))
          .orderBy("user_id")
      },
      Some("""WITH f AS (
             |  SELECT user_id, value,
             |         last_value(value IGNORE NULLS) OVER (
             |           PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             |  FROM events WHERE user_id < 20)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |       CAST(sum(CASE WHEN value IS NULL AND filled IS NOT NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
             |       round(sum(filled), 4) AS sum_filled
             |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // int4 scalar quantization with nibble packing: 15-level per-dim
    // codes, two codes per byte — 8× scan-I/O cut vs floats (the step
    // past vec_scalar_quant's int8 when recall tolerates it). Params
    // are the SAME one broadcast row; packing is exact integer
    // arithmetic, so the oracle pins code bytes bit-for-bit.
    "vec_int4_quant" -> Q(
      (s, d) => {
        val enc = Tables.embeddings(s, d)
          .crossJoin(broadcast(graft.ann.Quant.params(Tables.embeddings(s, d))))
          .withColumn("c4", transform(col("embedding"), (x, i) => {
            val p = element_at(col("pp"), i + lit(1))
            val mn = p.getField("mn"); val mx = p.getField("mx")
            when(mx === mn, lit(0L))
              .otherwise(round((x.cast("double") - mn) / (mx - mn) * 15.0, 0)
                .cast("long"))
          }))
          .withColumn("packed", transform(
            expr("sequence(0, size(c4) div 2 - 1)"),
            k => element_at(col("c4"), (k * 2 + 1).cast("int")) * 16
              + element_at(col("c4"), (k * 2 + 2).cast("int"))))
        enc.select(col("vec_id"),
            size(col("packed")).cast("long").as("n_bytes"),
            aggregate(col("packed"), lit(0L), (a, c) => a + c).as("byte_sum"),
            array_min(col("packed")).as("byte_min"),
            array_max(col("packed")).as("byte_max"))
          .orderBy("vec_id")
      },
      Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |                     unnest(embedding) AS x
             |              FROM embeddings),
             |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
             |      FROM dims GROUP BY i),
             |codes AS (SELECT vec_id, i,
             |                 CASE WHEN mx = mn THEN 0
             |                      ELSE CAST(round((x::DOUBLE - mn) / (mx - mn) * 15.0) AS BIGINT)
             |                 END AS c
             |          FROM dims JOIN p USING (i)),
             |cl AS (SELECT vec_id, list(c ORDER BY i) AS cs FROM codes GROUP BY vec_id),
             |pk AS (SELECT vec_id,
             |              list_transform(generate_series(0, len(cs) // 2 - 1),
             |                k -> cs[2 * k + 1] * 16 + cs[2 * k + 2]) AS packed
             |       FROM cl)
             |SELECT vec_id, CAST(len(packed) AS BIGINT) AS n_bytes,
             |       CAST(list_sum(packed) AS BIGINT) AS byte_sum,
             |       CAST(list_min(packed) AS BIGINT) AS byte_min,
             |       CAST(list_max(packed) AS BIGINT) AS byte_max
             |FROM pk ORDER BY vec_id""".stripMargin)),

    // mergeable running statistics: per-batch (n, mean, centered M2)
    // partials combined by Chan's parallel formula — the discipline
    // every incremental 100 TB statistics pipeline runs on (merge
    // yesterday's partials with today's, never rescan). Both engines
    // compute the SAME partials (means rounded 6, stat_moments
    // two-pass centering) and the same merge arithmetic, so the
    // result is order-pinned.
    "stat_merge_partials" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("batch", pmod(col("event_id"), lit(2)))
          .localCheckpoint(eager = false) // means + centered pass
        val mus = ev.groupBy("batch")
          .agg(round(sum("value") / count(lit(1)), 6).as("mu"))
        val parts = ev.join(broadcast(mus), "batch")
          .groupBy("batch")
          .agg(count(lit(1)).cast("double").as("n"), max("mu").as("mu"),
               sum(pow(col("value") - col("mu"), 2)).as("m2"))
        val w = parts.select(
          sum(when(col("batch") === 0, col("n"))).as("na"),
          sum(when(col("batch") === 0, col("mu"))).as("ma"),
          sum(when(col("batch") === 0, col("m2"))).as("m2a"),
          sum(when(col("batch") === 1, col("n"))).as("nb"),
          sum(when(col("batch") === 1, col("mu"))).as("mb"),
          sum(when(col("batch") === 1, col("m2"))).as("m2b"))
        val nn = col("na") + col("nb")
        val delta = col("mb") - col("ma")
        w.select(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          round(col("ma") + delta * col("nb") / nn, 6).as("mean_merged"),
          round((col("m2a") + col("m2b")
            + delta * delta * col("na") * col("nb") / nn) / nn, 6)
            .as("var_merged"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 2 AS batch, value FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)),
             |mus AS (SELECT batch, round(sum(value) / count(*), 6) AS mu
             |        FROM ev GROUP BY batch),
             |parts AS (SELECT batch, CAST(count(*) AS DOUBLE) AS n,
             |                 max(mu) AS mu,
             |                 sum(pow(value - mu, 2)) AS m2
             |          FROM ev JOIN mus USING (batch) GROUP BY batch),
             |w AS (SELECT
             |        sum(CASE WHEN batch = 0 THEN n END) AS na,
             |        sum(CASE WHEN batch = 0 THEN mu END) AS ma,
             |        sum(CASE WHEN batch = 0 THEN m2 END) AS m2a,
             |        sum(CASE WHEN batch = 1 THEN n END) AS nb,
             |        sum(CASE WHEN batch = 1 THEN mu END) AS mb,
             |        sum(CASE WHEN batch = 1 THEN m2 END) AS m2b
             |      FROM parts)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |       round(ma + (mb - ma) * nb / (na + nb), 6) AS mean_merged,
             |       round((m2a + m2b + (mb - ma) * (mb - ma) * na * nb
             |              / (na + nb)) / (na + nb), 6) AS var_merged
             |FROM w""".stripMargin)),

    // modularity of the CC-COMMUNITY partition on the LSH near-dup
    // graph (the companion to graph_modularity, which scores the
    // SOURCE partition on the jaccard graph): every LSH edge is
    // intra-community by construction, so Q = 1 − Σ_c (d_c/2m)² —
    // how far the dup clustering is from one hairball (Q→0 = one
    // giant component, the signal that the banding is too loose).
    // Degrees from the bounded pair table, labels from the SHARED
    // cluster table (the CC pass stays amortized).
    "graph_cc_modularity" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val pairs = Dedup.minhashLshPairs(
          Dedup.minhashSignaturesMapSide(docsUnder(s, d, 200), 5, 8), 8, 2)
          .localCheckpoint(eager = false) // m + degrees
        val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
        val deg = pairs.select(col("da").as("doc_id"))
          .union(pairs.select(col("db").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("deg"))
        val m = pairs.agg(count(lit(1)).cast("double").as("m"))
        deg.join(labels, "doc_id")
          .groupBy("cluster").agg(sum("deg").cast("double").as("dc"))
          .crossJoin(broadcast(m))
          .agg(max(col("m")).cast("long").as("n_edges"),
               count(lit(1)).as("n_communities"),
               round(lit(1.0) - sum(pow(col("dc") / (lit(2.0) * col("m")), 2)), 6)
                 .as("modularity"))
      },
      Some(s"""WITH RECURSIVE sig AS (
              |${graft.dedup.Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
              |bands AS (${(0 until 4).map(b =>
                 s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                 .mkString(" UNION ALL ")}),
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
              |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
              |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
              |reach(src, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
              |  UNION
              |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
              |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
              |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS deg
              |        FROM (SELECT da AS doc_id FROM pairs
              |              UNION ALL SELECT db FROM pairs)
              |        GROUP BY doc_id),
              |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM pairs),
              |dc AS (SELECT cluster, CAST(sum(deg) AS DOUBLE) AS dc
              |       FROM deg JOIN cc USING (doc_id) GROUP BY cluster)
              |SELECT CAST(max(m) AS BIGINT) AS n_edges,
              |       CAST(count(*) AS BIGINT) AS n_communities,
              |       round(1.0 - sum(pow(dc / (2.0 * m), 2)), 6) AS modularity
              |FROM dc, m""".stripMargin)))

  private val round11dQ: Seq[(String, Q)] = Seq(
    // negative-binomial fit of per-user event counts by method of
    // moments (r = μ²/(σ²−μ), p = μ/σ²) — the "is activity
    // overdispersed Poisson?" model card next to stat_overdispersion's
    // yes/no. Variance via the two-pass centered-sum altitude
    // (broadcast rounded means) so the 4dp report can't flake.
    "stat_nb_fit" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // mean pass + centered pass
        val mus = u.groupBy("event_type")
          .agg(round(sum("c") / count(lit(1)), 6).as("mu"))
        val st = u.join(broadcast(mus), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), max("mu").as("mu"),
               sum(pow(col("c") - col("mu"), 2)).as("m2"))
          .withColumn("v", col("m2") / col("n_users"))
        st.select(col("event_type"), col("n_users"),
            round(col("mu"), 4).as("mean_c"),
            round(col("v"), 4).as("var_c"),
            when(col("v") > col("mu"),
              round(col("mu") * col("mu") / (col("v") - col("mu")), 4))
              .as("nb_r"),
            when(col("v") > col("mu"), round(col("mu") / col("v"), 4))
              .as("nb_p"))
          .orderBy("event_type")
      },
      Some("""WITH u AS (
             |  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |mus AS (SELECT event_type, round(sum(c) / count(*), 6) AS mu
             |        FROM u GROUP BY event_type),
             |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             |              max(mu) AS mu, sum(pow(c - mu, 2)) AS m2
             |       FROM u JOIN mus USING (event_type) GROUP BY event_type)
             |SELECT event_type, n_users,
             |       round(mu, 4) AS mean_c,
             |       round(m2 / n_users, 4) AS var_c,
             |       CASE WHEN m2 / n_users > mu
             |            THEN round(mu * mu / (m2 / n_users - mu), 4) END AS nb_r,
             |       CASE WHEN m2 / n_users > mu
             |            THEN round(mu / (m2 / n_users), 4) END AS nb_p
             |FROM st ORDER BY event_type""".stripMargin)),

    // documents data contract: the quality gate a landing zone runs
    // before promotion — ONE conditional aggregate (plus the Expand
    // distinct for id uniqueness) over the scan, no joins. The
    // events-side twin is pipe_contract_events.
    "pipe_contract_docs" -> Q(
      (s, d) => Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("null_or_empty_text"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("bad_n_chars"),
        sum(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1L)
          .otherwise(0L)).as("unknown_lang"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_ids"),
        sum(when(col("n_chars") < 0 || col("n_chars") > 1000000, 1L)
          .otherwise(0L)).as("out_of_range_len")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS null_or_empty_text,
             |       CAST(sum(CASE WHEN n_chars <> length(text)
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_n_chars,
             |       CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS unknown_lang,
             |       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_ids,
             |       CAST(sum(CASE WHEN n_chars < 0 OR n_chars > 1000000
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_len
             |FROM documents""".stripMargin)),

    // NOMINAL-attribute t-closeness on the l-diversity QI frame
    // (source × length-bin; sensitive = lang): variational distance
    // ½·Σ|p_g − p_global| over the DENSE group × lang grid — the
    // unordered-category companion to priv_t_closeness (whose
    // ordered-EMD treats the NUMERIC length attribute). violates at
    // t > 0.3.
    "priv_t_nominal" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), expr("n_chars DIV 500").as("len_bin"),
            col("lang")) // 3-col projection: recompute beats materializing
        val glob = docs.groupBy("lang").agg(count(lit(1)).as("cg"))
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("tg"))))
        val grp = docs.groupBy("source", "len_bin", "lang")
          .agg(count(lit(1)).as("cs"))
        val gtot = grp.groupBy("source", "len_bin").agg(sum("cs").as("ts"))
        gtot.crossJoin(broadcast(glob))
          .join(grp, Seq("source", "len_bin", "lang"), "left")
          .na.fill(0L, Seq("cs"))
          .groupBy("source", "len_bin")
          .agg(max("ts").as("n"),
            round(sum(abs(col("cs") / col("ts").cast("double")
              - col("cg") / col("tg").cast("double"))) / 2, 4).as("t_dist"))
          .select(col("source"), col("len_bin"), col("n").as("n_rows"),
            col("t_dist"), (col("t_dist") > 0.3).as("violates_t03"))
          .orderBy("source", "len_bin")
      },
      Some("""WITH q AS (SELECT source, n_chars // 500 AS len_bin, lang
             |           FROM documents),
             |gl AS (SELECT lang, CAST(count(*) AS BIGINT) AS cg FROM q GROUP BY lang),
             |tg AS (SELECT CAST(count(*) AS BIGINT) AS tg FROM q),
             |grp AS (SELECT source, len_bin, lang, CAST(count(*) AS BIGINT) AS cs
             |        FROM q GROUP BY 1, 2, 3),
             |gtot AS (SELECT source, len_bin, CAST(sum(cs) AS BIGINT) AS ts
             |         FROM grp GROUP BY 1, 2),
             |dense AS (SELECT gtot.source, gtot.len_bin, gtot.ts,
             |                 gl.lang, gl.cg, tg.tg
             |          FROM gtot, gl, tg),
             |j AS (SELECT dense.*, coalesce(cs, 0) AS cs
             |      FROM dense LEFT JOIN grp USING (source, len_bin, lang))
             |SELECT source, len_bin, CAST(max(ts) AS BIGINT) AS n_rows,
             |       round(sum(abs(cs / CAST(ts AS DOUBLE)
             |             - cg / CAST(tg AS DOUBLE))) / 2, 4) AS t_dist,
             |       round(sum(abs(cs / CAST(ts AS DOUBLE)
             |             - cg / CAST(tg AS DOUBLE))) / 2, 4) > 0.3 AS violates_t03
             |FROM j GROUP BY source, len_bin
             |ORDER BY source, len_bin""".stripMargin)))

  private val round11eQ: Seq[(String, Q)] = Seq(
    // 2×2 factorial experiment: two INDEPENDENT hash assignments per
    // user, conversion per cell, interaction = difference of the A
    // effects across B with a pooled binomial z — the "do features
    // interact?" readout a platform running concurrent experiments
    // needs next to the single-factor ev_ab_test. One per-user
    // rollup → 4 cells of arithmetic.
    "stat_factorial" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("fa",
            md5Long(concat(lit("fa:"), col("user_id").cast("string"))) % 2)
          .withColumn("fb",
            md5Long(concat(lit("fb:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "fa", "fb")
          .agg(max(when(col("event_type") === "purchase", 1.0).otherwise(0.0))
            .as("y"))
        def cell(a: Int, b: Int, c: Column) =
          sum(when(col("fa") === a && col("fb") === b, c).otherwise(0.0))
        val g = u.agg(
          cell(0, 0, lit(1.0)).as("n00"), cell(0, 0, col("y")).as("c00"),
          cell(0, 1, lit(1.0)).as("n01"), cell(0, 1, col("y")).as("c01"),
          cell(1, 0, lit(1.0)).as("n10"), cell(1, 0, col("y")).as("c10"),
          cell(1, 1, lit(1.0)).as("n11"), cell(1, 1, col("y")).as("c11"))
        def p(n: String, c: String) = col(c) / col(n)
        val inter = (p("n11", "c11") - p("n10", "c10")) -
          (p("n01", "c01") - p("n00", "c00"))
        val se = sqrt(
          p("n00", "c00") * (lit(1.0) - p("n00", "c00")) / col("n00") +
          p("n01", "c01") * (lit(1.0) - p("n01", "c01")) / col("n01") +
          p("n10", "c10") * (lit(1.0) - p("n10", "c10")) / col("n10") +
          p("n11", "c11") * (lit(1.0) - p("n11", "c11")) / col("n11"))
        g.select(
          (col("n00") + col("n01") + col("n10") + col("n11")).cast("long")
            .as("n_users"),
          round(p("n00", "c00"), 4).as("rate_00"),
          round(p("n01", "c01"), 4).as("rate_01"),
          round(p("n10", "c10"), 4).as("rate_10"),
          round(p("n11", "c11"), 4).as("rate_11"),
          round(inter, 6).as("interaction"),
          when(se > 0, round(inter / se, 4)).as("z"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('fa:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS fa,
             |         ('0x' || substr(md5('fb:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS fb,
             |         max(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS y
             |  FROM events GROUP BY 1, 2, 3),
             |g AS (SELECT
             |  sum(CASE WHEN fa = 0 AND fb = 0 THEN 1.0 ELSE 0.0 END) AS n00,
             |  sum(CASE WHEN fa = 0 AND fb = 0 THEN y ELSE 0.0 END) AS c00,
             |  sum(CASE WHEN fa = 0 AND fb = 1 THEN 1.0 ELSE 0.0 END) AS n01,
             |  sum(CASE WHEN fa = 0 AND fb = 1 THEN y ELSE 0.0 END) AS c01,
             |  sum(CASE WHEN fa = 1 AND fb = 0 THEN 1.0 ELSE 0.0 END) AS n10,
             |  sum(CASE WHEN fa = 1 AND fb = 0 THEN y ELSE 0.0 END) AS c10,
             |  sum(CASE WHEN fa = 1 AND fb = 1 THEN 1.0 ELSE 0.0 END) AS n11,
             |  sum(CASE WHEN fa = 1 AND fb = 1 THEN y ELSE 0.0 END) AS c11
             |  FROM u),
             |e AS (SELECT *,
             |        (c11/n11 - c10/n10) - (c01/n01 - c00/n00) AS inter,
             |        sqrt((c00/n00) * (1.0 - c00/n00) / n00
             |           + (c01/n01) * (1.0 - c01/n01) / n01
             |           + (c10/n10) * (1.0 - c10/n10) / n10
             |           + (c11/n11) * (1.0 - c11/n11) / n11) AS se
             |      FROM g)
             |SELECT CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n_users,
             |       round(c00/n00, 4) AS rate_00, round(c01/n01, 4) AS rate_01,
             |       round(c10/n10, 4) AS rate_10, round(c11/n11, 4) AS rate_11,
             |       round(inter, 6) AS interaction,
             |       CASE WHEN se > 0 THEN round(inter / se, 4) END AS z
             |FROM e""".stripMargin)),

    // quantile treatment effects: per-arm quartiles of per-user spend
    // — where in the distribution the treatment moves money, which
    // the mean (ev_ab_test) hides. One per-user rollup; quartiles by
    // the stat_percentiles type-7 parity.
    "ev_qte" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(sum("value").as("spend"))
        val g = u.groupBy("arm")
          .agg(expr("percentile(spend, array(0.25D, 0.5D, 0.75D))").as("ps"))
        val t = g.filter(col("arm") === 1)
          .select(explode(expr(
            "arrays_zip(array(0.25D, 0.5D, 0.75D), ps)")).as("e"))
          .select(col("e.0").as("q"), round(col("e.ps"), 4).as("v_t"))
        val c = g.filter(col("arm") === 0)
          .select(explode(expr(
            "arrays_zip(array(0.25D, 0.5D, 0.75D), ps)")).as("e"))
          .select(col("e.0").as("q"), round(col("e.ps"), 4).as("v_c"))
        t.join(c, "q")
          .select(col("q"), col("v_t"), col("v_c"),
            round(col("v_t") - col("v_c"), 4).as("qte"))
          .orderBy("q")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         sum(value) AS spend
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
             |  GROUP BY 1, 2),
             |g AS (SELECT
             |        round(quantile_cont(spend, 0.25) FILTER (arm = 1), 4) AS t25,
             |        round(quantile_cont(spend, 0.50) FILTER (arm = 1), 4) AS t50,
             |        round(quantile_cont(spend, 0.75) FILTER (arm = 1), 4) AS t75,
             |        round(quantile_cont(spend, 0.25) FILTER (arm = 0), 4) AS c25,
             |        round(quantile_cont(spend, 0.50) FILTER (arm = 0), 4) AS c50,
             |        round(quantile_cont(spend, 0.75) FILTER (arm = 0), 4) AS c75
             |      FROM u)
             |SELECT CAST(0.25 AS DOUBLE) AS q, t25 AS v_t, c25 AS v_c, round(t25 - c25, 4) AS qte FROM g
             |UNION ALL
             |SELECT CAST(0.5 AS DOUBLE), t50, c50, round(t50 - c50, 4) FROM g
             |UNION ALL
             |SELECT CAST(0.75 AS DOUBLE), t75, c75, round(t75 - c75, 4) FROM g
             |ORDER BY q""".stripMargin)),

    // event-study leads/lags around the ITS cut day: per relative day
    // r ∈ [−5, 5], treated-minus-control conversion gap normalized to
    // the r = −1 gap — flat pre-trend is the diff-in-diff validity
    // check made visible. One conditional daily rollup; everything
    // after runs on the ≤11-row frame with the baseline broadcast.
    "ev_event_study" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // bounds + the rollup
        val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
          .withColumn("cut", col("mn") + expr("CAST((mx - mn + 1) div 2 AS BIGINT)"))
        val daily = ev.crossJoin(broadcast(bounds))
          .withColumn("rel", col("day") - col("cut"))
          .filter(col("rel").between(-5, 5))
          .groupBy("rel")
          .agg(
            round(sum(when(col("arm") === 1 && col("event_type") === "purchase",
              1.0).otherwise(0.0)) /
              nullif(sum(when(col("arm") === 1, 1.0).otherwise(0.0)), lit(0.0)),
              6).as("rate_t"),
            round(sum(when(col("arm") === 0 && col("event_type") === "purchase",
              1.0).otherwise(0.0)) /
              nullif(sum(when(col("arm") === 0, 1.0).otherwise(0.0)), lit(0.0)),
              6).as("rate_c"))
          .withColumn("gap", round(col("rate_t") - col("rate_c"), 6))
          .localCheckpoint(eager = false) // baseline + the report
        val base = daily.filter(col("rel") === -1)
          .select(col("gap").as("gap_base"))
        daily.crossJoin(broadcast(base))
          .select(col("rel"), col("rate_t"), col("rate_c"),
            round(col("gap") - col("gap_base"), 6).as("effect"))
          .orderBy("rel")
      },
      Some("""WITH ev AS (
             |  SELECT ts // 86400000000000 AS day, user_id, event_type,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |c AS (SELECT mn + (mx - mn + 1) // 2 AS cut FROM b),
             |daily AS (
             |  SELECT day - cut AS rel,
             |         round(sum(CASE WHEN arm = 1 AND event_type = 'purchase'
             |                        THEN 1.0 ELSE 0.0 END)
             |               / nullif(sum(CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END), 0.0), 6) AS rate_t,
             |         round(sum(CASE WHEN arm = 0 AND event_type = 'purchase'
             |                        THEN 1.0 ELSE 0.0 END)
             |               / nullif(sum(CASE WHEN arm = 0 THEN 1.0 ELSE 0.0 END), 0.0), 6) AS rate_c
             |  FROM ev, c WHERE day - cut BETWEEN -5 AND 5
             |  GROUP BY 1),
             |g AS (SELECT *, round(rate_t - rate_c, 6) AS gap FROM daily),
             |base AS (SELECT gap AS gap_base FROM g WHERE rel = -1)
             |SELECT rel, rate_t, rate_c,
             |       round(gap - gap_base, 6) AS effect
             |FROM g, base ORDER BY rel""".stripMargin)))

  private val round11fQ: Seq[(String, Q)] = Seq(
    // hapax-legomena profile per language: share of vocabulary seen
    // exactly once (+ dis legomena) — the lexical-richness tail that
    // TTR and Heaps' K summarize away, and the practical "is this
    // corpus big enough for its vocabulary" gauge. Two hash
    // aggregates, exact integers.
    "text_hapax" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("dis"))
        .select(col("lang"), col("vocab"), col("hapax"), col("dis"),
          round(col("hapax") / col("vocab").cast("double"), 4)
            .as("hapax_share"))
        .orderBy("lang"),
      Some("""WITH tc AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY lang, tok)
             |SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
             |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
             |       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
             |       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS hapax_share
             |FROM tc GROUP BY lang ORDER BY lang""".stripMargin)),

    // Chao1 richness estimator per language: D + F1²/(2·F2) (or the
    // bias-corrected F1(F1−1)/2 form when F2 = 0) — how many MORE
    // types the corpus would surface with unbounded sampling; pairs
    // with text_heaps_fit's growth-curve view off the same counts.
    "samp_chao1" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("double").as("dv"),
          sum(when(col("c") === 1, 1.0).otherwise(0.0)).as("f1"),
          sum(when(col("c") === 2, 1.0).otherwise(0.0)).as("f2"))
        .select(col("lang"), col("dv").cast("long").as("vocab"),
          col("f1").cast("long").as("f1"), col("f2").cast("long").as("f2"),
          round(when(col("f2") > 0,
              col("dv") + col("f1") * col("f1") / (lit(2.0) * col("f2")))
            .otherwise(col("dv")
              + col("f1") * (col("f1") - 1) / 2.0), 2).as("chao1"))
        .orderBy("lang"),
      Some("""WITH tc AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY lang, tok),
             |f AS (SELECT lang, CAST(count(*) AS DOUBLE) AS dv,
             |             sum(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END) AS f1,
             |             sum(CASE WHEN c = 2 THEN 1.0 ELSE 0.0 END) AS f2
             |      FROM tc GROUP BY lang)
             |SELECT lang, CAST(dv AS BIGINT) AS vocab,
             |       CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             |       round(CASE WHEN f2 > 0 THEN dv + f1 * f1 / (2.0 * f2)
             |                  ELSE dv + f1 * (f1 - 1) / 2.0 END, 2) AS chao1
             |FROM f ORDER BY lang""".stripMargin)),

    // Theil–Sen robust trend of daily purchase counts — the slope
    // ESTIMATOR to ts_mann_kendall's trend TEST: median of all
    // pairwise slopes over the calendar-bounded daily frame (days²
    // pairs of a ≤100-row frame — never fact-scale), immune to the
    // spike that drags OLS. Median by the type-7 percentile parity.
    "ts_theil_sen" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val pairs = daily.toDF("d1", "y1")
          .join(daily.toDF("d2", "y2"), col("d1") < col("d2"))
          .select(((col("y2") - col("y1")) /
            (col("d2") - col("d1")).cast("double")).as("slope"))
        pairs.agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5D)"), 4).as("ts_slope"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |p AS (SELECT (b.y - a.y) / CAST(b.day - a.day AS DOUBLE) AS slope
             |      FROM daily a JOIN daily b ON a.day < b.day)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(quantile_cont(slope, 0.5), 4) AS ts_slope
             |FROM p""".stripMargin)),

    // OLS influence diagnostics on the daily trend: leverage
    // h_i = 1/n + (x−x̄)²/Sxx and Cook's D per day (simple-regression
    // closed forms — no matrix inverse), flagging D > 4/n — which
    // days OWN the fitted trend, the honesty check behind
    // ev_intervention_its-style fits. Two passes over the bounded
    // daily frame with broadcast moments, all rounding pinned.
    "stat_influence" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // moments + the per-day pass
        val st = daily.agg(count(lit(1)).cast("double").as("n"),
          round(avg("day"), 6).as("xb"), round(avg("y"), 6).as("yb"),
          sum(col("day") * col("day")).as("sxx0"),
          sum(col("day") * col("y")).as("sxy0"),
          sum(col("day").cast("double")).as("sx"), sum("y").as("sy"))
        val wi = daily.crossJoin(broadcast(st))
          // nullif guards: a 1-2-day or constant-day frame has no
          // regression to diagnose (degenerate fixtures) — every
          // downstream column nulls out and the flag filter drops it
          .withColumn("sxx", nullif(
            col("sxx0") - col("sx") * col("sx") / col("n"), lit(0.0)))
          .withColumn("b",
            (col("sxy0") - col("sx") * col("sy") / col("n")) / col("sxx"))
          .withColumn("a", col("yb") - col("b") * col("xb"))
          .withColumn("e", col("y") - (col("a") + col("b") * col("day")))
          .localCheckpoint(eager = false) // mse + the report
        val mse = wi.agg(round(sum(col("e") * col("e"))
          / nullif(max("n") - 2, lit(0.0)), 6).as("mse"))
        wi.crossJoin(broadcast(mse))
          .withColumn("h", lit(1.0) / col("n")
            + (col("day") - col("xb")) * (col("day") - col("xb")) / col("sxx"))
          .withColumn("cook", round(col("e") * col("e") * col("h")
            / nullif(lit(2.0) * col("mse") * (lit(1.0) - col("h"))
               * (lit(1.0) - col("h")), lit(0.0)), 4))
          .filter(col("cook") > lit(4.0) / col("n"))
          .select(col("day"), col("y").cast("long").as("n_events"),
            round(col("h"), 4).as("leverage"), col("cook"))
          .orderBy(col("cook").desc, col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |              round(avg(day), 6) AS xb, round(avg(y), 6) AS yb,
             |              sum(CAST(day AS DOUBLE) * day) AS sxx0,
             |              sum(day * y) AS sxy0,
             |              sum(CAST(day AS DOUBLE)) AS sx, sum(y) AS sy
             |       FROM daily),
             |w AS (SELECT day, y, n, xb,
             |             nullif(sxx0 - sx * sx / n, 0.0) AS sxx,
             |             (sxy0 - sx * sy / n) / nullif(sxx0 - sx * sx / n, 0.0) AS b,
             |             yb - (sxy0 - sx * sy / n)
             |               / nullif(sxx0 - sx * sx / n, 0.0) * xb AS a
             |      FROM daily, st),
             |e AS (SELECT *, y - (a + b * day) AS e FROM w),
             |m AS (SELECT round(sum(e * e) / nullif(max(n) - 2, 0.0), 6) AS mse FROM e),
             |c AS (SELECT day, y, n,
             |             1.0 / n + (day - xb) * (day - xb) / sxx AS h,
             |             e, mse
             |      FROM e, m)
             |SELECT day, CAST(y AS BIGINT) AS n_events,
             |       round(h, 4) AS leverage,
             |       round(e * e * h / nullif(2.0 * mse * (1.0 - h) * (1.0 - h), 0.0), 4) AS cook
             |FROM c
             |WHERE round(e * e * h / nullif(2.0 * mse * (1.0 - h) * (1.0 - h), 0.0), 4)
             |      > 4.0 / n
             |ORDER BY cook DESC, day""".stripMargin)))

  private val round11gQ: Seq[(String, Q)] = Seq(
    // Friedman rank test across the three engagement event types,
    // blocked by user — the nonparametric repeated-measures ANOVA
    // (does a user's per-type spend RANK consistently?). The
    // per-(user,type) statistic is an exact integer (cents sum), so
    // midranks, rank sums, and Q are fully order-invariant — no
    // float rounding anywhere before the final report. Windows are
    // user-partitioned (≤3 rows per block); df = k−1 = 2, so the
    // chi-square survival is the closed form exp(−Q/2).
    "stat_friedman" -> Q(
      (s, d) => {
        val k = 3
        val pt = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view", "purchase"))
          .groupBy("user_id", "event_type")
          .agg(sum(round(coalesce(col("value"), lit(0.0)) * 100, 0)
            .cast("long")).as("v"))
        val complete = pt
          .withColumn("nt", count(lit(1)).over(Window.partitionBy("user_id")))
          .filter(col("nt") === k)
        val ranked = complete.withColumn("rk",
          rank().over(Window.partitionBy("user_id").orderBy("v"))
            + (count(lit(1)).over(Window.partitionBy("user_id", "v")) - 1)
              / 2.0)
        ranked.groupBy("event_type")
          .agg(sum("rk").as("rj"), count(lit(1)).cast("double").as("n"))
          .agg(max("n").as("nb"), sum(col("rj") * col("rj")).as("s2"))
          .withColumn("q", round(lit(12.0) / (col("nb") * k * (k + 1))
            * col("s2") - lit(3.0) * col("nb") * (k + 1), 4))
          .select(col("nb").cast("long").as("n_blocks"),
            col("q").as("q_stat"),
            round(exp(-col("q") / 2), 6).as("p_value"))
      },
      Some("""WITH pt AS (
             |  SELECT user_id, event_type,
             |         CAST(sum(CAST(round(coalesce(value, 0.0) * 100, 0)
             |           AS BIGINT)) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('click', 'view', 'purchase')
             |  GROUP BY 1, 2),
             |cb AS (SELECT *, count(*) OVER (PARTITION BY user_id) AS nt
             |       FROM pt),
             |rk AS (SELECT event_type,
             |              rank() OVER (PARTITION BY user_id ORDER BY v)
             |              + (count(*) OVER (PARTITION BY user_id, v) - 1)
             |                / 2.0 AS rk
             |       FROM cb WHERE nt = 3),
             |rj AS (SELECT event_type, sum(rk) AS rj,
             |              CAST(count(*) AS DOUBLE) AS n
             |       FROM rk GROUP BY 1),
             |ag AS (SELECT max(n) AS nb, sum(rj * rj) AS s2 FROM rj),
             |q AS (SELECT nb,
             |             round(12.0 / (nb * 3 * 4) * s2 - 3.0 * nb * 4, 4) AS q
             |      FROM ag)
             |SELECT CAST(nb AS BIGINT) AS n_blocks, q AS q_stat,
             |       round(exp(-q / 2), 6) AS p_value
             |FROM q""".stripMargin)),

    // Bartlett's variance-homogeneity test of doc length across
    // languages — the parametric chi-square companion to
    // stat_levene's robust F on the same frame. All inputs are exact
    // integer sums (n, Σx, Σx² of n_chars), so the group variances
    // are bit-identical across engines and merge orders; the one
    // libm ln() per group is absorbed by the final 4dp round.
    // Statistic only (df = k−1 is data-dependent; no hardcoded df).
    "stat_bartlett" -> Q(
      (s, d) => Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("n_chars").cast("long")).cast("double").as("sx"),
          sum(col("n_chars").cast("long") * col("n_chars").cast("long"))
            .cast("double").as("sxx"))
        .filter(col("n") > 1)
        .withColumn("s2",
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
        .agg(count(lit(1)).cast("double").as("k"), sum("n").as("nn"),
          sum((col("n") - 1) * log(col("s2"))).as("sl"),
          sum(lit(1.0) / (col("n") - 1)).as("si"),
          sum((col("n") - 1) * col("s2")).as("sp0"))
        .select(col("k").cast("long").as("k_groups"),
          col("nn").cast("long").as("n_total"),
          round(col("sp0") / (col("nn") - col("k")), 4).as("pooled_var"),
          round(((col("nn") - col("k"))
              * log(col("sp0") / (col("nn") - col("k"))) - col("sl"))
            / (lit(1.0) + (col("si") - lit(1.0) / (col("nn") - col("k")))
              / (lit(3.0) * (col("k") - 1))), 4).as("t_stat")),
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |         CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) AS sx,
             |         CAST(sum(CAST(n_chars AS BIGINT)
             |           * CAST(n_chars AS BIGINT)) AS DOUBLE) AS sxx
             |  FROM documents GROUP BY 1),
             |v AS (SELECT lang, n, (sxx - sx * sx / n) / (n - 1) AS s2
             |      FROM g WHERE n > 1),
             |a AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
             |             sum((n - 1) * ln(s2)) AS sl,
             |             sum(1.0 / (n - 1)) AS si,
             |             sum((n - 1) * s2) AS sp0
             |      FROM v)
             |SELECT CAST(k AS BIGINT) AS k_groups,
             |       CAST(nn AS BIGINT) AS n_total,
             |       round(sp0 / (nn - k), 4) AS pooled_var,
             |       round(((nn - k) * ln(sp0 / (nn - k)) - sl)
             |             / (1.0 + (si - 1.0 / (nn - k))
             |               / (3.0 * (k - 1))), 4) AS t_stat
             |FROM a""".stripMargin)),

    // Hodges–Lehmann shift estimator between en and de doc lengths —
    // the robust location-difference companion to stat_mwu's TEST on
    // the same frame: the (lower weighted) median of all pairwise
    // en−de differences, computed from the two value HISTOGRAMS so
    // the cross is |values|², never rows² (the stat_gini bound). All
    // arithmetic is exact integers — fully deterministic. The global
    // cumsum window runs over the bounded distinct-diff grid
    // (WindowGuard-allowlisted).
    "stat_hodges_lehmann" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def hist(lang: String) = docs.filter(col("lang") === lang)
          .groupBy(col("n_chars").cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val df0 = hist("en").toDF("va", "ca")
          .crossJoin(hist("de").toDF("vb", "cb"))
          .groupBy((col("va") - col("vb")).as("diff"))
          .agg(sum(col("ca") * col("cb")).as("w"))
        val wc = Window.orderBy("diff")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.orderBy("diff")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df0.withColumn("cum", sum("w").over(wc))
          .withColumn("tot", sum("w").over(wt))
          .agg(max("tot").as("n_pairs"), count(lit(1)).as("n_diffs"),
            min(when(col("cum") * 2 >= col("tot"), col("diff")))
              .as("hl_shift"))
      },
      Some("""WITH ha AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |                   CAST(count(*) AS BIGINT) AS c
             |            FROM documents WHERE lang = 'en' GROUP BY 1),
             |hb AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |              CAST(count(*) AS BIGINT) AS c
             |       FROM documents WHERE lang = 'de' GROUP BY 1),
             |df AS (SELECT a.v - b.v AS diff,
             |              CAST(sum(a.c * b.c) AS BIGINT) AS w
             |       FROM ha a, hb b GROUP BY 1),
             |cw AS (SELECT diff, w,
             |              CAST(sum(w) OVER (ORDER BY diff
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |                AS BIGINT) AS cum,
             |              CAST(sum(w) OVER () AS BIGINT) AS tot
             |       FROM df)
             |SELECT CAST(max(tot) AS BIGINT) AS n_pairs,
             |       CAST(count(*) AS BIGINT) AS n_diffs,
             |       CAST(min(CASE WHEN 2 * cum >= tot THEN diff END)
             |         AS BIGINT) AS hl_shift
             |FROM cw""".stripMargin)),

    // SAX symbolization of the hourly event-rate series (Lin et al.
    // 2003): per-type z-normalize, PAA over 4-hour frames, map to a
    // 4-symbol alphabet at the N(0,1) quartile breakpoints ±0.6745,
    // and report each type's 3 most common daily words — the motif
    // view behind cheap whole-series indexing/anomaly grouping.
    // Hourly counts are exact ints; μ is an exact int mean; only the
    // σ pass sums rounded-mean deviations (round-6 absorbed).
    "ts_sax" -> Q(
      (s, d) => {
        val hc = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 3600000000000").as("hr"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // μ/σ pass + PAA pass
        val st = hc.groupBy("event_type").agg(round(avg("c"), 6).as("mu"))
        val st2 = hc.join(broadcast(st), "event_type")
          .groupBy("event_type")
          .agg(round(sqrt(avg((col("c") - col("mu")) * (col("c") - col("mu")))),
            6).as("sd"), max("mu").as("mu"))
        val sym = hc
          .groupBy(col("event_type"), expr("hr div 24").as("day"),
            expr("(hr % 24) div 4").as("slot"))
          .agg(avg("c").as("pc"))
          .join(broadcast(st2), "event_type")
          .withColumn("z", round((col("pc") - col("mu"))
            / nullif(col("sd"), lit(0.0)), 4))
          .withColumn("sym", when(col("z") < -0.6745, "a")
            .when(col("z") < 0, "b").when(col("z") < 0.6745, "c")
            .otherwise("d"))
        val words = sym.groupBy("event_type", "day")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("slot"), col("sym")))),
            x => x.getField("sym")), "").as("word"))
          .groupBy("event_type", "word")
          .agg(count(lit(1)).as("n_days"))
        words.withColumn("rk", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(col("n_days").desc, col("word"))))
          .filter(col("rk") <= 3)
          .select(col("event_type"), col("word"), col("n_days"))
          .orderBy(col("event_type"), col("n_days").desc, col("word"))
      },
      Some("""WITH hc AS (
             |  SELECT event_type, ts // 3600000000000 AS hr,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, round(avg(c), 6) AS mu
             |       FROM hc GROUP BY 1),
             |s2 AS (SELECT h.event_type,
             |              round(sqrt(avg((c - mu) * (c - mu))), 6) AS sd,
             |              max(mu) AS mu
             |       FROM hc h JOIN st USING (event_type) GROUP BY 1),
             |paa AS (SELECT event_type, hr // 24 AS day,
             |               (hr % 24) // 4 AS slot, avg(c) AS pc
             |        FROM hc GROUP BY 1, 2, 3),
             |z AS (SELECT p.event_type, day, slot,
             |             round((pc - mu) / nullif(sd, 0.0), 4) AS z
             |      FROM paa p JOIN s2 USING (event_type)),
             |sym AS (SELECT event_type, day, slot,
             |               CASE WHEN z < -0.6745 THEN 'a'
             |                    WHEN z < 0 THEN 'b'
             |                    WHEN z < 0.6745 THEN 'c'
             |                    ELSE 'd' END AS sym
             |        FROM z),
             |words AS (SELECT event_type, day,
             |                 string_agg(sym, '' ORDER BY slot) AS word
             |          FROM sym GROUP BY 1, 2),
             |wc AS (SELECT event_type, word,
             |              CAST(count(*) AS BIGINT) AS n_days
             |       FROM words GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
             |                 ORDER BY n_days DESC, word) AS rk
             |       FROM wc)
             |SELECT event_type, word, n_days FROM rk WHERE rk <= 3
             |ORDER BY event_type, n_days DESC, word""".stripMargin)),

    // Per-token successor entropy for the 20 highest-flow tokens —
    // the branching-factor view of the corpus LM surface (how
    // predictable is the next token after "the"?), complementing
    // text_entropy's doc-level unigram H and text_lm_score's bigram
    // probabilities: H(next|w1) = ln n₁ − Σ c·ln c / n₁ off the
    // bigram counts, exact integers into one libm ln (round-4).
    "text_successor_entropy" -> Q(
      (s, d) => {
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        Tables.documents(s, d)
          .select(explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
          .groupBy("w1")
          .agg(sum("c").as("total"), count(lit(1)).as("n_next"),
            round(log(sum("c").cast("double"))
              - sum(col("c") * log(col("c").cast("double"))) / sum("c"), 4)
              .as("h_next"))
          .orderBy(col("total").desc, col("w1"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |  FROM documents),
             |pairs AS (
             |  SELECT t[i] AS w1, t[i + 1] AS w2
             |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
             |        FROM toks WHERE len(t) >= 2)),
             |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |       FROM pairs GROUP BY 1, 2)
             |SELECT w1, CAST(sum(c) AS BIGINT) AS total,
             |       CAST(count(*) AS BIGINT) AS n_next,
             |       round(ln(CAST(sum(c) AS DOUBLE))
             |             - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 4)
             |         AS h_next
             |FROM bc GROUP BY 1
             |ORDER BY total DESC, w1 LIMIT 20""".stripMargin)),

    // dHash perceptual near-dup (difference hash): 8×9 stub-decoded
    // luminance grid per image, 64 bits = horizontal-neighbor
    // gradients (px[r,c] < px[r,c+1]) — the gradient-structure
    // complement to mm_image_ahash's global-mean bits, robust to
    // uniform brightness shifts by construction. Same banded
    // pair-join + per-image nearest-neighbor report; the decode is
    // the deterministic md5 stub (no codec runtime in the sandbox),
    // the plumbing — grid fan-out, bit compare, hamming NN — real.
    "mm_image_dhash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        def px(i: Column) =
          md5Long(concat(col("text"), lit(":dpx"), i.cast("string"))) % 256
        val bits = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1 && col("doc_id") < 120 &&
                  col("text").isNotNull)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lit(63L))).as("k"))
          .withColumn("i1", expr("k div 8") * 9 + col("k") % 8)
          .select(col("doc_id"), col("k"),
            (px(col("i1")) < px(col("i1") + 1)).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val ham = bits.select(col("doc_id").as("da"), col("k"),
            col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"),
            col("bit").as("bb")), Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
        ham.withColumn("rk", row_number().over(
            Window.partitionBy("da").orderBy(col("hamming"), col("db"))))
          .filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
                  col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 1 AND doc_id < 120
             |                AND text IS NOT NULL),
             |ks AS (SELECT doc_id, text, CAST(k AS BIGINT) AS k,
             |              (k // 8) * 9 + (k % 8) AS i1
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)),
             |bits AS (SELECT doc_id, k,
             |           CAST((('0x' || substr(md5(text || ':dpx' || CAST(i1 AS VARCHAR)), 1, 15))::BIGINT % 256)
             |              < (('0x' || substr(md5(text || ':dpx' || CAST(i1 + 1 AS VARCHAR)), 1, 15))::BIGINT % 256)
             |             AS BIGINT) AS bit
             |         FROM ks),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)))

  private val round11hQ: Seq[(String, Q)] = Seq(
    // Tukey HSD post-hoc pairwise comparison of doc length across
    // languages — the parametric studentized-range companion to
    // stat_dunn_test's rank-based post-hoc, off the same exact
    // integer power sums as stat_bartlett (group means and the
    // pooled MSE are bit-identical across engines and merge orders).
    // Statistic per pair; the k(k−1)/2 pair join runs on the
    // ≤|langs|-row aggregate, never on rows.
    "stat_tukey_hsd" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("n_chars").cast("long")).cast("double").as("sx"),
            sum(col("n_chars").cast("long") * col("n_chars").cast("long"))
              .cast("double").as("sxx"))
          .filter(col("n") > 1)
          .withColumn("m", col("sx") / col("n"))
          .withColumn("ssw", col("sxx") - col("sx") * col("sx") / col("n"))
          .localCheckpoint(eager = false) // MSE agg + the pair join
        val mse = g.agg((sum("ssw") / (sum("n") - count(lit(1))))
          .as("mse"))
        g.select(col("lang").as("lang_a"), col("n").as("na"),
            col("m").as("ma"))
          .crossJoin(g.select(col("lang").as("lang_b"), col("n").as("nb"),
            col("m").as("mb")))
          .filter(col("lang_a") < col("lang_b"))
          .crossJoin(broadcast(mse))
          .select(col("lang_a"), col("lang_b"),
            round(col("ma") - col("mb"), 4).as("mean_diff"),
            round(abs(col("ma") - col("mb"))
              / sqrt(col("mse") / 2 * (lit(1.0) / col("na")
                + lit(1.0) / col("nb"))), 4).as("q_stat"))
          .orderBy("lang_a", "lang_b")
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |         CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) AS sx,
             |         CAST(sum(CAST(n_chars AS BIGINT)
             |           * CAST(n_chars AS BIGINT)) AS DOUBLE) AS sxx
             |  FROM documents GROUP BY 1),
             |w AS (SELECT lang, n, sx / n AS m,
             |             sxx - sx * sx / n AS ssw
             |      FROM g WHERE n > 1),
             |ms AS (SELECT sum(ssw) / (sum(n) - count(*)) AS mse FROM w)
             |SELECT a.lang AS lang_a, b.lang AS lang_b,
             |       round(a.m - b.m, 4) AS mean_diff,
             |       round(abs(a.m - b.m)
             |             / sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)), 4)
             |         AS q_stat
             |FROM w a, w b, ms
             |WHERE a.lang < b.lang
             |ORDER BY lang_a, lang_b""".stripMargin)),

    // Two-sample Cramér–von Mises statistic en vs de doc length —
    // completes the ECDF-distance trio beside samp_ks_test (sup) and
    // stat_ad_test (tail-weighted): T = nm/(n+m)² · Σ c·(F1−F2)² over
    // the merged value grid. ECDFs are exact-integer cumsums over the
    // DISTINCT value histogram (the stat_mwu bound, WindowGuard-
    // allowlisted); one final round absorbs division ulp.
    "stat_cvm" -> Q(
      (s, d) => {
        val h = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .groupBy(col("n_chars").cast("long").as("v"))
          .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c1"),
            sum(when(col("lang") === "de", 1L).otherwise(0L)).as("c2"))
        val wc = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        h.withColumn("f1", sum("c1").over(wc))
          .withColumn("f2", sum("c2").over(wc))
          .withColumn("n", sum("c1").over(wt))
          .withColumn("m", sum("c2").over(wt))
          .withColumn("dd", col("f1") / col("n").cast("double")
            - col("f2") / col("m").cast("double"))
          .agg(max("n").as("n"), max("m").as("m"),
            sum((col("c1") + col("c2")).cast("double")
              * col("dd") * col("dd")).as("s"))
          .select(col("n").as("n_en"), col("m").as("n_de"),
            round((col("n") * col("m")).cast("double")
              / ((col("n") + col("m")) * (col("n") + col("m")))
              * col("s"), 6).as("cvm_t"))
      },
      Some("""WITH h AS (
             |  SELECT CAST(n_chars AS BIGINT) AS v,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS c1,
             |         CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS c2
             |  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
             |e AS (SELECT c1, c2,
             |             CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN
             |               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
             |             CAST(sum(c2) OVER (ORDER BY v ROWS BETWEEN
             |               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2,
             |             CAST(sum(c1) OVER () AS BIGINT) AS n,
             |             CAST(sum(c2) OVER () AS BIGINT) AS m
             |      FROM h),
             |dd AS (SELECT c1, c2, n, m,
             |              f1 / CAST(n AS DOUBLE) - f2 / CAST(m AS DOUBLE) AS dd
             |       FROM e)
             |SELECT CAST(max(n) AS BIGINT) AS n_en,
             |       CAST(max(m) AS BIGINT) AS n_de,
             |       round(CAST(max(n) * max(m) AS DOUBLE)
             |             / ((max(n) + max(m)) * (max(n) + max(m)))
             |             * sum((c1 + c2) * dd * dd), 6) AS cvm_t
             |FROM dd""".stripMargin)),

    // Weighted reciprocity of the event-type transition graph —
    // min(w_ij, w_ji)/Σw_ij over the off-diagonal edges (Squartini
    // et al. 2013's weighted form): do flows come back, or is the
    // journey one-way? Runs on the ≤|types|² shared transition-cell
    // table — zero additional fact scans.
    "graph_reciprocity" -> Q(
      (s, d) => {
        val e = transitionCells(s, d).filter(col("to_type").isNotNull)
          .filter(col("from_type") =!= col("to_type"))
          .select(col("from_type").as("a"), col("to_type").as("b"),
            col("n"))
          .localCheckpoint(eager = false) // both sides of the reverse join
        e.join(e.select(col("a").as("b"), col("b").as("a"),
            col("n").as("nr")), Seq("a", "b"), "left")
          .agg(count(lit(1)).as("n_edges"),
            sum("n").cast("long").as("w_total"),
            sum(least(col("n"), coalesce(col("nr"), lit(0L))))
              .cast("long").as("w_recip"),
            sum(when(col("nr").isNotNull, 1L).otherwise(0L))
              .as("e_recip"))
          .select(col("n_edges"), col("w_total"),
            round(col("w_recip") / col("w_total").cast("double"), 4)
              .as("w_reciprocity"),
            round(col("e_recip") / col("n_edges").cast("double"), 4)
              .as("e_reciprocity"))
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS a,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS b
             |  FROM events),
             |e AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
             |      FROM tr WHERE b IS NOT NULL AND a <> b GROUP BY 1, 2),
             |j AS (SELECT e.a, e.b, e.n, r.n AS nr
             |      FROM e LEFT JOIN e r ON e.a = r.b AND e.b = r.a)
             |SELECT CAST(count(*) AS BIGINT) AS n_edges,
             |       CAST(sum(n) AS BIGINT) AS w_total,
             |       round(sum(least(n, coalesce(nr, 0)))
             |             / CAST(sum(n) AS DOUBLE), 4) AS w_reciprocity,
             |       round(sum(CASE WHEN nr IS NOT NULL THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS e_reciprocity
             |FROM j""".stripMargin)),

    // Weight-of-evidence encoding of source predicting the English
    // label — the interpretable cousin of feat_target_encode:
    // WOE_s = ln(((pos_s+.5)/pos)/((neg_s+.5)/neg)) with the
    // information-value contribution per source; the standard
    // credit-scoring screen for "which categories carry signal"
    // (here: which sources skew English — the routing signal a
    // lang-targeted training mix keys on). Exact integer counts into
    // one ln per source (round-4); smoothing keeps empty cells finite.
    "feat_woe" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d).groupBy("source")
          .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"),
            sum(when(col("lang") === "en", 0L).otherwise(1L)).as("neg"))
        val tot = g.agg(sum("pos").as("pt"), sum("neg").as("nt"))
        g.crossJoin(broadcast(tot))
          .withColumn("pd", (col("pos") + 0.5) / (col("pt") + 0.5))
          .withColumn("pn", (col("neg") + 0.5) / (col("nt") + 0.5))
          .select(col("source"), col("pos").as("n_en"),
            col("neg").as("n_other"),
            round(log(col("pd") / col("pn")), 4).as("woe"),
            round((col("pd") - col("pn")) * log(col("pd") / col("pn")), 6)
              .as("iv_term"))
          .orderBy("source")
      },
      Some("""WITH g AS (
             |  SELECT source,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS pos,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
             |           AS BIGINT) AS neg
             |  FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(pos) AS BIGINT) AS pt,
             |             CAST(sum(neg) AS BIGINT) AS nt FROM g)
             |SELECT source, pos AS n_en, neg AS n_other,
             |       round(ln(((pos + 0.5) / (pt + 0.5))
             |                / ((neg + 0.5) / (nt + 0.5))), 4) AS woe,
             |       round(((pos + 0.5) / (pt + 0.5) - (neg + 0.5) / (nt + 0.5))
             |             * ln(((pos + 0.5) / (pt + 0.5))
             |                  / ((neg + 0.5) / (nt + 0.5))), 6) AS iv_term
             |FROM g, t ORDER BY source""".stripMargin)),

    // Incremental-processing shard diff: fingerprint the corpus into
    // 16 stable hash shards (the pipe_shard_manifest keying), diff
    // TODAY's manifest against a simulated YESTERDAY (docs with
    // doc_id % 97 ≠ 0 — the deterministic stand-in for the previous
    // snapshot), and report per-shard changed/unchanged — the ledger
    // that lets a 100 TB daily pipeline re-process ONLY the shards
    // whose content hash moved. Fingerprint = Σ md5Long(text) mod p
    // per shard (exact bounded integers, order-invariant).
    "pipe_incremental_shards" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val p = 1000000007L
        def manifest(df: DataFrame) = df
          .withColumn("shard",
            md5Long(concat(lit("shard:"), col("doc_id").cast("string"))) % 16)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(md5Long(col("text")) % p).as("fp"))
        val now = Tables.documents(s, d)
        val prev = now.filter(col("doc_id") % 97 =!= 0)
        manifest(now).toDF("shard", "n_now", "fp_now")
          .join(manifest(prev).toDF("shard", "n_prev", "fp_prev"),
            Seq("shard"), "full_outer")
          .select(col("shard"),
            coalesce(col("n_now"), lit(0L)).as("n_now"),
            coalesce(col("n_prev"), lit(0L)).as("n_prev"),
            (coalesce(col("fp_now"), lit(-1L)) =!=
              coalesce(col("fp_prev"), lit(-1L))).cast("long").as("changed"))
          .orderBy("shard")
      },
      Some("""WITH nowm AS (
             |  SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 16 AS shard,
             |         CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
             |           % 1000000007) AS BIGINT) AS fp
             |  FROM documents GROUP BY 1),
             |prevm AS (
             |  SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 16 AS shard,
             |         CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
             |           % 1000000007) AS BIGINT) AS fp
             |  FROM documents WHERE doc_id % 97 <> 0 GROUP BY 1)
             |SELECT coalesce(n.shard, p.shard) AS shard,
             |       coalesce(n.n_docs, 0) AS n_now,
             |       coalesce(p.n_docs, 0) AS n_prev,
             |       CAST(coalesce(n.fp, -1) <> coalesce(p.fp, -1) AS BIGINT)
             |         AS changed
             |FROM nowm n FULL OUTER JOIN prevm p ON n.shard = p.shard
             |ORDER BY shard""".stripMargin)),

    // Day-of-week × hour activity profile per event type: the peak
    // cell, its traffic share, and the entropy of the 168-cell
    // distribution (how concentrated is the weekly rhythm?) — the
    // capacity-planning readout behind ts_seasonal's per-hour μ/σ
    // baseline. Epoch-day arithmetic (no timezone semantics), exact
    // integer counts, one agg + a ≤|types|-row window.
    "ev_dow_hour" -> Q(
      (s, d) => {
        val cells = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("(ts div 86400000000000) % 7").as("dow"),
            expr("(ts div 3600000000000) % 24").as("hour"))
          .agg(count(lit(1)).as("n"))
        val tot = cells.groupBy("event_type")
          .agg(sum("n").as("tot"),
            round(log(sum("n").cast("double"))
              - sum(col("n") * log(col("n").cast("double"))) / sum("n"), 4)
              .as("h_cells"))
        cells.join(broadcast(tot), "event_type")
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(col("n").desc, col("dow"), col("hour"))))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("dow").as("peak_dow"),
            col("hour").as("peak_hour"),
            round(col("n") / col("tot").cast("double"), 4)
              .as("peak_share"), col("h_cells"))
          .orderBy("event_type")
      },
      Some("""WITH cells AS (
             |  SELECT event_type, (ts // 86400000000000) % 7 AS dow,
             |         (ts // 3600000000000) % 24 AS hour,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2, 3),
             |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
             |               round(ln(CAST(sum(n) AS DOUBLE))
             |                     - sum(n * ln(CAST(n AS DOUBLE))) / sum(n), 4)
             |                 AS h_cells
             |        FROM cells GROUP BY 1),
             |rk AS (SELECT c.*, t.tot, t.h_cells,
             |              row_number() OVER (PARTITION BY c.event_type
             |                ORDER BY c.n DESC, c.dow, c.hour) AS rk
             |       FROM cells c JOIN tot t USING (event_type))
             |SELECT event_type, dow AS peak_dow, hour AS peak_hour,
             |       round(n / CAST(tot AS DOUBLE), 4) AS peak_share,
             |       h_cells
             |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin)))

  // ---------------------------------------------------------------

  private val defs: Seq[(String, Q)] =
    relational ++ eventsQ ++ experimentsQ ++ vectorStore ++ dedup ++ textQ ++
      annQ ++ multimodalQ ++ round10Q ++ round10bQ ++ round10cQ ++ round10dQ ++
      round10eQ ++ round10fQ ++ round10gQ ++ round10hQ ++ round10iQ ++
      round10jQ ++ round10kQ ++ round10lQ ++ round10mQ ++ round10nQ ++
      round10oQ ++ round10pQ ++ round11Q ++ round11bQ ++ round11cQ ++ round11dQ ++ round11eQ ++ round11fQ ++ round11gQ ++ round11hQ

  // a duplicate name would silently SHADOW an earlier operator in the
  // queries map (last wins) — fail fast instead (this bit round 11:
  // two re-registered names hid established queries for a session)
  require(defs.map(_._1).distinct.size == defs.size,
    "duplicate query names: " + defs.map(_._1)
      .groupBy(identity).collect { case (n, g) if g.size > 1 => n }
      .mkString(", "))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, QFn] = defs.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every SQL referencing `events` is rewritten to read through a
    * shadowing CTE that restores the engine-wide `ts` = epoch-nanos
    * BIGINT contract (round-9 testdata stores ts as TIMESTAMP(MICROS);
    * see [[Tables.events]]). `main.events` inside the CTE binds the
    * raw view (DuckDB rejects the bare name as a circular CTE
    * reference); every query body then sees the BIGINT column the
    * SQLs were written against. Applied centrally so the 70+ events
    * oracles stay byte-identical to their Spark twins' comments.
    */
  private val eventsNanosCte: String =
    // SELECT * REPLACE tracks the physical schema automatically — a
    // column added to events.parquet later is visible to every oracle
    // without touching this CTE
    "events AS (SELECT * REPLACE (CAST(epoch_ns(ts) AS BIGINT) AS ts) " +
      "FROM main.events)"
  // word-boundary match of the events table reference: `n_events` or
  // `my_events_alias` must NOT trigger CTE injection
  private val eventsRef = """(?i)\bevents\b""".r
  private val epochPlainTs = """epoch_ns\((\w+\.)?ts\)""".r
  private val epochUsTs = """epoch_us\((\w+\.)?ts\)""".r
  private val epochWindowTs = """epoch_ns\((lag|lead)\(ts""".r
  private val epochResidue = """epoch_(ns|us)\(\s*((\w+\.)?ts|lag\(|lead\()""".r
  private def shadowEvents(sql: String): String =
    if (eventsRef.findFirstIn(sql).isEmpty) sql
    else {
      // SQLs written against the old TIMESTAMP(NANOS) view convert with
      // epoch_ns/epoch_us themselves; under the CTE ts is already
      // BIGINT nanos, so those calls collapse to the column (÷1000 for
      // micros — integer division is exact, nanos are multiples of 1000).
      // Replacement strings carry no $ or \, so literal interpolation
      // via the matcher function is safe.
      var b = sql
      b = epochPlainTs.replaceAllIn(b,
        m => Option(m.group(1)).getOrElse("") + "ts")
      b = epochUsTs.replaceAllIn(b,
        m => "(" + Option(m.group(1)).getOrElse("") + "ts // 1000)")
      // epoch_ns wrapped around a window call: drop the wrapper, keep
      // its paren so the expression stays balanced
      b = epochWindowTs.replaceAllIn(b, m => "(" + m.group(1) + "(ts")
      // any surviving epoch_ns/epoch_us over ts would only fail later
      // as a DuckDB binder error — fail fast here instead
      require(epochResidue.findFirstIn(b).isEmpty,
        s"shadowEvents: unrewritten epoch_ns/epoch_us over ts in: $b")
      val t = b.stripLeading()
      if (t.length >= 5 && t.substring(0, 5).equalsIgnoreCase("with "))
        "WITH " + eventsNanosCte + ",\n" + t.substring(5)
      else "WITH " + eventsNanosCte + "\n" + b
    }

  def oracleSql: Map[String, String] =
    defs.collect { case (n, Q(_, Some(sql))) => n -> shadowEvents(sql) }.toMap

  /** Headline subset (ExplainDump default + documentation). */
  def headline: Seq[String] = Seq(
    "q1_agg", "q3_join_topk", "q5_multi_join", "q_scan_filter",
    "ev_sessionize", "ev_window_agg", "ev_asof_join", "ev_range_join",
    "vs_search_topk", "vs_search_threshold", "vs_upsert_merge",
    "ann_topk_batch", "ann_ivf_probe", "ann_lsh_bucketed",
    "dedup_minhash_lsh", "dedup_minhash_tok", "dedup_clusters",
    "dedup_exact", "text_token_count", "text_quality",
    "text_search_e2e", "text_bm25", "text_chunking",
    "emb_label_cohesion", "vec_scalar_quant", "samp_hash_split",
    "agg_pivot", "q_window_rank", "vec_pq_adc", "pipe_e2e_prep",
    // round-3 flagship additions
    "text_hybrid_rrf", "vs_search_grouped", "vs_recommend",
    "dedup_incremental", "text_decontam", "ev_heavy_hitters",
    // round-5: keep-best composes on the shared label table built by
    // dedup_clusters — benched to prove the composition is ~free
    "dedup_keep_best",
    // round-7 additions: PII scrub (pure map), tf-idf keyword
    // extraction, token-budget mixing, MMR diversified re-rank
    "text_pii_redact", "text_tfidf", "samp_token_budget", "ann_mmr_rerank",
    // round-8 flagships: broadcast-cutoff winsorize, zero-join
    // attribution, grouped-count Gini, KS drift gate, curriculum
    // interleave (boundedRowNumber), per-doc entropy
    "ev_winsorize", "ev_attribution", "stat_gini", "samp_ks_test",
    "pipe_interleave", "text_entropy",
    // round-9 flagships: exact-recall prefix-filter join, SCD2
    // intervals, KMV set sketches, k-center coreset, decay attribution
    "dedup_prefix_filter", "ev_scd2", "text_kmv_vocab", "samp_coreset",
    "ev_attribution_decay",
    // round-10 flagships: the production-transport embed path, the
    // grid-bound AUC evaluator, the mergeable count-min sketch, the
    // NDCG retrieval eval, TextRank keyphrases, and the dense-kernel
    // kNN graph
    "emb_service_search", "stat_roc_auc", "ev_countmin", "text_ndcg",
    "text_textrank", "ann_knn_graph",
    // round-10 closing flagships: the broadcast bloom screen, the
    // bounded-support exact test, the crawl-order novelty scan, and
    // the 4096-cell eigen machinery
    "dedup_bloom_incremental", "stat_fisher_exact", "text_ngram_novelty",
    "emb_top_eigen",
    // round-11 flagships: integer-exact blocked ranks, the SAX motif
    // pipeline, the bigram branching-factor scan, and the gradient
    // perceptual hash
    "stat_friedman", "ts_sax", "text_successor_entropy", "mm_image_dhash")
}
