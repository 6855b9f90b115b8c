package graft.operators

import graft.{Num, Op, T}
import graft.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational surface of the engine.
  *
  * The reference (OMLDM) has no relational algebra of its own — SURVEY.md §2.7
  * — so this whole surface is expressed directly as Catalyst logical plans via
  * the DataFrame API: scans stay columnar parquet with pushed filters/pruned
  * columns, joins get broadcast hints for dimension tables, aggregates are
  * partial (map-side) by construction, and AQE handles skew/coalesce at scale.
  *
  * Numeric outputs go through [[graft.Num]] (decimal-exact, order-independent)
  * so results hash-match the DuckDB oracle bit-for-bit.
  */
object Relational {

  private def disc(c: org.apache.spark.sql.Column) = one - rate(c)
  private val sqlDisc = "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val sqlCharge =
    "(CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"

  val ops: Seq[Op] = Seq(
    // ------------------------------------------------------------------
    Op(
      "q01_pricing_summary",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_shipdate").cast(DateType) <= lit("1999-06-30").cast(DateType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * disc(col("l_discount")))
              .cast(DoubleType).as("sum_disc_price"),
            sum(dec2(col("l_extendedprice")) * disc(col("l_discount")) *
              (one + rate(col("l_tax")))).cast(DoubleType).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
        |  ${sqlDsum("l_quantity")} AS sum_qty,
        |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc * $sqlCharge) AS DOUBLE) AS sum_charge,
        |  ${sqlDavg("l_quantity")} AS avg_qty,
        |  ${sqlDavg("l_extendedprice")} AS avg_price,
        |  ${sqlDavg("l_discount")} AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1999-06-30'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q02_revenue_by_nation",
      (s, d) => {
        val li = T.lineitem(s, d)
        li.join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum(dec2(col("l_extendedprice")) * disc(col("l_discount")))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q03_top_orders",
      (s, d) =>
        T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .join(T.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(T.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(dec2(col("l_extendedprice")) * disc(col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("o_orderdate"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10),
      Some(s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q04_priority_exists",
      (s, d) =>
        T.orders(s, d)
          .join(T.lineitem(s, d).filter(col("l_quantity") >= 45),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q05_window_topk",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        T.lineitem(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .orderBy("l_suppkey", "rn")
      },
      Some("""SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q06_running_total",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.orders(s, d)
          .withColumn("run_spend", sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType))
          .select(col("o_custkey"), col("o_orderkey"), col("run_spend"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q07_revenue_filter",
      (s, d) =>
        T.lineitem(s, d)
          .filter(
            col("l_shipdate").cast(DateType) >= lit("1996-01-01").cast(DateType) &&
            col("l_shipdate").cast(DateType) <  lit("1998-01-01").cast(DateType) &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(
            sum(dec2(col("l_extendedprice")) * rate(col("l_discount")))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items")),
      Some("""SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q08_semi_join",
      (s, d) =>
        T.customer(s, d)
          .join(T.orders(s, d).filter(col("o_orderstatus") === "O"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("c_mktsegment"),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q09_anti_join",
      (s, d) =>
        T.customer(s, d)
          .join(T.orders(s, d).filter(col("o_totalprice") > 400000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q10_distinct_counts",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q11_union",
      (s, d) =>
        T.customer(s, d)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            lit("customer").as("kind"))
          .unionByName(T.supplier(s, d).select(col("s_suppkey").as("id"),
            col("s_name").as("name"), lit("supplier").as("kind")))
          .orderBy("kind", "id"),
      Some("""SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier
        |ORDER BY kind, id""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q12_rollup",
      (s, d) =>
        T.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("sum_qty"), col("n_rows"))
          .orderBy("returnflag", "linestatus"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q13_conditional_agg",
      (s, d) =>
        T.lineitem(s, d)
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("low_line_count"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q14_above_avg_customers",
      (s, d) => {
        val c = T.customer(s, d)
        val stats = c.agg(
          (sum(dec2(col("c_acctbal"))).cast(DoubleType) / count(lit(1)))
            .cast(DoubleType).as("avg_bal"))
        c.crossJoin(broadcast(stats))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q15_string_funcs",
      (s, d) =>
        T.part(s, d)
          .filter(col("p_name").like("%a%"))
          .select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 8)).as("prefix"),
            length(col("p_name")).as("name_len"),
            concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 8)) AS prefix,
        |  LENGTH(p_name) AS name_len,
        |  p_brand || '|' || p_type AS brand_type
        |FROM part
        |WHERE p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin)),
    // ------------------------------------------------------------------
    // Full outer join: per-nation customer vs supplier account balances
    // (suppliers exist in few nations -> real null sides both ways).
    Op(
      "q18_outer_join",
      (s, d) => {
        val c = T.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("cust_bal"))
        val su = T.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("supp_bal"))
        c.join(su, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("cust_bal"), lit(0.0)).as("cust_bal"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            coalesce(col("supp_bal"), lit(0.0)).as("supp_bal"))
          .orderBy("nationkey")
      },
      Some(s"""WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust,
        |            ${sqlDsum("c_acctbal")} AS cust_bal FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp,
        |      ${sqlDsum("s_acctbal")} AS supp_bal FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(cust_bal, 0.0) AS cust_bal,
        |  COALESCE(n_supp, 0) AS n_supp, COALESCE(supp_bal, 0.0) AS supp_bal
        |FROM c FULL OUTER JOIN s USING (nationkey)
        |ORDER BY nationkey""".stripMargin)),
    // ------------------------------------------------------------------
    // P4 StringToArrayDoublesParser (StringToArrayDoublesParser.scala:3-5):
    // CSV line -> array<double>, here round-tripped from lineitem columns.
    Op(
      "q19_csv_vector_parse",
      (s, d) =>
        T.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            concat_ws(",", col("l_quantity"), col("l_discount"), col("l_tax"))
              .as("line"))
          .select(col("l_orderkey"), col("l_linenumber"),
            split(col("line"), ",").cast("array<double>").as("vec"))
          .select(col("l_orderkey"), col("l_linenumber"),
            element_at(col("vec"), 1).as("v_qty"),
            element_at(col("vec"), 2).as("v_disc"),
            element_at(col("vec"), 3).as("v_tax"),
            size(col("vec")).cast(LongType).as("dim"))
          .orderBy("l_orderkey", "l_linenumber"),
      // values survive the string round-trip exactly: the doubles carry at
      // most 2 decimals, and both engines parse shortest-decimal forms back
      // to the identical double
      Some("""SELECT l_orderkey, l_linenumber,
        |  l_quantity AS v_qty, l_discount AS v_disc, l_tax AS v_tax,
        |  CAST(3 AS BIGINT) AS dim
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    // ------------------------------------------------------------------
    // Set operations beyond union: nations having customers INTERSECT/EXCEPT
    // nations having suppliers.
    Op(
      "q20_setops",
      (s, d) => {
        val cn = T.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
        val sn = T.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
        cn.intersect(sn).withColumn("op", lit("both"))
          .unionByName(cn.except(sn).withColumn("op", lit("customer_only")))
          .orderBy("op", "nationkey")
      },
      Some("""SELECT nationkey, 'both' AS op FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'customer_only' AS op FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |ORDER BY op, nationkey""".stripMargin)),
    // ------------------------------------------------------------------
    // Skew-mitigation pattern proven correct: lineitem joined to supplier
    // through an explicit 8-way salt (small side replicated per salt, big
    // side salted by a deterministic hash) must produce exactly the plain
    // join's aggregate. At 100 TB this is the manual fallback when AQE's
    // skew-join splitting isn't available (e.g. bucketed inputs). The
    // salted join carries NO broadcast hint — the pattern exists for the
    // shuffle-join regime (if the small side could broadcast, salting
    // would be pointless); the planner still size-picks broadcast at
    // test SF, shuffling on (suppkey, salt) at scale.
    Op(
      "q21_salted_skew_join",
      (s, d) => {
        val salts = 8
        val li = T.lineitem(s, d)
          .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)))
        val su = T.supplier(s, d)
          .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
        li.join(su,
            col("l_suppkey") === col("s_suppkey") && li("salt") === su("salt"))
          .groupBy(col("s_name"))
          .agg(
            sum(dec2(col("l_extendedprice")) * disc(col("l_discount")))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("s_name")
      },
      Some(s"""SELECT s_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q22_cube",
      (s, d) =>
        T.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"), col("revenue"))
          .orderBy("status", "priority"),
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS revenue
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin)),
    // ------------------------------------------------------------------
    // Correlated aggregate subquery (TPC-H Q17 shape): lineitems under 40%
    // of their part's average quantity. Decorrelates to an aggregate + join.
    Op(
      "q23_correlated_avg",
      (s, d) => {
        val li = T.lineitem(s, d)
        // ~1 row per part key — but |part| ≈ SF·200k, so the aggregate's
        // size SCALES WITH THE FACT TABLE and must not carry a forced
        // broadcast hint (at 100 TB it is billions of rows). Unhinted, AQE
        // sees the post-aggregation size at runtime: broadcast at small SF,
        // co-partitioned shuffle join on l_partkey at scale (both sides
        // already hash by the join key, map-side partial agg shrinks the
        // build side before the exchange).
        val partAvg = li.groupBy(col("l_partkey").as("pk"))
          .agg((sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1)))
            .cast(DoubleType).as("avg_qty"))
        li.join(partAvg, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < lit(0.4) * col("avg_qty"))
          .agg(
            sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("total_price"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT ${sqlDsum("l_extendedprice")} AS total_price, COUNT(*) AS n_items
        |FROM lineitem l
        |WHERE l_quantity < 0.4 * (
        |  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM lineitem WHERE l_partkey = l.l_partkey)""".stripMargin)),
    // ------------------------------------------------------------------
    // lag/lead + centered moving average per customer order history.
    Op(
      "q24_lag_moving_avg",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        T.orders(s, d)
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("ma3",
            (sum(dec2(col("o_totalprice"))).over(w.rowsBetween(-1, 1)).cast(DoubleType) /
              count(lit(1)).over(w.rowsBetween(-1, 1))).cast(DoubleType))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("prev_price"), col("next_price"), col("ma3"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS ma3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    // ------------------------------------------------------------------
    // Exact interpolated percentiles (both engines use the linear
    // interpolation definition on the same doubles).
    Op(
      "q25_percentiles",
      (s, d) =>
        T.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("med_price"),
            expr("percentile(o_totalprice, 0.9)").as("p90_price"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS med_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)),
    // ------------------------------------------------------------------
    // Array-function surface over the embeddings vectors.
    Op(
      "q26_array_funcs",
      (s, d) =>
        T.embeddings(s, d)
          .select(col("vec_id"),
            expr("size(embedding)").cast(LongType).as("dim"),
            expr("array_max(embedding)").cast(DoubleType).as("vmax"),
            expr("array_min(embedding)").cast(DoubleType).as("vmin"),
            expr("size(filter(embedding, x -> x > cast(0 as float)))")
              .cast(LongType).as("n_pos"),
            expr("cast(element_at(embedding, 1) as double)").as("first"),
            expr("cast(element_at(embedding, -1) as double)").as("last"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |  CAST(list_min(embedding) AS DOUBLE) AS vmin,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  CAST(embedding[1] AS DOUBLE) AS first,
        |  CAST(embedding[-1] AS DOUBLE) AS last
        |FROM embeddings ORDER BY vec_id""".stripMargin)),
    // ------------------------------------------------------------------
    // JSON extraction from the events.props payload column.
    Op(
      "q27_json_props",
      (s, d) =>
        T.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            countDistinct(col("k")).as("n_distinct_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_distinct_k
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "q16_monthly_revenue",
      (s, d) =>
        T.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
          .orderBy("month"),
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  ${sqlDsum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY 1
        |ORDER BY month""".stripMargin)),
  )
}
