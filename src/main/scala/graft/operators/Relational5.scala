package graft.operators

import graft.{Num, Op, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational surface, part 5: the last classic TPC-H shapes (Q9, Q10, Q12,
  * Q16, Q20) the engine had not yet exercised — multi-fact profit rollup,
  * returned-items top-k, conditional service-level counts, anti-joined
  * count-distinct, and the nested semijoin chain. Reference scope: the OMLDM
  * surface has no relational engine (SURVEY §2.7); this completes the
  * TPC-H-shape family q64/q66–q75. Fixture adaptations (no partsupp, no
  * shipmode/commitdate/receiptdate/comment columns) are noted per-op; every
  * substitution preserves the PLAN shape the original stresses.
  */
object Relational5 {

  /** (1.00 - l_discount) in exact decimal, the shared revenue factor. */
  private def disc(c: org.apache.spark.sql.Column) = Num.one - Num.rate(c)
  private val sqlDisc =
    "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val sqlRev =
    s"CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc"

  val ops: Seq[Op] = Seq(
    // ------------------------------------------------------------------
    // TPC-H Q9 SHAPE — product-type profit by nation and year: the
    // six-table rollup with a COMPUTED measure (revenue minus supply
    // cost). No partsupp fixture, so unit supply cost derives from the
    // part dimension (60% of retail price) instead of ps_supplycost —
    // same expression shape: profit is a per-row decimal computation over
    // columns from THREE tables, which forces the measure to be evaluated
    // inside the joined stream, not pushed to any single scan. All money
    // math stays in the exact decimal domain ((18,2)x(3,2)x(4,0) products
    // — quantities are integral 1..50 — stay far under precision caps in
    // both engines), so the sums are order-independent and the gate is
    // bit-exact. Scale plan: lineitem⋈orders is the one fact-fact shuffle
    // (orderkey); part and supplier are SF-scaling tables so they carry NO
    // broadcast hint — the planner size-picks (broadcast at test SF,
    // shuffle join at 100 TB where part is 200M rows/SF); only the 25-row
    // nation dimension is hinted. The name filter pushes to the part scan
    // either way.
    Op(
      "q76_product_profit",
      (s, d) => {
        val qd = col("l_quantity").cast(DecimalType(4, 0))
        val costPu = Num.dec2(col("p_retailprice")) *
          lit(new java.math.BigDecimal("0.60"))
        val profit = Num.dec2(col("l_extendedprice")) * disc(col("l_discount")) -
          costPu * qd
        T.lineitem(s, d)
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(T.part(s, d)
            .filter(col("p_name").contains("gear"))
            .select("p_partkey", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .join(T.supplier(s, d).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(sum(profit).cast(DoubleType).as("sum_profit"),
            count(lit(1)).as("n_items"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM($sqlRev
        |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.60 AS DECIMAL(3,2))
        |      * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sum_profit,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q10 SHAPE — returned-items top-20 customers: revenue lost to
    // returns in one quarter, resolved through customer and nation. The
    // judged shape is the TOP-K AFTER AGGREGATE: the revenue rollup keys
    // on custkey, the global top-20 is a TakeOrderedAndProject (per-
    // partition O(k) heaps + one O(p*k) driver merge — never a full sort
    // of the customer aggregate), and only the 20 winners join the
    // customer/nation dimensions. The BROADCAST side is the bounded 20-row
    // top-k result, never customer (the largest SF-scaling dimension —
    // hinting it would ship an ever-growing table to every executor to
    // meet a 20-row probe). Ordering ties break on custkey so the cut is
    // deterministic in both engines; the compare happens on the exact
    // decimal revenue, the output casts to double.
    Op(
      "q77_returned_items",
      (s, d) => {
        val rev = T.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .join(T.orders(s, d)
            .filter(col("o_orderdate").cast(DateType)
              .between("1997-10-01", "1997-12-31")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(Num.dec2(col("l_extendedprice")) * disc(col("l_discount")))
            .as("rev_dec"), count(lit(1)).as("n_items"))
        broadcast(rev
            .orderBy(col("rev_dec").desc, col("o_custkey"))
            .limit(20))
          .join(T.customer(s, d)
            .select("c_custkey", "c_name", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(T.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("rev_dec").cast(DoubleType).as("revenue"), col("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
      },
      Some(s"""WITH rev AS (
        |  SELECT o_custkey,
        |    SUM($sqlRev) AS rev_dec, COUNT(*) AS n_items
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND CAST(o_orderdate AS DATE)
        |        BETWEEN DATE '1997-10-01' AND DATE '1997-12-31'
        |  GROUP BY 1),
        |top AS (SELECT * FROM rev ORDER BY rev_dec DESC, o_custkey LIMIT 20)
        |SELECT c_custkey, c_name, n_name,
        |  CAST(rev_dec AS DOUBLE) AS revenue, n_items
        |FROM top JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q12 SHAPE — service-level conditional counts over a lateness
    // predicate. No shipmode/commitdate/receiptdate columns: the group key
    // is l_linestatus and "late" is l_shipdate > o_orderdate + 60 days —
    // same plan: one orderkey fact-fact join whose residual compares
    // columns from BOTH sides (so it cannot push to either scan), a
    // 2-group aggregate of two CASE-counts, integer-exact everywhere.
    // Scale plan: the shipdate year window pushes to the lineitem scan,
    // the lateness residual rides the join, and the aggregate is a
    // 2x2-cell partial-agg fold — nothing but the join shuffles.
    Op(
      "q78_late_shipments",
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        T.lineitem(s, d)
          .filter(col("l_shipdate").cast(DateType)
            .between("1998-01-01", "1998-12-31"))
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(l_shipdate AS DATE)
        |      BETWEEN DATE '1998-01-01' AND DATE '1998-12-31'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q16 SHAPE — supplier count per part signature with a NOT-IN
    // anti-join. No partsupp: the part-supplier relation is the DISTINCT
    // (l_partkey, l_suppkey) projection of lineitem; no comment column:
    // the excluded "complaint" suppliers are those with negative account
    // balance. The judged shape survives intact: a distinct over the fact
    // table, an ANTI-join against a subquery-derived exclusion set
    // (unhinted — supplier scales with SF, so the planner size-picks the
    // broadcast anti at test SF and falls back to a shuffle at 100 TB), a
    // negated dimension
    // filter (<> brand, <> type, size IN set), and COUNT(DISTINCT) per
    // group. Scale plan: the distinct and the count-distinct ride the
    // SAME partkey-led shuffle; the anti-join adds no exchange (broadcast
    // hash anti); the part filters push to the dimension scan.
    Op(
      "q79_supplier_part_types",
      (s, d) => {
        val sizes = Seq(1, 9, 17, 25, 33, 41, 49)
        val ps = T.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(T.supplier(s, d)
            .filter(col("s_acctbal") < 0).select("s_suppkey"),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
        ps.join(T.part(s, d)
            .filter(col("p_brand") =!= "Brand#5" &&
              col("p_type") =!= "PROMO" && col("p_size").isin(sizes: _*)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"),
            col("p_size").cast(LongType).as("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 17, 25, 33, 41, 49)
        |  AND l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q20 SHAPE — the nested semijoin chain into supplier: suppliers
    // holding "excess stock" of name-matched parts. No partsupp/availqty:
    // per (part, supplier) the 1998 shipped quantity stands in for
    // availqty and the condition is qty98 > 80% of the all-time quantity
    // ON A REAL VOLUME (total >= 50 units — without the floor every
    // single-lineitem pair trivially passes the ratio and the gate
    // degenerates to all-suppliers, the q17 lesson) — evaluated in
    // INTEGERS (qty98*10 > total*8; quantities are integral) so the cut
    // is exact in both engines and discriminating at every SF
    // (1/10, 30/100, 202/1000 suppliers). The judged shape:
    // aggregate → HAVING → semijoin into part (name LIKE) → DISTINCT
    // supplier keys → semijoin into supplier, never a denormalizing join
    // that would duplicate supplier rows. Scale plan: one
    // (partkey, suppkey) shuffle with conditional map-side partials; the
    // name-filtered part set rides a LEFT SEMI (unhinted — part scales
    // with SF, so the planner size-picks broadcast vs shuffle); the final
    // supplier semijoin is O(suppliers) against a distinct key set.
    Op(
      "q80_excess_stock_suppliers",
      (s, d) => {
        val qty = col("l_quantity").cast(LongType)
        val in98 = col("l_shipdate").cast(DateType)
          .between("1998-01-01", "1998-12-31")
        val agg = T.lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(when(in98, qty).otherwise(0L)).as("qty98"),
            sum(qty).as("qty_total"))
          .filter(col("qty98") * 10 > col("qty_total") * 8 &&
            col("qty_total") >= 50)
        val excess = agg
          .join(T.part(s, d)
            .filter(col("p_name").contains("bolt")).select("p_partkey"),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_suppkey")).distinct()
        T.supplier(s, d)
          .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(T.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy("s_suppkey")
      },
      Some("""WITH agg AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CASE WHEN CAST(l_shipdate AS DATE)
        |             BETWEEN DATE '1998-01-01' AND DATE '1998-12-31'
        |        THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qty98,
        |    SUM(CAST(l_quantity AS BIGINT)) AS qty_total
        |  FROM lineitem GROUP BY 1, 2),
        |excess AS (
        |  SELECT DISTINCT l_suppkey FROM agg
        |  WHERE qty98 * 10 > qty_total * 8 AND qty_total >= 50
        |    AND l_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'))
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
        |ORDER BY s_suppkey""".stripMargin)),
  )
}
