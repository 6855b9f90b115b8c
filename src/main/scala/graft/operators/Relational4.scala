package graft.operators

import graft.{Num, Op, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational surface, part 4: the remaining classic TPC-H join shapes the
  * engine had not yet exercised — the two-sided nation-pair join (Q7), the
  * single-row ratio aggregate (Q14), the disjunctive-residual join (Q19)
  * and the argmax-against-aggregate view (Q15). Same design rules as
  * [[Relational]]: decimal-domain money math for bit-exact cross-engine
  * sums, broadcast only what is a true dimension, let AQE size-pick the
  * rest.
  */
object Relational4 {

  /** (1.00 - l_discount) in exact decimal, the shared revenue factor. */
  private def disc(c: org.apache.spark.sql.Column) = Num.one - Num.rate(c)
  private val sqlDisc =
    "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val sqlRev =
    s"CAST(l_extendedprice AS DECIMAL(18,2)) * $sqlDisc"

  val ops: Seq[Op] = Seq(
    // ------------------------------------------------------------------
    // TPC-H Q7 SHAPE — bilateral nation-pair shipping volume by year.
    // Reference scope: the OMLDM surface has no relational engine at all
    // (SURVEY §2.7); this extends the TPC-H family q64/q66-q69. The shape
    // stresses the DOUBLE dimension attach: the supplier side resolves
    // through one nation alias, the customer side through another, and the
    // pair predicate is a residual over both. Scale plan: lineitem⋈orders
    // is the one fact-fact shuffle (orderkey); supplier+nation join
    // UNHINTED (supplier scales with SF — the planner broadcasts it at
    // test SF, shuffles at 100 TB), customer likewise resolves via a
    // size-based join AQE picks (big at 100 TB → shuffle on custkey,
    // never forced broadcast). The nation-set membership prunes the
    // supplier side BEFORE any shipping. Year extraction is a
    // codegen'd expression; sums are decimal-exact (order-independent).
    Op(
      "q70_nation_traffic",
      (s, d) => {
        val left = Seq(1, 2, 3)
        val right = Seq(4, 5, 6)
        val supp = T.supplier(s, d)
          .join(broadcast(T.nation(s, d)
            .filter(col("n_nationkey").isin((left ++ right): _*))
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey").as("sn"), col("supp_nation"))
        val cust = T.customer(s, d)
          .join(broadcast(T.nation(s, d)
            .filter(col("n_nationkey").isin((left ++ right): _*))
            .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cnk"))
          .select(col("c_custkey"), col("c_nationkey").as("cn"), col("cust_nation"))
        T.lineitem(s, d)
          .filter(col("l_shipdate").cast(DateType)
            .between("1997-01-01", "1998-12-31"))
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter((col("sn").isin(left: _*) && col("cn").isin(right: _*)) ||
            (col("sn").isin(right: _*) && col("cn").isin(left: _*)))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(
            sum(Num.dec2(col("l_extendedprice")) * disc(col("l_discount")))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM($sqlRev) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_nationkey IN (1,2,3) AND n2.n_nationkey IN (4,5,6))
        |    OR (n1.n_nationkey IN (4,5,6) AND n2.n_nationkey IN (1,2,3)))
        |  AND CAST(l_shipdate AS DATE)
        |      BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q14 SHAPE — promo revenue share: a single-row ratio of two
    // conditional decimal sums over one month-window join. Parity rule:
    // both engines compute the SAME two decimal sums, cast each to double,
    // then perform the division and the *100.0 in the same order — one
    // IEEE divide + one multiply on bit-identical operands is
    // bit-deterministic. Scale plan: the shipdate window pushes to the
    // lineitem scan (PushedFilters), part joins on partkey size-picked by
    // AQE (broadcast at test SF; at 100 TB part is 200M rows/SF → shuffle),
    // and the aggregate is a two-cell partial-agg fold — no full-row
    // shuffle survives the scan.
    Op(
      "q71_promo_revenue",
      (s, d) => {
        val rev = Num.dec2(col("l_extendedprice")) * disc(col("l_discount"))
        T.lineitem(s, d)
          .filter(col("l_shipdate").cast(DateType)
            .between("1998-01-01", "1998-03-31"))
          .join(T.part(s, d), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(new java.math.BigDecimal("0.00")))).as("pr"),
            sum(rev).as("ar"),
            count(lit(1)).as("n_items"))
          .select(
            (col("pr").cast(DoubleType) / col("ar").cast(DoubleType) *
              lit(100.0)).as("promo_pct"),
            col("n_items"))
      },
      Some(s"""SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $sqlRev
        |           ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(SUM($sqlRev) AS DOUBLE) * 100.0 AS promo_pct,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE)
        |      BETWEEN DATE '1998-01-01' AND DATE '1998-03-31'""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q19 SHAPE — disjunctive-predicate join revenue. The planner
    // test: the join key (partkey) is a clean equi-join, but the brand/
    // size/quantity bands only correlate ACROSS the two tables inside an
    // OR — Catalyst must keep the equi-join and evaluate the disjunction
    // as a codegen'd residual, not fall back to a nested-loop. The
    // common-across-branches bounds (p_size >= 1, l_quantity >= 1) are
    // factored by constant-folding into scan-pushable conjuncts. Scale
    // plan: one partkey shuffle (or part broadcast when it fits), residual
    // filter inside the join, two-cell aggregate out.
    Op(
      "q72_disjunctive_join",
      (s, d) => {
        val j = T.lineitem(s, d)
          .join(T.part(s, d), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 40)))
        j.agg(
          sum(Num.dec2(col("l_extendedprice")) * disc(col("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT CAST(SUM($sqlRev) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q15 SHAPE — top revenue supplier(s) with ties: an argmax
    // against an aggregated view. The max-compare happens in the DECIMAL
    // domain (exact, order-independent) so the tie predicate is
    // bit-deterministic in both engines; only the output casts to double.
    // Scale plan: one suppkey shuffle builds the revenue view with
    // map-side partials; the global max is ONE broadcast row (never a
    // window over the whole view — the q5-style rank-all plan would sort
    // 10M suppliers for one cut); the winner set (1 row + ties) then
    // joins the supplier dimension UNHINTED — supplier scales with SF, so
    // the planner broadcasts whichever side is small (the winner set).
    Op(
      "q73_top_supplier",
      (s, d) => {
        val rev = T.lineitem(s, d)
          .filter(col("l_shipdate").cast(DateType)
            .between("1997-01-01", "1997-03-31"))
          .groupBy(col("l_suppkey"))
          .agg(sum(Num.dec2(col("l_extendedprice")) * disc(col("l_discount")))
            .as("total_rev_dec"))
        val mx = rev.agg(max(col("total_rev_dec")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_rev_dec") === col("mx"))
          .join(T.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev_dec").cast(DoubleType).as("total_rev"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
        |  SELECT l_suppkey, SUM($sqlRev) AS total_rev_dec
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE)
        |        BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |  GROUP BY 1),
        |mx AS (SELECT MAX(total_rev_dec) AS m FROM rev)
        |SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_rev
        |FROM rev JOIN mx ON total_rev_dec = m
        |JOIN supplier ON s_suppkey = l_suppkey
        |ORDER BY s_suppkey""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q2 SHAPE — min-cost supplier per part (argmin-per-group).
    // With no partsupp fixture, unit cost derives from lineitem history:
    // min observed extendedprice/quantity per (part, supplier). The
    // argmin is the p01 MIN-STRUCT AGGREGATION — min(struct(price,
    // suppkey)) gives the winner AND the deterministic tie-break in one
    // partial-aggregable fold, where Q2's textbook correlated subquery
    // (or a rank window over every part) would sort 200M part groups for
    // one row each. Unit price is ONE IEEE division per (part,supp) —
    // bit-identical in both engines; min over doubles is
    // order-independent. Scale: two keyed aggregates riding the SAME
    // (l_partkey[, l_suppkey]) shuffle, brand-filtered part joined at the
    // end UNHINTED (part scales with SF — the planner size-picks; at
    // 100 TB the brand filter would drive a DPP/semi-join into the fact
    // scan instead of post-filtering the aggregate).
    Op(
      "q74_min_cost_supplier",
      (s, d) => {
        val cost = T.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice").cast(DoubleType) /
              col("l_quantity").cast(DoubleType)).as("up"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min("up").as("up"))
        val best = cost.groupBy("l_partkey")
          .agg(min(struct(col("up"), col("l_suppkey"))).as("b"),
            count(lit(1)).as("n_suppliers"))
        best
          .join(T.part(s, d).filter(col("p_brand") === "Brand#4")
            .select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_brand"),
            col("b.l_suppkey").as("best_suppkey"),
            col("b.up").as("best_unit_price"), col("n_suppliers"))
          .orderBy("p_partkey")
      },
      Some("""WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
        |      AS up
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (
        |  SELECT l_partkey, l_suppkey, up,
        |    ROW_NUMBER() OVER (PARTITION BY l_partkey
        |      ORDER BY up, l_suppkey) AS rk,
        |    COUNT(*) OVER (PARTITION BY l_partkey) AS n_suppliers
        |  FROM cost)
        |SELECT p.p_partkey, p.p_brand, b.l_suppkey AS best_suppkey,
        |  b.up AS best_unit_price, CAST(b.n_suppliers AS BIGINT) AS n_suppliers
        |FROM best b JOIN part p ON p.p_partkey = b.l_partkey
        |WHERE b.rk = 1 AND p.p_brand = 'Brand#4'
        |ORDER BY p.p_partkey""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q11 SHAPE — "important stock": per-(nation, part) value with
    // a HAVING cut against a global scalar. The canonical Q11 threshold
    // (fraction × global sum) is replaced by the scale-invariant
    // 3× the mean group value — same plan shape (aggregate → one-row
    // broadcast scalar → filter), but the result stays non-degenerate at
    // every SF. Values aggregate in the exact decimal domain; the
    // threshold compare is double ops on bit-identical operands in a
    // fixed order. Scale: ONE (nationkey, partkey) shuffle with map-side
    // partials (supplier joins unhinted — it scales with SF, so the
    // planner broadcasts it at test SF and shuffles at 100 TB), the
    // global total is a second fold OVER THE AGGREGATE (O(groups), not a
    // second fact pass), and the cut broadcasts one row back.
    Op(
      "q75_important_stock",
      (s, d) => {
        // persist: v (the aggregated (nation, part) table — output-sized,
        // far smaller than the lineitem join feeding it) is consumed twice
        // (the threshold scalar + the main filter); uncached, the broadcast
        // subquery re-ran the whole join+aggregate (r12, guide §5).
        // Lifecycle (ADVICE r12): no in-body unpersist is possible — the
        // last consumer IS the returned lazy plan, so the cache must outlive
        // this function (s08's in-body unpersist works only because its
        // consumers are internal actions). Callers own post-action cache
        // release: Bench/Verify clearCache() between queries; a library
        // caller should do the same after its final action.
        val v = T.lineitem(s, d)
          .join(T.supplier(s, d).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), col("l_partkey"))
          .agg(sum(Num.dec2(col("l_extendedprice"))).as("val"))
          .persist()
        val tot = v.agg(sum("val").as("t"), count(lit(1)).as("g"))
        v.crossJoin(broadcast(tot))
          .filter(col("val").cast(DoubleType) >
            lit(3.0) * (col("t").cast(DoubleType) / col("g")))
          .select(col("s_nationkey").cast(LongType).as("nationkey"),
            col("l_partkey"), col("val").cast(DoubleType).as("value"))
          .orderBy(col("value").desc, col("nationkey"), col("l_partkey"))
      },
      Some("""WITH v AS (
        |  SELECT s_nationkey, l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT SUM(val) AS t, COUNT(*) AS g FROM v)
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey, l_partkey,
        |  CAST(val AS DOUBLE) AS value
        |FROM v, tot
        |WHERE CAST(val AS DOUBLE) > 3.0 * (CAST(t AS DOUBLE) / g)
        |ORDER BY value DESC, nationkey, l_partkey""".stripMargin)),
  )
}
