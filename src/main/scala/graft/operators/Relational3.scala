package graft.operators

import graft.{Num, Op, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational surface, part 3: lakehouse operational queries — snapshot
  * reconciliation and sketch-based frequency estimation. Same design rules
  * as [[Relational]]/[[Relational2]]: declarative Catalyst plans, exact
  * integer/boolean gate columns wherever a value is approximate by nature.
  */
object Relational3 {

  val ops: Seq[Op] = Seq(
    // ------------------------------------------------------------------
    // SNAPSHOT DIFF / table reconciliation — the audit every incremental
    // pipeline runs after a backfill or engine migration: classify every
    // key of two table snapshots as added / removed / changed / unchanged
    // and checksum each class. Snapshots are derived deterministically from
    // the orders fixture (snapshot A drops keys ≡ 0 mod 7 — "yesterday was
    // incomplete"; snapshot B drops keys ≡ 0 mod 13 — "today saw deletes"
    // — and reprices keys ≡ 0 mod 11 by a single IEEE multiply — "today
    // saw updates"), so both engines build bit-identical inputs and ALL
    // FOUR classes are live (a key ≡ 0 mod 13 but not mod 7 is removed;
    // ≡ 0 mod 7 but not 13 is added). Scale shape: ONE full-outer sort-merge join on the snapshot
    // key — the two sides co-partition on that key (on a lakehouse both
    // snapshots are bucketed by it, making the join exchange-free), the
    // classification is a codegen'd CASE over the join's null pattern, and
    // only O(classes) rows leave the final aggregate. The change test
    // compares doubles produced by the SAME single multiply in both
    // engines, so it is bit-deterministic.
    Op(
      "q60_snapshot_diff",
      (s, d) => {
        val o = T.orders(s, d)
        val snapA = o.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("pa"))
        val snapB = o.filter(col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 11 === 0, col("o_totalprice") * lit(1.1))
              .otherwise(col("o_totalprice")).as("pb"))
        snapA.join(snapB, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("pa").isNull, "added")
              .when(col("pb").isNull, "removed")
              .when(col("pa") =!= col("pb"), "changed")
              .otherwise("unchanged").as("class"))
          .groupBy("class")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_key"))
          .orderBy("class")
      },
      Some("""WITH a AS (
        |  SELECT o_orderkey AS k, o_totalprice AS pa FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |b AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS pb
        |  FROM orders WHERE o_orderkey % 13 <> 0),
        |j AS (
        |  SELECT COALESCE(a.k, b.k) AS k,
        |    CASE WHEN a.k IS NULL THEN 'added'
        |         WHEN b.k IS NULL THEN 'removed'
        |         WHEN pa <> pb THEN 'changed'
        |         ELSE 'unchanged' END AS class
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT class, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_key
        |FROM j GROUP BY class ORDER BY class""".stripMargin)),
    // ------------------------------------------------------------------
    // COUNT-MIN SKETCH frequency estimation — the constant-memory
    // heavy-hitter counter for streams and shuffles too wide for exact
    // maps. The sketch is built by Spark's codegen'd count_min_sketch
    // aggregate (one pass, map-side mergeable — at 100 TB every executor
    // folds its partition into a w x d integer grid and the driver merges
    // sketch-sized blobs, never rows). The blob is then probed for the 10
    // true-heaviest part keys. Estimates are approximate BY CONSTRUCTION,
    // so the hash gate follows the q37/q42 invariant pattern: CMS can
    // NEVER undercount (every cell the key hashes to saw all its
    // increments), and with eps = 0.001 the overcount is bounded by
    // eps * N collisions-mass — both prove as booleans next to the exact
    // counts the oracle reproduces. Fixed seed makes the run
    // deterministic; a sketch-width regression, a merge bug, or a probe
    // off-by-one flips a boolean and fails the driver hash.
    Op(
      "q61_countmin_freq",
      (s, d) => {
        val s2 = s
        import s2.implicits._
        val li = T.lineitem(s, d)
        val n = li.count()
        val skBytes = li
          .agg(expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(skBytes))
        val top = li.groupBy("l_partkey").agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("l_partkey")).limit(10)
          .collect() // O(10) rows: the probe set, not the data
          .map(r => (r.getLong(0), r.getLong(1)))
        val slack = math.ceil(0.001 * n).toLong
        top.toSeq.map { case (k, c) =>
          val est = cms.estimateCount(k)
          (k, c, est >= c, est <= c + slack)
        }.toDF("l_partkey", "true_cnt", "est_ge_true", "est_within_eps")
          .orderBy(col("true_cnt").desc, col("l_partkey"))
      },
      Some("""SELECT l_partkey, COUNT(*) AS true_cnt,
        |  true AS est_ge_true, true AS est_within_eps
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY true_cnt DESC, l_partkey LIMIT 10""".stripMargin)),
    // ------------------------------------------------------------------
    // LAST-TOUCH ATTRIBUTION with a lookback window — the marketing/
    // growth query every event pipeline serves: attribute each purchase
    // to the user's most recent preceding touch (view/click/signup), but
    // ONLY if it happened within the 1-day lookback; older touches mean
    // the purchase reports as organic ('none'). This is the WINDOWED
    // variant of the as-of join (q17/q45 are unbounded): the shared as-of
    // core finds the latest touch <= t, and the window becomes one
    // codegen'd age predicate on the result — no second join. Revenue
    // sums in floor-milli integers (the st19 scheme) so the rollup is
    // bit-exact. Scale shape: the as-of core costs ONE exchange
    // partitioned by user — both event streams co-partition on the user
    // key, ties resolve by (ts, event_id) deterministically, and only
    // O(touch types) rows leave the final aggregate.
    Op(
      "q62_attribution",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val touches = e
          .filter(col("event_type").isin("view", "click", "signup"))
          .select(col("user_id"), col("ts").as("touch_ts"),
            col("event_type").as("touch_type"), col("event_id").as("touch_id"))
        AsOf.asofJoin(purchases, touches, "user_id", "user_id",
            col("ts"), col("touch_ts"),
            Seq("touch_type", "touch_ts", "touch_id"), "touch_id")
          .withColumn("touch",
            when(col("touch_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("touch_ts")) >
                lit(86400000000L), "none")
              .otherwise(col("touch_type")))
          .groupBy("touch")
          .agg(count(lit(1)).as("n_purchases"),
            sum(floor(col("value") * 1000).cast(LongType)).as("revenue_milli"))
          .orderBy("touch")
      },
      Some("""WITH p AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |    value
        |  FROM events WHERE event_type = 'purchase'),
        |tc AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type,
        |    event_id
        |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
        |at AS (
        |  SELECT p.event_id, p.value, p.t AS pt, w.event_type AS touch_type,
        |    w.t AS touch_t
        |  FROM p LEFT JOIN LATERAL (
        |    SELECT tc.event_type, tc.t FROM tc
        |    WHERE tc.user_id = p.user_id AND tc.t <= p.t
        |    ORDER BY tc.t DESC, tc.event_id DESC LIMIT 1) w ON true)
        |SELECT
        |  CASE WHEN touch_t IS NULL OR pt - touch_t > 86400000000
        |       THEN 'none' ELSE touch_type END AS touch,
        |  COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS revenue_milli
        |FROM at GROUP BY 1 ORDER BY touch""".stripMargin)),
    // ------------------------------------------------------------------
    // VARIANT shredding (Spark 4's semi-structured column type): the
    // event props JSON is parsed ONCE into a binary Variant value, then
    // typed paths extract from the encoded form — the open-lakehouse
    // answer to "parse the JSON string in every expression" (q27's
    // get_json_object re-parses per call; Variant parses once and
    // extracts many times from a binary-encoded tree, and table formats
    // shred hot paths into columns). try_variant_get proves the missing-
    // path contract (NULL, not error). The rollup is exact integers, so
    // the oracle reproduces it from DuckDB's JSON operators directly.
    Op(
      "q63_variant_shred",
      (s, d) =>
        T.events(s, d)
          .select(col("event_type"), expr("parse_json(props)").as("v"))
          .select(col("event_type"),
            expr("variant_get(v, '$.k', 'bigint')").as("k"),
            expr("try_variant_get(v, '$.absent', 'bigint')").as("absent"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("k").as("sum_k"),
            min("k").as("min_k"), max("k").as("max_k"),
            sum(when(col("absent").isNull, 1L).otherwise(0L))
              .as("n_absent_null"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
        |  COUNT(*) AS n_absent_null
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    // ------------------------------------------------------------------
    // MARKET SHARE (the TPC-H Q8 shape): of all ECONOMY-part revenue sold
    // to ASIA-region customers, what fraction came from NATION_7
    // suppliers, per order year — the deepest join in the surface
    // (lineitem x orders x customer x nation x region x supplier x
    // nation x part: 7 joins) and the join-reorder/broadcast stress
    // test. Only the CONSTANT dimensions (nation 25 rows, region 5) carry
    // broadcast hints; supplier and part scale with SF so they stay
    // unhinted — the planner size-picks broadcast at test SF and a
    // shuffle join at 100 TB (customer at sf-scale shuffles; at 100 TB it
    // would bucket on the key like orders); the
    // fact table is scanned ONCE with the part filter semi-joined in,
    // and the share is one IEEE division of two decimal-exact volume
    // sums, so it hash-matches bit-for-bit.
    Op(
      "q64_market_share",
      (s, d) => {
        val vol = Num.dec2(col("l_extendedprice")) *
          (lit(new java.math.BigDecimal("1.00")) -
            col("l_discount").cast(DecimalType(3, 2)))
        T.lineitem(s, d)
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(T.nation(s, d).select(
            col("n_nationkey").as("cn_key"), col("n_regionkey"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(T.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .join(T.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T.nation(s, d).select(
            col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .join(T.part(s, d), col("l_partkey") === col("p_partkey"))
          .filter(col("p_type") === "ECONOMY")
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_7", vol)
              .otherwise(lit(new java.math.BigDecimal("0.00"))))
              .cast(DoubleType).as("nation_volume"),
            sum(vol).cast(DoubleType).as("total_volume"),
            (sum(when(col("supp_nation") === "NATION_7", vol)
              .otherwise(lit(new java.math.BigDecimal("0.00")))).cast(DoubleType) /
              sum(vol).cast(DoubleType)).cast(DoubleType).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""WITH base AS (
        |  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
        |      AS vol,
        |    sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN region r ON cn.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY')
        |SELECT CAST(o_year AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
        |                ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS nation_volume,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume,
        |  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
        |                     ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin)),
    // ------------------------------------------------------------------
    // BINNED temporal proximity join — the big x big interval join q32's
    // broadcast band lookup cannot scale to: pairs of SAME-USER events
    // within 5 minutes of each other. The naive plan is a per-user
    // inequality self-join (a nested loop at any granularity Spark can't
    // equi-hash); the scale answer is BINNING (the Databricks range-join
    // trick, here hand-rolled): bucket time into bin = t div 300s, explode
    // ONE side into its 3 adjacent bins, equi-join on (user, bin) — a
    // plain shuffled hash join, no broadcast, no nested loop — and apply
    // the exact |t1-t2| <= 300s predicate to the O(bin-local) candidates.
    // Each qualifying pair matches on exactly ONE exploded bin value (the
    // left row's own bin), so no dedup pass is needed. Everything is
    // integer micros, so the per-type-pair rollup hash-matches DuckDB's
    // direct inequality join. Scale shape: 3x one side's rows shuffle on
    // (user, bin); candidate volume is bounded by per-user-per-5-min
    // density, never by corpus size — the plan that survives when both
    // sides are 100 TB event logs.
    Op(
      "q65_proximity_join",
      (s, d) => {
        val ev = T.events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("t"))
        val binned = ev.withColumn("bin", expr("t div 300000000"))
        val exploded = binned
          .withColumn("jb", explode(array(col("bin") - 1, col("bin"),
            col("bin") + 1)))
          .select(col("event_id").as("id_b"), col("user_id"),
            col("event_type").as("type_b"), col("t").as("t_b"), col("jb"))
        binned.as("x")
          .join(exploded,
            col("x.user_id") === exploded("user_id") &&
              col("x.bin") === col("jb"))
          .filter(col("x.event_id") < col("id_b") &&
            abs(col("x.t") - col("t_b")) <= 300000000L)
          .groupBy(col("x.event_type").as("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(abs(col("x.t") - col("t_b"))).as("sum_gap_us"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS n_pairs,
        |  CAST(SUM(ABS(a.t - b.t)) AS BIGINT) AS sum_gap_us
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND ABS(a.t - b.t) <= 300000000
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q21 SHAPE — "suppliers who kept orders waiting": for finished
    // orders, the late supplier (shipped > 90 days after the order date)
    // on multi-supplier orders where NO OTHER supplier was also late.
    // Q21 is the optimizer's nested-EXISTS/NOT-EXISTS stress test; the
    // Spark-first plan REWRITES the correlated semi/anti pair as one
    // per-order aggregate — countDistinct suppliers and countDistinct
    // LATE suppliers — joined back to the late lines (late AND nsupp>=2
    // AND nlate=1 <=> EXISTS other supplier AND NOT EXISTS other late
    // supplier). At 100 TB that is ONE shuffle on the order key (the
    // aggregate and the join-back share it; lineitem bucketed on
    // l_orderkey makes both exchange-free) instead of three correlated
    // passes over lineitem; the constant nation dimension is hinted at
    // the end while supplier (SF-scaling) stays unhinted for the planner
    // to size-pick. Counts are per late LINE, Q21's own multiplicity.
    Op(
      "q66_waiting_suppliers",
      (s, d) => {
        val fo = T.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val l = T.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(fo, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            when(col("l_shipdate") > date_add(col("o_orderdate"), 90), 1)
              .otherwise(0).as("late"))
        // r13 (guide §2.4 "window partitioned by the same key as a preceding
        // aggregation needs no second shuffle"): the r12 form persisted `l`
        // and consumed it twice — a per-order distinct-supplier aggregate
        // joined back to the late rows, i.e. TWO l_orderkey exchanges over
        // the fact plus a pinned cache with no post-action unpersist hook
        // (ADVICE r12). One window pass over a single l_orderkey exchange
        // computes the same per-order values on every row: size(collect_set)
        // ≡ countDistinct (both ignore the NULL the when() emits for on-time
        // rows), so the filtered row set — and therefore numwait — is
        // unchanged.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey")
        val waits = l
          .withColumn("nsupp", size(collect_set(col("l_suppkey")).over(w)))
          .withColumn("nlate", size(collect_set(
            when(col("late") === 1, col("l_suppkey"))).over(w)))
          .filter(col("late") === 1 && col("nsupp") >= 2 &&
            col("nlate") === 1)
          .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        waits
          .join(T.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("n_name"),
            col("numwait").cast(LongType).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH fo AS (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderstatus = 'F'),
        |l AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    CASE WHEN l.l_shipdate > fo.o_orderdate + INTERVAL 90 DAY
        |         THEN 1 ELSE 0 END AS late
        |  FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey),
        |per AS (
        |  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS nsupp,
        |    COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nlate
        |  FROM l GROUP BY 1),
        |q AS (
        |  SELECT l.l_suppkey, COUNT(*) AS waits
        |  FROM l JOIN per ON l.l_orderkey = per.l_orderkey
        |  WHERE l.late = 1 AND per.nsupp >= 2 AND per.nlate = 1
        |  GROUP BY 1)
        |SELECT s.s_name, n.n_name, CAST(q.waits AS BIGINT) AS numwait
        |FROM q JOIN supplier s ON s.s_suppkey = q.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q22 SHAPE — "global sales opportunity": rich customers (above
    // the positive-balance average within a selective nation set) with no
    // RECENT order (every fixture customer has ordered at least once, so
    // the cut is a date — "lapsed" rather than "never", same plan shape).
    // The canonical scalar-subquery + anti-join optimizer shape: the
    // average is ONE broadcast row (decimal-exact sum / count, Num.davg),
    // the lapsed test is a LEFT ANTI join against date-filtered orders on
    // the customer key — the o_orderdate predicate pushes to the orders
    // parquet scan, shrinking the anti build side before any exchange. At
    // 100 TB: shuffled anti join on o_custkey (or broadcast of the
    // distinct recent-custkey set if it fits), never a correlated
    // per-row probe; nation-set pruning pushes to the customer scan.
    Op(
      "q67_sales_opportunity",
      (s, d) => {
        val nations = Seq(1, 3, 5, 7, 9, 11, 13)
        val cutoff = "2001-04-01"
        val cust = T.customer(s, d)
          .filter(col("c_nationkey").isin(nations: _*))
        val avgBal = cust
          .filter(col("c_acctbal") > 0.0)
          .agg(Num.davg(col("c_acctbal")).as("avg_bal"))
        val recent = T.orders(s, d)
          .filter(col("o_orderdate") >= lit(cutoff).cast(DateType))
          .select(col("o_custkey"))
        cust
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal").cast(DoubleType) > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast(LongType).as("cntry"))
          .agg(count(lit(1)).as("numcust"),
            Num.dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("cntry")
      },
      Some(s"""WITH cust AS (
        |  SELECT * FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |ab AS (
        |  SELECT ${Num.sqlDavg("c_acctbal")} AS avg_bal
        |  FROM cust WHERE c_acctbal > 0),
        |rich AS (
        |  SELECT c.* FROM cust c, ab
        |  WHERE CAST(c.c_acctbal AS DOUBLE) > ab.avg_bal
        |    AND NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = c.c_custkey
        |                      AND o.o_orderdate >= DATE '2001-04-01'))
        |SELECT CAST(c_nationkey AS BIGINT) AS cntry,
        |  COUNT(*) AS numcust,
        |  ${Num.sqlDsum("c_acctbal")} AS totacctbal
        |FROM rich GROUP BY 1 ORDER BY cntry""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q13 SHAPE — customer order-count distribution: LEFT OUTER join
    // that must KEEP zero-order customers, then a double aggregation
    // (per-customer count → histogram of counts). The qualifying-order
    // predicate is applied to the orders side BEFORE the join so it pushes
    // to the parquet scan (equivalent to Q13's join-condition filter for a
    // left join). Scale shape: one shuffle joins customer⋈orders on
    // custkey; the first groupBy is on the SAME key, so the join output's
    // hash partitioning is reused with no second exchange; the histogram
    // aggregate sees O(distinct counts) rows. count(o_orderkey) counts
    // only matched (non-null) rows — the outer-join-count semantics the
    // shape exists to test.
    Op(
      "q68_custdist",
      (s, d) => {
        val qualifying = T.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 150000.0)
          .select(col("o_custkey"), col("o_orderkey"))
        T.customer(s, d).select(col("c_custkey"))
          .join(qualifying, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),
    // ------------------------------------------------------------------
    // TPC-H Q18 SHAPE — large-volume customers. The canonical
    // aggregate-reuse rewrite: instead of Q18's `o_orderkey IN (GROUP BY
    // HAVING)` subquery PLUS a re-aggregation of lineitem, the per-order
    // quantity rollup is computed ONCE (one lineitem shuffle on
    // l_orderkey, map-side partial agg), filtered to the rare heavy
    // orders, and joined back — the filtered side is tiny at any SF, so
    // AQE broadcasts it against orders and the enriched result against
    // customer (no forced hints; the sizes are runtime facts). Final
    // top-100 takes the TakeOrdered path, never a global sort.
    Op(
      "q69_large_volume",
      (s, d) => {
        val heavy = T.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(Num.dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 300.0)
        heavy
          .join(T.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  o_totalprice, total_qty
        |FROM (SELECT l_orderkey, ${Num.sqlDsum("l_quantity")} AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING ${Num.sqlDsum("l_quantity")} > 300) h
        |JOIN orders ON o_orderkey = h.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
  )
}
