package graft.operators

import graft.{Op, T}
import graft.Num._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational surface, part 2: pivot/unpivot, grouping sets, higher-order
  * array functions, range-band join, window frames, date/regexp function
  * families, and deterministic hash sampling. Same design rules as
  * [[Relational]] — declarative Catalyst plans, decimal-exact numerics,
  * broadcast hints where a side is provably small.
  */
object Relational2 {

  /** The batch funnel oracle, shared verbatim with st28 — the streaming
    * funnel's whole contract is "must equal this", so a single constant
    * keeps the two gates from silently diverging.
    */
  private[operators] def funnelOracleSql: String =
    """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND t > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t > t2 GROUP BY 1)
        |SELECT
        |  (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
        |  (SELECT COUNT(*) FROM s1) AS n_signup,
        |  (SELECT COUNT(*) FROM s2) AS n_signup_view,
        |  (SELECT COUNT(*) FROM s3) AS n_full_funnel,
        |  CAST(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
        |    / (SELECT COUNT(*) FROM s1) AS DOUBLE) AS conversion,
        |  (SELECT CAST(SUM(t3 - t1) AS BIGINT)
        |     FROM s3 JOIN s1 USING (user_id)) AS sum_convert_us,
        |  (SELECT CAST(MAX(t3 - t1) AS BIGINT)
        |     FROM s3 JOIN s1 USING (user_id)) AS max_convert_us""".stripMargin


  /** Collision-free fixture fingerprint for cached derived artifacts
    * (bucketed tables, compaction copies, the w09 Derby database): an md5
    * of the full path PLUS the (name, size, mtime) of every parquet file in
    * the fixture dir — so a REGENERATED fixture at the same path gets a
    * fresh tag and stale caches are never served (a path-only or hashCode
    * key would silently reuse them).
    */
  private[graft] def fixtureTag(d: String): String = {
    // Files.walk (not listFiles): a directory-per-table layout nests the
    // parquet parts one level down, and an empty fingerprint would silently
    // degrade to a path-only tag — the stale-cache bug this exists to stop.
    val root = java.nio.file.Paths.get(d)
    val files =
      if (!java.nio.file.Files.isDirectory(root)) Seq.empty
      else {
        val walk = java.nio.file.Files.walk(root, 2)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(p => p.getFileName.toString.endsWith(".parquet") &&
              java.nio.file.Files.isRegularFile(p))
            .map(p => (root.relativize(p).toString,
              java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis))
            .toSeq.sortBy(_._1)
        } finally walk.close()
      }
    require(files.nonEmpty,
      s"fixtureTag: no parquet files under $d — refusing a path-only tag " +
        "(it would serve stale cached artifacts for a regenerated fixture)")
    val sig = files.map { case (n, sz, mt) => s"$n:$sz:$mt" }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$sig".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  val ops: Seq[Op] = Seq(
    // ------------------------------------------------------------------
    // Pivot: order counts + revenue per priority, statuses as columns.
    // Spark's pivot is a regular aggregate with a known value set (no extra
    // pass); the oracle is the equivalent conditional aggregation.
    Op(
      "q28_pivot",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderpriority").as("priority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
          .select(col("priority"),
            col("F_n").as("f_n"), col("F_rev").as("f_rev"),
            col("O_n").as("o_n"), col("O_rev").as("o_rev"),
            col("P_n").as("p_n"), col("P_rev").as("p_rev"))
          .orderBy("priority"),
      Some(s"""SELECT o_orderpriority AS priority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS f_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS f_rev,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS o_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS o_rev,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS p_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS p_rev
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),
    // ------------------------------------------------------------------
    // Unpivot (stack): lineitem measure columns to (component, value) rows —
    // one scan, no shuffle beyond the final aggregate.
    Op(
      "q29_unpivot",
      (s, d) =>
        T.lineitem(s, d)
          .select(expr(
            """stack(4,
              |  'quantity', l_quantity,
              |  'extendedprice', l_extendedprice,
              |  'discount', l_discount,
              |  'tax', l_tax) AS (component, v)""".stripMargin))
          .groupBy("component")
          .agg(count(lit(1)).as("n"),
            sum(col("v").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
          .orderBy("component"),
      Some("""WITH u AS (
        |  SELECT 'quantity' AS component, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
        |SELECT component, COUNT(*) AS n,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM u GROUP BY component ORDER BY component""".stripMargin)),
    // ------------------------------------------------------------------
    // GROUPING SETS (finer than q22's full cube): (status, priority),
    // (status), () — exercised through Spark SQL over a temp view.
    Op(
      "q30_grouping_sets",
      (s, d) => {
        T.orders(s, d).createOrReplaceTempView("graft_orders_gs")
        s.sql(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
          |  COALESCE(o_orderpriority, 'ALL') AS priority,
          |  COUNT(1) AS n_orders,
          |  ${sqlDsum("o_totalprice")} AS revenue
          |FROM graft_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
          |ORDER BY status, priority""".stripMargin)
      },
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  ${sqlDsum("o_totalprice")} AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin)),
    // ------------------------------------------------------------------
    // Higher-order array functions over the embedding vectors: transform /
    // filter / aggregate (sequential index-order folds are bit-identical to
    // DuckDB's list_reduce — the leading 0.0+x is exact) / array_sort.
    Op(
      "q31_higher_order",
      (s, d) =>
        T.embeddings(s, d)
          .withColumn("el", expr("transform(embedding, x -> cast(x as double))"))
          .select(col("vec_id"),
            expr("aggregate(el, cast(0 as double), (a, x) -> a + x * x)").as("norm_sq"),
            expr("""CASE WHEN size(filter(el, x -> x > 0)) = 0 THEN cast(0 as double)
              |  ELSE aggregate(filter(el, x -> x > 0), cast(0 as double), (a, x) -> a + x) END"""
              .stripMargin).as("pos_sum"),
            expr("size(filter(el, x -> abs(x) > cast(0.2 as double)))")
              .cast(LongType).as("n_large"),
            expr("cast(element_at(array_sort(embedding), 1) as double)").as("sorted_first"),
            expr("aggregate(zip_with(el, el, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)")
              .as("self_dot"))
          .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS el, embedding FROM embeddings)
        |SELECT vec_id,
        |  list_reduce(list_transform(el, x -> x * x), (a, b) -> a + b) AS norm_sq,
        |  CASE WHEN len(list_filter(el, x -> x > 0)) = 0 THEN 0.0
        |       ELSE list_reduce(list_filter(el, x -> x > 0), (a, b) -> a + b) END AS pos_sum,
        |  CAST(len(list_filter(el, x -> abs(x) > 0.2)) AS BIGINT) AS n_large,
        |  CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first,
        |  list_reduce(list_transform(el, x -> x * x), (a, b) -> a + b) AS self_dot
        |FROM e ORDER BY vec_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Range/band join: orders matched to irregular literal price bands via
    // an inequality predicate. The band table is tiny and broadcast, so the
    // physical plan is a broadcast nested-loop probe — the right shape at any
    // fact-table scale (never shuffle the big side for a band lookup).
    Op(
      "q32_band_join",
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          (0L, 0.0, 50000.0), (1L, 50000.0, 120000.0), (2L, 120000.0, 210000.0),
          (3L, 210000.0, 330000.0), (4L, 330000.0, 600000.0))
          .toDF("band", "lo", "hi")
        T.orders(s, d)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"),
            min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"))
          .orderBy("band")
      },
      Some(s"""SELECT band, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS revenue,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders JOIN (VALUES
        |    (CAST(0 AS BIGINT), 0.0, 50000.0), (1, 50000.0, 120000.0),
        |    (2, 120000.0, 210000.0), (3, 210000.0, 330000.0),
        |    (4, 330000.0, 600000.0)) b(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin)),
    // ------------------------------------------------------------------
    // Window frame families: numeric RANGE frame, ntile, percent_rank,
    // cume_dist (total order within each partition makes ranks deterministic).
    Op(
      "q33_window_frames",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
        val wr = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
          .rangeBetween(-1000L, Window.currentRow)
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            sum(dec2(col("o_totalprice"))).over(wr).cast(DoubleType).as("range_sum"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_orderstatus ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)),
    // ------------------------------------------------------------------
    // Date/time function family (dayofweek aligned: Spark is 1=Sunday,
    // DuckDB 0=Sunday).
    Op(
      "q34_date_funcs",
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("y"),
            quarter(col("o_orderdate")).cast(LongType).as("q"),
            month(col("o_orderdate")).cast(LongType).as("m"),
            weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"),
            (dayofweek(col("o_orderdate")) - 1).cast(LongType).as("dow0"),
            dayofyear(col("o_orderdate")).cast(LongType).as("doy"),
            last_day(col("o_orderdate")).cast(DateType).as("month_end"),
            date_trunc("quarter", col("o_orderdate")).cast(DateType).as("q_start"),
            datediff(lit("2000-01-01").cast(DateType), col("o_orderdate").cast(DateType))
              .cast(LongType).as("days_to_2000"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_2000
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    // ------------------------------------------------------------------
    // Regexp function family over document text (ASCII-safe patterns keep
    // Java regex and RE2 semantics identical).
    Op(
      "q35_regexp",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
            regexp_count(col("text"), lit("[0-9]+")).cast(LongType).as("n_numbers"),
            length(regexp_replace(col("text"), "[aeiou]", "")).cast(LongType)
              .as("len_novowels"),
            col("text").rlike("data").as("mentions_data"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
        |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS len_novowels,
        |  regexp_matches(text, 'data') AS mentions_data
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Deterministic hash sampling (the scale-safe way to sample: a pure
    // function of the key, no RNG state, stable across retries/partitions):
    // keep ~1/8 of documents by md5 prefix.
    Op(
      "q36_hash_sample",
      (s, d) =>
        T.documents(s, d)
          .filter(substring(md5(col("doc_id").cast(StringType)), 1, 2) < "20")
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        |GROUP BY lang ORDER BY lang""".stripMargin)),
    // ------------------------------------------------------------------
    // Multi-CTE SQL surface: chained WITH clauses (per-nation revenue and
    // return rate joined against the national average) — the full SQL-string
    // entry path through Spark's parser/Catalyst, same plan quality as the
    // DataFrame API.
    Op(
      "q38_cte_chain",
      (s, d) => {
        T.lineitem(s, d).createOrReplaceTempView("graft_li_cte")
        T.supplier(s, d).createOrReplaceTempView("graft_su_cte")
        T.nation(s, d).createOrReplaceTempView("graft_na_cte")
        s.sql(s"""WITH rev AS (
          |  SELECT s_nationkey, ${sqlDsum("l_extendedprice")} AS revenue,
          |    COUNT(1) AS n_items,
          |    COUNT(1) FILTER (WHERE l_returnflag = 'R') AS n_returned
          |  FROM graft_li_cte JOIN graft_su_cte ON l_suppkey = s_suppkey
          |  GROUP BY s_nationkey),
          |avgrev AS (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_revenue FROM rev)
          |SELECT n_name,
          |  revenue,
          |  CAST(n_returned AS DOUBLE) / n_items AS return_rate,
          |  revenue > avg_revenue AS above_avg
          |FROM rev JOIN graft_na_cte ON s_nationkey = n_nationkey
          |CROSS JOIN avgrev
          |ORDER BY n_name""".stripMargin)
      },
      Some(s"""WITH rev AS (
        |  SELECT s_nationkey, ${sqlDsum("l_extendedprice")} AS revenue,
        |    COUNT(*) AS n_items,
        |    COUNT(*) FILTER (l_returnflag = 'R') AS n_returned
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey),
        |avgrev AS (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_revenue FROM rev)
        |SELECT n_name, revenue,
        |  CAST(n_returned AS DOUBLE) / n_items AS return_rate,
        |  revenue > avg_revenue AS above_avg
        |FROM rev JOIN nation ON s_nationkey = n_nationkey
        |CROSS JOIN avgrev
        |ORDER BY n_name""".stripMargin)),
    // ------------------------------------------------------------------
    // Funnel analysis over the event stream: per user, the earliest
    // view -> click -> purchase progression (each stage strictly after the
    // previous), plus corpus-level conversion counts. One conditional
    // aggregation per user — no self-joins, no explosion; at any scale this
    // is a single shuffle on user_id.
    Op(
      "q39_funnel",
      (s, d) => {
        val ev = T.events(s, d)
        val perUser = ev.groupBy("user_id").agg(
          min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"))
        val withClick = ev.join(perUser, "user_id")
          .groupBy(col("user_id"), col("t_view"))
          .agg(min(when(col("event_type") === "click" &&
            unix_micros(col("ts")) > col("t_view"), unix_micros(col("ts")))).as("t_click"))
        val withBuy = ev.join(withClick, "user_id")
          .groupBy(col("user_id"), col("t_view"), col("t_click"))
          .agg(min(when(col("event_type") === "purchase" &&
            unix_micros(col("ts")) > col("t_click"), unix_micros(col("ts")))).as("t_buy"))
        withBuy.agg(
          count(lit(1)).as("n_users"),
          count(col("t_view")).as("n_viewed"),
          count(col("t_click")).as("n_clicked_after_view"),
          count(col("t_buy")).as("n_purchased_after_click"))
      },
      Some("""WITH v AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, v.t_view,
        |    MIN(CASE WHEN event_type = 'click' AND epoch_us(CAST(ts AS TIMESTAMP)) > v.t_view
        |        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_click
        |  FROM events e JOIN v USING (user_id) GROUP BY e.user_id, v.t_view),
        |b AS (
        |  SELECT e.user_id, c.t_view, c.t_click,
        |    MIN(CASE WHEN event_type = 'purchase' AND epoch_us(CAST(ts AS TIMESTAMP)) > c.t_click
        |        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_buy
        |  FROM events e JOIN c USING (user_id) GROUP BY e.user_id, c.t_view, c.t_click)
        |SELECT COUNT(*) AS n_users, COUNT(t_view) AS n_viewed,
        |  COUNT(t_click) AS n_clicked_after_view,
        |  COUNT(t_buy) AS n_purchased_after_click
        |FROM b""".stripMargin)),
    // ------------------------------------------------------------------
    // Cohort retention: users grouped by signup week, activity counted per
    // (cohort, weeks-since-signup) cell. Two user_id-keyed aggregations and
    // one broadcastable join of per-user cohorts back onto activity — the
    // standard retention matrix with no row explosion. All-integer outputs.
    Op(
      "q40_cohort_retention",
      (s, d) => {
        val ev = T.events(s, d)
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast(DateType).as("cohort_week"))
        val activity = ev
          .select(col("user_id"), date_trunc("week", col("ts")).cast(DateType).as("week"))
          .distinct()
        activity.join(cohort, "user_id")
          .filter(col("week") >= col("cohort_week"))
          .groupBy(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7).cast(LongType).as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_week", "weeks_since")
      },
      Some("""WITH cohort AS (
        |  SELECT user_id, CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |  FROM events)
        |SELECT cohort_week,
        |  CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS weeks_since,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM activity JOIN cohort USING (user_id)
        |WHERE week >= cohort_week
        |GROUP BY 1, 2 ORDER BY cohort_week, weeks_since""".stripMargin)),
    // ------------------------------------------------------------------
    // Keep-latest-per-key: the workhorse of incremental ingestion (CDC
    // compaction, snapshot-over-append). row_number over (key, recency) lets
    // Spark's WindowGroupLimit prune per partition before the shuffle
    // completes — never a full sort of the history.
    Op(
      "q41_latest_per_key",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
            col("o_orderdate").cast(DateType).as("latest_date"),
            col("o_totalprice").as("latest_price"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey AS latest_order,
        |  CAST(o_orderdate AS DATE) AS latest_date,
        |  o_totalprice AS latest_price
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),
    // ------------------------------------------------------------------
    // Approximate sketches — the constant-memory substitutes for exact
    // distinct/quantiles at 100 TB: HyperLogLog++ (approx_count_distinct,
    // one pass, mergeable partials) and Greenwald-Khanna quantile sketches
    // (approx_percentile). Sketch estimates are engine-specific, so the hash
    // gate checks their ERROR-BOUND INVARIANTS as booleans the oracle can
    // reproduce (the q42/t10 pattern): HLL++ estimate within 3x its
    // configured 5% rsd of the exact distinct count (rsd is a standard
    // deviation, not a bound — a 1-sigma gate would flip on ~1/3 of new
    // fixtures; 3 sigma is the stable invariant, and OperatorSuite keeps a
    // non-gating 1-sigma expectation on the shipped fixtures), and each GK
    // percentile landing
    // between the exact 45th/55th (resp. 98.5th/99.5th) percentile values —
    // a bound orders of magnitude looser than GK's 1/10000 rank guarantee,
    // so any sketch regression flips a boolean and the hash mismatches.
    // Exact counts ride along as real hash-checked columns.
    Op(
      "q37_approx_sketches",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            expr("approx_percentile(l_extendedprice, 0.5)").as("approx_p50"),
            expr("approx_percentile(l_extendedprice, 0.99)").as("approx_p99"),
            expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.45)").as("lo50"),
            expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.55)").as("hi50"),
            expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.985)").as("lo99"),
            expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.995)").as("hi99"),
            count(lit(1)).as("n"))
          .select(
            col("l_returnflag"),
            (abs(col("approx_parts") - col("exact_parts")).cast(DoubleType) /
              col("exact_parts") <= 0.15).as("approx_within_rsd"),
            (col("approx_p50").cast(DoubleType).between(col("lo50"), col("hi50")))
              .as("p50_within_gk_bound"),
            (col("approx_p99").cast(DoubleType).between(col("lo99"), col("hi99")))
              .as("p99_within_gk_bound"),
            col("exact_parts"),
            col("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, true AS approx_within_rsd,
        |  true AS p50_within_gk_bound, true AS p99_within_gk_bound,
        |  COUNT(DISTINCT l_partkey) AS exact_parts, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // Sketch mergeability — the property that makes constant-memory
    // distinct-counting work at 100 TB: DataSketches HLL partials union to a
    // result that depends only on the DATA, not on how it was sharded
    // (map-side partials, cross-day rollups, incremental ingestion all rely
    // on it). Note the honest contract: the union result is shard-LAYOUT
    // independent, but a union of sparse partials and a single-pass sketch
    // may sit in different internal modes, so their estimates can differ
    // within the error bound — the invariant is layout independence +
    // bounded error, not bit-equality with single-pass. The query asserts
    // both engine-side as booleans, so the oracle hash-checks them: any
    // divergence flips a boolean and the hash mismatches.
    Op(
      "q42_sketch_merge",
      (s, d) => {
        val li = T.lineitem(s, d)
        def mergedEst(shards: Int) = li
          .groupBy((col("l_orderkey") % shards).as("shard"))
          .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val m8 = mergedEst(8).select(col("est").as("est8"))
        val m16 = mergedEst(16).select(col("est").as("est16"))
        val single = li.agg(
          hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("single_est"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        m8.crossJoin(m16).crossJoin(single)
          .select(
            (col("est8") === col("est16")).as("merge_layout_independent"),
            (abs(col("est8") - col("exact_parts")).cast(DoubleType) /
              col("exact_parts") < 0.05).as("merged_within_5pct"),
            (abs(col("single_est") - col("exact_parts")).cast(DoubleType) /
              col("exact_parts") < 0.05).as("single_within_5pct"),
            col("exact_parts"))
      },
      Some("""SELECT true AS merge_layout_independent,
        |  true AS merged_within_5pct, true AS single_within_5pct,
        |  COUNT(DISTINCT l_partkey) AS exact_parts
        |FROM lineitem""".stripMargin)),
    // ------------------------------------------------------------------
    // Stratified deterministic sampling — the training-data-pipeline form of
    // q36: per-stratum keep rates (downsample the over-represented 'en'
    // stratum less aggressively than the tail) as pure functions of the key,
    // so the sample is stable across retries, partitions and engines; no RNG
    // state to coordinate at 1000 executors.
    Op(
      "q43_stratified_sample",
      (s, d) =>
        T.documents(s, d)
          .withColumn("bucket", substring(md5(col("doc_id").cast(StringType)), 1, 2))
          .filter(when(col("lang") === "en", col("bucket") < "40")
            .otherwise(col("bucket") < "10"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CASE WHEN lang = 'en'
        |  THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10' END
        |GROUP BY lang ORDER BY lang""".stripMargin)),
    // ------------------------------------------------------------------
    // Bucketed-table co-located join — the storage layout that removes the
    // join shuffle entirely at 100 TB: both fact tables written bucketBy
    // the join key, so the sort-merge join reads co-located buckets and the
    // only exchange left is the final aggregation's (the no-shuffle plan is
    // asserted by `bucketed tables join co-located` in PipelineSparkSuite;
    // here the RESULT is oracle-gated through the same layout).
    Op(
      "q44_bucketed_join",
      (s, d) => {
        val tag = Relational2.fixtureTag(d)
        val (to, tl) = (s"graft_bo_$tag", s"graft_bl_$tag")
        // the bucketed layout is a one-time investment (OPTIMIZE-style
        // maintenance, not query cost): build it once per fixture dir,
        // reuse on every subsequent run against the same data
        if (!s.catalog.tableExists(to))
          T.orders(s, d).write
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
        if (!s.catalog.tableExists(tl))
          T.lineitem(s, d).write
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
        s.table(tl)
          .join(s.table(to), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_items,
        |  ${sqlDsum("l_extendedprice")} AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),
    // ------------------------------------------------------------------
    // Range-clustered data layout (the OPTIMIZE/CLUSTER BY maintenance op
    // for 100 TB scan efficiency): lineitem rewritten repartitionByRange on
    // l_shipdate + sorted within partitions, so every file covers a
    // disjoint time slice and a time-range query prunes at BOTH the file
    // level (min/max footer vs pushed filter) and the row-group level
    // (sorted pages). Like q44's bucketing, the rewrite is a one-time
    // investment keyed by fixture dir, not query cost. The gate is
    // twofold: the layout invariant (per-file [min,max] shipdate ranges
    // are pairwise disjoint, file count bounded by the partition count) as
    // booleans the oracle expects true, and the RESULT of a range query
    // over the clustered copy, which must equal the same aggregate over
    // the raw table.
    Op(
      "q46_range_layout",
      (s, d) => {
        val tag = Relational2.fixtureTag(d)
        val path = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), s"graft_rl_$tag"),
          "lineitem").toString
        if (!new java.io.File(path, "_SUCCESS").exists)
          T.lineitem(s, d)
            .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
            .repartitionByRange(8, col("l_shipdate"))
            .sortWithinPartitions("l_shipdate", "l_orderkey")
            .write.mode("overwrite").parquet(path)
        val cl = s.read.parquet(path)
        // layout proof: ≤8 files (one per range partition), ranges disjoint
        // in shipdate order (tiny per-file aggregate — ≤8 rows — so the
        // single-partition window is free)
        val files = cl.groupBy(input_file_name().as("f"))
          .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
        val w = Window.orderBy("lo")
        val layout = files
          .withColumn("prev_hi", lag("hi", 1).over(w))
          .agg(
            (count(lit(1)).between(1L, 8L)).as("bounded_files"),
            (sum(when(col("prev_hi").isNull || col("prev_hi") <= col("lo"), 0L)
              .otherwise(1L)) === 0L).as("files_disjoint"))
          .select("bounded_files", "files_disjoint")
        cl.filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1996-01-01").cast(TimestampType))
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
          .agg(
            sum(dec2(col("l_extendedprice")) *
              (one - rate(col("l_discount")))).cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .crossJoin(layout)
          .orderBy("month")
      },
      Some("""SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |    AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items,
        |  true AS bounded_files, true AS files_disjoint
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1 ORDER BY month""".stripMargin)),
    // ------------------------------------------------------------------
    // Small-file compaction (the other standing maintenance op besides
    // q44's bucketing and q46's clustering): streaming ingest leaves many
    // tiny files; a 100 TB table read pays per-file open/footer cost, so
    // periodic compaction rewrites them into few large files. The gate
    // proves the rewrite is lossless (row count + decimal-exact value sum +
    // an order-independent content checksum all equal the fixture) and
    // that the layout actually changed (≥16 files before, ≤4 after —
    // engine-observed booleans the oracle expects true).
    Op(
      "q48_compaction",
      (s, d) => {
        val tag = Relational2.fixtureTag(d)
        val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft_cp_$tag")
        val smallDir = new java.io.File(base, "small").toString
        val bigDir = new java.io.File(base, "compact").toString
        val ev = T.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        if (!new java.io.File(smallDir, "_SUCCESS").exists)
          ev.repartition(32).write.mode("overwrite").parquet(smallDir)
        if (!new java.io.File(bigDir, "_SUCCESS").exists)
          s.read.parquet(smallDir).repartition(4)
            .write.mode("overwrite").parquet(bigDir)
        def stats(dir: String) = s.read.parquet(dir)
          // materialize the file name first: input_file_name() may not
          // appear directly inside an aggregate argument
          .withColumn("f", input_file_name()).agg(
          count(lit(1)).as("n_rows"),
          dsum(col("value")).as("sum_value"),
          sum(expr(
            "cast(conv(substring(md5(CAST(CAST(event_id AS STRING) AS BINARY)), 1, 8), 16, 10) as bigint)"))
            .as("content_sum"),
          countDistinct(col("f")).as("n_files"))
        val a = stats(smallDir).select(col("n_rows"), col("sum_value"),
          col("content_sum"), col("n_files").as("files_before"))
        val b = stats(bigDir).select(col("n_rows").as("nb"),
          col("sum_value").as("sb"), col("content_sum").as("cb"),
          col("n_files").as("files_after"))
        a.crossJoin(b).select(
          col("n_rows"), col("sum_value"),
          (col("n_rows") === col("nb") && col("sum_value") === col("sb") &&
            col("content_sum") === col("cb")).as("contents_equal"),
          (col("files_before") >= 16L).as("was_fragmented"),
          (col("files_after") <= 4L).as("is_compacted"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  true AS contents_equal, true AS was_fragmented, true AS is_compacted
        |FROM events""".stripMargin)),
    // ------------------------------------------------------------------
    // Incremental view maintenance with EXACT mergeable partials (the
    // non-sketch counterpart of q42): the corpus arrives in two batches
    // split at a date boundary; each batch's per-group partial aggregate
    // is computed separately and the partials are MERGED — never
    // recomputing batch 1. The merge is exact because the intermediate
    // stays DECIMAL (order-independent addition) until the final cast;
    // the hash gate is full equality with the direct aggregate over all
    // data, so a wrong merge (double-counting, dropped batch, premature
    // double rounding) mismatches. At 100 TB this is the nightly-refresh
    // pattern: O(new batch) per refresh, not O(history).
    Op(
      "q49_incremental_agg",
      (s, d) => {
        val ev = T.events(s, d)
        val cut = lit("1995-07-01").cast(TimestampType)
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("event_type").agg(
            count(lit(1)).as("pn"), sum(dec2(col("value"))).as("sv"))
        partial(ev.filter(col("ts") < cut))
          .unionByName(partial(ev.filter(col("ts") >= cut)))
          .groupBy("event_type")
          .agg(sum("pn").as("n"), sum("sv").cast(DoubleType).as("sum_value"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
        |  ${sqlDsum("value")} AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    // ------------------------------------------------------------------
    // Data-quality expectations (the dq/constraint-check pass every
    // pipeline runs before trusting a batch): PK uniqueness, FK orphan
    // counts, null and empty-value audits — each as one row with the
    // observed violation count and its verdict. Every observation is a
    // plain aggregate (exactly oracle-derivable — no engine state), so the
    // whole report hash-gates. Each check is one scan or one anti-join;
    // at 100 TB the checks share scans when composed and none requires a
    // global sort.
    Op(
      "q50_dq_expectations",
      (s, d) => {
        import s.implicits._
        val orders = T.orders(s, d)
        val li = T.lineitem(s, d)
        val pkDup = orders.agg(
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v"))
          .head().getLong(0)
        val orphans = li.join(orders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti").count()
        val custNull = T.customer(s, d)
          .filter(col("c_name").isNull).count()
        val evNullTs = T.events(s, d).filter(col("ts").isNull).count()
        val emptyDocs = T.documents(s, d).filter(col("n_chars") <= 0).count()
        Seq(
          ("customer_name_nulls", custNull),
          ("documents_empty", emptyDocs),
          ("events_ts_nulls", evNullTs),
          ("lineitem_fk_orphans", orphans),
          ("orders_pk_duplicates", pkDup))
          .toDF("check", "violations")
          .withColumn("passed", col("violations") === 0L)
          .orderBy("check")
      },
      Some("""WITH checks AS (
        |  SELECT 'customer_name_nulls' AS chk,
        |    (SELECT COUNT(*) FROM customer WHERE c_name IS NULL) AS violations
        |  UNION ALL SELECT 'documents_empty',
        |    (SELECT COUNT(*) FROM documents WHERE n_chars <= 0)
        |  UNION ALL SELECT 'events_ts_nulls',
        |    (SELECT COUNT(*) FROM events WHERE ts IS NULL)
        |  UNION ALL SELECT 'lineitem_fk_orphans',
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'orders_pk_duplicates',
        |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders))
        |SELECT chk AS "check", CAST(violations AS BIGINT) AS violations,
        |  violations = 0 AS passed
        |FROM checks ORDER BY chk""".stripMargin)),
    // ------------------------------------------------------------------
    // Per-group z-score outlier detection (the numeric data-quality screen
    // before training on a metric column): mean/variance are computed from
    // EXACT integer moments — values are 2-decimal money-like doubles, so
    // v100 = value*100 as BIGINT is exact, and sum/sum-of-squares over
    // BIGINT are order-independent. Both engines then evaluate the SAME
    // double expression tree on those integers, so the flagged counts and
    // extreme z-scores hash-match bit-for-bit. One scan + one keyed agg +
    // one broadcast-back join — no sort, scales as a pure pass.
    Op(
      "q51_outlier_zscore",
      (s, d) => {
        val ev = T.events(s, d)
          .withColumn("v100", (dec2(col("value")) * 100).cast(LongType))
        val m = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("v100").as("s1"),
          sum(col("v100") * col("v100")).as("s2"))
          .withColumn("mean",
            (col("s1").cast(DoubleType) / col("n")).cast(DoubleType))
          .withColumn("variance",
            (col("s2").cast(DoubleType) / col("n") -
              col("mean") * col("mean")).cast(DoubleType))
        ev.join(broadcast(m), "event_type")
          .withColumn("z",
            (col("v100").cast(DoubleType) - col("mean")) /
              sqrt(col("variance")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_outliers"),
            max(abs(col("z"))).as("max_abs_z"))
          .orderBy("event_type")
      },
      Some("""WITH v AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100
        |  FROM events),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(v100) AS s1, SUM(v100 * v100) AS s2
        |  FROM v GROUP BY event_type),
        |mm AS (
        |  SELECT event_type, n,
        |    CAST(CAST(s1 AS DOUBLE) / n AS DOUBLE) AS mean,
        |    CAST(CAST(s2 AS DOUBLE) / n -
        |      (CAST(CAST(s1 AS DOUBLE) / n AS DOUBLE) *
        |       CAST(CAST(s1 AS DOUBLE) / n AS DOUBLE)) AS DOUBLE) AS variance
        |  FROM m)
        |SELECT v.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN abs((CAST(v100 AS DOUBLE) - mean) / sqrt(variance)) > 3.0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  MAX(abs((CAST(v100 AS DOUBLE) - mean) / sqrt(variance))) AS max_abs_z
        |FROM v JOIN mm ON v.event_type = mm.event_type
        |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin)),
    // ------------------------------------------------------------------
    // Deterministic weight-biased sampling (the corpus-subset selection
    // step when you want long documents favored without an RNG): priority
    // = md5-hash(doc_id) / n_chars — a heavier doc gets a smaller expected
    // priority, and the k smallest priorities win. Like q36/q43 the sample
    // is a pure function of the key, so it is identical under any
    // partitioning, any retry, any engine — and the top-k is a TakeOrdered
    // (no global sort materialization). The division of two exact integers
    // is the same double in both engines, so even the priorities
    // hash-match.
    Op(
      "q52_weighted_sample",
      (s, d) =>
        T.documents(s, d)
          .withColumn("h", expr(
            "CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"))
          .withColumn("prio",
            (col("h").cast(DoubleType) / col("n_chars")).cast(DoubleType))
          .orderBy(col("prio"), col("doc_id"))
          .limit(20)
          .select(col("doc_id"), col("n_chars"), col("prio")),
      Some("""SELECT doc_id, n_chars,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    AS DOUBLE) / n_chars AS DOUBLE) AS prio
        |FROM documents
        |ORDER BY prio, doc_id LIMIT 20""".stripMargin)),
    // ------------------------------------------------------------------
    // Runtime-filter join pruning: build a Bloom filter over the selected
    // dimension keys, broadcast it, and pre-filter the fact scan BEFORE the
    // join — the pattern that turns a 100 TB shuffle join into a scan that
    // discards non-candidates at the source (Spark's own
    // InjectRuntimeFilter does this with BloomFilterAggregate; this op
    // makes the mechanism explicit and oracle-checkable). The bitset
    // (m=4096 bits, k=3 md5-derived hashes) is built DISTRIBUTEDLY: each
    // selected key explodes to its k bit positions, a 64-row bit_or
    // aggregation ORs map-side partial words, and only the constant-size
    // 64-word bitset is collected — never O(dim) rows. The fact-side
    // membership test is pure built-in codegen (element_at + shiftleft on
    // an array literal); false positives are verified against the exact
    // semi-join, and no-false-negatives is a hash-gated invariant.
    Op(
      "q53_bloom_semijoin",
      (s, d) => {
        val m = 4096
        def pos(key: String, seed: Int): String =
          s"(CAST(conv(substring(md5(CAST(concat(CAST($key AS STRING), ':$seed') AS BINARY)), 1, 8), 16, 10) AS BIGINT) % $m)"
        val sel = T.part(s, d).filter(col("p_size") >= 40).select(col("p_partkey"))
        val words = sel
          .select(explode(array((0 until 3).map(k =>
            expr(pos("p_partkey", k))): _*)).as("pos"))
          .groupBy(expr("CAST(pos DIV 64 AS INT)").as("w"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").as("bits"))
          .collect()
        val bitset = Array.fill(m / 64)(0L)
        words.foreach(r => bitset(r.getInt(0)) = r.getLong(1))
        def test(seed: Int): String = {
          val p = pos("l_partkey", seed)
          s"(element_at(__bloom, CAST($p DIV 64 AS INT) + 1) & shiftleft(CAST(1 AS BIGINT), CAST($p % 64 AS INT))) != 0"
        }
        T.lineitem(s, d)
          .withColumn("__bloom", lit(bitset))
          .withColumn("bloom_pass",
            expr(test(0)) && expr(test(1)) && expr(test(2)))
          .join(sel.withColumn("in_sel", lit(true)),
            col("l_partkey") === col("p_partkey"), "left")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_candidates"),
            sum(when(col("in_sel").isNotNull, 1L).otherwise(0L)).as("n_exact"),
            sum(when(col("bloom_pass") && col("in_sel").isNull, 1L).otherwise(0L))
              .as("n_false_pos"),
            (sum(when(col("in_sel").isNotNull && !col("bloom_pass"), 1L)
              .otherwise(0L)) === 0L).as("no_false_negatives"))
          .crossJoin(broadcast(sel.agg(count(lit(1)).as("n_selected"))))
          .select(col("n_selected"), col("n_rows"), col("n_candidates"),
            col("n_exact"), col("n_false_pos"), col("no_false_negatives"))
      },
      Some("""WITH sel AS (SELECT p_partkey FROM part WHERE p_size >= 40),
        |seeds AS (SELECT * FROM (VALUES (0),(1),(2)) s(seed)),
        |pos AS (
        |  SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || ':' ||
        |      CAST(seed AS VARCHAR)), 1, 8))::BIGINT % 4096 AS pos
        |  FROM sel, seeds),
        |k AS (
        |  SELECT l_partkey,
        |    (SELECT COUNT(*) FROM seeds
        |     WHERE ('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || ':' ||
        |       CAST(seed AS VARCHAR)), 1, 8))::BIGINT % 4096
        |       IN (SELECT pos FROM pos)) = 3 AS bloom_pass,
        |    l_partkey IN (SELECT p_partkey FROM sel) AS in_sel
        |  FROM lineitem)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sel) AS n_selected,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_candidates,
        |  CAST(SUM(CASE WHEN in_sel THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN bloom_pass AND NOT in_sel THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_false_pos,
        |  (SUM(CASE WHEN in_sel AND NOT bloom_pass THEN 1 ELSE 0 END) = 0)
        |    AS no_false_negatives
        |FROM k""".stripMargin)),
    // ------------------------------------------------------------------
    // Z-ORDER (Morton) layout — q46's multi-dimensional sibling: q46's
    // range clustering prunes on ONE column; interleaving the bits of two
    // bucketized keys gives every file a tight min/max range on BOTH
    // columns, so a box predicate (orderkey range AND partkey range)
    // prunes files on either dimension — the Delta/Iceberg OPTIMIZE ZORDER
    // trick, done with nothing but integer arithmetic in the sort key.
    // Gates: the box aggregate from the z-ordered copy hash-matches the
    // raw-table oracle (losslessness), the layout lands in the planned
    // file count, and the per-file stats prune at least half the files
    // for the box (gate >= 8 of 16; holds at sf0.001/0.01/0.1).
    Op(
      "q55_zorder_layout",
      (s, d) => {
        val tag = Relational2.fixtureTag(d)
        val path = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), s"graft_zo_$tag"),
          "lineitem").toString
        val bounds = T.lineitem(s, d)
          .agg(max("l_orderkey"), max("l_partkey")).head()
        val (maxOk, maxPk) = (bounds.getLong(0), bounds.getLong(1))
        // 10-bit buckets per dimension; morton interleaves them
        val bo = s"CAST(l_orderkey * 1024 DIV ${maxOk + 1} AS BIGINT)"
        val bp = s"CAST(l_partkey * 1024 DIV ${maxPk + 1} AS BIGINT)"
        val morton = (0 until 10).map(i =>
          s"(shiftleft(($bo >> $i) & 1, ${2 * i}) + " +
            s"shiftleft(($bp >> $i) & 1, ${2 * i + 1}))").mkString(" + ")
        if (!new java.io.File(path, "_SUCCESS").exists)
          T.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
              expr(morton).as("z"))
            .repartitionByRange(16, col("z"))
            .sortWithinPartitions("z")
            .drop("z")
            .write.mode("overwrite").parquet(path)
        val zl = s.read.parquet(path)
        // deterministic mid-range box on both dimensions
        val (lo1, hi1) = ((maxOk + 1) / 4, (maxOk + 1) * 2 / 5)
        val (lo2, hi2) = ((maxPk + 1) / 4, (maxPk + 1) * 2 / 5)
        val layout = zl.groupBy(input_file_name().as("f"))
          .agg(min("l_orderkey").as("olo"), max("l_orderkey").as("ohi"),
            min("l_partkey").as("plo"), max("l_partkey").as("phi"))
          .agg(
            (count(lit(1)) === 16L).as("files_as_planned"),
            (sum(when(col("ohi") < lo1 || col("olo") > hi1 ||
              col("phi") < lo2 || col("plo") > hi2, 1L).otherwise(0L)) >= 8L)
              .as("zorder_prunes_most"))
        zl.filter(col("l_orderkey") >= lo1 && col("l_orderkey") <= hi1 &&
            col("l_partkey") >= lo2 && col("l_partkey") <= hi2)
          .agg(count(lit(1)).as("n_rows_box"),
            dsum(col("l_quantity")).as("sum_qty_box"))
          .crossJoin(layout)
          .select(col("n_rows_box"), col("sum_qty_box"),
            col("files_as_planned"), col("zorder_prunes_most"))
      },
      Some(s"""WITH b AS (SELECT MAX(l_orderkey) AS mo, MAX(l_partkey) AS mp
        |  FROM lineitem)
        |SELECT COUNT(*) AS n_rows_box, ${sqlDsum("l_quantity")} AS sum_qty_box,
        |  true AS files_as_planned, true AS zorder_prunes_most
        |FROM lineitem, b
        |WHERE l_orderkey >= (mo + 1) // 4 AND l_orderkey <= (mo + 1) * 2 // 5
        |  AND l_partkey >= (mp + 1) // 4 AND l_partkey <= (mp + 1) * 2 // 5"""
        .stripMargin)),
    // ------------------------------------------------------------------
    // Mergeable quantile sketches — the quantile counterpart of q42's HLL
    // mergeability: percentile_approx (Greenwald–Khanna summaries) carries a
    // HARD rank-error guarantee eps = 1/accuracy (not probabilistic like
    // HLL's rsd), so the gate checks the guarantee itself: the true rank of
    // each approximate percentile lies within eps of the target rank.
    // Constant memory per group at any scale; partials merge map-side. The
    // approximate VALUE may vary with partitioning (GK merges are
    // layout-dependent), but the emitted columns — counts and the
    // guarantee booleans — are layout-independent, which is exactly why
    // the gate checks the guarantee and not the value. The projection is
    // persisted: both the sketch pass and the rank-audit pass read it.
    Op(
      "q54_quantile_sketch",
      (s, d) => {
        val li = T.lineitem(s, d)
          .select(col("l_returnflag"), dec2(col("l_extendedprice"))
            .cast(DoubleType).as("v"))
          .persist()
        val eps = 0.01 // accuracy=100 => guaranteed rank error <= 1%
        val approx = li.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          percentile_approx(col("v"), lit(0.5), lit(100)).as("a50"),
          percentile_approx(col("v"), lit(0.9), lit(100)).as("a90"))
        // true rank interval of each approximate value, from one extra
        // pass; tie-safe: [count(v < a), count(v <= a)] must overlap the
        // target band [p - eps, p + eps]
        def rk(a: String, strict: Boolean): Column =
          (sum(when(if (strict) col("v") < col(a) else col("v") <= col(a),
            1L).otherwise(0L)).cast(DoubleType) / count(lit(1)))
        val ranks = li.join(broadcast(approx), "l_returnflag")
          .groupBy("l_returnflag").agg(
            rk("a50", strict = true).as("r50lo"),
            rk("a50", strict = false).as("r50hi"),
            rk("a90", strict = true).as("r90lo"),
            rk("a90", strict = false).as("r90hi"))
        approx.join(ranks, "l_returnflag")
          .select(col("l_returnflag"), col("n"),
            (col("r50lo") <= 0.5 + eps && col("r50hi") >= 0.5 - eps)
              .as("p50_within_eps"),
            (col("r90lo") <= 0.9 + eps && col("r90hi") >= 0.9 - eps)
              .as("p90_within_eps"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        |  true AS p50_within_eps, true AS p90_within_eps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // SCD Type-2 dimension MERGE — the warehouse upsert every nightly
    // dimension load runs (MERGE INTO with history retention). The change
    // batch is derived deterministically from the base dimension (keys
    // ending %7==3 get a +100.00 balance update; %97==5 spawn a brand-new
    // key offset by 1e6), then applied with the canonical FULL-OUTER-join
    // classification: matched rows close their old version (is_current
    // false) and open version 2 with the new balance; unmatched base rows
    // stay version-1 current; not-matched-by-source rows insert as
    // version-1 current. Decimal-exact balances keep the hash bit-stable.
    // Scale shape: ONE shuffle join on the dimension key (the update
    // batch broadcasts when small, AQE decides), plus a unionByName of
    // three narrow projections — no window, no global sort except the
    // presentation ORDER BY; at a 10^9-row dimension this is the same
    // single-join plan Delta/Iceberg MERGE compiles to.
    Op(
      "q56_scd2_merge",
      (s, d) => {
        val base = T.customer(s, d)
          .select(col("c_custkey").as("k"), dec2(col("c_acctbal")).as("bal"))
        val hundred = lit(BigDecimal("100.00")).cast(DecimalType(18, 2))
        val updates = base.filter(col("k") % 7 === 3)
          .select(col("k"), (col("bal") + hundred).as("new_bal"))
        val inserts = base.filter(col("k") % 97 === 5)
          .select((col("k") + 1000000L).as("k"), hundred.as("new_bal"))
        val changes = updates.unionByName(inserts)
        val joined = base.join(changes, Seq("k"), "full_outer")
        val closedOld = joined
          .filter(col("bal").isNotNull && col("new_bal").isNotNull)
          .select(col("k"), lit(1).as("version"),
            col("bal").cast(DoubleType).as("acctbal"),
            lit(false).as("is_current"))
        val openedNew = joined
          .filter(col("bal").isNotNull && col("new_bal").isNotNull)
          .select(col("k"), lit(2).as("version"),
            col("new_bal").cast(DoubleType).as("acctbal"),
            lit(true).as("is_current"))
        val untouched = joined
          .filter(col("bal").isNotNull && col("new_bal").isNull)
          .select(col("k"), lit(1).as("version"),
            col("bal").cast(DoubleType).as("acctbal"),
            lit(true).as("is_current"))
        val inserted = joined
          .filter(col("bal").isNull)
          .select(col("k"), lit(1).as("version"),
            col("new_bal").cast(DoubleType).as("acctbal"),
            lit(true).as("is_current"))
        closedOld.unionByName(openedNew).unionByName(untouched)
          .unionByName(inserted)
          .orderBy("k", "version")
      },
      Some("""WITH base AS (
        |  SELECT c_custkey AS k, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |changes AS (
        |  SELECT k, bal + 100.00 AS new_bal FROM base WHERE k % 7 = 3
        |  UNION ALL
        |  SELECT k + 1000000, CAST(100.00 AS DECIMAL(18,2)) FROM base
        |  WHERE k % 97 = 5),
        |j AS (SELECT base.k AS bk, changes.k AS ck, bal, new_bal
        |      FROM base FULL OUTER JOIN changes ON base.k = changes.k)
        |SELECT COALESCE(bk, ck) AS k, CAST(v AS INTEGER) AS version,
        |  CAST(acctbal AS DOUBLE) AS acctbal, is_current
        |FROM (
        |  SELECT bk, ck, 1 AS v, bal AS acctbal, false AS is_current
        |  FROM j WHERE bal IS NOT NULL AND new_bal IS NOT NULL
        |  UNION ALL
        |  SELECT bk, ck, 2, new_bal, true
        |  FROM j WHERE bal IS NOT NULL AND new_bal IS NOT NULL
        |  UNION ALL
        |  SELECT bk, ck, 1, bal, true
        |  FROM j WHERE bal IS NOT NULL AND new_bal IS NULL
        |  UNION ALL
        |  SELECT bk, ck, 1, new_bal, true FROM j WHERE bal IS NULL)
        |ORDER BY k, version""".stripMargin)),
    // ------------------------------------------------------------------
    // Gaps-and-islands interval coalescing (the classic warehouse merge of
    // overlapping validity/activity intervals; reference test lineage: the
    // sessionization family around OMLDM's event-time windows, but as a
    // BATCH set operation rather than a stream window). Each event opens a
    // 300s activity interval; overlapping or touching intervals per user
    // fuse into islands via the running-max-end trick: an interval starts a
    // new island iff its start exceeds the max end of everything before it
    // (ROWS UNBOUNDED PRECEDING..1 PRECEDING), and a running sum of those
    // starts numbers the islands. All arithmetic is exact epoch-micros
    // int64, so island boundaries — and the hash — are engine-independent.
    // Scale shape: two windows + one aggregate, ALL partitioned by user_id
    // (per-key data is bounded); one shuffle on user_id total, no global
    // sort, no island ever crosses a partition.
    Op(
      "q57_interval_merge",
      (s, d) => {
        val span = 300000000L // 300s in micros
        val wOrd = Window.partitionBy("user_id")
          .orderBy("st", "event_id")
        val iv = T.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("st"))
          .withColumn("en", col("st") + lit(span))
        val isl = iv
          .withColumn("prev_max_en",
            max("en").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("new_isl",
            when(col("prev_max_en").isNull ||
              col("st") > col("prev_max_en"), 1L).otherwise(0L))
          .withColumn("isl",
            sum("new_isl").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "isl")
          .agg(min("st").as("i_st"), max("en").as("i_en"),
            count(lit(1)).as("i_n"))
        isl.groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("i_en") - col("i_st")).as("covered_us"),
            max(col("i_en") - col("i_st")).as("max_island_us"),
            max("i_n").as("max_island_events"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS st,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS en
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_isl
        |  FROM iv),
        |numbered AS (
        |  SELECT user_id, st, en,
        |    sum(new_isl) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM marked),
        |islands AS (
        |  SELECT user_id, isl, min(st) AS i_st, max(en) AS i_en,
        |    count(*) AS i_n
        |  FROM numbered GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(i_en - i_st) AS BIGINT) AS covered_us,
        |  CAST(max(i_en - i_st) AS BIGINT) AS max_island_us,
        |  CAST(max(i_n) AS BIGINT) AS max_island_events
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Sequential-pattern FUNNEL (signup → view → purchase): the product
    // analytics staple — per user, the first signup, the first view
    // STRICTLY AFTER it, the first purchase strictly after that, then the
    // stage-conversion report. The chain is three conditional min-
    // aggregations, each keyed on user_id; each stage's scan pushes its
    // event_type filter to parquet, and because a stage frame is one row
    // per qualifying user the stage joins all BROADCAST (the audited plan:
    // filtered scans + BHJ per stage — no stage ever shuffles the full
    // event stream). All stage timestamps are exact epoch
    // micros; the one double (conversion) is a single division — so the
    // one-row report hash-matches. At 100 TB: per-user event counts are
    // bounded, stage frames shrink monotonically (s3 ⊆ s2 ⊆ s1), and the
    // final assembly crossJoins only one-row aggregates.
    Op(
      "q58_funnel",
      (s, d) => {
        val e = T.events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("t").as("t1"))
        val s2 = e.filter(col("event_type") === "view")
          .join(s1, "user_id").filter(col("t") > col("t1"))
          .groupBy("user_id").agg(min("t").as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("t") > col("t2"))
          .groupBy("user_id").agg(min("t").as("t3"))
        val conv = s3.join(s1, "user_id")
          .agg(sum(col("t3") - col("t1")).as("sum_convert_us"),
            max(col("t3") - col("t1")).as("max_convert_us"))
        e.agg(countDistinct("user_id").as("n_users"))
          .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_signup"))))
          .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_signup_view"))))
          .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_full_funnel"))))
          .crossJoin(broadcast(conv))
          .withColumn("conversion",
            (col("n_full_funnel").cast(DoubleType) / col("n_signup"))
              .cast(DoubleType))
          .select("n_users", "n_signup", "n_signup_view", "n_full_funnel",
            "conversion", "sum_convert_us", "max_convert_us")
      },
      Some(funnelOracleSql)),
    // ------------------------------------------------------------------
    // Cohort RETENTION matrix — the other half of the product-analytics
    // pair with q58: users grouped by the epoch-week of their first event
    // (the cohort), counted in every later week they were active, keyed by
    // week offset. Weeks are exact integer epoch-micros division
    // (604800000000 us), so cohort boundaries — and the matrix — are
    // engine-independent. Scale shape: one groupBy(user) for the cohort
    // anchor, one user-keyed join that reuses the same hash partitioning
    // (exchange reuse, the q58 property), then a distinct + count on the
    // (cohort, offset) matrix key whose cardinality is O(weeks²) — tiny
    // regardless of corpus size. No window over the full event stream.
    Op(
      "q59_retention",
      (s, d) => {
        val e = T.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("w"))
        val cohort = e.groupBy("user_id").agg(min("w").as("cw"))
        e.join(cohort, "user_id")
          .select(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"),
            col("user_id"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w
        |  FROM events),
        |cohort AS (SELECT user_id, MIN(w) AS cw FROM e GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT cohort.cw AS cohort_week, e.w - cohort.cw AS week_offset,
        |    e.user_id
        |  FROM e JOIN cohort USING (user_id))
        |SELECT cohort_week, week_offset, COUNT(*) AS n_active
        |FROM act GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)),
  )
}
