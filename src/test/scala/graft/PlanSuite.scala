package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the PLANS.md audit claims, enforced.
  * Loose substring assertions on the formatted plan keep these stable across
  * Spark versions while still failing if a broadcast silently becomes a
  * sort-merge join or a pushed filter stops reaching the scan.
  */
class PlanSuite extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p.take(2000))
  }

  test("q02: dimension joins broadcast (no sort-merge join)") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("q23: per-part aggregate broadcasts by SIZE, not by forced hint") {
    // the aggregate side is |part|-scaled (fact-derived), so a forced
    // broadcast hint would OOM at 100 TB — the choice must come from the
    // planner's size estimate (broadcast at small SF, shuffle join at scale)
    val df = SparkEntry.queries("q23_correlated_avg")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("UnresolvedHint") && !analyzed.contains("ResolvedHint"),
      "q23 regained a forced broadcast hint on an SF-scaling side")
    val p = plan("q23_correlated_avg")
    assert(p.contains("BroadcastHashJoin"), "size-based broadcast lost at test SF")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q68: qualifying-order predicate pushes to the orders scan") {
    val p = plan("q68_custdist")
    assert(p.contains("PushedFilters") && p.contains("o_orderpriority"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q69: top-100 takes the TakeOrdered path, not a global sort") {
    val p = plan("q69_large_volume")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("w12: single-language read of the hive layout is partition-pruned") {
    val p = plan("w12_hive_partitioned")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("lang"), s"lang predicate not in PartitionFilters:\n$pf")
  }

  test("w13: nested scan prunes to the two metadata leaves (no payload)") {
    val p = plan("w13_nested_pruning")
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(rs.contains("n_tok") && rs.contains("lang"), rs)
    assert(!rs.contains("text"), s"payload column not pruned:\n$rs")
  }

  test("g10: top-100 recommendations take the TakeOrdered path") {
    val p = plan("g10_two_hop_recs")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("s15: MIPS scan broadcasts the query set (no corpus shuffle)") {
    val p = plan("s15_mips_search")
    assert(!p.contains("SortMergeJoin"), "query join degraded to SMJ")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q32: band join is a broadcast nested-loop probe") {
    val p = plan("q32_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("t07: top-k terms take the TakeOrdered path, not a global sort") {
    val p = plan("t07_term_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("t06: fused winnowing plans no window exchange") {
    val p = plan("t06_rolling_fingerprint")
    assert(!p.contains("Window"), "winnowing regressed to explode+window")
    assert(p.toLowerCase.contains("winnow"),
      "winnowing lost the fused native expression")
  }

  test("s04: IVF probe is a partition-pruned read of the bucketed index") {
    val p = plan("s04_ann_ivf_pruned")
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      p.linesIterator.filter(_.contains("Partition")).mkString("\n"))
  }

  test("s03/s04: IVF bucket/probe assignment is a native expression, not a UDF") {
    for (name <- Seq("s03_ann_ivf", "s04_ann_ivf_pruned")) {
      val p = plan(name)
      assert(p.toLowerCase.contains("nearestcentroids") ||
        p.contains("nearest_centroids"), s"$name lost the native probe")
      assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
        s"$name still plans a UDF")
    }
  }

  test("mm06: single-modality read is partition-pruned") {
    val p = plan("mm06_modality_pruned")
    assert(p.contains("PartitionFilters") && p.contains("modality"),
      p.linesIterator.filter(_.contains("Partition")).mkString("\n"))
  }

  test("d10: embedding near-dup joins on LSH band buckets, never label") {
    val p = plan("d10_embed_neardup_lsh")
    assert(p.contains("band") && p.contains("bkey"),
      "candidate join lost its band-bucket keys")
    assert(!p.contains("label"), "near-dup pair join regressed to label blocking")
  }

  test("native expressions stay inside whole-stage codegen (no fallback)") {
    // d04 (simhash32), t06 (rolling_hashes/md5_prefix32), s02 (dot_fd),
    // s16 (i8_codes + dot_ll — the r10 kernels whose whole point is the
    // codegen'd hot loop), s15 (dot_ff): each plan must show codegen
    // stages (the `*(n)` stars in simple explain) and no CodegenFallback
    // — a fallback would silently interpret the hot loop.
    for (name <- Seq("d04_simhash", "t06_rolling_fingerprint", "s02_ann_lsh",
        "s16_int8_search", "s15_mips_search")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // materialize so AQE finalizes the physical stages
      val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(p.contains("*("), s"$name lost codegen entirely:\n$p")
      assert(!p.contains("CodegenFallback"), s"$name fell back to interpretation")
    }
  }

  test("q36: hash-sample filter reaches the scan stage (no shuffle before it)") {
    val p = plan("q36_hash_sample")
    // the sample predicate is a per-row filter under the aggregate: exactly
    // one exchange (the groupBy), plus the final sort's — count unique
    // operator ids in the formatted detail section
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges <= 2, s"unexpected exchanges:\n$p")
  }

  test("d13: boilerplate probe broadcasts the top-K gram set") {
    val p = plan("d13_boilerplate_coverage")
    // the gram->df agg may shuffle, but the join BACK to the corpus-side
    // gram instances must be a broadcast probe (the corpus never
    // reshuffles for it) and the top-K a TakeOrdered, not a global sort
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), "top-K degraded to global sort")
    assert(!p.contains("SortMergeJoin"), "gram probe degraded to SMJ")
  }

  test("t14: sequence packing shuffles on source only (no global ordering)") {
    val p = plan("t14_sequence_pack")
    // window sum partitioned by source: every hash exchange keys on source;
    // a single-partition exchange would mean a global-order window snuck in
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
    assert(p.contains("hashpartitioning(source"), p.take(3000))
  }

  test("p01: curation pipeline broadcasts the benchmark set, no global window") {
    val p = plan("p01_corpus_curation")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("Exchange SinglePartition"),
      "a global-order window snuck into the curation chain")
    assert(!p.contains("CartesianProduct"), "unbounded cross join")
    // exactly the two per-source windows (quota pick + packing offset) may
    // remain; a third means exact-dedup regressed from the d01 min-per-hash
    // aggregate back to a single-task window sort on the content-hash
    // hot key
    val windows = """\(\d+\) Window\b""".r.findAllIn(p).length
    assert(windows == 2,
      s"expected 2 per-source windows, got $windows — exact dedup must stay an aggregate")
  }

  test("t15: hashed classifier is a pure projection (no exchange before sort)") {
    val p = plan("t15_hashed_classifier")
    // one rangepartitioning exchange for the presentation sort; nothing else
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges <= 1, s"unexpected exchanges:\n$p")
  }

  test("t18: split totals join broadcasts (membership is a pure projection)") {
    val p = plan("t18_hash_split")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), "per-source totals join degraded to SMJ")
  }

  test("t19: mixture normalizer is a broadcast back-join, not a wide shuffle") {
    val p = plan("t19_domain_mixture")
    // total + Z are 1-row aggregates broadcast back onto the per-source table
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"), "1-row join lost its broadcast hint")
  }

  test("t20: chunking is scan-cost (no exchange before the presentation sort)") {
    val p = plan("t20_chunk_windows")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges <= 1, s"unexpected exchanges:\n$p")
  }

  test("s05: quantization is elementwise in the scan projection") {
    val p = plan("s05_embed_quantize")
    // one hash exchange for the per-label rollup, one range for the sort
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges <= 2, s"unexpected exchanges:\n$p")
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"))
  }

  test("s06: sign projection is scan-cost (no aggregation shuffle, no UDF)") {
    val p = plan("s06_random_projection")
    // only the presentation sort's range exchange is allowed
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"))
  }

  test("t21: rule battery is scan-cost (no aggregation shuffle)") {
    val p = plan("t21_gopher_rules")
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("q46: range filter is pushed to the clustered-copy scan") {
    val p = plan("q46_range_layout")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("q52: weighted sample takes the TakeOrdered path, not a global sort") {
    val p = plan("q52_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q47: both session window passes share one exchange and sort") {
    val p = plan("q47_sessionize")
    // lag and the dependent running sum are two Window nodes by necessity,
    // but they must ride ONE (user, ts) exchange + sort — a second sort
    // between them would mean the shared ordering was lost
    val windows = """\(\d+\) Window""".r.findAllIn(p).length
    assert(windows == 2, s"expected exactly the two session windows:\n$p")
    val sorts = """\(\d+\) Sort""".r.findAllIn(p).length
    assert(sorts <= 2, s"windows stopped sharing their sort:\n$p")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges <= 2, s"unexpected exchanges:\n$p")
  }

  test("q53: bloom membership test is built-in codegen; dim side broadcasts") {
    val p = plan("q53_bloom_semijoin")
    assert(p.contains("BroadcastHashJoin"), "exact semi-check must broadcast")
    assert(!p.contains("SortMergeJoin"), "fact-side join degraded to SMJ")
    // the bitset probe is element_at + shiftleft on an array literal — no
    // UDF node may appear anywhere in the plan
    assert(!p.toLowerCase.contains("batchevalpython") &&
      !p.contains("ScalaUDF"), "bloom test fell out of codegen")
  }

  test("ml16: both CUSUM window passes share one (event_type) exchange") {
    val p = plan("ml16_cusum_drift")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    // one hash exchange for the windows + the final tiny group/sort pair
    assert(exchanges <= 3, s"CUSUM windows stopped sharing the shuffle:\n$p")
    val sorts = """\(\d+\) Sort""".r.findAllIn(p).length
    assert(sorts <= 3, s"extra sort between the window passes:\n$p")
  }

  test("s10: MaxSim scores in one broadcast pass (no shuffle before rank)") {
    val p = plan("s10_maxsim")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "query set must broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"))
  }

  test("q54: quantile sketch rank-check joins broadcast the 3-row approx side") {
    val p = plan("q54_quantile_sketch")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("d17: paragraph-dedup winner selection is an aggregate, not a window sort") {
    val p = plan("d17_paragraph_dedup")
    assert(!p.contains("Window"),
      "first-seen-wins regressed to a window sort on the chunk-hash hot key")
  }

  test("q05: per-group top-k is pushed down as WindowGroupLimit (no full sort)") {
    val p = plan("q05_window_topk")
    // Spark's InferWindowGroupLimit keeps only k rows per group on both the
    // map and reduce side of the rank window — the optimizer doing the
    // top-k pushdown for us; a regression here means full-partition sorts
    assert(p.contains("WindowGroupLimit"), p.take(1500))
  }

  test("g01: final ranking takes the TakeOrdered path; ranks broadcast") {
    val p = plan("g01_pagerank")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 ranking regressed to a global sort")
    assert(!p.contains("SortMergeJoin"),
      "iteration join degraded — rank table must broadcast")
  }

  test("g01 co-partitioned mode: no broadcast, zero exchange on the edge side") {
    import graft.operators.Graph
    val es = spark.range(400)
      .selectExpr("id % 60 AS a", "(id * 7 + 1) % 60 AS b")
      .filter("a <> b").distinct()
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ej = Graph.coPartPrep(es, p)
    try {
      // ranks arrive localCheckpointed mid-loop (an RDD scan), so the only
      // exchanges in a real iteration are the ones the iteration adds
      val ranks = es.select(org.apache.spark.sql.functions.col("a").as("node"))
        .distinct()
        .withColumn("r", org.apache.spark.sql.functions.lit(1000000L))
        .localCheckpoint()
      // AQE off for a fully-materialized static tree; collect() does not
      // descend into InMemoryRelation innerChildren, so the one-time prep
      // plan (where tiny deg may legitimately broadcast) stays out of scope
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val nodeNames = try {
        val iter = Graph.coPartIteration(ej, ranks, 1000000L, p)
        iter.queryExecution.executedPlan.collect {
          case n => n.getClass.getSimpleName
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(nodeNames.exists(_.contains("ShuffledHashJoin")),
        s"rank join is not a shuffled hash join: $nodeNames")
      assert(!nodeNames.exists(_.contains("Broadcast")),
        s"co-partitioned mode must never broadcast the rank table: $nodeNames")
      // exactly two exchanges: the O(nodes) rank shuffle + the destination
      // aggregation; the cached O(edges) side must satisfy the join's
      // distribution with NO exchange of its own
      val nEx = nodeNames.count(_.contains("ShuffleExchange"))
      assert(nEx == 2,
        s"expected 2 exchanges (rank side + dest agg), got $nEx: $nodeNames")
    } finally ej.unpersist(blocking = true)
  }

  test("q55: both box dimensions push down to the z-ordered scan") {
    val p = plan("q55_zorder_layout")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_orderkey") && pushed.contains("l_partkey"),
      s"box predicate lost a dimension at the scan:\n$pushed")
  }

  test("p02: removal is a broadcast anti-join; no cartesian products") {
    val p = plan("p02_embedding_pipeline")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      "survivor filter lost its broadcast anti-join")
    assert(!p.contains("CartesianProduct"), "unbounded cross join in p02")
  }

  test("w09: JDBC read is range-partitioned and the filter pushes to the DB") {
    val p = plan("w09_jdbc_source")
    assert(p.contains("numPartitions=4"),
      "JDBC extract degraded to a single-connection scan")
    assert(p.contains("PushedFilters") && p.contains("o_totalprice"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("s11: kNN graph blocks on LSH bands — no cartesian, top-k group-limited") {
    val p = plan("s11_knn_graph")
    assert(!p.contains("CartesianProduct"), "unbounded cross join in s11")
    // the only nested-loop joins allowed are bounded 32-row hyperplane
    // broadcasts (Cross BuildRight) inside embedBandsOf; the
    // vector-vs-vector candidate join must never appear as a nested loop
    val badNlj = p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && l.contains("+-"))
      .filterNot(_.contains("Cross BuildRight")).toSeq
    assert(badNlj.isEmpty, s"non-plane nested-loop joins: $badNlj")
    assert(p.contains("WindowGroupLimit"),
      "per-vector rank<=3 lost its group-limit pushdown (full window sort)")
  }

  test("p03: near-dup removal is a broadcast anti-join; no cartesian") {
    val p = plan("p03_multimodal_pipeline")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      "survivor filter lost its broadcast anti-join")
    assert(!p.contains("CartesianProduct"), "unbounded cross join in p03")
  }

  test("q65: the binned proximity join is a plain equi-join — no nested loop") {
    val p = plan("q65_proximity_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "binned range join degraded to a nested loop")
  }

  test("q64: the 7-join market share broadcasts every dimension") {
    val p = plan("q64_market_share")
    // supplier/nation/region/part all broadcast; the only sort-merge join
    // allowed is lineitem x orders (two fact-sized sides)
    val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
    assert(p.contains("BroadcastHashJoin"))
    assert(smj <= 2, s"dimension join degraded to SMJ ($smj SMJs)")
    assert(p.contains("PushedFilters") && p.contains("p_type"),
      "part filter not pushed to its scan")
  }

  test("q17: backward as-of plans onto the native merge-join operator") {
    val p = plan("q17_asof_join")
    assert(p.contains("AsOfMergeJoin"),
      "as-of fell back to the union+window encoding")
    assert(!p.contains("Window"),
      "native as-of plan should carry no window operator")
  }

  test("s12: probe table broadcasts — the corpus side never sort-merges") {
    val p = plan("s12_range_search")
    assert(p.contains("BroadcastHashJoin"),
      "bucket probe lost its broadcast join")
    assert(!p.contains("SortMergeJoin"),
      "range-search candidate join degraded to SMJ (corpus shuffle)")
    assert(p.contains("InMemoryRelation"),
      "bucketed corpus no longer persisted — plane projection runs twice")
  }

  test("d21: chunk dedup is min-struct aggregation, not a window over the hash") {
    val p = plan("d21_content_chunks")
    assert(!p.contains("Window"),
      "d21 regressed to the hot-key window sort d17's comment warns against")
  }

  test("q60: snapshot diff classifies inside the join projection (single SMJ)") {
    val p = plan("q60_snapshot_diff")
    assert(p.contains("SortMergeJoin FullOuter"),
      "reconciliation lost its single full-outer merge join")
    assert(p.contains("partial_count"),
      "class rollup lost its map-side partial aggregate")
  }

  test("mm08: A/V alignment costs one hash exchange (the per-asset as-of sort)") {
    val p = plan("mm08_av_align")
    val hashExchanges = p.linesIterator
      .filter(l => l.contains("hashpartitioning")).toSeq
    assert(hashExchanges.nonEmpty && hashExchanges.size <= 2,
      s"as-of alignment grew extra shuffles:\n${hashExchanges.mkString("\n")}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q70: nation-set predicates push into BOTH dimension scans") {
    val p = plan("q70_nation_traffic")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("In(s_nationkey")), pushed.mkString("\n"))
    assert(pushed.exists(_.contains("In(c_nationkey")), pushed.mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q71: shipdate window reaches the lineitem scan; single partial agg") {
    val p = plan("q71_promo_revenue")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(l => l.contains("l_shipdate") &&
      l.contains("GreaterThanOrEqual")), pushed.mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q72: disjunctive residual keeps the partkey equi-join (no NL join)") {
    val p = plan("q72_disjunctive_join")
    assert(p.contains("HashJoin"), "equi-join lost")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "disjunction degraded to nested loop")
  }

  test("q73/q74: argmax/argmin never window or sort the full aggregate") {
    for (q <- Seq("q73_top_supplier", "q74_min_cost_supplier")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q regressed to a rank window")
    }
  }

  test("q75: the global cut is a one-row broadcast over the aggregate") {
    val p = plan("q75_important_stock")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "scalar threshold no longer broadcast")
    // supplier dimension broadcasts into the fact side
    assert(p.linesIterator.count(_.contains("Scan parquet")) >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("s16: the query code set broadcasts; corpus side never exchanges " +
    "before scoring") {
    val p = plan("s16_int8_search")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query set no longer broadcast")
    assert(!p.contains("CartesianProduct"), "unbounded cartesian appeared")
  }

  test("s01/s16: per-query top-k is a bounded-heap aggregate, not a window") {
    for (q <- Seq("s01_topk_bruteforce", "s16_int8_search")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q regressed to a rank-window sort")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"$q lost the collect_top_k aggregate path")
    }
  }

  // exchanges appear twice in a formatted plan (tree line + detail
  // header) — count only the numbered detail headers
  private def nExchanges(p: String): Int =
    p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))

  test("t31: the hapax census is shuffle-free until the O(10)-row rollup") {
    val p = plan("t31_lexical_diversity")
    // one partial->final agg exchange + the presentation sort only
    assert(nExchanges(p) <= 2, s"array-domain census grew shuffles:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("q76: part-name filter pushes to the dimension scan; no cartesian") {
    val p = plan("q76_product_profit")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("StringContains(p_name")), pushed.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q77: top-20 takes the TakeOrdered path; quarter window pushes to orders") {
    val p = plan("q77_returned_items")
    assert(p.contains("TakeOrderedAndProject"), "top-20 regressed to a full sort")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("l_returnflag")), pushed.mkString("\n"))
    assert(pushed.exists(_.contains("o_orderdate")), pushed.mkString("\n"))
  }

  test("q78: shipdate window pushes to lineitem; lateness stays a join residual") {
    val p = plan("q78_late_shipments")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("l_shipdate")), pushed.mkString("\n"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "two-sided lateness predicate degraded the equi-join")
  }

  test("q79: exclusion set is a broadcast ANTI join; size set pushes to part") {
    val p = plan("q79_supplier_part_types")
    assert(p.contains("LeftAnti"), "NOT-IN shape lost the anti join")
    assert(!p.contains("SortMergeJoin"), "anti join degraded to SMJ")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("In(p_size")), pushed.mkString("\n"))
  }

  test("q80: the chain stays LEFT SEMI end-to-end (no denormalizing join)") {
    val p = plan("q80_excess_stock_suppliers")
    assert(p.contains("LeftSemi"), "semijoin chain lost")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("t33: top-100 cut is a bounded-heap aggregate, not a term-table sort") {
    val p = plan("t33_zipf_slope")
    assert(!p.contains("Window"), "zipf rank regressed to a window sort")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "lost the collect_top_k aggregate path")
  }

  test("d27: consensus merge never degrades to a cartesian product") {
    val p = plan("d27_ensemble_consensus")
    assert(!p.contains("CartesianProduct"), "signal merge went quadratic")
  }

  test("TPC-H tier: broadcast hints only wrap BOUNDED sides") {
    // The r8 verdict's one wrong-at-100x plan class: an explicit broadcast
    // hint on an SF-scaling table (customer/supplier/part or an aggregate
    // over them) is honored regardless of size, shipping an ever-growing
    // build side to every executor. A hint is legitimate only when its
    // subtree is provably bounded: a constant dimension (nation 25 rows /
    // region 5 rows), a GlobalLimit (q77's 20-row top-k), or an ungrouped
    // one-row aggregate (q73's max, q75's total). Everything else must
    // stay unhinted so the planner size-picks (broadcast at test SF,
    // shuffle at 100 TB).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, ResolvedHint}
    val tier = Seq(
      "q21_salted_skew_join", "q53_bloom_semijoin", "q64_market_share",
      "q66_waiting_suppliers", "q70_nation_traffic", "q73_top_supplier",
      "q74_min_cost_supplier", "q75_important_stock", "q76_product_profit",
      "q77_returned_items", "q78_late_shipments", "q79_supplier_part_types",
      "q80_excess_stock_suppliers")
    for (q <- tier) {
      val analyzed = SparkEntry.queries(q)(spark, sf).queryExecution.analyzed
      val hints = analyzed.collect { case h: ResolvedHint => h }
      hints.foreach { h =>
        val boundedShape = h.child.collectFirst {
          case _: GlobalLimit => ()
          case a: Aggregate if a.groupingExpressions.isEmpty => ()
        }.isDefined
        val leaves = h.child.collectLeaves()
        val constDims = leaves.nonEmpty && leaves.forall { l =>
          val s = l.toString
          s.contains("nation") || s.contains("region")
        }
        assert(boundedShape || constDims,
          s"$q hints an SF-scaling side:\n${h.child.treeString}")
      }
    }
  }

  test("q77: the 20-row top-k side is the broadcast build side, not customer") {
    // flip-check for the r8 verdict finding: the hint must wrap the
    // GlobalLimit subtree; customer columns must never sit under a hint
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, ResolvedHint}
    val analyzed =
      SparkEntry.queries("q77_returned_items")(spark, sf).queryExecution.analyzed
    val hints = analyzed.collect { case h: ResolvedHint => h }
    assert(hints.exists(_.child.collectFirst { case _: GlobalLimit => () }.isDefined),
      "q77 lost the broadcast hint on the 20-row top-k probe")
    hints.foreach { h =>
      assert(!h.child.output.exists(_.name.startsWith("c_")),
        "q77 regained a broadcast hint on the customer dimension")
    }
    // and the physical join must still broadcast (build side = the 20 rows)
    val p = plan("q77_returned_items")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "20-row probe degraded to SMJ")
  }

  test("w15: merged-schema read resolves the evolved column at the scan") {
    // the staged dir mixes v1/v2 schema versions; the footer merge must
    // surface quality_score in the scan's ReadSchema, not via a cast
    val p = plan("w15_schema_evolution")
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(rs.contains("quality_score"), s"evolved column missing:\n$rs")
  }

  test("t34: per-query top-10 is group-limited; query terms broadcast") {
    val p = plan("t34_bm25_retrieval")
    assert(p.contains("WindowGroupLimit"),
      "per-query top-10 lost its group-limit pushdown (full window sort)")
    assert(p.contains("BroadcastHashJoin"), "query-term probe lost broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("d23: candidate generation rides the native rolling hash, md5 only confirms") {
    val p = plan("d23_duplicate_spans")
    assert(p.toLowerCase.contains("rolling_hashes") ||
      p.toLowerCase.contains("rollinghashes"),
      "d23 lost the 8-byte rolling-hash candidate pass")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("mm10: shot census stays in the scan projection (no explode shuffle)") {
    val p = plan("mm10_shot_boundaries")
    assert(!p.contains("Generate"), "per-frame explode appeared")
    assert(nExchanges(p) <= 1, // the presentation sort's range exchange
      s"mm10 grew shuffles:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("w16: the dim-side cut reaches the fact scan as a DYNAMIC " +
    "partition filter (DPP fires)") {
    val p = plan("w16_dynamic_partition_pruning")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("dynamicpruning"),
      s"DPP lost — fact scan would read every partition at 100 TB:\n$pf")
  }

  test("s17: both arms bounded-heap; seed sides broadcast; token table " +
    "materialized once (no duplicated corpus tokenize)") {
    val p = plan("s17_hybrid_rrf")
    // per-arm top-k rides the collect_top_k aggregate, never a corpus
    // rank-window (the only Window allowed is the final O(q x k) fusion)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "an arm lost the bounded-heap top-k path")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "seed set no longer broadcast")
    assert(!p.contains("CartesianProduct"), "unbounded cartesian appeared")
    // the shared (doc_id, term) table must come from the materialized
    // relation, not four re-derivations of explode+distinct: the corpus
    // tokenize expression appears EXACTLY once in the plan detail (the
    // cache-fill), with the two O(q x k) posexplodes as the only other
    // Generates
    val nTok = p.linesIterator.count(_.contains("explode(split(text"))
    assert(nTok == 1,
      s"corpus tokenize appears $nTok times (token cache lost)")
    val nGen = p.linesIterator.count(_.matches("""\(\d+\) Generate.*"""))
    assert(nGen <= 3,
      s"unexpected Generate count $nGen (duplicated subtree)")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "token table no longer read from the materialized cache")
  }

  test("s18/s19: no shuffle join and no cartesian anywhere in the serving " +
    "stack — bounded sides broadcast, corpus stays put") {
    for (q <- Seq("s18_quantized_rerank", "s19_ivf_quantized_rerank")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q shuffles a corpus-sized join side")
      assert(!p.contains("CartesianProduct"), s"$q went quadratic")
    }
  }

  test("s21 MIPS serving: no corpus shuffle, no corpus sort — broadcast " +
    "query/cap sides, bounded-heap aggregate only (the s15 gate arm keeps " +
    "the rank windows; the serving path must NOT)") {
    val p = plan("s21_mips_serve")
    assert(!p.contains("SortMergeJoin"), "s21 shuffles a corpus-sized side")
    assert(!p.contains("CartesianProduct"), "s21 went quadratic")
    // the gate arm's signature is the corpus-wide rank Window — serving
    // must carry none (its only Sort is the final O(q*k) ORDER BY)
    assert(!p.contains(" Window"), "s21 reintroduced a rank window:\n" +
      p.linesIterator.filter(_.contains("Window")).mkString("\n"))
  }

  test("p09: detection, featurization and the in-plan solve ride ONE data " +
    "shuffle (all four windows share the sort exchange; the solve is " +
    "projection-only)") {
    val p = plan("p09_drift_retrain")
    val exchanges = p.split("\n")
      .count(l => l.trim.matches("""\(\d+\) Exchange"""))
    // one hash exchange for the (event_type | ts, event_id) window chain
    // + the final ORDER BY's range exchange over O(segments) rows; an upper
    // bound, not exact equality — planner-neutral AQE/version changes may
    // elide one, but a third exchange means a lost shared sort (ADVICE r10)
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    for (j <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!p.contains(j),
        s"p09 should be join-free ($j found) — segmentation is a window, not a self-join")
  }

  test("p08 router: ONE scan of the wire stream feeds every envelope " +
    "branch; the parse + fan-out stays in whole-stage codegen") {
    // the router is source-agnostic: pin the plan on a batch frame (the
    // streaming plan wraps the identical projection around the file source)
    import spark.implicits._
    val routed = graft.operators.JobTopology.route(
      Seq(
        """{"id": 7, "operation": "training", "numericalFeatures": [1.0, 2.0], "target": 1}""",
        """{"id": 1, "request": "Create", "requestId": 1, "learner": {"name": "PA"}}""",
        "EOS").toDF("value"))
    val p = routed.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // exactly one source scan: a branch-per-destination union would show
    // one scan per branch (3x the ingest I/O per trigger at 100 TB)
    val scans = p.linesIterator.count(l =>
      l.matches("""\(\d+\) Scan.*""") || l.matches("""\(\d+\) LocalTableScan.*"""))
    assert(scans == 1, s"wire routing reads the source $scans times:\n" +
      p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("Union"), "router regained a branch-per-destination union")
    assert(p.contains("codegen id"), "parse+fan-out fell out of codegen")
    // and it routes: 2 data envelopes (one per hosted pipeline) + 4
    // control envelopes (worker broadcast), EOS dropped
    val rows = routed.collect()
    assert(rows.count(_.kind == "data") == 2 &&
      rows.count(_.kind == "control") == 4 && rows.length == 6)
  }

  test("HOF hot-loop guard: no nested or per-pair higher-order function " +
    "over a corpus-sized scan (r11 verdict #4 — the dot_ll/phash64 lesson)") {
    // Twice a Catalyst HOF chain in a hot loop cost 15-60x until a 100x
    // probe caught it: r10's per-PAIR aggregate(zip_with(...)) in the int8
    // rerank (one fresh array per candidate pair) and r11's per-row
    // transform(sequence) -> aggregate(sequence) pHash chain (64 re-scans
    // of each document). Both share a machine-checkable shape, enforced
    // here over every registered batch query's OPTIMIZED plan:
    //   (a) a HOF inside another HOF's LAMBDA body — the inner traversal
    //       re-runs once per outer element, so per-row cost MULTIPLIES
    //       (O(outer x inner)); HOFs composed in ARGUMENT position
    //       (aggregate(transform(xs, ...), ...)) are sequential passes and
    //       stay linear — the bread-and-butter declarative form, or
    //   (b) any HOF evaluated at JOIN-OUTPUT cardinality (both join sides
    //       reach a corpus-sized scan -> per-pair allocation), or
    //   (c) a HOF lambda that references an OUTER String-typed column —
    //       the mm05 shape (aggregate(sequence(...), (a, p) -> ... +
    //       ascii(substring(text, p, 1)))): every element re-enters the
    //       payload through interpreted evaluation at ~us per position
    //       (measured 351x at 20k-char docs, SCALE.md r12). Lambdas that
    //       touch only their own variables and accumulators pass.
    // In each case with no Aggregate between the expression and a
    // corpus-sized leaf (an Aggregate collapses cardinality, so HOFs above
    // one — e.g. d28's transform(array_sort(collect_list(...))) stitch —
    // run O(groups) times and are cold by construction).
    // Streaming (st) and training (ml, p07-p09) entries are excluded: their
    // op functions RUN work and return sink reads, so the hot path is not
    // visible in the returned DataFrame's plan. Their guards are the
    // kernel-parity suites + the per-family 100x probes (SCALE.md).
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, HigherOrderFunction, LambdaFunction}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

    val big = Seq("documents", "embeddings", "lineitem", "orders", "events")
    def bigLeaf(p: LogicalPlan): Boolean = p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths
          .exists(rp => big.exists(b => rp.toString.contains(b)))
        case _ => false
      }
      case _ => false
    }
    def rawBig(p: LogicalPlan): Boolean =
      !p.isInstanceOf[Aggregate] && (bigLeaf(p) || p.children.exists(rawBig))
    def perPair(p: LogicalPlan): Boolean =
      !p.isInstanceOf[Aggregate] && (p match {
        case j: Join => (rawBig(j.left) && rawBig(j.right)) ||
          j.children.exists(perPair)
        case _ => p.children.exists(perPair)
      })
    def nested(h: HigherOrderFunction): Boolean =
      h.functions.exists(_.exists {
        case _: HigherOrderFunction => true
        case _ => false
      })
    def lambdaOuterString(h: HigherOrderFunction): Boolean =
      h.functions.exists {
        case lf: LambdaFunction => lf.function.exists {
          case a: AttributeReference =>
            a.dataType == org.apache.spark.sql.types.StringType
          case _ => false
        }
        case _ => false
      }
    // Known-cold paths, each with its reason — additions need the same
    // justification or a kernel replacement (the phash64 route).
    val allow: Map[String, String] = Map(
      "s06_random_projection" -> ("outer transform runs over the LITERAL " +
        "32-hyperplane matrix: the multiplier is a compile-time constant " +
        "(O(32d) per row, one pass over the embedding per plane), pinned " +
        "scan-cost by its own plan test; kernel replacement is the upgrade " +
        "path if a probe ever disagrees"),
      "s10_maxsim" -> ("per-pair flag only: the join's query side is the " +
        "16-row benchmark slice, broadcast (pinned by the s10 plan test), " +
        "so 'pair' cardinality is 16 x corpus — the zip_with runs at scan " +
        "cost with a constant multiplier"))
    val sweep = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val fam = n.takeWhile(_.isLetter)
      Set("q", "w", "t", "d", "s", "g", "mm").contains(fam) ||
        Set("p01", "p02", "p03", "p04", "p05", "p06").exists(n.startsWith)
    }
    assert(sweep.size > 150, s"sweep shrank to ${sweep.size} — selector broke?")
    val offenders = scala.collection.mutable.LinkedHashSet[String]()
    for (name <- sweep if !allow.contains(name)) {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      plan.foreach { node =>
        val hs = node.expressions.flatMap(_.collect {
          case h: HigherOrderFunction => h
        })
        if (hs.nonEmpty && node.children.exists(rawBig)) {
          hs.filter(nested).take(1).foreach(h =>
            offenders += s"$name: NESTED HOF ${h.sql.take(140)}")
          if (node.children.exists(perPair))
            offenders += s"$name: PER-PAIR HOF ${hs.head.sql.take(140)}"
          hs.filter(lambdaOuterString).take(1).foreach(h =>
            offenders += s"$name: PAYLOAD-IN-LAMBDA HOF ${h.sql.take(140)}")
        }
      }
    }
    assert(offenders.isEmpty,
      s"HOF hot-loop candidates (replace with a codegen'd kernel or " +
        s"allowlist with a cold-path justification):\n" +
        offenders.mkString("\n"))
  }

  test("st46/st48 standing window index is a bucketed table: the " +
    "per-trigger semi join exchanges ONLY the arrival side (r12 100x fix)") {
    import org.apache.spark.sql.functions._
    val docs = T.documents(spark, sf)
    val tbl = graft.operators.StreamOps.standingWinIndex(spark, sf, docs)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // the pin is the non-broadcast shape: at real scale neither side fits
    // in a broadcast, and the claim under test is that the corpus-sized
    // index side never exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dp = docs.filter(col("doc_id") % 5 === 3 && col("n_chars") >= 40)
        .select(col("doc_id"),
          explode(expr("sequence(1, cast(n_chars as int) - 39)")).as("pos"),
          col("text"))
        .select(col("doc_id"), col("pos"),
          expr("unhex(md5(substring(text, pos, 40)))").as("h"))
      val j = dp.join(spark.table(tbl), Seq("h"), "left_semi")
      val p = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("Bucketed: true"), p.take(4000))
      val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
      assert(exchanges == 1,
        s"expected exactly 1 exchange (arrival windows only), got $exchanges:\n$p")
      assert(j.count() > 0, "probe produced no duplicate windows at sf0.001")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("st30: the as-of merge against the bucketed standing orders table " +
    "exchanges ONLY the arrival side (r13)") {
    import org.apache.spark.sql.functions._
    val tbl = graft.operators.StreamOps.bucketedArtifact(spark,
      s"plansuite_pitorders@r13#$sf", "st30_orders", "o_custkey",
      "o_custkey BIGINT, o_orderdate TIMESTAMP, o_orderkey BIGINT, " +
        "o_totalprice DOUBLE") {
      T.orders(spark, sf).select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    }
    // the shape st30 plans per trigger: arrival batch as-of'd against the
    // standing dimension. The bucketed scan must satisfy the merge's
    // ClusteredDistribution (requires the key to stay a direct alias —
    // AsOf.nonNullRowGuard), so only the arrival side exchanges.
    val j = graft.operators.AsOf.asofJoin(
      T.events(spark, sf).select("event_id", "user_id", "ts", "event_type"),
      spark.table(tbl), "user_id", "o_custkey",
      col("ts"), col("o_orderdate"),
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    val p = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Bucketed: true"), p.take(4000))
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly 1 exchange (arrival side only), got $exchanges:\n$p")
    assert(j.count() > 0)
  }
}
