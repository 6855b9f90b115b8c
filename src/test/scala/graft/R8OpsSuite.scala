package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic regression guards for the round-7 continuation additions
  * (q70–q73, t30/t31, s16, g11/g12, st37/st38, mm10): invariants that must
  * hold at ANY fixture, so a future edit that still hash-matches a stale
  * oracle can't silently change meaning.
  */
class R8OpsSuite extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q70: pair predicate keeps only cross-set nation pairs, window holds") {
    val rows = SparkEntry.queries("q70_nation_traffic")(spark, sf).collect()
    assert(rows.nonEmpty)
    val left = Set("NATION_1", "NATION_2", "NATION_3")
    val right = Set("NATION_4", "NATION_5", "NATION_6")
    rows.foreach { r =>
      val s = r.getAs[String]("supp_nation"); val c = r.getAs[String]("cust_nation")
      assert((left(s) && right(c)) || (right(s) && left(c)), s"pair $s/$c")
      val y = r.getAs[Long]("l_year")
      assert(y == 1997L || y == 1998L, s"year $y outside window")
      assert(r.getAs[Double]("revenue") > 0.0)
    }
  }

  test("q71: promo share is a percentage strictly inside (0, 100)") {
    val r = SparkEntry.queries("q71_promo_revenue")(spark, sf).collect().head
    val pct = r.getAs[Double]("promo_pct")
    assert(pct > 0.0 && pct < 100.0, s"promo_pct $pct")
    assert(r.getAs[Long]("n_items") > 0L)
  }

  test("q72: disjunctive residual keeps a strict subset of the plain join") {
    val r = SparkEntry.queries("q72_disjunctive_join")(spark, sf).collect().head
    val n = r.getAs[Long]("n_items")
    val all = T.lineitem(spark, sf)
      .join(T.part(spark, sf), col("l_partkey") === col("p_partkey")).count()
    assert(n > 0L && n < all, s"residual kept $n of $all")
  }

  test("q73: no supplier out-earns the reported winner (ties included)") {
    val rows = SparkEntry.queries("q73_top_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val winner = rows.head.getAs[Double]("total_rev")
    rows.foreach(r => assert(r.getAs[Double]("total_rev") == winner))
    // independent recompute of the per-supplier revenue max
    val best = T.lineitem(spark, sf)
      .filter(col("l_shipdate").cast("date").between("1997-01-01", "1997-03-31"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (Num.one - col("l_discount").cast("decimal(3,2)"))).as("rev"))
      .agg(max(col("rev").cast("double"))).collect().head.getDouble(0)
    assert(winner == best, s"reported $winner, true max $best")
  }

  test("t30: per-language profile is consistent and ease follows its formula") {
    val rows = SparkEntry.queries("t30_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    var docs = 0L
    rows.foreach { r =>
      val awl = r.getAs[Double]("avg_word_len")
      val spw = r.getAs[Double]("syll_per_word")
      val ease = r.getAs[Double]("ease")
      assert(awl > 1.0 && awl < 20.0, s"avg_word_len $awl")
      assert(spw > 0.0 && spw <= awl, s"more vowel runs than letters")
      assert(ease == 100.0 - 60.0 * spw - 10.0 * awl)
      docs += r.getAs[Long]("n_docs")
    }
    assert(docs == T.documents(spark, sf).count())
  }

  test("t31: decile census conserves documents; TTR is monotone in decile") {
    val rows = SparkEntry.queries("t31_lexical_diversity")(spark, sf)
      .orderBy("ttr_decile").collect()
    val docs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(docs == T.documents(spark, sf).count())
    rows.foreach { r =>
      val dec = r.getAs[Long]("ttr_decile")
      assert(dec >= 0L && dec <= 9L)
      assert(r.getAs[Long]("sum_hapax") <= r.getAs[Long]("sum_distinct"))
      assert(r.getAs[Long]("sum_distinct") <= r.getAs[Long]("sum_tok"))
    }
    val ttrs = rows.map(_.getAs[Double]("ttr")).toSeq
    assert(ttrs == ttrs.sorted, s"TTR not monotone across deciles: $ttrs")
  }

  test("s16: integer scores are symmetric and rankings are self-consistent") {
    val rows = SparkEntry.queries("s16_int8_search")(spark, sf).collect()
    assert(rows.nonEmpty)
    // per query: ranks are 1..k with strictly ordered (iscore desc, vec_id)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to sorted.length.toLong))
      val pairs = sorted.toSeq
        .map(r => (r.getAs[Long]("iscore"), r.getAs[Long]("vec_id")))
      pairs.sliding(2).foreach {
        case Seq((s1, v1), (s2, v2)) =>
          assert(s1 > s2 || (s1 == s2 && v1 < v2), "tie-break order broken")
        case _ =>
      }
    }
    // symmetry: query a scoring query b equals b scoring a (both are in
    // the <16 query set and both appear in each other's candidate pool)
    val byPair = rows.filter(r => r.getAs[Long]("vec_id") < 16)
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")),
        r.getAs[Long]("iscore"))).toMap
    byPair.foreach { case ((a, b), s) =>
      byPair.get((b, a)).foreach(s2 => assert(s2 == s, s"asym $a,$b"))
    }
  }

  test("g11: teleport keeps all mass reachable from seeds; seeds persist") {
    val ranks = SparkEntry.queries("g11_personalized_pagerank")(spark, sf)
      .collect()
    assert(ranks.nonEmpty)
    assert(ranks.forall(_.getAs[Long]("rank_fp") > 0L))
    // total fixed-point mass never exceeds the injected Scale (truncation
    // only leaks mass, never mints it)
    assert(ranks.map(_.getAs[Long]("rank_fp")).sum <=
      operators.Graph.Scale)
  }

  test("g12: assortativity is a correlation in [-1, 1] on a live edge set") {
    val r = SparkEntry.queries("g12_degree_assortativity")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("m") > 0L)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0 && !a.isNaN, s"assortativity $a")
  }

  test("st37: the streamed top-20 equals the batch top-20 exactly") {
    val streamed = SparkEntry.queries("st37_stream_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[String]("term"),
        r.getAs[Long]("n"))).toSeq
    val batch = T.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(20)
      .collect().zipWithIndex
      .map { case (r, i) =>
        (i + 1L, r.getAs[String]("term"), r.getAs[Long]("n")) }.toSeq
    assert(streamed == batch)
  }

  test("st38: trigger boundaries cannot move a bit vs the batch z-scores") {
    val streamed = SparkEntry.queries("st38_stream_zscore")(spark, sf)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_outliers"),
        r.getAs[Double]("max_abs_z"))).toSeq
    val batch = SparkEntry.queries("q51_outlier_zscore")(spark, sf)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_outliers"),
        r.getAs[Double]("max_abs_z"))).toSeq
    assert(streamed == batch)
  }

  test("topk_structs equals the rank window bit-for-bit, ties included") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // small score domain forces heavy ties so the (score, id) tie-break
    // is actually exercised; duplicate (g, score, id) triples occur too
    val df = (1 to 4000)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(25).toLong,
        rnd.nextInt(400).toLong))
      .toDF("g", "score", "id").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(functions.F.topkStructs(
        struct((-col("score")).as("ns"), col("id")), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1L).as("rk"),
        (-col("col.ns")).as("score"), col("col.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWin = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("g", "rk", "score", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    assert(viaAgg == viaWin)
  }

  test("mm10: shot census is internally consistent per document") {
    val rows = SparkEntry.queries("mm10_shot_boundaries")(spark, sf).collect()
    assert(rows.length == T.documents(spark, sf).count())
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames"); val ns = r.getAs[Long]("n_shots")
      assert(nf >= 1L && ns >= 1L && ns <= nf,
        s"doc ${r.getAs[Long]("doc_id")}: $ns shots over $nf frames")
      if (ns == 1L) assert(r.getAs[Long]("boundary_sum") == 0L)
      if (nf == 1L) assert(r.getAs[Long]("max_delta") == 0L)
      // every boundary index is within [1, n_frames-1]; their sum is
      // bounded by the sum of the (ns-1) largest admissible indexes
      val bs = r.getAs[Long]("boundary_sum")
      val maxSum = (nf - ns + 1L to nf - 1L).sum
      assert(bs <= maxSum, s"boundary_sum $bs exceeds $maxSum")
    }
  }

  test("d27: votes are internally consistent and majority-gated") {
    val rows = SparkEntry.queries("d27_ensemble_consensus")(spark, sf).collect()
    assert(rows.nonEmpty, "consensus empty at sf0.001")
    rows.foreach { r =>
      val (vj, vs, vp) = (r.getAs[Long]("v_jaccard"),
        r.getAs[Long]("v_simhash"), r.getAs[Long]("v_phash"))
      val votes = r.getAs[Long]("votes")
      assert(Seq(vj, vs, vp).forall(v => v == 0L || v == 1L))
      assert(votes == vj + vs + vp && votes >= 2L && votes <= 3L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("w15: evolved-column aggregates respect the version split") {
    val rows = SparkEntry.queries("w15_schema_evolution")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val sc = r.getAs[Long]("n_scored")
      assert(sc <= n, "scored more rows than exist")
      assert(sc > 0, "v2 rows missing from the merged read")
      // v1 backfill: token totals must cover every doc, not just v2's
      assert(r.getAs[Long]("n_tokens") >= n, "backfill lost v1 rows")
    }
  }

  test("t33: slope is negative (Zipf) and the cut matches the vocabulary") {
    val r = SparkEntry.queries("t33_zipf_slope")(spark, sf).collect().head
    // the heap takes min(100, |vocab|) terms — sf0.001's corpus has a
    // vocabulary smaller than the cut, so derive the expectation
    val vocab = T.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").select("t").distinct().count()
    assert(r.getAs[Long]("n_terms") == math.min(100L, vocab))
    assert(r.getAs[Double]("slope") < 0.0, "frequency must fall with rank")
    assert(r.getAs[Long]("top100_occurrences") > 0L)
  }

  test("ml26: protocol parity output carries accumulated round totals") {
    val rows = SparkEntry.queries("ml26_sync_protocol_parity")(spark, sf)
      .collect()
    assert(rows.length == 6)
    val n = rows.head.getAs[Long]("n_fitted")
    // 320 ids -> 160/partition -> 128 fitted per partition-round x 2 x 2
    assert(n == 512L, s"n_fitted $n != 2 workers x 2 rounds x 128")
    val cum = rows.find(_.getAs[Long]("dim") == 5L).get.getAs[Double]("weight")
    assert(cum > 0.0 && !cum.isNaN)
  }

  test("d23: spans are exactly maximal on planted cross-doc overlaps") {
    import spark.implicits._
    // shared blocks use alphabets disjoint from every filler, so the ONLY
    // cross-doc 40-grams are those inside the planted blocks
    val s1 = "01" * 30 // 60 chars, shared
    val s2 = "89" * 23 take 45 // 45 chars, shared
    val f = (a: String, n: Int) =>
      Iterator.continually(a).flatten.take(n).mkString
    val doc1 = f("abcdef", 50) + s1 + f("abcdef", 50) + s2 + f("abcdef", 10)
    val doc2 = s1 + f("ghijkl", 60) + s2
    val doc3 = f("mnopqr", 100)
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = operators.Dedup.maximalDupSpans(docs)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("covered_chars"), r.getAs[Long]("max_span"),
        r.getAs[Double]("covered_frac")))
      .toSeq
    // doc1: s1 at 51..110 (span 60), s2 at 161..205 (span 45), gap > 40
    // doc2: s1 at 1..60, s2 at 121..165; doc3: nothing duplicated.
    // Coverage is the EXACT union of the planted blocks — one char more
    // or less (sub-maximal or over-merged spans) fails the compare.
    assert(got == Seq(
      (1L, 2L, 105L, 60L, 105.0 / doc1.length),
      (2L, 2L, 105L, 60L, 105.0 / doc2.length),
      (3L, 0L, 0L, 0L, 0.0)), got.mkString("\n"))
  }
}
