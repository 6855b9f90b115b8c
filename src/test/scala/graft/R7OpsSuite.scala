package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic regression guards for the round-7 additions, beyond the driver
  * hash gates: invariants that must hold at ANY fixture, so a future edit
  * that still happens to hash-match a stale oracle can't silently change
  * meaning.
  */
class R7OpsSuite extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("t27: mixture is a probability vector that flattens the raw shares") {
    val rows = SparkEntry.queries("t27_temperature_mix")(spark, sf).collect()
    val sumQ = rows.map(_.getAs[Double]("q")).sum
    assert(math.abs(sumQ - 1.0) < 1e-9, s"sum(q) = $sumQ")
    // temperature < 1 pulls every language toward the uniform share:
    // over-represented ones shrink (repeat < 1), rare ones grow (> 1)
    rows.foreach { r =>
      val p = r.getAs[Double]("p"); val rf = r.getAs[Double]("repeat_factor")
      val uniform = 1.0 / rows.length
      if (p > uniform) assert(rf < 1.0 + 1e-9, s"p=$p repeat=$rf")
      if (p < uniform) assert(rf > 1.0 - 1e-9, s"p=$p repeat=$rf")
    }
  }

  test("d25: S-curve scoring selects a mid-granularity banding for t=0.5") {
    val rows = SparkEntry.queries("d25_lsh_tuning")(spark, sf)
      .orderBy("rnk").collect()
    assert(rows.length == 8)
    // extremes are never optimal: r=1 fires on everything (FP-heavy),
    // r=128 on nothing (FN-heavy)
    val best = rows.head
    assert(best.getAs[Long]("r") > 1L && best.getAs[Long]("r") < 128L,
      s"degenerate banding won: ${best.mkString(",")}")
    // total error strictly ordered by rank (rnk tie-breaks on b, but the
    // 8 fixed curves have distinct totals)
    val totals = rows.map(_.getAs[Double]("total_err")).toSeq
    assert(totals == totals.sorted, s"rank order broken: $totals")
  }

  test("g09: no node moves unless the integer gain is positive") {
    val rows = SparkEntry.queries("g09_louvain_pass")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val moved = r.getAs[Long]("new_comm") != r.getAs[Long]("node")
      val gain = r.getAs[Long]("best_gain")
      assert(moved == (gain > 0L),
        s"move/gain mismatch: ${r.mkString(",")}")
    }
  }

  test("mm09: every image lands in exactly one bucket (counts conserve)") {
    val rows = SparkEntry.queries("mm09_aspect_buckets")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_images")).sum
    val docs = T.documents(spark, sf).count()
    assert(total == docs, s"bucketed $total of $docs")
    rows.foreach { r =>
      val ar = r.getAs[Double]("mean_ar")
      assert(ar > 0.0 && ar < 20.0, s"implausible mean ratio: $ar")
    }
  }

  test("d26: pair algebra matches a direct per-key binomial recount") {
    val occ = T.documents(spark, sf)
      .select(md5(substring(col("text"), 1, 16)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(sum(expr("c * (c - 1) div 2")).as("tot"))
      .collect()(0)
    val expected =
      if (occ.isNullAt(0)) 0L else occ.getLong(0)
    val matrix = SparkEntry.queries("d26_dup_attribution")(spark, sf)
      .agg(sum("n_dup_pairs")).collect()(0)
    val got = if (matrix.isNullAt(0)) 0L else matrix.getLong(0)
    assert(got == expected, s"matrix total $got != binomial $expected")
  }

  test("p05: selection honors quotas and never exceeds the survivor pool") {
    val sel = SparkEntry.queries("p05_training_manifest")(spark, sf)
      .groupBy("lang").agg(sum("n_sel").as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val surv = T.documents(spark, sf)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .filter(col("n_tok") >= 20 && col("n_chars") >= 100)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    sel.foreach { case (lang, n) =>
      assert(n <= surv(lang), s"$lang selected $n of ${surv(lang)}")
    }
    assert(sel.values.sum <= surv.values.sum / 2 + sel.size,
      "selection exceeds the half-corpus budget beyond rounding")
  }
}
