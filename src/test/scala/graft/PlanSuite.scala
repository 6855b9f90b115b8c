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

  test("q23: decorrelated per-part aggregate broadcasts") {
    val p = plan("q23_correlated_avg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q32: band join is a broadcast nested-loop probe") {
    val p = plan("q32_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("t07: top-k terms take the TakeOrdered path, not a global sort") {
    val p = plan("t07_term_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("t06: array-domain winnowing plans no window exchange") {
    val p = plan("t06_rolling_fingerprint")
    assert(!p.contains("Window"), "winnowing regressed to explode+window")
    assert(p.contains("rollinghashes") || p.contains("rolling_hashes") ||
      p.toLowerCase.contains("rollinghashes"))
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
    // d04 (simhash32), t06 (rolling_hashes/md5_prefix32), s02 (dot_fd):
    // each plan must show codegen stages (the `*(n)` stars in simple
    // explain) and no CodegenFallback — a fallback would silently interpret
    // the hot loop.
    for (name <- Seq("d04_simhash", "t06_rolling_fingerprint", "s02_ann_lsh")) {
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
}
