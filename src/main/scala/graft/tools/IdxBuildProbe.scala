package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r12): time the ONE-TIME build of the bucketed standing window
  * index at 100x — the cost the bucketed-artifact design trades for its
  * per-trigger savings (SCALE.md st48/st49 rows). Run in a fresh JVM so the
  * in-process artifact cache is cold.
  *
  * Usage: runMain graft.tools.IdxBuildProbe [sfDir]
  */
object IdxBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_docs100"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.T.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val tbl = graft.operators.StreamOps.standingWinIndex(spark, sfDir, docs)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val rows = spark.table(tbl).count()
    println(f"IDXBUILD table=$tbl rows=$rows build=$buildSecs%.1f s")
    spark.stop()
  }
}
