package graft.tools

import graft.T
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dev tool (r13): print the formatted plan of st30's per-trigger as-of
  * probe in both arms — static orders side as a plain parquet read (the
  * pre-r13 shape: EnsureRequirements exchanges and sorts the WHOLE
  * dimension every trigger) vs as the hash-bucketed standing table st30
  * now maintains (only the arrival side exchanges). The per-trigger plan
  * lives inside foreachBatch, so graft.Explain cannot show it; this probe
  * rebuilds the identical join shape outside the stream.
  *
  * Usage: runMain graft.tools.PitPlanProbe <sfDir>
  */
object PitPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val left = T.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type")
    def probe(right: org.apache.spark.sql.DataFrame): String =
      graft.operators.AsOf.asofJoin(left, right,
        "user_id", "o_custkey", col("ts"), col("o_orderdate"),
        Seq("o_orderkey", "o_totalprice"), "o_orderkey")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
    println("========== st30 per-trigger as-of probe, PLAIN parquet static side ==========")
    println(probe(T.orders(spark, sfDir).select(col("o_custkey"),
      col("o_orderdate").cast("timestamp").as("o_orderdate"),
      col("o_orderkey"), col("o_totalprice"))))
    val tbl = graft.operators.StreamOps.bucketedArtifact(spark,
      s"pitplanprobe@r13#$sfDir", "st30_orders", "o_custkey",
      "o_custkey BIGINT, o_orderdate TIMESTAMP, o_orderkey BIGINT, " +
        "o_totalprice DOUBLE") {
      T.orders(spark, sfDir).select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    }
    println("========== st30 per-trigger as-of probe, BUCKETED standing table ==========")
    println(probe(spark.table(tbl)))
    spark.stop()
  }
}
