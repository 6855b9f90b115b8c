package graft

import graft.pipeline.{PipelineSpec, Trainer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: every SparkEntry query timed at the bench scale
  * factor, plus the BASELINE.md ingest+train throughput metric (PA over the
  * events table). Emits ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup so the first measured query isn't charged for it
    SparkEntry.entry(spark).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ingest+train rows/s: stream the events table through feature
    // extraction into a 1-round distributed PA fit (BASELINE.md metric).
    val trainT0 = System.nanoTime()
    val pts = T.events(spark, sfDir)
      .select(
        array(
          col("value"),
          hour(col("ts")).cast("double"),
          dayofweek(col("ts")).cast("double"),
          (col("user_id") % 16).cast("double")).as("features"),
        when(col("event_type") === "purchase", 1.0).otherwise(-1.0).as("target"))
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val fitted = Trainer.fit(spark,
      PipelineSpec(99, "PA", Map("C" -> 0.01), Seq("StandardScaler"), "Synchronous",
        rounds = 1), pts)
    val trainSec = (System.nanoTime() - trainT0) / 1e9
    val rowsPerSec = fitted.model.n / trainSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","ingest_train_rows_per_sec":$rowsPerSec,"ingest_train_sec":$trainSec}""")
    spark.stop()
  }
}
