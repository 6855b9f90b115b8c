package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for streaming fixed cost: runs one windowed streaming
  * query over the staged events fixture and dumps per-trigger durationMs
  * breakdowns from the progress log. Not part of the library surface.
  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (dir, schema, _) = graft.streaming.Streaming.stageEventsCached(spark, sfDir, 2)
    // warm
    locally {
      val wDir = java.nio.file.Files.createTempDirectory("graft_warm_").toString
      import spark.implicits._
      Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(wDir)
      val q = spark.readStream.schema("id LONG, v STRING").parquet(wDir)
        .dropDuplicates("id")
        .writeStream.format("noop").option("checkpointLocation", s"$wDir/_ckpt").start()
      q.processAllAvailable(); q.stop()
    }
    val variants = Seq(
      ("p4tmp", "4", "/tmp"),
      ("p2tmp", "2", "/tmp"),
      ("p4shm", "4", "/dev/shm"),
      ("p2shm", "2", "/dev/shm"))
    for (rep <- 1 to 2; (tag, parts, ckBase) <- variants) {
      val t0 = System.nanoTime()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = src.withWatermark("ts", "35 days")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory")
        .queryName(s"probe_${tag}_$rep")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get(ckBase), "graft_probe_ck_").toString)
        .start()
      q.processAllAvailable(); q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val tot = (System.nanoTime() - t0) / 1e9
      val trig = q.recentProgress.map(_.durationMs.get("triggerExecution").toLong).sum
      println(f"== $tag rep $rep total $tot%.2fs triggerSum ${trig / 1000.0}%.2fs " +
        s"(${q.recentProgress.length} triggers)")
    }
    spark.stop()
  }
}
