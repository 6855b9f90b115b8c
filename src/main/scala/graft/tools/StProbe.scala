package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for streaming fixed cost: runs one windowed streaming
  * query over the staged events fixture and dumps per-trigger durationMs
  * breakdowns from the progress log. Not part of the library surface.
  *
  * r12 variants A/B (recorded in PLANS.md): checkpoint on /dev/shm vs /tmp
  * and 2 vs 4 shuffle partitions — shm + 4 adopted. r13 extension: full
  * per-trigger durationMs key breakdown + the wall NOT inside
  * triggerExecution (query start/stop, AvailableNow scheduling), so the
  * fixed-cost tier's ~1 s/query is attributed instead of argued about.
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val buildDone = System.nanoTime()
      val q = src.withWatermark("ts", "35 days")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory")
        .queryName(s"probe_$rep")
        .outputMode("append")
        .option("checkpointLocation",
          graft.streaming.Streaming.scratchDir("graft_probe_ck_"))
        .start()
      val started = System.nanoTime()
      q.processAllAvailable()
      val processed = System.nanoTime()
      q.stop()
      val stopped = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val progress = q.recentProgress
      val trigSum = progress.map(_.durationMs.get("triggerExecution").toLong).sum
      println(f"== rep $rep total ${(stopped - t0) / 1e9}%.2fs: " +
        f"start ${(started - buildDone) / 1e9}%.2fs, " +
        f"processAll ${(processed - started) / 1e9}%.2fs " +
        f"(triggerSum ${trigSum / 1000.0}%.2fs over ${progress.length} triggers), " +
        f"stop ${(stopped - processed) / 1e9}%.2fs")
      progress.foreach { p =>
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2.toLong)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"   trigger batch=${p.batchId} rows=${p.numInputRows} $d")
      }
    }
    spark.stop()
  }
}
