package graft.tools

import graft.streaming._
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: replay p08's Q3 (job-stats quiescence + Terminate barrier)
  * against an existing stat_partials directory, printing every batch.
  */
object P08Probe {
  def main(args: Array[String]): Unit = {
    val statsDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val src = spark.readStream.schema(Encoders.product[StatPartial].schema)
      .option("maxFilesPerTrigger", "1").parquet(statsDir).as[StatPartial]
    val q = JobStatsOperator.run(src, workers = 4, testSetSize = 256,
      timeoutMs = 60000L, wmOnlyTag = "__wm__").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SpokeEvent], id: Long) =>
        println(s"=== batch $id ===")
        b.collect().foreach(println)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("p08probe_").toString)
      .start()
    q.processAllAvailable(); q.stop()
    spark.stop()
  }
}
