package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool for the r12 small-files A/B (SCALE.md): q48 implements
  * compaction as an operator; this probe measures what it BUYS at the 100x
  * scan tier. The same 60M-row lineitem is laid out three ways — as
  * synthesized (32 ~27 MiB files), compacted toward the 128 MiB target
  * (7 files), and fragmented into 2,000 ~0.4 MiB files (the steady state
  * of an uncompacted streaming ingest) — and the q01-shape scan+aggregate
  * is timed over each, with task counts and listing overhead made visible.
  *
  * Usage: runMain graft.tools.SmallFilesProbe [srcDir]
  */
object SmallFilesProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/tmp/graft_li100"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$src/lineitem.parquet")

    // lay out the three variants once (idempotent per run: overwrite)
    val compacted = "/tmp/graft_li100_compact"
    val shattered = "/tmp/graft_li100_shattered"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(compacted)))
      li.repartition(7).write.mode("overwrite").parquet(compacted)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(shattered)))
      li.repartition(2000).write.mode("overwrite").parquet(shattered)
    val dust = "/tmp/graft_li100_dust"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dust)))
      li.repartition(20000).write.mode("overwrite").parquet(dust)

    def agg(path: String): (Long, Int) = {
      val df = spark.read.parquet(path)
      val scanParts = df.rdd.getNumPartitions
      (df.filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .count(), scanParts)
    }
    for ((name, path) <- Seq(("as-synthesized", s"$src/lineitem.parquet"),
        ("compacted-7", compacted), ("shattered-2000", shattered),
        ("dust-20000", dust))) {
      var best = Double.MaxValue
      var parts = 0
      (1 to 3).foreach { _ =>
        // new file index each run: include listing cost, exclude FS cache
        // only on run 1 (runs 2-3 measure warm-page steady state)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val (n, p) = agg(path)
        val secs = (System.nanoTime() - t0) / 1e9
        require(n > 0 && n < 10, s"$name returned $n groups")
        if (secs < best) { best = secs; parts = p }
      }
      val nFiles = {
        val s0 = java.nio.file.Files.list(java.nio.file.Paths.get(path))
        try s0.filter(p => p.toString.endsWith(".parquet")).count()
        finally s0.close()
      }
      println(f"SMALLFILES $name%-15s files=$nFiles%5d scanTasks=$parts%4d wall=$best%.2f s")
    }
    spark.stop()
  }
}
