package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: wall-time selected queries (2 runs each, min reported) with
  * optional session conf overrides: `runMain graft.TimeQ <sfDir>
  * [k=v,k=v] <query...>`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (confs, names) = args.tail.partition(_.contains("="))
    val cpus = sys.env.getOrElse("TIMEQ_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    names.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9 -> cnt
      }
      println(f"TIMEQ $n%s ${times.map(_._1).min}%.2f s rows=${times.head._2}")
    }
    spark.stop()
  }
}
