package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Dev tool for the r12 concurrent-serving probe (SCALE.md): every scale row
  * so far measures one query at a time, but a deployed serving path (s21's
  * MIPS top-k) faces BURSTS — R requests in flight at once, sharing the
  * cluster. This probe measures per-request latency percentiles and
  * aggregate throughput for a 16-request burst at concurrency 1/4/8, under
  * both scheduler modes:
  *
  *  - FIFO (Spark default): jobs queue; an early heavy job head-of-line
  *    blocks the burst's tail.
  *  - FAIR with one pool per in-flight request: active jobs share task
  *    slots round-robin, trading per-request best case for burst p95.
  *
  * The corpus is the standing serving artifact (embeddings + norms,
  * cached + materialized once — s21's design); each request is a fresh
  * 16-query batch over disjoint query ids, so no result reuse between
  * requests. Scheduler mode is fixed at context creation, so the two arms
  * run in two successive SparkContexts, each warmed separately.
  *
  * Usage: runMain graft.tools.ServeProbe [sfDir]
  */
object ServeProbe {

  private def session(mode: String): SparkSession = {
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.scheduler.mode", mode)
    b.getOrCreate()
  }

  /** The cached serving corpus: embeddings with precomputed self-dot. */
  private def corpus(s: SparkSession, sfDir: String): DataFrame = {
    val e = graft.T.embeddings(s, sfDir)
      .select(col("vec_id"), col("embedding"),
        F.dotFF(col("embedding"), col("embedding")).as("n2"))
      .cache()
    e.count()
    e
  }

  /** One serve request: top-5 MIPS for 16 query vectors (ids [16r, 16r+16)),
    * s21's zero-shuffle broadcast-scan-heap shape over the cached corpus.
    */
  private def serve(e: DataFrame, r: Int): Long = {
    val lo = 16L * r
    val q = e.filter(col("vec_id") >= lo && col("vec_id") < lo + 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id")
      .agg(F.topkStructs(
        struct((-F.dotFF(col("q_emb"), col("embedding"))).as("ni"),
          col("vec_id")), 5).as("tk"))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val requests = 16
    for (mode <- Seq("FIFO", "FAIR")) {
      val spark = session(mode)
      spark.sparkContext.setLogLevel("ERROR")
      val e = corpus(spark, sfDir)
      (100 to 101).foreach(serve(e, _)) // warm plan + codegen
      for (conc <- Seq(1, 4, 8)) {
        val pool = Executors.newFixedThreadPool(conc)
        val lat = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
        val t0 = System.nanoTime()
        (0 until requests).foreach { r =>
          pool.submit(new Runnable {
            def run(): Unit = {
              if (mode == "FAIR")
                spark.sparkContext.setLocalProperty(
                  "spark.scheduler.pool", s"serve${r % conc}")
              val s0 = System.nanoTime()
              val n = serve(e, r)
              require(n == 16, s"request $r returned $n rows")
              lat.add((System.nanoTime() - s0) / 1e9)
            }
          })
        }
        pool.shutdown()
        pool.awaitTermination(600, TimeUnit.SECONDS)
        val wall = (System.nanoTime() - t0) / 1e9
        val xs = lat.toArray(Array.empty[java.lang.Double])
          .map(_.doubleValue()).sorted
        def pct(p: Double) = xs(math.min(xs.length - 1, (p * xs.length).toInt))
        println(f"SERVE mode=$mode conc=$conc wall=$wall%.2f s " +
          f"qps=${requests / wall}%.2f p50=${pct(0.5)}%.2f " +
          f"p95=${pct(0.95)}%.2f max=${xs.last}%.2f")
      }
      spark.stop()
    }
  }
}
