package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Dev tool for the r12 concurrent-serving probe (SCALE.md): every scale row
  * so far measures one query at a time, but a deployed serving path (s21's
  * MIPS top-k) shares the cluster with batch work. The question this probe
  * answers with numbers instead of folklore: when a heavy analytical job is
  * running, what bounds interactive latency — the SCHEDULER MODE (FIFO vs
  * FAIR pools), or the batch job's TASK LENGTH?
  *
  * Design: corpus = 2M cached embedding vectors (the s16/s21 1000x tier).
  * Background thread loops a heavy job (1024-query brute-force MIPS agg over
  * the corpus, ~131 GFLOP/job) pinned at either 32 coarse or 256 fine partitions — same
  * total work, 8x shorter tasks. Foreground runs 16 sequential serve
  * requests (16-query top-5, s21's shape) and records the latency
  * distribution. Arms: {FIFO, FAIR-with-pools} x {no background, coarse
  * background, fine background}. Scheduler mode is fixed at context
  * creation, so modes run in successive SparkContexts.
  *
  * Spark scheduling granularity is the TASK: a free slot is handed to the
  * next task by job-FIFO order or pool fair share, but a running task is
  * never preempted — so the serve request's wait is bounded below by the
  * heavy job's per-task duration regardless of mode. Expectation to verify:
  * fine-partitioning the batch job protects serving latency more than
  * switching scheduler; FAIR's contribution is ordering fairness when
  * multiple jobs queue, not preemption.
  *
  * Usage: runMain graft.tools.ServeProbe [fixtureDir]
  */
object ServeProbe {

  private def session(mode: String): SparkSession = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.scheduler.mode", mode)
    .getOrCreate()

  /** s21's serve shape: top-5 MIPS for 16 query vectors by id range. */
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

  /** The heavy batch job: 1024-query exhaustive MIPS aggregate (~128 GFLOP
    * per job — task length is the experimental variable, set by the corpus
    * partition count). */
  private def heavy(corpus: DataFrame, qbig: DataFrame): Long =
    corpus.crossJoin(broadcast(qbig))
      .agg(sum(F.dotFF(col("q_emb"), col("embedding"))).as("s"))
      .count()

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_emb1000"
    val requests = 16
    for (mode <- Seq("FIFO", "FAIR")) {
      val spark = session(mode)
      spark.sparkContext.setLogLevel("ERROR")
      val base = graft.T.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val e = base.cache(); e.count()
      val qbig = base.filter(col("vec_id") < 1024)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // same heavy workload at two task granularities, both cached
      val coarse = base.repartition(32).cache(); coarse.count()
      val fine = base.repartition(256).cache(); fine.count()
      val dust = base.repartition(1024).cache(); dust.count()
      // aggressive warm: the serve and heavy kernels share dotFF, so a cold
      // JIT makes whichever arm runs first look slower — warm until C2 has
      // seen both shapes many times (the r11 ingest-band lesson)
      (100 to 119).foreach(serve(e, _))
      (1 to 3).foreach(_ => { heavy(coarse, qbig); heavy(fine, qbig) })
      // two full cycles: round 1 absorbs residual JIT warming (the leading
      // vs trailing no-load control differed 2x without it), round 2 is
      // the recorded measurement
      for (round <- 1 to 2;
          (bg, bgName) <- Seq(
            (None: Option[DataFrame], "none"),
            (Some(coarse), "bg32"), (Some(fine), "bg256"),
            (Some(dust), "bg1024"))) {
        val done = new AtomicBoolean(false)
        val heavyJobs = new AtomicLong(0)
        val bgThread = bg.map { corpus =>
          val t = new Thread(() => {
            spark.sparkContext.setLocalProperty(
              "spark.scheduler.pool", "batch")
            while (!done.get()) { heavy(corpus, qbig); heavyJobs.incrementAndGet() }
          })
          t.setDaemon(true); t.start(); Thread.sleep(1500); t
        }
        val lat = Array.ofDim[Double](requests)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "serve")
        val t0 = System.nanoTime()
        (0 until requests).foreach { r =>
          val s0 = System.nanoTime()
          val n = serve(e, r)
          require(n == 16, s"request $r returned $n rows")
          lat(r) = (System.nanoTime() - s0) / 1e9
        }
        val wall = (System.nanoTime() - t0) / 1e9
        done.set(true)
        bgThread.foreach(_.join(120000))
        val xs = lat.sorted
        def pct(p: Double) = xs(math.min(xs.length - 1, (p * xs.length).toInt))
        if (round == 2)
          println(f"SERVE mode=$mode bg=$bgName%-5s p50=${pct(0.5)}%.2f " +
            f"p95=${pct(0.95)}%.2f max=${xs.last}%.2f wall=$wall%.1f s " +
            f"heavyJobsDone=${heavyJobs.get()}")
      }
      spark.stop()
    }
  }
}
