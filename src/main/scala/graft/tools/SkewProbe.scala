package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool for the r12 skew A/B (SCALE.md): the three deployment answers to
  * a hot join key — naive shuffle join, AQE skew-join splitting, and manual
  * salting (q21's technique) — measured against each other on the SAME
  * synthetically-skewed 60M-row fact table, with the straggler made visible
  * (max single task duration) instead of inferred from wall clock.
  *
  * Setup: the 100x lineitem synthesis (ScaleSynth), 25% of fact rows
  * remapped to ONE hot supplier key; dim side is the 100k distinct supplier
  * keys with a payload. Broadcast is disabled for the join arms — at this
  * dim size a real deployment would broadcast (and q21's scale note says
  * so); the probe's question is what happens when the dim does NOT fit,
  * which is when skew actually bites on a cluster. All three arms must
  * produce the identical aggregate checksum — a perf A/B over arms that
  * disagree measures nothing.
  *
  * Usage: runMain graft.tools.SkewProbe [factDir]
  */
object SkewProbe {

  private class TaskTally extends SparkListener {
    @volatile var maxTaskMs = 0L
    @volatile var tasks = 0L
    @volatile var maxReadBytes = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null) {
        val d = t.taskInfo.duration
        if (d > maxTaskMs) maxTaskMs = d
        tasks += 1
        if (t.taskMetrics != null) {
          val r = t.taskMetrics.shuffleReadMetrics.totalBytesRead
          if (r > maxReadBytes) maxReadBytes = r
        }
      }
    }
    def reset(): Unit = { maxTaskMs = 0L; tasks = 0L; maxReadBytes = 0L }
  }

  def main(args: Array[String]): Unit = {
    val factDir = if (args.length > 0) args(0) else "/tmp/graft_li100"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("SKEW_DEBUG_PLAN"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
    val tally = new TaskTally
    spark.sparkContext.addSparkListener(tally)

    val hotKey = 7L
    // 25% of rows land on the hot key; the rest keep their uniform key
    val fact = spark.read.parquet(s"$factDir/lineitem.parquet")
      .select(
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(4)) === 0,
          lit(hotKey)).otherwise(col("l_suppkey")).as("k"),
        col("l_quantity"), col("l_extendedprice"))
    // dim must be a TABLE, not a derived distinct(): an aggregate child is
    // already hash-partitioned, so the join's dim side has no shuffle stage
    // and OptimizeSkewedJoin's pattern (join over two shuffle stages) never
    // matches — the realistic shape is also the one the rule handles
    // rebuilt unconditionally: an exists-guard would serve a stale dim after
    // a fixture regeneration, and the cross-arm checksum cannot catch it
    // because all arms share the dim (review r12)
    val dimPath = s"$factDir/skew_dim.parquet"
    fact.select(col("k")).distinct()
      .select(col("k"), (col("k") % 97).cast("double").as("rate"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    def joined(f: DataFrame, d: DataFrame): DataFrame =
      f.join(d, "k")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity") * col("rate")).cast("decimal(30,2)").as("chk"))

    def salted(f: DataFrame, d: DataFrame, salts: Int): DataFrame =
      f.withColumn("salt", pmod(hash(col("l_quantity"), col("l_extendedprice")), lit(salts)))
        .join(d.withColumn("salt", explode(array((0 until salts).map(lit): _*))),
          Seq("k", "salt"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity") * col("rate")).cast("decimal(30,2)").as("chk"))

    def arm(name: String, aqe: Boolean, skew: Boolean,
        skewThresholdMb: Int = 256, skewFactor: Double = 5.0)(
        q: => DataFrame): (String, String) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      // default 256m: a hot partition whose COMPRESSED shuffle size sits
      // under it never splits — the tuned arm drops it (and the advisory
      // target, which caps the split chunk size) to what a deployment
      // facing this fact/key distribution would pick
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        s"${skewThresholdMb}m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        s"${math.max(2, skewThresholdMb / 4)}m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        skewFactor.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      var res = ""
      var best = Double.MaxValue
      var bestMax = 0L
      var bestTasks = 0L
      var bestRead = 0L
      var skewed = false
      // run 1 warms FS cache; run 2 recorded
      (1 to 2).foreach { _ =>
        tally.reset()
        val t0 = System.nanoTime()
        val df = q
        val row = df.collect().head
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        res = s"n=${row.getLong(0)} chk=${row.getDecimal(1)}"
        skewed = df.queryExecution.executedPlan.toString.contains("skew=true")
        if (sys.env.contains("SKEW_DEBUG_PLAN")) {
          val root = df.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          import org.apache.spark.sql.execution.SparkPlan
          import org.apache.spark.sql.execution.adaptive.{QueryStageExec, ShuffleQueryStageExec}
          def shuffleStages(p: SparkPlan): Seq[ShuffleQueryStageExec] =
            p.collect {
              case s: ShuffleQueryStageExec => Seq(s) ++ shuffleStages(s.plan)
              case q: QueryStageExec => shuffleStages(q.plan)
            }.flatten
          val stages = shuffleStages(root).map { s =>
            s.mapStats.map { m =>
              val sz = m.bytesByPartitionId.sorted.reverse
              (sz.take(3).map(_ / 1048576.0).map(x => f"$x%.1f").toSeq,
                f"${sz(sz.length / 2) / 1048576.0}%.1f")
            }.getOrElse((Seq.empty, "?"))
          }
          println(s"=== $name (top3, median) MiB per stage: $stages")
        }
        if (secs < best) { best = secs; bestMax = tally.maxTaskMs; bestTasks = tally.tasks; bestRead = tally.maxReadBytes }
      }
      println(f"SKEW $name%-10s wall=$best%.1f s maxTask=${bestMax / 1000.0}%.1f s " +
        f"tasks=$bestTasks maxRead=${bestRead / 1048576.0}%.1f MiB skewSplit=$skewed $res")
      (name, res)
    }

    val checks = Seq(
      arm("plain", aqe = false, skew = false)(joined(fact, dim)),
      arm("aqe_dflt", aqe = true, skew = true)(joined(fact, dim)),
      arm("aqe_8m", aqe = true, skew = true, skewThresholdMb = 8)(
        joined(fact, dim)),
      arm("aqe_8m_f2", aqe = true, skew = true, skewThresholdMb = 8,
        skewFactor = 2.0)(joined(fact, dim)),
      arm("salted8", aqe = false, skew = false)(salted(fact, dim, 8)),
      arm("salted32", aqe = false, skew = false)(salted(fact, dim, 32)))
    require(checks.map(_._2).distinct.size == 1,
      s"arms disagree: $checks")
    println("SKEW all arms checksum-equal")
    spark.stop()
  }
}
