package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool for the r10 100x probe (SCALE.md): wall-time selected queries
  * AND record their shuffle traffic — total shuffle-write bytes and the
  * single heaviest stage — via a stage-completion listener. The brief's bar
  * is "survive 100x", and shuffle volume is where a banded/bucketed design
  * would silently go quadratic; measuring it is the difference between
  * arguing linearity and showing it.
  *
  * Usage: runMain graft.tools.Scale100Probe <sfDir> <query...>
  */
object Scale100Probe {

  private class ShuffleTally extends SparkListener {
    @volatile var writeBytes = 0L
    @volatile var peakStageWrite = 0L
    @volatile var spillBytes = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        val w = m.shuffleWriteMetrics.bytesWritten
        writeBytes += w
        if (w > peakStageWrite) peakStageWrite = w
        spillBytes += m.diskBytesSpilled
      }
    }
    def reset(): Unit = { writeBytes = 0L; peakStageWrite = 0L; spillBytes = 0L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.tail
    val cpus = sys.env.getOrElse("TIMEQ_CPUS", "32")
    // r11 g01 A/B: let the probe scale shuffle partitions independently of
    // executor threads (the deployment rule under test — partitions scale
    // with data volume, threads with the machine)
    val shuf = sys.env.getOrElse("SCALE_SHUFFLE_PARTS", cpus)
    // r12 codec A/B: core confs like spark.io.compression.codec are read at
    // SparkEnv creation, so they must land in the builder, not on a live
    // session — SCALE_CONF="k=v,k=v" injects them here (guide §2.3: "there
    // is no universal answer — measure shuffle bytes and stage time with
    // each").
    val extraConfs: Seq[(String, String)] = sys.env.get("SCALE_CONF")
      .map(_.split(",").toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }).getOrElse(Nil)
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val spark = extraConfs.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    extraConfs.foreach { case (k, v) =>
      println(s"PROBE100 conf $k=$v")
    }
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    names.foreach { n =>
      // run 1 warms FS caches; run 2 is the recorded measurement
      var last = (0.0, 0L, 0L, 0L, 0L)
      (1 to 2).foreach { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        tally.reset()
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give the bus a beat
        Thread.sleep(300)
        last = (secs, cnt, tally.writeBytes, tally.peakStageWrite, tally.spillBytes)
      }
      val (secs, cnt, wb, pk, sp) = last
      println(f"PROBE100 $n%s wall=$secs%.2f s rows=$cnt shuffleWrite=${wb / 1048576.0}%.1f MiB " +
        f"peakStage=${pk / 1048576.0}%.1f MiB spilled=${sp / 1048576.0}%.1f MiB")
    }
    spark.stop()
  }
}
