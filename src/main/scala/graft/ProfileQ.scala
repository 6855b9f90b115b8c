package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r12 optimization round): wall-time selected queries like TimeQ
  * but additionally attach a stage-level listener and print, per query, the
  * top stages by task-time with shuffle read/write bytes — the local stand-in
  * for the Spark UI's stage table (guide §1.1/§7.1; the bench box runs with
  * the UI disabled). Usage:
  *   PROFQ_CPUS=32 sbt "runMain graft.ProfileQ <sfDir> [k=v...] <query...>"
  */
object ProfileQ {
  private case class StageRow(id: Int, name: String, taskTimeMs: Long,
      shufReadB: Long, shufWriteB: Long, inputB: Long, spillB: Long,
      tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (confs, names) = args.tail.partition(_.contains("="))
    val cpus = sys.env.getOrElse("PROFQ_CPUS", "32")
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
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        rows.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead,
          m.diskBytesSpilled,
          si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      // pass 1 untimed warm (fixture staging, codegen), pass 2 profiled
      SparkEntry.queries(n)(spark, sfDir).count()
      rows.clear()
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; a short settle beats reaching
      // into the private listener bus
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq
      val totTask = rs.map(_.taskTimeMs).sum
      println(f"PROFQ $n wall=$wall%.2f s rows=$cnt stages=${rs.size} " +
        f"taskTime=${totTask / 1e3}%.2f s " +
        f"shufR=${rs.map(_.shufReadB).sum / 1e6}%.1f MB " +
        f"shufW=${rs.map(_.shufWriteB).sum / 1e6}%.1f MB " +
        f"input=${rs.map(_.inputB).sum / 1e6}%.1f MB " +
        f"spill=${rs.map(_.spillB).sum / 1e6}%.1f MB")
      rs.sortBy(-_.taskTimeMs).take(12).foreach { r =>
        println(f"  stage ${r.id}%4d ${r.taskTimeMs / 1e3}%7.2f s tasks=${r.tasks}%3d " +
          f"sR=${r.shufReadB / 1e6}%8.2f MB sW=${r.shufWriteB / 1e6}%8.2f MB " +
          f"in=${r.inputB / 1e6}%8.2f MB ${r.name}%s")
      }
    }
    spark.stop()
  }
}
