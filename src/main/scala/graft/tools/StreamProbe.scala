package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool for the r9 streaming 10x scale probe (SCALE.md): run named
  * streaming ops with a [[StreamingQueryListener]] attached and print one
  * `TRIG` JSON line per micro-batch — input rows, trigger wall time, and
  * state-store rows/bytes — plus one `PROBE` line per op with total wall
  * time. The per-trigger lines are the evidence the SCALE.md table wants:
  * trigger cost must track the DELTA (numInputRows), not the ledger/state
  * accumulated so far.
  *
  * Usage: runMain graft.tools.StreamProbe [sfDir op1,op2,...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val ops = (if (args.length > 1) args(1)
      else "st08_stream_stream_join").split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val trig = new scala.collection.mutable.ArrayBuffer[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L)
        val st = p.stateOperators
        val line = s"""{"q":"${Option(p.name).getOrElse("fb")}",""" +
          s""""run":"${p.runId.toString.take(8)}","batch":${p.batchId},""" +
          s""""input_rows":${p.numInputRows},"trigger_ms":$ms,""" +
          s""""state_rows":${st.map(_.numRowsTotal).sum},""" +
          s""""state_mb":${st.map(_.memoryUsedBytes).sum / 1000000}}"""
        trig.synchronized { trig += line }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    ops.foreach { op =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(op)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // give async progress events a beat to drain before attributing
      Thread.sleep(500)
      val lines = trig.synchronized { val s = trig.toSeq; trig.clear(); s }
      lines.foreach(l => println(s"TRIG $op $l"))
      println(f"""PROBE {"op":"$op","wall_sec":$sec%.2f,"out_rows":$n}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
