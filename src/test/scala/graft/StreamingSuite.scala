package graft

import graft.streaming._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Spoke state-machine semantics, driven through the same `process` function
  * the streaming query uses (TestGroupState is Spark's public harness for
  * exactly this).
  */
class StreamingSuite extends AnyFunSuite {

  private def data(seq: Long, id: Long, y: Option[Double], op: String = "training") =
    Envelope(seq, 1, "data", "", "", -1L, id, Seq(1.0, 2.0, 3.0), y, op)
  private def ctl(seq: Long, req: String, learner: String = "", reqId: Long = 1L) =
    Envelope(seq, 1, "control", req, learner, reqId, -1, Nil, None, "")

  private def fresh(): TestGroupState[SpokeState] =
    TestGroupState.create[SpokeState](
      org.apache.spark.api.java.Optional.empty[SpokeState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

  test("pre-Create data buffers, Create drains it into training") {
    val st = fresh()
    val out = Spoke.process(1, Iterator(
      data(0, 10, Some(1.0)), data(1, 11, Some(-1.0)),
      ctl(2, "Create", "PA")), st).toSeq
    val log = out.find(_.kind == "log").get
    assert(log.info == "created:drained" && log.value == 2.0)
    assert(st.exists)
    // next trigger: more training + query reflects all 3 fits
    val out2 = Spoke.process(1, Iterator(
      data(10, 12, Some(1.0)), ctl(11, "Query", reqId = 9L)), st).toSeq
    val resp = out2.find(_.kind == "response").get
    assert(resp.info == "fitted=3", resp.info)
    assert(resp.requestId == 9L)
  }

  test("forecasting points yield predictions; Delete clears state") {
    val st = fresh()
    Spoke.process(1, Iterator(ctl(0, "Create", "PA"),
      data(1, 20, Some(1.0)), data(2, 21, Some(1.0))), st)
      .foreach(_ => ())
    val out = Spoke.process(1, Iterator(
      data(10, 30, None, "forecasting"), ctl(11, "Delete")), st).toSeq
    assert(out.count(_.kind == "prediction") == 1)
    assert(out.exists(e => e.kind == "log" && e.info == "deleted"))
    val out2 = Spoke.process(1, Iterator(ctl(20, "Query", reqId = 2L)), st).toSeq
    assert(out2.head.info == "fitted=0")
  }

  test("statistics operator merges per-pipeline stats and emits on quiescence timeout") {
    // event-time timers: watermark at 500ms when the stats arrive
    val st = TestGroupState.create[StatsState](
      org.apache.spark.api.java.Optional.empty[StatsState](),
      GroupStateTimeout.EventTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.of(500L), hasTimedOut = false)
    val out1 = StatsOperator.process(30000L)(1, Iterator(
      StatEvent(1, 4, 2048, 1, 100, 0.8, 1000L),
      StatEvent(1, 4, 2048, 1, 120, 0.9, 6000L)), st).toSeq
    assert(out1.isEmpty && st.exists)
    // the timer was registered at lastTs + timeout (event time, not wall)
    assert(st.getTimeoutTimestampMs.get() == 36000L)
    // simulate the watermark passing the timer instant
    val fired = TestGroupState.create[StatsState](
      org.apache.spark.api.java.Optional.of(st.get),
      GroupStateTimeout.EventTimeTimeout, 40000L,
      org.apache.spark.api.java.Optional.of(36001L), hasTimedOut = true)
    val out2 = StatsOperator.process(30000L)(1, Iterator.empty, fired).toSeq
    assert(out2.length == 1)
    val js = out2.head
    assert(js.kind == "job_statistics")
    assert(js.info.contains("makespan=5000"))
    assert(js.info.contains("models=8"))
    assert(js.info.contains("fitted=220"))
    assert(!fired.exists)
    // a LATE stats record (below the watermark) after the timeout must not
    // resurrect the cleared state
    val late = TestGroupState.create[StatsState](
      org.apache.spark.api.java.Optional.empty[StatsState](),
      GroupStateTimeout.EventTimeTimeout, 50000L,
      org.apache.spark.api.java.Optional.of(36001L), hasTimedOut = false)
    val out3 = StatsOperator.process(30000L)(1,
      Iterator(StatEvent(1, 1, 64, 1, 5, 0.1, 2000L)), late).toSeq
    assert(out3.isEmpty && !late.exists, "late record resurrected stats state")
  }

  private def statsQuiescenceScenario(
      runOp: org.apache.spark.sql.Dataset[StatEvent] =>
        org.apache.spark.sql.Dataset[SpokeEvent],
      session: org.apache.spark.sql.SparkSession): Unit = {
    val spark = session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_").toString
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[SpokeEvent]()
    def writeFile(evts: Seq[StatEvent], mtime: Long): Unit = {
      val sub = new java.io.File(dir, "data")
      evts.toDS().coalesce(1).write.mode("append").parquet(sub.toString)
      // distinct mtimes keep the file-source trigger order deterministic
      sub.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => f.setLastModified(mtime))
    }
    def drain(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StatEvent]].schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/data").as[StatEvent]
      val q = runOp(src).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/_ckpt")
        .foreachBatch((df: org.apache.spark.sql.Dataset[SpokeEvent], _: Long) =>
          df.collect().foreach(sink.add))
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // pipeline 1's stats end at ts=6000; the timer is due at 36000
    writeFile(Seq(
      StatEvent(1, 4, 2048, 1, 100, 0.8, 1000L),
      StatEvent(1, 4, 2048, 1, 120, 0.9, 6000L)), 1000000L)
    drain()
    assert(!sink.iterator().hasNext, "emitted before the watermark reached the timer")
    // a fresh pipeline-99 record pushes the watermark past 36000 -> pipeline
    // 1's timer fires on data time alone (no 30s wall-clock wait happened)
    writeFile(Seq(StatEvent(99, 1, 64, 1, 5, 0.5, 1000000L)), 2000000L)
    drain()
    val emitted = sink.iterator()
    assert(emitted.hasNext)
    val js = sink.peek()
    assert(js.pipelineId == 1 && js.kind == "job_statistics" &&
      js.info.contains("makespan=5000"), js.toString)
    assert(sink.size() == 1)
    // a late pipeline-1 record (ts far below the watermark) cannot resurrect
    // the cleared state: advancing the watermark again emits nothing new for
    // pipeline 1
    writeFile(Seq(StatEvent(1, 9, 99, 1, 9, 0.9, 2000L)), 3000000L)
    drain()
    writeFile(Seq(StatEvent(99, 1, 64, 1, 5, 0.5, 9000000L)), 4000000L)
    drain()
    val all = scala.jdk.CollectionConverters.IteratorHasAsScala(
      sink.iterator()).asScala.toSeq
    assert(all.count(e => e.pipelineId == 1) == 1,
      s"late record resurrected pipeline-1 state: $all")
  }

  test("stats quiescence is driven by the watermark end-to-end, not wall clock") {
    statsQuiescenceScenario(
      src => StatsOperator.run(src, timeoutMs = 30000L), TestSession.spark)
  }

  test("transformWithState stats operator (registered event-time timers) matches fMGWS") {
    val s2 = TestSession.spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    statsQuiescenceScenario(
      src => TwsStatsOperator.run(src, timeoutMs = 30000L), s2)
  }

  test("spoke state survives a streaming-query restart from checkpoint") {
    val spark = TestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val ck = s"$dir/_ckpt"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[SpokeEvent]()
    def start() = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Envelope]].schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/data").as[Envelope]
      Spoke.run(src).writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch((df: org.apache.spark.sql.Dataset[SpokeEvent], _: Long) =>
          df.collect().foreach(sink.add))
        .start()
    }
    val batch1: Seq[Envelope] = Seq(ctl(0, "Create", "PA"),
      data(1, 1, Some(1.0)), data(2, 2, Some(-1.0)), data(3, 3, Some(1.0)))
    batch1.toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // second incarnation: only a Query arrives; fitted=3 proves the model
    // state was recovered from the checkpointed state store
    Thread.sleep(1100)
    Seq(ctl(10, "Query", reqId = 77L)).toDS().coalesce(1)
      .write.mode("append").parquet(s"$dir/data")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val resp = sink.toArray(Array.empty[SpokeEvent]).find(_.kind == "response")
    assert(resp.isDefined, s"no response in ${sink.size} events")
    assert(resp.get.info == "fitted=3", resp.get.info)
    assert(resp.get.requestId == 77L)
  }

  test("transformWithState spoke (RocksDB state store) matches the fMGWS semantics") {
    val spark = TestSession.spark
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tws_").toString
    val batch1: Seq[Envelope] = Seq(
      data(0, 1, Some(1.0)), data(1, 2, Some(-1.0)), // buffered pre-Create
      ctl(5, "Create", "PA"))
    val batch2: Seq[Envelope] = Seq(
      data(10, 3, Some(1.0)),
      data(11, 40, None, "forecasting"),
      ctl(12, "Query", reqId = 5L))
    batch1.toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    Thread.sleep(1200)
    batch2.toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    val src = s2.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Envelope]].schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/data").as[Envelope]
    val q = TwsSpoke.run(src).writeStream
      .format("memory").queryName("tws_spoke").outputMode("append")
      .option("checkpointLocation", s"$dir/_ckpt").start()
    q.processAllAvailable(); q.stop()
    val rows = s2.table("tws_spoke").as[SpokeEvent].collect()
    assert(rows.exists(e => e.kind == "log" && e.value == 2.0), "drain of 2 buffered")
    assert(rows.exists(e => e.kind == "response" && e.info == "fitted=3"),
      rows.mkString(";"))
    assert(rows.count(_.kind == "prediction") == 1)
  }

  test("two pipelines in one envelope stream keep isolated models") {
    val st1 = fresh(); val st2 = fresh()
    def forPipeline(p: Int)(e: Envelope) = e.copy(pipelineId = p)
    val create = ctl(0, "Create", "PA")
    Spoke.process(1, Iterator(create, data(1, 1, Some(1.0)), data(2, 2, Some(1.0))), st1)
      .foreach(_ => ())
    Spoke.process(2, Iterator(forPipeline(2)(create),
      data(1, 9, Some(-1.0))), st2).foreach(_ => ())
    val r1 = Spoke.process(1, Iterator(ctl(10, "Query")), st1).toSeq.head
    val r2 = Spoke.process(2, Iterator(forPipeline(2)(ctl(10, "Query"))), st2).toSeq.head
    assert(r1.info == "fitted=2")
    assert(r2.info == "fitted=1")
    assert(r1.pipelineId == 1 && r2.pipelineId == 2)
  }

  test("within-trigger events replay in seq order regardless of iterator order") {
    val st = fresh()
    // Create has lower seq than the data — must apply first even though the
    // iterator delivers it last
    val out = Spoke.process(1, Iterator(
      data(5, 10, Some(1.0)), data(6, 11, Some(1.0)), ctl(0, "Create", "PA")), st).toSeq
    assert(out.find(_.kind == "log").get.value == 0.0) // nothing buffered
    val out2 = Spoke.process(1, Iterator(ctl(10, "Query")), st).toSeq
    assert(out2.head.info == "fitted=2")
  }
}
