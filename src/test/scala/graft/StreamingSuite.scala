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
    assert(resp.info.startsWith("fitted=3,"), resp.info)
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
    // post-Delete Query: the catalog's "rejected: missing" outcome
    // (PipelineMap.scala:42-44) — the spoke no longer hosts the pipeline
    val out2 = Spoke.process(1, Iterator(ctl(20, "Query", reqId = 2L)), st).toSeq
    assert(out2.map(e => (e.kind, e.info)) ==
      Seq(("log", "query_rejected:missing")))
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
    assert(resp.get.info.startsWith("fitted=3,"), resp.get.info)
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
    assert(rows.exists(e => e.kind == "response" && e.info.startsWith("fitted=3,")),
      rows.mkString(";"))
    assert(rows.count(_.kind == "prediction") == 1)
  }

  test("held-out ring: 2-of-10 split, Query scored against ring, deterministic replay") {
    // 30 training points after Create: cycle positions 8,9 of every 10 go to
    // the ring (FlinkSpoke.scala:92-107) -> ring 6, trained 24
    def run(): (SpokeEvent, SpokeEvent) = {
      val st = fresh()
      Spoke.process(1, Iterator(ctl(0, "Create", "PA")), st).foreach(_ => ())
      val pts = (0 until 30).map(i =>
        data(10 + i, i, Some(if (i % 3 == 0) 1.0 else -1.0)))
      Spoke.process(1, pts.iterator, st).foreach(_ => ())
      val r1 = Spoke.process(1, Iterator(ctl(100, "Query", reqId = 5L)), st).toSeq.head
      val r2 = Spoke.process(1, Iterator(ctl(101, "Query", reqId = 6L)), st).toSeq.head
      (r1, r2)
    }
    val (r1, r2) = run()
    assert(r1.info.startsWith("fitted=24,testn=6,"), r1.info)
    // Query is read-only: repeating it returns the identical snapshot
    assert(r1.info == r2.info && r1.value == r2.value)
    // deterministic replay: a fresh identical run reproduces loss and score
    val (r1b, _) = run()
    assert(r1b.info == r1.info && r1b.value == r1.value)
    // score is the ring accuracy for a classifier: within [0,1]
    val score = r1.info.split(",").find(_.startsWith("score=")).get
      .stripPrefix("score=").toDouble
    assert(score >= 0.0 && score <= 1.0, score)
  }

  test("full ring evicts oldest point back into training (FIFO)") {
    val st = TestGroupState.create[SpokeState](
      org.apache.spark.api.java.Optional.empty[SpokeState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    def step(evts: Seq[Envelope]) =
      Spoke.process(testMode = false, testCap = 2)(1, evts.iterator, st).toSeq
    step(Seq(ctl(0, "Create", "PA")))
    // 30 points, ring candidates at positions 8,9,18,19,28,29; cap 2 =>
    // 4 evictions feed back to training: fitted = 24 + 4 = 28, testn = 2
    step((0 until 30).map(i => data(10 + i, i, Some(1.0))))
    val r = step(Seq(ctl(100, "Query", reqId = 5L))).head
    assert(r.info.startsWith("fitted=28,testn=2,"), r.info)
  }

  test("drained pre-Create buffer goes through the 2-of-10 split too") {
    val st = fresh()
    // 20 points buffered BEFORE Create; the drain routes them through
    // handleData, so 4 land in the ring (positions 8,9,18,19)
    Spoke.process(1, (0 until 20).map(i =>
      data(i, i, Some(1.0))).iterator, st).foreach(_ => ())
    val out = Spoke.process(1, Iterator(ctl(100, "Create", "PA")), st).toSeq
    assert(out.find(_.kind == "log").get.value == 20.0)
    val r = Spoke.process(1, Iterator(ctl(101, "Query", reqId = 5L)), st).toSeq.head
    assert(r.info.startsWith("fitted=16,testn=4,"), r.info)
  }

  test("held-out ring survives a streaming-query restart from checkpoint") {
    val spark = TestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ringck_").toString
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
    val batch1 = ctl(0, "Create", "PA") +:
      (0 until 30).map(i => data(10 + i, i, Some(if (i % 3 == 0) 1.0 else -1.0)))
    batch1.toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // reference Query in the same incarnation records the expected snapshot
    val stDirect = fresh()
    Spoke.process(1, batch1.iterator, stDirect).foreach(_ => ())
    val expected = Spoke.process(1,
      Iterator(ctl(100, "Query", reqId = 77L)), stDirect).toSeq.head
    // second incarnation: only a Query arrives; ring contents and model must
    // both come back from the checkpointed state store
    Thread.sleep(1100)
    Seq(ctl(100, "Query", reqId = 77L)).toDS().coalesce(1)
      .write.mode("append").parquet(s"$dir/data")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val resp = sink.toArray(Array.empty[SpokeEvent]).find(_.kind == "response")
    assert(resp.isDefined, s"no response in ${sink.size} events")
    assert(resp.get.info == expected.info, s"${resp.get.info} != ${expected.info}")
    assert(resp.get.value == expected.value)
    assert(resp.get.info.startsWith("fitted=24,testn=6,"), resp.get.info)
  }

  test("test-mode polling emits one curve point per 100 records, across triggers") {
    val st = fresh()
    def step(evts: Seq[Envelope]) =
      Spoke.process(testMode = true, testCap = SpokeCore.TestCap)(
        1, evts.iterator, st).toSeq
    step(Seq(ctl(0, "Create", "PA")))
    // 250 records split over two triggers (130 + 120): pollCount persists in
    // state, so polls fire at records 100 and 200 -> 2 curve points
    val curve1 = step((0 until 130).map(i => data(10 + i, i, Some(1.0))))
      .filter(_.kind == "curve")
    val curve2 = step((0 until 120).map(i => data(200 + i, 130 + i, Some(1.0))))
      .filter(_.kind == "curve")
    assert(curve1.length == 1 && curve2.length == 1, s"$curve1 / $curve2")
    // curve points are scored against the ring: id carries the fitted count
    assert(curve1.head.id == 80L, curve1.head.toString) // 100 records, 20 in ring
    assert(curve2.head.id == 160L, curve2.head.toString)
    assert(curve1.head.info.contains("testn=20"), curve1.head.info)
  }

  test("stats operator: out-of-order batch keeps the max-event-time score, not the last") {
    val st = TestGroupState.create[StatsState](
      org.apache.spark.api.java.Optional.empty[StatsState](),
      GroupStateTimeout.EventTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.of(500L), hasTimedOut = false)
    // intentionally shuffled: the newest point (ts=9000, score=0.9) arrives
    // FIRST in iterator order; "last write wins" would leave 0.2 behind
    StatsOperator.process(30000L)(1, Iterator(
      StatEvent(1, 1, 100, 1, 10, 0.9, 9000L),
      StatEvent(1, 1, 100, 1, 10, 0.5, 3000L),
      StatEvent(1, 1, 100, 1, 10, 0.2, 6000L)), st).foreach(_ => ())
    val s1 = st.get
    assert(s1.score == 0.9, s"stale score survived: $s1")
    assert(s1.lastTsMs == 9000L && s1.firstTsMs == 3000L)
    // a second out-of-order batch with only OLDER records must not clobber it
    StatsOperator.process(30000L)(1, Iterator(
      StatEvent(1, 1, 100, 1, 10, 0.1, 4000L)), st).foreach(_ => ())
    assert(st.get.score == 0.9, st.get.toString)
  }

  test("transformWithState buffers 10k pre-Create rows across triggers via ListState") {
    val spark = TestSession.spark
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_twsbuf_").toString
    val n = 10000
    // trigger 1+2: 10k pre-Create rows split across two files (appends hit
    // the ListState, never a whole-buffer rewrite); trigger 3: Create + Query
    (0 until n / 2).map(i => data(i, i, Some(if (i % 2 == 0) 1.0 else -1.0)))
      .toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    Thread.sleep(1100)
    (n / 2 until n).map(i => data(i, i, Some(if (i % 2 == 0) 1.0 else -1.0)))
      .toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    Thread.sleep(1100)
    Seq(ctl(n + 1, "Create", "PA"), ctl(n + 2, "Query", reqId = 5L))
      .toDS().coalesce(1).write.mode("append").parquet(s"$dir/data")
    val src = s2.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Envelope]].schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/data").as[Envelope]
    val name = s"tws_buf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = TwsSpoke.run(src).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", s"$dir/_ckpt").start()
    q.processAllAvailable(); q.stop()
    val rows = s2.table(name).as[SpokeEvent].collect()
    val drained = rows.find(_.kind == "log").get
    assert(drained.value == n.toDouble, drained.toString)
    // drain goes through the 2-of-10 split: 20% of 10k capped at ring 256
    val resp = rows.find(_.kind == "response").get
    assert(resp.info.contains("testn=256"), resp.info)
    // fMGWS parity on the same envelope sequence
    val stP = fresh()
    Spoke.process(1, ((0 until n).map(i =>
        data(i, i, Some(if (i % 2 == 0) 1.0 else -1.0))) :+
      ctl(n + 1, "Create", "PA")).iterator, stP).foreach(_ => ())
    val expected = Spoke.process(1,
      Iterator(ctl(n + 2, "Query", reqId = 5L)), stP).toSeq.head
    assert(resp.info == expected.info, s"${resp.info} != ${expected.info}")
  }

  test("job stats: final statistics only after workers x pipelines Terminate partials") {
    def jstate(wm: Long, timedOut: Boolean = false,
        prev: Option[JobStatsState] = None) =
      TestGroupState.create[JobStatsState](
        prev.map(org.apache.spark.api.java.Optional.of[JobStatsState])
          .getOrElse(org.apache.spark.api.java.Optional.empty[JobStatsState]()),
        GroupStateTimeout.EventTimeTimeout, wm,
        org.apache.spark.api.java.Optional.of(wm + 1), hasTimedOut = timedOut)
    val workers = 2; val testSetSize = 4
    def part(tag: String, pip: Int, w: Int, fitted: Long, score: Double, ts: Long) =
      StatPartial(tag, pip, w, 1L, 64L, fitted, 2.0, score, ts)
    val proc = JobStatsOperator.process(workers, testSetSize, 30000L) _
    val st = jstate(0L)
    // ongoing stats for two pipelines
    val o1 = proc(0, Iterator(
      part("stats", 1, 0, 100, 0.0, 1000L),
      part("stats", 2, 0, 50, 0.0, 2000L),
      part("stats", 1, 1, 110, 0.0, 6000L)), st).toSeq
    assert(o1.isEmpty && st.exists)
    assert(st.getTimeoutTimestampMs.get() == 36000L)
    // quiescence timer fires -> terminate signal, state retained for partials
    val fired = jstate(40000L, timedOut = true, prev = Some(st.get))
    val o2 = proc(0, Iterator.empty, fired).toSeq
    assert(o2.length == 1 && o2.head.kind == "terminate_signal")
    assert(fired.exists, "state cleared before the Terminate partials arrived")
    // 3 of 4 partials: nothing emitted yet (the exactly-(w x p) barrier)
    val st2 = jstate(41000L, prev = Some(fired.get))
    val o3 = proc(0, Iterator(
      part("Terminate", 1, 0, 5, 0.75, 41000L),
      part("Terminate", 2, 0, 3, 0.5, 41001L),
      part("Terminate", 1, 1, 7, 0.25, 41002L)), st2).toSeq
    assert(o3.isEmpty, s"emitted before all partials: $o3")
    // the 4th partial completes the barrier: one final record per pipeline
    val st3 = jstate(42000L, prev = Some(st2.get))
    val o4 = proc(0, Iterator(part("Terminate", 2, 1, 4, 1.0, 42000L)), st3).toSeq
    assert(o4.length == 2, o4.toString)
    assert(o4.map(_.kind).toSet == Set("job_statistics_final"))
    assert(!st3.exists)
    val p1 = o4.find(_.pipelineId == 1).get
    val p2 = o4.find(_.pipelineId == 2).get
    // score = sum(partial score x testSetSize) / (workers x testSetSize)
    assert(math.abs(p1.value - 0.5) < 1e-12, p1.toString)
    assert(math.abs(p2.value - 0.75) < 1e-12, p2.toString)
    // makespan = end - start = 6000 - 1000; fitted = ongoing + partials
    assert(p1.info.contains("makespan=5000"), p1.info)
    assert(p1.info.contains("fitted=222"), p1.info) // 100+110 ongoing + 5+7
    assert(p2.info.contains("fitted=57"), p2.info) // 50 ongoing + 3+4
    assert(p1.info.contains("partials=2") && p2.info.contains("partials=2"))
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
    assert(r1.info.startsWith("fitted=2,"))
    assert(r2.info.startsWith("fitted=1,"))
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
    assert(out2.head.info.startsWith("fitted=2,"))
  }

  test("transformWithState checkpoint survives adding a state field (avro evolution)") {
    // The documented fMGWS limitation is that SpokeState cannot gain a
    // field without abandoning the checkpoint; TwsSpoke is the fix path.
    // This gate proves the transformWithState + avro-encoding combination
    // actually reopens a PRE-EVOLUTION checkpoint after the state case
    // class grows an Option field, carrying old counts forward.
    val spark = TestSession.spark
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_twsevo_").toString
    def stage(lo: Int, hi: Int): Unit =
      (lo until hi).map(i => EvoRec(i % 4, i.toLong)).toDS()
        .coalesce(1).write.mode("append").parquet(s"$dir/data")
    def run(proc: org.apache.spark.sql.streaming.StatefulProcessor[Int, EvoRec, EvoOut])
        : Unit = {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val src = s2.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EvoRec]].schema)
        .parquet(s"$dir/data").as[EvoRec]
      // file sink, not memory: the memory sink refuses checkpoint recovery,
      // and reopening the checkpoint is the whole point of this gate
      val q = src.groupByKey(_.k)
        .transformWithState(proc, TimeMode.None(), OutputMode.Append())
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/_ckpt").start()
      q.processAllAvailable(); q.stop()
    }
    stage(0, 40)
    run(new EvoProcV1) // checkpoint written with EvoStateV1
    stage(40, 60)
    run(new EvoProcV2) // same checkpoint, evolved state
    val out = s2.read.parquet(s"$dir/out").as[EvoOut].collect()
    for (k <- 0 until 4) {
      val last = out.filter(_.k == k).maxBy(_.cnt)
      assert(last.cnt == 15L,
        s"key $k: pre-evolution count lost on reopen — got ${last.cnt}")
      assert(last.maxSeq == 56L + k, s"key $k: maxSeq ${last.maxSeq}")
    }
  }

  test("crash between WAL write and sink commit recovers exactly-once " +
    "(both state-store providers)") {
    // drives the same crashRecoveryRun the driver-gated st40 uses: clean
    // run, delete commits/N + sink _spark_metadata/N (orphan data files
    // left behind), restart, and require (a) the WAL/sink entries are
    // re-written, (b) new output files appeared (batch N re-executed),
    // (c) the metadata-aware sink read equals the batch aggregate — no
    // dupes from the orphans, no gaps from a skipped re-execution.
    import org.apache.spark.sql.functions._
    val spark = TestSession.spark
    val sf = "/root/testdata/sf0.001"
    val (dir, schema, _) = Streaming.stageEventsCached(spark, sf, 2)
    val expected = T.events(spark, sf)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n"),
        sum(Num.dec2(col("value"))).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    for (provider <- Seq("hdfs", "rocksdb")) {
      val got = graft.operators.StreamOps
        .crashRecoveryRun(spark, dir, schema, provider)
        .collect()
      assert(got.nonEmpty, s"$provider: empty recovery output")
      got.foreach { r =>
        assert(r.getAs[Boolean]("recovered_commit"),
          s"$provider: deleted WAL/sink entries not re-written")
        assert(r.getAs[Boolean]("reexecuted"),
          s"$provider: no new output files — batch was not re-executed")
      }
      val agg = got.map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("day_us")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
      assert(agg == expected,
        s"$provider: post-crash sink != batch aggregate " +
          s"(${agg.size} vs ${expected.size} groups)")
    }
  }

  test("st26 cusumFold survives one dominant key and matches a naive fold") {
    import graft.operators.{CusumState, StreamOps}
    def bd(i: Int) = new java.math.BigDecimal(s"${50 + (i % 23)}.0${i % 10}")
    // one hot key with 50k rows (the skewed event_type), two cold keys;
    // rows pre-sorted per the repartition+sortWithinPartitions contract
    val hot = (0 until 50000).map(i => ("hot", i.toLong, i.toLong, bd(i)))
    val cold = Seq("cold_a", "cold_b").flatMap(k =>
      (0 until 10).map(i => (k, i.toLong, i.toLong, bd(i + 7))))
    val rows = (cold.filter(_._1 == "cold_a") ++ hot ++
      cold.filter(_._1 == "cold_b")).iterator
    val prior = Map("hot" ->
      CusumState("hot", "12.00", "-3.00", "15.00", 4L, 0L, -1L))
    val got = StreamOps.cusumFold(prior, rows)
      .map(st => st.event_type -> st).toMap
    // naive reference: per-key toSeq fold with the same decimal recurrence
    def naive(key: String, vs: Seq[java.math.BigDecimal]): CusumState = {
      var st = prior.getOrElse(key,
        CusumState(key, "0.00", "0.00", "0.00", 0L, 0L, -1L))
      for (v <- vs) {
        val cs = BigDecimal(st.cs) + BigDecimal(v) - BigDecimal("55.00")
        val mn = BigDecimal(st.mn).min(cs)
        val ph = cs - mn
        st = CusumState(key, cs.toString, mn.toString,
          BigDecimal(st.maxPh).max(ph).toString, st.nPts + 1,
          st.nAlarms + (if (ph > BigDecimal("500.00")) 1 else 0),
          if (st.firstAlarm >= 0) st.firstAlarm
          else if (ph > BigDecimal("500.00")) st.nPts + 1 else -1L)
      }
      st
    }
    val all = cold ++ hot
    for (key <- Seq("hot", "cold_a", "cold_b")) {
      val exp = naive(key, all.filter(_._1 == key).sortBy(r => (r._2, r._3))
        .map(_._4))
      assert(got(key) == exp, s"$key: iterator fold != naive fold")
    }
    assert(got("hot").nPts == 50004L) // prior 4 + this batch's 50k
  }
}

// --- transformWithState schema-evolution fixtures (top-level: Spark must
// serialize the processors and encode the case classes) ---

case class EvoRec(k: Int, seq: Long)
case class EvoStateV1(cnt: Long)
/** V1 + one Option field — the exact "state gained a field" shape the
  * fMGWS SpokeState cannot survive; avro-encoded tws state must.
  */
case class EvoStateV2(cnt: Long, maxSeq: Option[Long])
case class EvoOut(k: Int, cnt: Long, maxSeq: Long)

class EvoProcV1
    extends org.apache.spark.sql.streaming.StatefulProcessor[Int, EvoRec, EvoOut] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[EvoStateV1] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV1]("cnt",
      Encoders.product[EvoStateV1], TTLConfig.NONE)
  override def handleInputRows(key: Int, rows: Iterator[EvoRec],
      timerValues: TimerValues): Iterator[EvoOut] = {
    val c = (if (st.exists()) st.get().cnt else 0L) + rows.size
    st.update(EvoStateV1(c))
    Iterator.single(EvoOut(key, c, -1L))
  }
}

class EvoProcV2
    extends org.apache.spark.sql.streaming.StatefulProcessor[Int, EvoRec, EvoOut] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[EvoStateV2] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV2]("cnt",
      Encoders.product[EvoStateV2], TTLConfig.NONE)
  override def handleInputRows(key: Int, rows: Iterator[EvoRec],
      timerValues: TimerValues): Iterator[EvoOut] = {
    val prev = if (st.exists()) Some(st.get()) else None
    var c = prev.map(_.cnt).getOrElse(0L)
    var mx = prev.flatMap(_.maxSeq).getOrElse(-1L)
    rows.foreach { r => c += 1; mx = math.max(mx, r.seq) }
    st.update(EvoStateV2(c, Some(mx)))
    Iterator.single(EvoOut(key, c, mx))
  }
}
