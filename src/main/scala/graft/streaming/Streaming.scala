package graft.streaming

import graft.ml.{Learners, ModelState, OnlineLearner}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types.StructType

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer

/** Structured-Streaming side of the engine.
  *
  * Mirrors the reference's streaming dataflow (SURVEY §2.3-2.4) on Spark:
  *  - event-time windows + watermarks replace the reference's ingestion-time
  *    processing (the reference has none of these — §2.7 — so they come from
  *    Spark built-ins);
  *  - [[Spoke]] is the K1/K2 analog: a keyed stateful processor
  *    (flatMapGroupsWithState) holding per-pipeline model state, buffering
  *    data that arrives before Create (SpokeLogic.scala:28-35), training on
  *    the data path, answering Query with loss/count snapshots and emitting
  *    Predictions for forecasting points.
  *
  * Batch fixtures are staged into time-ranged parquet files read with
  * maxFilesPerTrigger=1, so a query really runs multiple triggers and the
  * watermark advances between them — append-mode window results are produced
  * by watermark progress, not by query shutdown. A far-future sentinel row
  * (+40 days) closes the tail windows; rows derived from it are filtered out
  * after the run (the oracle never sees the sentinel). Callers must pick a
  * watermark delay LARGER than the staged data's time span: same-mtime files
  * can be listed in any order, and a smaller delay would silently late-drop
  * an out-of-order file's data.
  */
object Streaming {

  /** Staged-events cache: the fixture staging (a full write of the events
    * table) is identical across the streaming ops, so stage once per
    * (sfDir, nFiles) and share the directory. Checkpoints live in `_`-prefixed
    * subdirectories, which the file source ignores.
    */
  private val stageCache =
    scala.collection.concurrent.TrieMap[(String, Int), (String, StructType, Long)]()

  /** Base for streaming scratch dirs (staged fixtures + checkpoints):
    * RAM-backed tmpfs when available, else java.io.tmpdir. This only dodges
    * shared-disk fsync latency on the local bench — the checkpoint protocol
    * (offset/commit WAL, state-store deltas, recovery) runs unchanged, and
    * the restart tests prove recovery against the same layout. A cluster
    * deployment points checkpoints at HDFS/S3 instead.
    */
  private val scratchBase: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Create a streaming scratch directory under [[scratchBase]]. */
  def scratchDir(prefix: String): String =
    Files.createTempDirectory(scratchBase, prefix).toString

  private val stagedDirCache =
    scala.collection.concurrent.TrieMap[(String, String), String]()

  /** Memoized scratch staging: `build` runs once per (key, sfDir) and the
    * staged directory is shared by every later call — fixture staging is
    * scaffolding, not operator cost, and re-writing the same parquet layout
    * per bench pass would bill the query for it. Callers MUST use per-run
    * unique checkpoint paths inside a memoized dir (a fixed name would
    * resume the first run's committed offsets and emit nothing).
    */
  def stagedDir(key: String, sfDir: String)(build: String => Unit): String =
    stagedDirCache.getOrElseUpdate((key, sfDir), {
      val dir = scratchDir(s"graft_${key}_")
      build(dir)
      dir
    })

  def stageEventsCached(spark: SparkSession, sfDir: String, nFiles: Int): (String, StructType, Long) =
    stageCache.getOrElseUpdate((sfDir, nFiles),
      stageEvents(spark, graft.T.events(spark, sfDir), nFiles))

  /** Streaming state-store partition count. Each stateful operator opens one
    * state store per shuffle partition per trigger; at local bench scale 4
    * partitions cut that fixed cost 8x vs the session's 32 while keeping the
    * operator fully partition-parallel (results are partition-count
    * independent — decimal-exact sums, keyed state; the suite re-runs with
    * SPARK_GRAFT_CPUS=32 to prove it). On a real cluster this would be
    * sized to executor count instead.
    */
  val StreamShufflePartitions = 4

  /** Run `body` with the session's shuffle partitions temporarily lowered to
    * [[StreamShufflePartitions]] (streaming queries bake the value into their
    * state checkpoint at start).
    */
  def withStreamShuffle[A](spark: SparkSession)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Stage a batch DataFrame as n time-ranged parquet files + a sentinel
    * file; returns (dir, schema, maxTs-in-micros). `sentinelDays` must
    * exceed watermarkDelay + any join/window range the query needs flushed
    * (outer joins hold unmatched rows until watermark > ts + range); 120
    * covers the 35-day delays + 7-day ranges used across the streaming set,
    * and a farther sentinel is always safe (it only closes windows sooner
    * relative to the data).
    */
  def stageEvents(spark: SparkSession, events: DataFrame, nFiles: Int,
      sentinelDays: Int = 120): (String, StructType, Long) = {
    val dir = scratchDir("graft_stream_")
    val maxTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    events.repartitionByRange(nFiles, col("ts"))
      .write.mode("append").parquet(dir)
    // sentinel: one far-future row per schema, closes all real windows
    val sentinel = events.limit(1)
      .withColumn("ts", timestamp_micros(lit(maxTs + sentinelDays.toLong * 86400L * 1000000L)))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("sentinel"))
      .withColumn("value", lit(0.0))
    sentinel.coalesce(1).write.mode("append").parquet(dir)
    (dir, events.schema, maxTs)
  }

  /** Run `build` over a staged directory as a real streaming query
    * (append mode, memory sink), wait for completion, return the collected
    * result as a batch DataFrame.
    */
  def runStream(spark: SparkSession, dir: String, schema: StructType,
      name: String, build: DataFrame => DataFrame): DataFrame =
    withStreamShuffle(spark) {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = build(src).writeStream
        .format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$dir/_ckpt_$name")
        .start()
      q.processAllAvailable()
      q.stop()
      spark.table(name)
    }
}

/** Envelope: the unified control+data stream element (SURVEY §3.4). */
case class Envelope(
    seq: Long, // total order within a pipeline (Kafka offset analog)
    pipelineId: Int,
    kind: String, // "data" | "control"
    reqType: String, // Create | Update | Query | Delete ("" for data)
    learner: String,
    requestId: Long,
    id: Long,
    features: Seq[Double],
    target: Option[Double],
    operation: String)

/** Tagged spoke output (side-output analog, SURVEY §2.4 K9). */
case class SpokeEvent(
    pipelineId: Int,
    kind: String, // "prediction" | "response" | "log"
    requestId: Long,
    id: Long,
    value: Double,
    info: String)

/** Serializable spoke state: model as a blob (Catalyst-encodable), the
  * pre-Create buffer (capped like SpokeLogic.scala:32-35), and the held-out
  * test ring (FlinkSpoke.scala:92-107): of every 10 training points, points
  * 8-9 of the cycle go into a FIFO ring of <= `testCap`; once full, each
  * append evicts the oldest point back INTO training. Query answers are
  * scored against the ring (FlinkSpoke.scala:160-163).
  *
  * `buffered`/`bufferedCount` describe the pre-Create buffer. The fMGWS
  * binding keeps the rows inline in `buffered`; the transformWithState
  * binding keeps them in a separate ListState (O(1) appends) and leaves
  * `buffered` Nil while tracking the size in `bufferedCount`.
  */
case class SpokeState(
    learnerName: String,
    created: Boolean,
    modelBlob: Array[Byte],
    buffered: Seq[(Seq[Double], Option[Double])],
    bufferedCount: Int = 0,
    testRing: Seq[(Seq[Double], Double)] = Nil,
    ringPos: Int = 0,
    sampleCount: Int = 0,
    pollCount: Int = 0)

/** Pre-Create buffer storage hook: the fMGWS binding buffers inside the
  * [[SpokeState]] blob; the transformWithState binding plugs in ListState
  * so an append never rewrites the whole buffer.
  */
trait SpokeBuffer {
  def append(features: Seq[Double], target: Option[Double]): Unit
  /** Read every buffered row and clear the buffer. */
  def drain(): Seq[(Seq[Double], Option[Double])]
}

/** The spoke state machine, shared by both stateful-API bindings
  * ([[Spoke]]: flatMapGroupsWithState; [[TwsSpoke]]: Spark 4
  * transformWithState): pure (events, state) -> (outputs, state).
  */
object SpokeCore {
  val BufferCap = 100000 // reference record-buffer cap (SpokeLogic.scala:32)
  val TestCap = 256 // reference held-out ring size (DefaultJobParameters)
  val PollEvery = 100 // reference test-mode poll cadence (FlinkSpoke.scala:85)

  def ser(m: ModelState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    bos.toByteArray
  }
  def deser(b: Array[Byte]): ModelState = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(b))
    ois.readObject().asInstanceOf[ModelState]
  }

  /** Score a model against the held-out ring: (avg test loss, score).
    * Score = accuracy for classifiers, -RMSE for regressors, -mean
    * distortion for clustering — same contract as the batch Trainer.
    */
  def evalRing(learner: OnlineLearner, model: ModelState,
      ring: Seq[(Seq[Double], Double)]): (Double, Double) = {
    if (model == null || ring.isEmpty) return (0.0, 0.0)
    var ls = 0.0; var sc = 0.0
    ring.foreach { case (f, y) =>
      val x = f.toArray
      ls += learner.loss(model, x, y)
      if (learner.isClassifier) { if (learner.predict(model, x) == y) sc += 1.0 }
      else { val e = learner.predict(model, x) - y; sc += e * e }
    }
    val n = ring.length
    val avgLoss = ls / n
    val score =
      if (learner.isClassifier) sc / n
      // type test, not name test: MiniBatchKMeans must score as clustering
      // too (same contract as the batch Trainer, Pipeline.scala)
      else if (learner.isInstanceOf[graft.ml.OnlineKMeans]) -avgLoss
      else -math.sqrt(sc / n)
    (avgLoss, score)
  }

  /** One trigger's worth of events for one pipeline.
    *
    * @param extBuffer when set, pre-Create buffering goes through it instead
    *                  of the in-state `buffered` seq (ListState binding).
    * @param testMode  reference test mode: every [[PollEvery]] data records
    *                  emit a learning-curve point ("curve" event) scored
    *                  against the current ring — the Spark-native form of the
    *                  reference's SpokeMessage(-1) self-query poll
    *                  (FlinkSpoke.scala:83-89).
    */
  def step(key: Int, eventsIn: Iterator[Envelope], prev: Option[SpokeState],
      extBuffer: Option[SpokeBuffer] = None, testMode: Boolean = false,
      testCap: Int = TestCap)
      : (Seq[SpokeEvent], Option[SpokeState]) = {
    val events = eventsIn.toArray.sortBy(_.seq)
    var st = prev.getOrElse(SpokeState("", created = false, null, Nil))
    var learner: OnlineLearner = if (st.created) Learners.create(st.learnerName) else null
    var model: ModelState = if (st.modelBlob != null) deser(st.modelBlob) else null
    var buffer = st.buffered.toVector
    var bufCount = st.bufferedCount
    val ring = st.testRing.toBuffer
    var ringPos = st.ringPos
    var sampleCount = st.sampleCount
    var pollCount = st.pollCount
    val out = ArrayBuffer[SpokeEvent]()

    def train(features: Seq[Double], target: Option[Double]): Unit = {
      if (model == null) model = learner.init(features.length)
      target.foreach(t => learner.fit(model, features.toArray, t))
    }

    /** FlinkSpoke.handleData:92-107 — the 2-of-10 held-out split: cycle
      * positions 8-9 go to the ring (a full ring evicts its oldest point
      * back into training); positions 0-7 train directly. Forecasting
      * points never touch the cycle.
      */
    def handleData(features: Seq[Double], target: Option[Double]): Unit =
      target match {
        case Some(y) =>
          if (sampleCount >= 8) {
            if (ring.length < testCap) ring += ((features, y))
            else {
              val (ef, ey) = ring(ringPos)
              ring(ringPos) = ((features, y))
              ringPos = (ringPos + 1) % testCap
              train(ef, Some(ey))
            }
          } else train(features, target)
          sampleCount += 1
          if (sampleCount == 10) sampleCount = 0
        case None => train(features, None)
      }

    def queryScore(): (Long, Double, Double, Double) = {
      val (n, cum) = if (model == null) (0L, 0.0) else (model.n, model.cumLoss)
      val (tl, sc) = evalRing(learner, model, ring.toSeq)
      (n, cum, tl, sc)
    }

    events.foreach { e =>
      if (e.kind == "control") e.reqType match {
        case "Create" =>
          if (learner != null)
            // the catalog's duplicate-Create rejection (PipelineMap.scala:
            // 31-36, "rejected: exists"), surfaced per hosted pipeline —
            // exists takes precedence over validation, like the reference
            out += SpokeEvent(key, "log", e.requestId, -1, 0.0,
              "create_rejected:exists")
          else if (!Learners.names.contains(e.learner))
            // the catalog's learner-name validation (PipelineMap.scala:
            // 66-69) lives WITH the per-pipeline state: a malformed Create
            // is rejected in place, never crashes a worker
            out += SpokeEvent(key, "log", e.requestId, -1, 0.0,
              s"create_rejected:invalid learner: ${e.learner}")
          else {
            learner = Learners.create(e.learner)
            st = st.copy(learnerName = e.learner, created = true)
            val pending = extBuffer.map(_.drain()).getOrElse(buffer)
            buffer = Vector.empty; bufCount = 0
            // drained rows go through handleData, so the 2-of-10 split
            // applies to them too (FlinkSpoke drains via handleData)
            pending.foreach { case (f, t) => handleData(f, t) }
            out += SpokeEvent(key, "log", e.requestId, -1,
              pending.length.toDouble, "created:drained")
          }
        case "Update" =>
          if (!Learners.names.contains(e.learner))
            // Update validates like Create (PipelineMap.scala:37-41)
            out += SpokeEvent(key, "log", e.requestId, -1, 0.0,
              s"update_rejected:invalid learner: ${e.learner}")
          else {
            learner = Learners.create(e.learner)
            st = st.copy(learnerName = e.learner, created = true)
            model = null // fresh model; ring persists (operator-level in ref)
            out += SpokeEvent(key, "log", e.requestId, -1, 0.0, "updated")
          }
        case "Query" =>
          if (learner == null)
            // the catalog's Query-on-missing rejection (PipelineMap.scala:
            // 42-44, "rejected: missing"): no pipeline, no response partial
            out += SpokeEvent(key, "log", e.requestId, -1, 0.0,
              "query_rejected:missing")
          else {
            // scored against the held-out ring (FlinkSpoke.scala:160-163):
            // value = avg test loss; info carries fitted count, ring size,
            // score and the cumulative training loss
            val (n, cum, tl, sc) = queryScore()
            out += SpokeEvent(key, "response", e.requestId, -1, tl,
              s"fitted=$n,testn=${ring.length},score=$sc,cumLoss=$cum")
          }
        case "Delete" =>
          learner = null; model = null; buffer = Vector.empty; bufCount = 0
          extBuffer.foreach(_.drain())
          ring.clear(); ringPos = 0; sampleCount = 0; pollCount = 0
          st = SpokeState("", created = false, null, Nil)
          out += SpokeEvent(key, "log", e.requestId, -1, 0.0, "deleted")
        case _ => ()
      } else {
        if (learner == null) {
          if (bufCount < SpokeCore.BufferCap) {
            extBuffer match {
              case Some(b) => b.append(e.features, e.target)
              case None => buffer :+= ((e.features, e.target))
            }
            bufCount += 1
          }
        } else if (e.operation == "forecasting") {
          if (model != null)
            out += SpokeEvent(key, "prediction", -1, e.id,
              learner.predict(model, e.features.toArray), "")
        } else handleData(e.features, e.target)
        // test-mode polling: one learning-curve point per PollEvery records
        // (the reference's every-100-records self-query)
        if (testMode) {
          pollCount += 1
          if (pollCount == PollEvery) {
            pollCount = 0
            val (n, _, tl, sc) = queryScore()
            out += SpokeEvent(key, "curve", -1L, n, sc, s"testLoss=$tl,testn=${ring.length}")
          }
        }
      }
    }
    (out.toSeq, Some(st.copy(
      modelBlob = if (model == null) null else ser(model),
      buffered = buffer,
      bufferedCount = bufCount,
      testRing = ring.toSeq,
      ringPos = ringPos,
      sampleCount = sampleCount,
      pollCount = pollCount)))
  }
}

/** flatMapGroupsWithState binding of [[SpokeCore]] (works with the default
  * HDFS-backed state store).
  */
object Spoke {
  val BufferCap: Int = SpokeCore.BufferCap

  def process(key: Int, it: Iterator[Envelope], state: GroupState[SpokeState]): Iterator[SpokeEvent] =
    process(testMode = false, testCap = SpokeCore.TestCap)(key, it, state)

  def process(testMode: Boolean, testCap: Int)(
      key: Int, it: Iterator[Envelope], state: GroupState[SpokeState]): Iterator[SpokeEvent] = {
    val (out, next) = SpokeCore.step(key, it, state.getOption,
      testMode = testMode, testCap = testCap)
    next.foreach(state.update)
    out.iterator
  }

  /** Wire the processor over an envelope stream. */
  def run(envelopes: Dataset[Envelope], testMode: Boolean = false,
      testCap: Int = SpokeCore.TestCap): Dataset[SpokeEvent] = {
    import envelopes.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    envelopes.groupByKey(_.pipelineId)
      .flatMapGroupsWithState[SpokeState, SpokeEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(process(testMode, testCap))
  }
}

/** Spark 4 `transformWithState` binding of [[SpokeCore]] — the stateful API
  * SURVEY §2.4 maps K1/K2 onto. Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`).
  *
  * Buffer shape (r10 verdict #5 — structural fix for a measured RocksDB
  * trap): r10 stored the pre-Create buffer as one ListState and found that
  * with the provider DEFAULT `trackTotalNumberOfRows=true` every
  * appendValue (a RocksDB merge) also GETs the whole accumulated list to
  * maintain the row-count metric — O(buffer) per append, quadratic across a
  * large buffer (a 50k-row load sat >7 min in RocksDB.get until the flag
  * was turned off). This binding is now IMMUNE to that flag: buffered rows
  * live in fixed-size chunks ([[TwsSpoke.ChunkSize]] rows per entry) inside
  * a MapState keyed by chunk index. MapState updates are plain point PUTs —
  * no merge operator, so no row-count GET-the-world path exists — and each
  * trigger touches ONE bounded tail chunk plus O(newRows/ChunkSize) closed
  * chunks, with tracking ON or OFF (both pinned by the R10 suite load
  * test). Appends within a trigger stage in task memory and flush once
  * after the step, so per-row state-store work is amortized O(1).
  */
class TwsSpokeProcessor(testMode: Boolean = false, testCap: Int = SpokeCore.TestCap)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Int, Envelope, SpokeEvent] {
  import org.apache.spark.sql.streaming.{MapState, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var state: ValueState[SpokeState] = _
  @transient private var bufChunks: MapState[Long, BufChunk] = _
  @transient private var bufMeta: ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    state = getHandle.getValueState[SpokeState]("spokeState",
      Encoders.product[SpokeState], TTLConfig.NONE)
    bufChunks = getHandle.getMapState[Long, BufChunk]("preCreateChunks",
      Encoders.scalaLong, Encoders.product[BufChunk], TTLConfig.NONE)
    bufMeta = getHandle.getValueState[Long]("preCreateChunkCount",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Int, rows: Iterator[Envelope],
      timerValues: TimerValues): Iterator[SpokeEvent] = {
    val prev = if (state.exists()) Some(state.get()) else None
    // appends stage here during the step; flushed to chunked state below
    val pending = scala.collection.mutable.ArrayBuffer.empty[BufRow]
    val ext = new SpokeBuffer {
      override def append(features: Seq[Double], target: Option[Double]): Unit =
        pending += BufRow(features, target)
      override def drain(): Seq[(Seq[Double], Option[Double])] = {
        val nc = if (bufMeta.exists()) bufMeta.get() else 0L
        val stored = (0L until nc).iterator
          .flatMap(i => bufChunks.getValue(i).rows)
          .map(r => (r.features, r.target)).toSeq
        if (nc > 0) { bufChunks.clear(); bufMeta.clear() }
        val all = stored ++ pending.map(r => (r.features, r.target))
        pending.clear()
        all
      }
    }
    val (out, next) = SpokeCore.step(key, rows, prev, Some(ext), testMode, testCap)
    if (pending.nonEmpty) {
      var nc = if (bufMeta.exists()) bufMeta.get() else 0L
      var tail =
        if (nc > 0)
          scala.collection.mutable.ArrayBuffer.from(bufChunks.getValue(nc - 1).rows)
        else { nc = 1L; scala.collection.mutable.ArrayBuffer.empty[BufRow] }
      pending.foreach { r =>
        if (tail.length >= TwsSpoke.ChunkSize) {
          bufChunks.updateValue(nc - 1, BufChunk(tail.toSeq)) // close full chunk
          nc += 1
          tail = scala.collection.mutable.ArrayBuffer.empty[BufRow]
        }
        tail += r
      }
      bufChunks.updateValue(nc - 1, BufChunk(tail.toSeq))
      bufMeta.update(nc)
    }
    next.foreach(state.update)
    out.iterator
  }
}

/** Row shape of the transformWithState pre-Create buffer. */
case class BufRow(features: Seq[Double], target: Option[Double])

/** One fixed-size chunk of buffered rows — the MapState value type (see
  * [[TwsSpokeProcessor]]'s buffer-shape note).
  */
case class BufChunk(rows: Seq[BufRow])

object TwsSpoke {
  /** Rows per buffer chunk: bounds every per-trigger state GET/PUT to
    * ChunkSize rows regardless of total buffer size. 512 rows x ~(8B x dim)
    * keeps a chunk well under RocksDB's comfortable value size at the
    * fixture dims while amortizing the per-entry overhead 512x.
    */
  val ChunkSize = 512

  def run(envelopes: Dataset[Envelope], testMode: Boolean = false,
      testCap: Int = SpokeCore.TestCap): Dataset[SpokeEvent] = {
    import envelopes.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    envelopes.groupByKey(_.pipelineId)
      .transformWithState(new TwsSpokeProcessor(testMode, testCap),
        TimeMode.None(), OutputMode.Append())
  }
}

/** Per-pipeline statistics record flowing into [[StatsOperator]]
  * (the reference's (String, Statistics) hub output, FlinkHub.scala:96-156).
  */
case class StatEvent(
    pipelineId: Int,
    modelsShipped: Long,
    bytesShipped: Long,
    blocks: Long,
    fitted: Long,
    score: Double,
    eventTimeMs: Long)

case class StatsState(
    modelsShipped: Long, bytesShipped: Long, blocks: Long, fitted: Long,
    score: Double, firstTsMs: Long, lastTsMs: Long)

/** The reference's StatisticsOperator (StatisticsOperator.scala:21-150):
  * merges per-hub statistics per pipeline and uses a quiescence timeout —
  * no new statistics for `timeoutMs` of EVENT time — to emit the final
  * JobStatistics with the pipeline makespan and clear state. The reference
  * registers `lastTimestamp + timeout` event-time timers
  * (StatisticsOperator.scala:91,135-142); here that maps onto
  * GroupStateTimeout.EventTimeTimeout with the timer keyed off watermark
  * progress — quiescence is decided by the data's own clock, so replay and
  * backfill behave identically to live ingestion (a processing-time timer
  * would fire mid-backfill on wall-clock pauses).
  */
object StatsOperator {

  def process(timeoutMs: Long)(
      key: Int, it: Iterator[StatEvent], state: GroupState[StatsState]): Iterator[SpokeEvent] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      val makespan = st.lastTsMs - st.firstTsMs
      Iterator.single(SpokeEvent(key, "job_statistics", -1, -1, st.score,
        s"makespan=$makespan,models=${st.modelsShipped},bytes=${st.bytesShipped}," +
          s"blocks=${st.blocks},fitted=${st.fitted}"))
    } else {
      // Late-data guard: a record at/below the watermark arrives after the
      // quiescence decision for its epoch is sealed — processing it would
      // resurrect state the timer already cleared (the reference's
      // event-time timers give the same guarantee: a post-timer record
      // re-opens nothing retroactively).
      val wm = scala.util.Try(state.getCurrentWatermarkMs).getOrElse(0L)
      val live = it.filter(_.eventTimeMs >= wm).toSeq
      if (live.isEmpty) Iterator.empty
      else {
        var st = state.getOption.getOrElse(
          StatsState(0, 0, 0, 0, 0.0, Long.MaxValue, Long.MinValue))
        live.foreach { e =>
          st = StatsState(
            st.modelsShipped + e.modelsShipped,
            st.bytesShipped + e.bytesShipped,
            st.blocks + e.blocks,
            st.fitted + e.fitted,
            // newest curve point by EVENT time, not iterator order: an
            // out-of-order batch must not leave a stale score behind
            // (the reference keeps the newest point by timestamp)
            if (e.eventTimeMs >= st.lastTsMs) e.score else st.score,
            math.min(st.firstTsMs, e.eventTimeMs),
            math.max(st.lastTsMs, e.eventTimeMs))
        }
        state.update(st)
        // the reference's timer instant, clamped above the current watermark
        // (Spark rejects timers at or below it)
        state.setTimeoutTimestamp(math.max(st.lastTsMs + timeoutMs, wm + 1))
        Iterator.empty
      }
    }
  }

  /** Wire the processor over a stats stream. The input's `eventTimeMs`
    * drives both the watermark and the quiescence timers. The watermarked
    * timestamp column must reach the stateful operator, so the event rides
    * inside a [[StatEnvelope]] next to it.
    */
  def run(stats: Dataset[StatEvent], timeoutMs: Long = 30000L,
      watermarkDelay: String = "0 seconds"): Dataset[SpokeEvent] = {
    import stats.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val cols = stats.columns.map(col)
    stats
      .withColumn("eventTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("eventTime", watermarkDelay)
      .select(struct(cols: _*).as("e"), col("eventTime"))
      .as[StatEnvelope]
      .groupByKey(_.e.pipelineId)
      .flatMapGroupsWithState[StatsState, SpokeEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Int, it: Iterator[StatEnvelope], state: GroupState[StatsState]) =>
          process(timeoutMs)(key, it.map(_.e), state))
  }
}

/** Carrier keeping the watermarked timestamp column alongside the stats
  * record through the stateful operator (see [[StatsOperator.run]]).
  */
case class StatEnvelope(e: StatEvent, eventTime: java.sql.Timestamp)

/** Spark-4 `transformWithState` binding of the statistics operator — the
  * closest structural analog to the reference's timer API
  * (StatisticsOperator.scala:91,135-142): timers are REGISTERED objects
  * (`getHandle.registerTimer(lastTs + timeout)`, re-registered on every new
  * record, fired by watermark progress into [[handleExpiredTimer]]), not a
  * per-state timeout flag. Requires the RocksDB state store provider, like
  * [[TwsSpoke]]. Semantics proven identical to [[StatsOperator]] by the
  * StreamingSuite parity test.
  */
class TwsStatsProcessor(timeoutMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Int, StatEnvelope, SpokeEvent] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}

  @transient private var state: ValueState[StatsState] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[StatsState]("statsState",
      Encoders.product[StatsState], TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[StatEnvelope],
      timerValues: TimerValues): Iterator[SpokeEvent] = {
    val wm = timerValues.getCurrentWatermarkInMs
    // same late-data guard as StatsOperator.process
    val live = rows.map(_.e).filter(_.eventTimeMs >= wm).toSeq
    if (live.isEmpty) Iterator.empty
    else {
      var st = (if (state.exists()) Option(state.get()) else None).getOrElse(
        StatsState(0, 0, 0, 0, 0.0, Long.MaxValue, Long.MinValue))
      live.foreach { e =>
        st = StatsState(
          st.modelsShipped + e.modelsShipped,
          st.bytesShipped + e.bytesShipped,
          st.blocks + e.blocks,
          st.fitted + e.fitted,
          // same max-event-time-wins rule as StatsOperator.process
          if (e.eventTimeMs >= st.lastTsMs) e.score else st.score,
          math.min(st.firstTsMs, e.eventTimeMs),
          math.max(st.lastTsMs, e.eventTimeMs))
      }
      state.update(st)
      // slide the quiescence timer: drop the old instant, register the new
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(math.max(st.lastTsMs + timeoutMs, wm + 1))
      Iterator.empty
    }
  }

  override def handleExpiredTimer(key: Int, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SpokeEvent] = {
    if (!state.exists()) Iterator.empty
    else {
      val st = state.get()
      state.clear()
      val makespan = st.lastTsMs - st.firstTsMs
      Iterator.single(SpokeEvent(key, "job_statistics", -1, -1, st.score,
        s"makespan=$makespan,models=${st.modelsShipped},bytes=${st.bytesShipped}," +
          s"blocks=${st.blocks},fitted=${st.fitted}"))
    }
  }
}

/** One worker shard's answer to a broadcast Query, as read back off the
  * spoke's response sink (the K5 input shape).
  */
case class WorkerResponse(
    pipe: Int, worker: Int, requestId: Long,
    fitted: Long, testn: Long, loss: Double, score: Double)

/** Merged query response released by the exactly-p barrier. */
case class MergedResponse(
    pipe: Int, requestId: Long, parts: Int,
    fitted: Long, testn: Long, avgLoss: Double, avgScore: Double)

private[graft] case class MergeState(
    parts: Int, fitted: Long, testn: Long, lossSum: Double, scoreSum: Double)

/** The reference's ResponseConstructor (ResponseConstructor.scala:13-69) as
  * a STREAMING barrier: worker-shard response partials accumulate per
  * (pipeline, requestId) in keyed state, and the merged QueryResponse is
  * released only when exactly `workers` partials have arrived — dataFitted
  * summed, losses and scores averaged. State is O(open requests), removed on
  * release, so a pipeline with r in-flight queries holds r tiny rows no
  * matter the corpus size; the barrier is trigger-order independent (any
  * subset of partials per trigger accumulates identically).
  */
object ResponseMerge {

  def process(workers: Int)(key: (Int, Long), it: Iterator[WorkerResponse],
      state: GroupState[MergeState]): Iterator[MergedResponse] = {
    var st = state.getOption.getOrElse(MergeState(0, 0L, 0L, 0.0, 0.0))
    val out = ArrayBuffer[MergedResponse]()
    it.foreach { r =>
      st = MergeState(st.parts + 1, st.fitted + r.fitted, st.testn + r.testn,
        st.lossSum + r.loss, st.scoreSum + r.score)
      if (st.parts == workers) {
        out += MergedResponse(key._1, key._2, st.parts, st.fitted, st.testn,
          st.lossSum / workers, st.scoreSum / workers)
        st = MergeState(0, 0L, 0L, 0.0, 0.0)
        state.remove()
      }
    }
    if (st.parts > 0) state.update(st)
    out.iterator
  }

  def run(responses: Dataset[WorkerResponse], workers: Int): Dataset[MergedResponse] = {
    import responses.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    responses.groupByKey(r => (r.pipe, r.requestId))
      .flatMapGroupsWithState[MergeState, MergedResponse](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(process(workers))
  }
}

object TwsStatsOperator {
  def run(stats: Dataset[StatEvent], timeoutMs: Long = 30000L,
      watermarkDelay: String = "0 seconds"): Dataset[SpokeEvent] = {
    import stats.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val cols = stats.columns.map(col)
    stats
      .withColumn("eventTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("eventTime", watermarkDelay)
      .select(struct(cols: _*).as("e"), col("eventTime"))
      .as[StatEnvelope]
      .groupByKey(_.e.pipelineId)
      .transformWithState(new TwsStatsProcessor(timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
