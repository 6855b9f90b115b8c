package graft.streaming

import graft.ml._
import graft.pipeline.PipelineSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable.ArrayBuffer

/** Continuous training over a stream: every micro-batch trains
  * partition-local replicas seeded from the current global model, and the
  * protocol folds them into the next global — the reference's continuous
  * parameter-server exchange (SURVEY §3.2) realized at micro-batch
  * granularity via foreachBatch, with no Kafka feedback loop (design (b) of
  * SURVEY §3.4). The prequential cumulative loss per batch is the learning
  * curve the reference's statistics pipeline tracks (FlinkHub.scala:96-156).
  */
object StreamingTrainer {

  final case class BatchPoint(batch: Long, fitted: Long, cumLoss: Double,
      modelsShipped: Long, bytesShipped: Long)

  final case class StreamFit(model: ModelState, learner: OnlineLearner,
      protocolName: String, stats: ProtocolStats, curve: Seq[BatchPoint])

  /** `dir` holds parquet files of (features: array<double>, target: double);
    * each file becomes one micro-batch (one protocol round).
    * `partitionsPerBatch` > 0 re-spreads each micro-batch to that many
    * training partitions — a single small file arrives as ONE partition,
    * which the resolution rules force to CentralizedTraining; multi-replica
    * protocols (GM/FGM gating, averaging) need the spread.
    */
  def fitStream(spark: SparkSession, dir: String, schema: StructType,
      spec: PipelineSpec, partitionsPerBatch: Int = 0): StreamFit = {
    val learner = Learners.create(spec.learner, spec.learnerHp)
    var global: Option[ModelState] = None
    var protocolName = spec.protocol
    // One protocol instance per resolved parallelism, reused across
    // micro-batches: the resolution rules still apply per batch (a 1-
    // partition batch forces CentralizedTraining), but a stateful protocol
    // (FGM's quantum) keeps its subround state across rounds. Stateless
    // protocols are unaffected — a cached instance behaves identically.
    var protoCache: Map[Int, Protocol] = Map.empty
    val stats = ProtocolStats()
    var totalFitted = 0L
    var totalCumLoss = 0.0
    val curve = ArrayBuffer[BatchPoint]()

    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // unique checkpoint per fit: the staged dir may be memoized across runs,
    // and resuming a committed checkpoint would replay zero batches
    val ckpt = java.util.UUID.randomUUID().toString.replace("-", "")
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/_ckpt_train_$ckpt")
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val rdd0 = df.rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
        val rdd =
          if (partitionsPerBatch > 0) rdd0.repartition(partitionsPerBatch)
          else rdd0
        val np = rdd.getNumPartitions
        val protocol = protoCache.getOrElse(np, {
          val p = Protocols.resolve(spec.protocol, spec.learner, np,
            spec.protocolHp)
          protoCache += np -> p
          p
        })
        protocolName = protocol.name
        val data = protocol.maxParallelism match {
          case Some(p) if rdd.getNumPartitions > p => rdd.coalesce(p)
          case _ => rdd
        }
        val bcGlobal = spark.sparkContext.broadcast(global)
        // Same map-side ship gate + chunked ship path as the batch Trainer:
        // drift-gated protocols keep non-drifted replicas on their
        // executors, and shipped payloads travel as <=maxMsgParams-double
        // ParamBlocks (block.dim carries the data-discovered input dim).
        val maxP = spec.maxMsgParams
        val collected = data.mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var model: ModelState = bcGlobal.value.map(_.deepCopy).orNull
          if (model != null) { model.n = 0L; model.cumLoss = 0.0 }
          var any = false
          it.foreach { case (x, y) =>
            if (model == null) model = learner.init(x.length) // dim from data
            any = true
            learner.fit(model, x, y)
          }
          if (any) {
            learner.finish(model)
            if (protocol.ships(model, bcGlobal.value))
              ModelWire.chunk(model, maxP, pid).iterator.map(Option(_))
            else Iterator.single(Option.empty[ParamBlock])
          } else Iterator.empty
        }.collect()
        val blocks = collected.flatten.toSeq
        val replicas = ModelWire.reassemble(blocks,
          (bdim, ps) => learner.init(bdim).loadWire(ps))
        stats.blocks += blocks.length
        if (collected.nonEmpty) {
          val merged = protocol.aggregate(replicas, global, learner, stats,
            totalReplicas =
              collected.count(_.isEmpty).toLong + blocks.count(_.idx == 0))
          totalFitted += merged.n
          totalCumLoss += merged.cumLoss
          merged.n = totalFitted
          merged.cumLoss = totalCumLoss
          global = Some(merged)
          curve += BatchPoint(batchId, totalFitted, totalCumLoss,
            stats.modelsShipped, stats.bytesShipped)
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    StreamFit(global.getOrElse(learner.init(1)), learner, protocolName,
      stats, curve.toSeq)
  }
}
