package graft

import graft.pipeline.PipelineSpec
import graft.streaming.StreamingTrainer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic regression guards for the round-10 additions: the streaming
  * trainer's two-phase FGM path (frozen micro-batches must move scalars,
  * never parameter blocks), the deterministic pid-routed mode behind ml31,
  * and ml31's all-or-nothing invariant at any fixture.
  */
class R10OpsSuite extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def trainSchema = StructType(Seq(
    StructField("features", ArrayType(DoubleType)),
    StructField("target", DoubleType)))

  private def stagePlain(nFiles: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("r10_train_").toString
    T.embeddings(spark, sf).select(
        col("vec_id"),
        expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE))")
          .as("features"),
        when(col("label") >= 5, 1.0).otherwise(-1.0).as("target"))
      .repartitionByRange(nFiles, col("vec_id"))
      .select("features", "target")
      .write.mode("append").parquet(dir)
    dir
  }

  test("streaming FGM frozen micro-batches collect ZERO parameter blocks " +
    "— the blocks and bytes ledgers agree (r9 advisor medium)") {
    val dir = stagePlain(4)
    val fit = StreamingTrainer.fitStream(spark, dir, trainSchema,
      PipelineSpec(101, "PA", Map("C" -> 0.01), Nil, "FGM",
        protocolHp = Map("threshold" -> 1e12)),
      partitionsPerBatch = 4)
    val c = fit.curve.sortBy(_.batch)
    assert(c.size == 4)
    val plen = fit.model.params.length.toLong
    // bootstrap: 4 replicas ship as 4 one-block payloads; the 3 frozen
    // batches each move 4 counter scalars and NOTHING else
    assert(fit.stats.blocks == 4L,
      s"blocks ${fit.stats.blocks}: frozen batches leaked parameter blocks")
    assert(fit.stats.scalars == 3L * 4L,
      s"scalars ${fit.stats.scalars}, want 4 counters x 3 frozen batches")
    assert(fit.stats.bytesShipped == 4L * plen * 8L + 3L * 4L * 8L,
      s"bytes ${fit.stats.bytesShipped} disagree with the block ledger")
    assert(fit.stats.modelsShipped == 4L)
  }

  test("routed mode: (pid, seq) assignment is deterministic — two runs " +
    "over the same staged batches merge to bit-identical models") {
    val dir =
      java.nio.file.Files.createTempDirectory("r10_routed_").toString + "/b"
    T.embeddings(spark, sf).filter(col("vec_id") < 200).select(
        (col("vec_id") % 2).as("pid"), col("vec_id").as("seq"),
        expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE))")
          .as("features"),
        when(col("label") % 2 === 1, 1.0).otherwise(-1.0).as("target"))
      .coalesce(1).write.parquet(dir)
    val schema = StructType(Seq(
      StructField("pid", LongType), StructField("seq", LongType),
      StructField("features", ArrayType(DoubleType)),
      StructField("target", DoubleType)))
    def run() = StreamingTrainer.fitStream(spark, dir, schema,
      PipelineSpec(102, "PA", Map("C" -> 1.0), Nil, "Synchronous"),
      partitionsPerBatch = 2, routed = true)
    val a = run(); val b = run()
    assert(a.model.params.sameElements(b.model.params),
      "routed fit is not replayable — partition assignment or order drifted")
    assert(a.model.n == 200L && a.model.n == b.model.n)
    assert(a.protocolName == "Synchronous",
      "2 routed partitions must not resolve to CentralizedTraining")
  }

  test("ml31 invariant at any fixture: FGM advances all-or-nothing per " +
    "batch, quanta stay positive, and the reset quantum is exactly T/2") {
    val rows = SparkEntry.queries("ml31_fgm_false_alarm_replay")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = SparkEntry.queries("ml31_fgm_false_alarm_replay")(spark, sf)
      .head().getLong(2)
    // batch sizes 160/80/240: batch 0 always bootstraps; each later batch
    // contributes its full row count or nothing
    val valid = for (b2 <- Seq(0L, 80L); b3 <- Seq(0L, 240L))
      yield 160L + b2 + b3
    assert(valid.contains(n), s"partial advance: n_fitted $n not in $valid")
    val (t2, t3) = (rows(6L), rows(7L))
    assert(t2 > 0.0 && t3 > 0.0, s"non-positive quantum: $t2 / $t3")
    // a quantum that is neither T/2 (sync or quiet) nor a rebalance must
    // not appear; rebalanced quanta are < T/2 by construction (psi > -kT)
    assert(t2 == 0.6 || t2 < 0.6, s"theta after batch 1 out of range: $t2")
    assert(t3 == 0.6 || t3 < 0.6, s"theta after batch 2 out of range: $t3")
  }
}
