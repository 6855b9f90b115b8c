package graft.tools

import graft.pipeline.{PipelineSpec, Trainer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe for ml32's inertia-parity tolerance: prints the parallel /
  * sequential inertia ratio per fixture so the gate constant is a measured
  * margin, not a guess.
  */
object Ml32Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // default: the three shipped fixtures; args override with explicit dirs
    // (e.g. the ScaleSynth embOnly 1000x dir for the near-linearity probe)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    for (d <- dirs) {
      val sf = d
      val df = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("id"),
          col("embedding").cast(ArrayType(DoubleType)).as("features"),
          col("label").cast(DoubleType).as("target"))
        .repartitionByRange(8, col("id"))
        .sortWithinPartitions("id")
      def toRdd = df.select("features", "target").rdd
        .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
      val k = 8
      val seedPts = df.orderBy("id").limit(64)
        .select("features").collect().map(_.getSeq[Double](0).toArray)
      val seedModel = graft.ml.MiniBatchKMeans.sharedSeed(seedPts.toSeq, k)
      val t1 = System.nanoTime()
      val seqFit = Trainer.fit(spark,
        PipelineSpec(6, "K-means", Map("k" -> k.toDouble), Nil, "Asynchronous"),
        toRdd)
      val tSeq = (System.nanoTime() - t1) / 1e9
      val iSeq = graft.ml.MiniBatchKMeans.inertia(spark, seqFit.model, toRdd)
      // both parallel arms: ml32's Synchronous and ml33's bounded-stale SSP
      for ((proto, php) <- Seq(
          ("Synchronous", Map.empty[String, Double]),
          ("SSP", Map("staleness" -> 2.0)))) {
        val t0 = System.nanoTime()
        val fitted = Trainer.fit(spark,
          PipelineSpec(32, "MiniBatchKMeans", Map("k" -> k.toDouble), Nil,
            proto, protocolHp = php), toRdd, Some(seedModel))
        val tPar = (System.nanoTime() - t0) / 1e9
        val iPar = graft.ml.MiniBatchKMeans.inertia(spark, fitted.model, toRdd)
        println(f"PROBE $sf [$proto]: iPar=$iPar%.3f iSeq=$iSeq%.3f " +
          f"ratio=${iPar / iSeq}%.4f " +
          f"proto=${fitted.protocolName} ships=${fitted.statistics.modelsShipped} " +
          f"blocks=${fitted.statistics.blocks} bytes=${fitted.statistics.bytesShipped} " +
          f"tPar=$tPar%.2f tSeq=$tSeq%.2f")
      }
    }
    spark.stop()
  }
}
