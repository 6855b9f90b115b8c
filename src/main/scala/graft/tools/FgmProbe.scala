package graft.tools

import graft.ml._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for ml31 threshold tuning: replays the 3-batch streaming
  * FGM trajectory driver-side (PA chains per worker in vec_id order, no
  * ring split — the StreamingTrainer fit shape) and prints the per-batch
  * drift norms, so the ml31 threshold can be chosen to land on the
  * false-alarm-then-sync path. Not part of the library surface.
  */
object FgmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val rows = graft.T.embeddings(spark, d)
        .select(col("vec_id"),
          expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE))")
            .as("features"),
          when(col("label") % 2 === 1, 1.0).otherwise(-1.0).as("target"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1)
      val learner = Learners.create("PA", Map("C" -> 1.0))
      def train(lo: Long, hi: Long, pid: Long,
          seed: Option[ModelState]): ModelState = {
        val m = seed.map(_.deepCopy).getOrElse(learner.init(4))
        m.n = 0L; m.cumLoss = 0.0
        rows.filter(t => t._1 >= lo && t._1 < hi && t._1 % 2 == pid)
          .foreach(t => learner.fit(m, t._2, t._3))
        learner.finish(m)
        m
      }
      val ranges = Seq((0L, 160L), (160L, 240L), (240L, 480L))
      val (l1, h1) = ranges.head
      val g1 = learner.merge(
        Seq(train(l1, h1, 0L, None), train(l1, h1, 1L, None)), None)
      def drifts(lo: Long, hi: Long): (Double, Double) = {
        val a = train(lo, hi, 0L, Some(g1))
        val b = train(lo, hi, 1L, Some(g1))
        (Protocols.driftNorm(a.params, g1.params),
          Protocols.driftNorm(b.params, g1.params))
      }
      val (e0, e1) = drifts(ranges(1)._1, ranges(1)._2)
      val (f0, f1) = drifts(ranges(2)._1, ranges(2)._2)
      println(f"$sf: b2 drifts ($e0%.6f, $e1%.6f) sum ${e0 + e1}%.6f | " +
        f"b3 drifts ($f0%.6f, $f1%.6f) sum ${f0 + f1}%.6f")
      // false alarm at b2 needs: floor(2*e0/T)+floor(2*e1/T) > 2 AND
      // e0+e1 < 2T; confirmed sync at b3 needs f0+f1 >= 2T (counters
      // always trigger under the tiny rebalanced quantum)
      for (t <- Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3, 1.5)) {
        val trig2 = math.floor(e0 / (t / 2)).toLong +
          math.floor(e1 / (t / 2)).toLong > 2
        val psi2 = (e0 - t) + (e1 - t)
        val theta2 = if (trig2 && psi2 < 0) -psi2 / 4.0 else t / 2.0
        val trig3 = math.floor(f0 / theta2).toLong +
          math.floor(f1 / theta2).toLong > 2
        val psi3 = (f0 - t) + (f1 - t)
        val path =
          (if (trig2) (if (psi2 >= 0) "b2=SYNC" else "b2=FALSE-ALARM")
           else "b2=quiet") + " " +
          (if (trig3) (if (psi3 >= 0) "b3=SYNC" else "b3=false-alarm")
           else "b3=quiet")
        println(f"  T=$t%.2f theta2=$theta2%.6f $path")
      }
    }
    spark.stop()
  }
}
