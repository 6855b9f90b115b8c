package graft.tools

import graft.T
import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for mm12's recall trade at synthetic-clique density: counts
  * the verified near-dup pairs of the UNCAPPED band graph (mm11's input)
  * vs the W=16 CAPPED graph (mm12's), so the dropped-pair count the
  * SCALE.md row reports is measured, not inferred.
  *
  * Usage: runMain graft.tools.Mm12Probe <docsDir>
  */
object Mm12Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("TIMEQ_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ph = Multimodal.phashOf(T.documents(spark, dir)).localCheckpoint()
    val bands = Multimodal.phashBands(ph)
    def timeCount(label: String, df: org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PROBE $label: $n%,d in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      n
    }
    val capped = bands
      .withColumn("rn", row_number().over(
        Window.partitionBy("band", "bits").orderBy("doc_id")))
      .filter(col("rn") <= 16).drop("rn")
    val nCap = timeCount("capped pairs (W=16)",
      Multimodal.phashNeardupPairs(capped))
    val nAll = timeCount("uncapped pairs", Multimodal.phashNeardupPairs(bands))
    println(f"PROBE dropped: ${nAll - nCap}%,d of $nAll%,d " +
      f"(${100.0 * (nAll - nCap) / math.max(nAll, 1)}%.2f%%)")
    spark.stop()
  }
}
