package graft.tools

import graft.T
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the ml24 HT trajectory gate: replays the exact
  * single-partition, ring-diverted sequence the gate will pin and prints the
  * split decision internals (per-attr/threshold gains, Hoeffding bound,
  * margins) so the oracle's decision-stability can be checked before the SQL
  * is authored. Dev-only tooling, like StProbe.
  */
object HtProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nIds = if (args.length > 1) args(1).toInt else 155
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = T.embeddings(spark, d)
      .filter(col("vec_id") < nIds)
      .select(col("vec_id"),
        expr("CAST(embedding[0] AS DOUBLE)").as("x0"),
        expr("CAST(embedding[1] AS DOUBLE)").as("x1"))
      .orderBy("vec_id")
      .collect()
      .map(r => (Array(r.getDouble(1), r.getDouble(2)),
        if (r.getDouble(1) > 0) 1.0 else 0.0))
    // Trainer ring diversion, testCap 256 (never fills here)
    val fitted = rows.zipWithIndex.collect {
      case ((x, y), i) if i % 10 < 8 => (x, y)
    }
    println(s"input=${rows.length} fitted=${fitted.length}")

    val grace = 64; val delta = 0.05; val tau = 0.05; val k = 2
    // replicate the learner verbatim (HoeffdingTree.scala) with tracing
    val learner = new graft.ml.HoeffdingTreeLearner(delta, tau, grace, k)
    val m = learner.init(2).asInstanceOf[graft.ml.HTModel]
    var step = 0
    fitted.foreach { case (x, y) =>
      val pre = m.root.isLeaf
      learner.fit(m, x, y)
      step += 1
      if (pre && !m.root.isLeaf)
        println(s"SPLIT at fitted step $step: attr=${m.root.splitAttr} " +
          s"val=${m.root.splitVal} (raw bits ${java.lang.Double.doubleToLongBits(m.root.splitVal)})")
    }
    def dump(n: graft.ml.HTNode, nm: String): Unit = {
      println(s"$nm: leaf=${n.isLeaf} seen=${n.seen} counts=${n.classCounts.mkString(",")}")
      if (n.obsN != null)
        for (a <- 0 until 2; c <- 0 until k) {
          val o = a * k + c
          println(f"  obs a=$a c=$c n=${n.obsN(o)} mean=${n.obsMean(o)}%.17g m2=${n.obsM2(o)}%.17g")
        }
    }
    dump(m.root, "root")
    if (!m.root.isLeaf) { dump(m.root.left, "left"); dump(m.root.right, "right") }
    println(s"n=${m.n} cumLoss=${m.cumLoss}")

    // margin analysis at the split boundary: rerun first 64 fitted points
    // into a fresh leaf and print the full gain surface
    val leaf = new graft.ml.HTNode(k, 2)
    leaf.ensureObs()
    fitted.take(grace).foreach { case (x, y) =>
      val yi = y.toInt
      leaf.seen += 1; leaf.classCounts(yi) += 1
      for (a <- 0 until 2) {
        val o = a * k + yi
        leaf.obsN(o) += 1
        val dd = x(a) - leaf.obsMean(o)
        leaf.obsMean(o) += dd / leaf.obsN(o)
        leaf.obsM2(o) += dd * (x(a) - leaf.obsMean(o))
      }
    }
    def entropy(c: Array[Double]): Double = {
      val tot = c.sum
      if (tot <= 0) 0.0
      else c.filter(_ > 0).map(x => { val p = x / tot; -p * math.log(p) / math.log(2.0) }).sum
    }
    val base = entropy(leaf.classCounts.map(_.toDouble))
    println(s"base entropy=$base")
    for (a <- 0 until 2) {
      var lo = Double.MaxValue; var hi = Double.MinValue
      for (c <- 0 until k) {
        val o = a * k + c
        if (leaf.obsN(o) > 0) {
          val sd = if (leaf.obsN(o) > 1) math.sqrt(leaf.obsM2(o) / (leaf.obsN(o) - 1)) else 0.0
          lo = math.min(lo, leaf.obsMean(o) - 2 * sd)
          hi = math.max(hi, leaf.obsMean(o) + 2 * sd)
        }
      }
      println(s"attr $a lo=$lo hi=$hi")
      for (t <- 1 to 8) {
        val thr = lo + (hi - lo) * t / 9.0
        val lC = new Array[Double](k); val rC = new Array[Double](k)
        for (c <- 0 until k) {
          val o = a * k + c
          val nC = leaf.obsN(o)
          if (nC > 0) {
            val sd = if (nC > 1) math.sqrt(leaf.obsM2(o) / (nC - 1)) else 0.0
            val pL = graft.ml.La.normCdf(thr, leaf.obsMean(o), sd)
            lC(c) = nC * pL; rC(c) = nC * (1 - pL)
          }
        }
        val nl = lC.sum; val nr = rC.sum; val tot = nl + nr
        val gain = if (nl > 0 && nr > 0)
          base - (nl / tot) * entropy(lC) - (nr / tot) * entropy(rC) else -1.0
        println(f"  t=$t thr=$thr%.17g gain=$gain%.17g")
      }
    }
    val eps = math.sqrt(math.log(1.0 / delta) / (2.0 * leaf.seen))
    println(s"eps=$eps tau=$tau")
    spark.stop()
  }
}
