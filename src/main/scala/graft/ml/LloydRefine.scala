package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Batch Lloyd refinement — the offline companion to [[OnlineKMeans]]
  * (reference scope: OMLDM trains K-means purely online,
  * FlinkSpoke.scala:203-211; a production pipeline follows the online pass
  * with full-batch Lloyd sweeps over the day's data to polish centroids).
  *
  * Determinism contract (what makes ml18's cross-engine value parity
  * possible): features arrive as micro-unit INTEGERS (caller quantizes via
  * `floor(x*1e6 + 0.5)` — IEEE multiply/add/floor, bit-identical in any
  * engine), so per-cluster sums are exact integer aggregates — order- and
  * partitioning-independent — and each new centroid `sum/n` is one exact
  * double division. Assignment distances are doubles built left-associated
  * from those integers and centroid literals; ties break to the smallest
  * cluster id. Every step is reproducible bit-for-bit at any parallelism.
  *
  * Scale shape: per iteration ONE scan + ONE partial-aggregated groupBy on
  * the k-valued cluster id (map-side combine reduces each partition to ≤k
  * rows before the exchange); centroids ride along as k·d literals in the
  * argmin projection — broadcast-free, collect is O(k·d) model state. At
  * 100 TB with BIGINT overflow risk (n·1e7 > 2^63 past ~1e12 rows per
  * cluster) the sums would widen to DECIMAL(38,0) — same exactness.
  */
object LloydRefine {

  /** Argmin assignment as codegen-able columns: (cluster id, its squared
    * distance). Distances are left-associated ascending-dim double sums
    * from the integer features and centroid literals; ties break to the
    * smallest cluster id — the determinism contract shared with the
    * cross-engine oracles (ml18/d24).
    */
  def assignExprs(
      cols: Seq[String], cent: Array[Array[Double]]): (Column, Column) = {
    val k = cent.length
    require(k >= 2, s"assignExprs needs >= 2 centroids, got $k")
    val dists = (0 until k).map { c =>
      cols.indices.map { j =>
        val diff = col(cols(j)).cast(DoubleType) - lit(cent(c)(j))
        diff * diff
      }.reduce(_ + _)
    }
    val m = least(dists: _*)
    // first matching cluster wins — identical to ORDER BY dist, cl
    val cl = (0 until k - 1).foldRight(lit(k - 1)) { (c, rest) =>
      when(dists(c) === m, lit(c)).otherwise(rest)
    }
    (cl, m)
  }

  /** Run `iters` Lloyd sweeps over `df`'s integer feature columns `cols`,
    * starting from `init` (micro-unit centroids, k × cols.length).
    * Returns (final centroids in micro-units, final assignment counts);
    * a cluster left empty by a sweep keeps its previous centroid and
    * reports count 0.
    */
  def refine(
      df: DataFrame,
      cols: Seq[String],
      init: Array[Array[Double]],
      iters: Int): (Array[Array[Double]], Array[Long]) = {
    val k = init.length
    val d = cols.length
    var cent = init.map(_.clone())
    var counts = new Array[Long](k)
    for (_ <- 0 until iters) {
      val (cl, _) = assignExprs(cols, cent)
      val stats = df
        .groupBy(cl.as("cl"))
        .agg(count(lit(1)).as("n"),
          cols.map(c => sum(col(c)).as(s"s_$c")): _*)
        .collect()
      val next = cent.map(_.clone())
      val nextCounts = new Array[Long](k)
      stats.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1)
        nextCounts(c) = n
        var j = 0
        while (j < d) {
          next(c)(j) = r.getLong(2 + j).toDouble / n
          j += 1
        }
      }
      cent = next
      counts = nextCounts
    }
    (cent, counts)
  }
}
