package graft.ml

import scala.collection.mutable

/** Hoeffding tree (VFDT, Domingos & Hulten, KDD 2000) with Gaussian numeric
  * attribute observers — the reference's "HT" learner (PipelineMap.scala:68),
  * which it forces onto the SingleLearner protocol (FlinkSpoke.scala:203-211):
  * one global tree, no replica merging. The pipeline honors that by training
  * HT on a single partition; `merge` therefore just selects the
  * most-trained replica.
  *
  * Split decision: at each `grace`-point boundary a leaf compares the top two
  * attributes' information gain against the Hoeffding bound
  * eps = sqrt(R^2 ln(1/delta) / 2n); ties broken when eps < tau.
  */
final class HTNode(val numClasses: Int, val dim: Int) extends Serializable {
  var isLeaf = true
  var splitAttr: Int = -1
  var splitVal: Double = 0.0
  var left: HTNode = _
  var right: HTNode = _
  var seen: Long = 0L
  var seenAtLastCheck: Long = 0L
  val classCounts = new Array[Long](numClasses)
  // per (attr, class): Welford count/mean/M2
  var obsN: Array[Long] = _
  var obsMean: Array[Double] = _
  var obsM2: Array[Double] = _

  def ensureObs(): Unit = if (obsN == null) {
    obsN = new Array[Long](dim * numClasses)
    obsMean = new Array[Double](dim * numClasses)
    obsM2 = new Array[Double](dim * numClasses)
  }

  def majority: Int = {
    var best = 0; var bc = -1L; var c = 0
    while (c < numClasses) { if (classCounts(c) > bc) { bc = classCounts(c); best = c }; c += 1 }
    best
  }

  def route(x: Array[Double]): HTNode =
    if (isLeaf) this
    else if (x(splitAttr) <= splitVal) left.route(x) else right.route(x)

  def deepCopy: HTNode = {
    val o = new HTNode(numClasses, dim)
    o.isLeaf = isLeaf; o.splitAttr = splitAttr; o.splitVal = splitVal
    o.seen = seen; o.seenAtLastCheck = seenAtLastCheck
    System.arraycopy(classCounts, 0, o.classCounts, 0, numClasses)
    if (obsN != null) { o.obsN = obsN.clone(); o.obsMean = obsMean.clone(); o.obsM2 = obsM2.clone() }
    if (left != null) o.left = left.deepCopy
    if (right != null) o.right = right.deepCopy
    o
  }

  def countNodes: Int =
    1 + (if (left != null) left.countNodes else 0) + (if (right != null) right.countNodes else 0)
}

final class HTModel(val root: HTNode) extends ModelState {
  def deepCopy: ModelState = new HTModel(root.deepCopy).copyCountersFrom(this)
  def params: Array[Double] = Array(root.countNodes.toDouble)
  /** Tree structure has no flat wire form; HT is SingleLearner-forced, so at
    * most one replica ever ships (whole). */
  override def wireSupported: Boolean = false
}

class HoeffdingTreeLearner(val delta: Double, val tau: Double, val grace: Int,
    val numClasses: Int) extends OnlineLearner {
  def name = "HT"
  def isClassifier = true

  private var dim0 = 0
  def init(dim: Int): ModelState = { dim0 = dim; new HTModel(new HTNode(numClasses, dim)) }

  private def entropy(counts: Array[Double]): Double = {
    val tot = counts.sum
    if (tot <= 0) return 0.0
    var e = 0.0; var i = 0
    while (i < counts.length) {
      if (counts(i) > 0) { val p = counts(i) / tot; e -= p * math.log(p) / math.log(2.0) }
      i += 1
    }
    e
  }

  /** Best (gain, threshold) for one attribute via the Gaussian class models:
    * candidate thresholds are evenly spaced between the extreme class means
    * +- 2 sigma; expected left/right class mass from the normal CDF.
    */
  private def bestSplitForAttr(leaf: HTNode, attr: Int): (Double, Double) = {
    val k = leaf.numClasses
    var lo = Double.MaxValue; var hi = Double.MinValue
    var c = 0
    while (c < k) {
      val o = attr * k + c
      if (leaf.obsN(o) > 0) {
        val sd = if (leaf.obsN(o) > 1) math.sqrt(leaf.obsM2(o) / (leaf.obsN(o) - 1)) else 0.0
        lo = math.min(lo, leaf.obsMean(o) - 2 * sd)
        hi = math.max(hi, leaf.obsMean(o) + 2 * sd)
      }
      c += 1
    }
    if (lo >= hi) return (0.0, 0.0)
    val base = {
      val tot = new Array[Double](k)
      var i = 0
      while (i < k) { tot(i) = leaf.classCounts(i).toDouble; i += 1 }
      entropy(tot)
    }
    var bestGain = 0.0; var bestThr = 0.0
    var t = 1
    while (t <= 8) {
      val thr = lo + (hi - lo) * t / 9.0
      val lCounts = new Array[Double](k); val rCounts = new Array[Double](k)
      c = 0
      while (c < k) {
        val o = attr * k + c
        val nC = leaf.obsN(o)
        if (nC > 0) {
          val sd = if (nC > 1) math.sqrt(leaf.obsM2(o) / (nC - 1)) else 0.0
          val pLeft = La.normCdf(thr, leaf.obsMean(o), sd)
          lCounts(c) = nC * pLeft; rCounts(c) = nC * (1 - pLeft)
        }
        c += 1
      }
      val nl = lCounts.sum; val nr = rCounts.sum; val tot = nl + nr
      if (nl > 0 && nr > 0) {
        val gain = base - (nl / tot) * entropy(lCounts) - (nr / tot) * entropy(rCounts)
        if (gain > bestGain) { bestGain = gain; bestThr = thr }
      }
      t += 1
    }
    (bestGain, bestThr)
  }

  private def maybeSplit(leaf: HTNode): Unit = {
    if (leaf.seen - leaf.seenAtLastCheck < grace) return
    leaf.seenAtLastCheck = leaf.seen
    var nClassesSeen = 0
    leaf.classCounts.foreach(cc => if (cc > 0) nClassesSeen += 1)
    if (nClassesSeen < 2) return
    var g1 = 0.0; var g2 = 0.0; var a1 = -1; var thr1 = 0.0
    var attr = 0
    while (attr < leaf.dim) {
      val (g, thr) = bestSplitForAttr(leaf, attr)
      if (g > g1) { g2 = g1; g1 = g; a1 = attr; thr1 = thr }
      else if (g > g2) { g2 = g }
      attr += 1
    }
    if (a1 < 0 || g1 <= 0) return
    val r = math.log(leaf.numClasses.toDouble) / math.log(2.0)
    val eps = math.sqrt(r * r * math.log(1.0 / delta) / (2.0 * leaf.seen))
    if (g1 - g2 > eps || eps < tau) {
      leaf.isLeaf = false
      leaf.splitAttr = a1; leaf.splitVal = thr1
      leaf.left = new HTNode(leaf.numClasses, leaf.dim)
      leaf.right = new HTNode(leaf.numClasses, leaf.dim)
      leaf.obsN = null; leaf.obsMean = null; leaf.obsM2 = null
    }
  }

  def fit(ms: ModelState, x: Array[Double], y: Double): Unit = {
    val m = ms.asInstanceOf[HTModel]
    val leaf = m.root.route(x)
    val yi = math.min(math.max(y.toInt, 0), numClasses - 1)
    m.cumLoss += (if (leaf.majority == yi && leaf.seen > 0) 0.0 else 1.0)
    m.n += 1
    leaf.ensureObs()
    leaf.seen += 1
    leaf.classCounts(yi) += 1
    var attr = 0
    val k = leaf.numClasses
    while (attr < leaf.dim) {
      val o = attr * k + yi
      leaf.obsN(o) += 1
      val d = x(attr) - leaf.obsMean(o)
      leaf.obsMean(o) += d / leaf.obsN(o)
      leaf.obsM2(o) += d * (x(attr) - leaf.obsMean(o))
      attr += 1
    }
    maybeSplit(leaf)
  }

  def predict(ms: ModelState, x: Array[Double]): Double =
    ms.asInstanceOf[HTModel].root.route(x).majority.toDouble

  def loss(ms: ModelState, x: Array[Double], y: Double): Double =
    if (predict(ms, x) == y.toInt.toDouble) 0.0 else 1.0

  /** SingleLearner semantics: no averaging of trees — keep the most-trained
    * replica (there is only one under the forced single-partition protocol).
    */
  def merge(ms: Seq[ModelState], prev: Option[ModelState] = None): ModelState = ms.maxBy(_.n)
}
