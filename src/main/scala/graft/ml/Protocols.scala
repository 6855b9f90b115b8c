package graft.ml

/** Distributed-training protocols, mirroring the reference's catalog
  * (MLNodeGenerator.scala:26-64): CentralizedTraining, SingleLearner,
  * Asynchronous, Synchronous, SSP, EASGD, GM, FGM.
  *
  * The reference exchanges models continuously through a parameter server
  * over a Kafka feedback loop; on Spark's micro-batch execution model the
  * natural equivalent is per-round model aggregation (SURVEY §3.4(b)):
  * every round each partition trains a replica seeded from the global model,
  * then the protocol decides how replicas fold into the next global.
  * Semantic deltas vs the reference (documented, per SURVEY §2.6):
  * Asynchronous runs as FREE-RUNNING stale reads — the unbounded-staleness
  * limit of the SSP window, proven bit-identical to SSP(MaxValue) and
  * divergent from Synchronous (see [[Asynchronous]]); SSP keeps a REAL
  * staleness bound (workers read globals up to s rounds stale, over-stale
  * updates are skip-merged — see [[SSP]]); GM/FGM keep their
  * communication-skipping semantics via the drift threshold (replicas
  * that moved less than the threshold don't ship).
  */
/** `blocks` counts maxMsgParams-bounded parameter blocks shipped to the
  * merge (see [[ModelWire]]) — the reference's message count, not a round
  * count.
  */
final case class ProtocolStats(
    var modelsShipped: Long = 0L,
    var bytesShipped: Long = 0L,
    var blocks: Long = 0L)

sealed trait Protocol extends Serializable {
  def name: String
  /** Number of training partitions this protocol allows (None = any). */
  def maxParallelism: Option[Int] = None
  /** Map-side ship decision: whether a trained replica is sent to the merge
    * at all. Default: always. DriftGated overrides — replicas inside the
    * drift threshold never leave their executor (the reference's
    * communication-skipping made actually communication-free; the driver
    * sees one boolean instead of O(params) per skipped replica).
    */
  def ships(replica: ModelState, prev: Option[ModelState]): Boolean = true
  /** Fold shipped replicas + previous global into the next global.
    * `totalReplicas` is the number of replicas trained this round (>=
    * `replicas.length` when the caller pre-filtered with [[ships]]); -1
    * means "no map-side filtering happened".
    */
  def aggregate(replicas: Seq[ModelState], prev: Option[ModelState],
      learner: OnlineLearner, stats: ProtocolStats,
      totalReplicas: Long = -1L): ModelState = {
    val merged = learner.merge(replicas, prev)
    stats.modelsShipped += replicas.length
    stats.bytesShipped += replicas.map(_.params.length.toLong * 8L).sum
    merged
  }
}

case object Synchronous extends Protocol { def name = "Synchronous" }

/** Free-running workers: the Trainer seeds partition pid from a global pid
  * rounds behind the frontier (the UNBOUNDED-staleness limit of the SSP
  * stale-read window) and the merge admits every update — the reference's
  * asynchronous interleave (MLNodeGenerator.scala:26-64), expressed at
  * round granularity. Equivalent by construction to SSP(Int.MaxValue);
  * the PipelineSparkSuite parity test pins the equivalence bit-for-bit.
  */
case object Asynchronous extends Protocol { def name = "Asynchronous" }

/** Stale-synchronous parallel with a REAL staleness bound s (reference
  * MLNodeGenerator.scala:26-64): workers may compute on a global model up
  * to s rounds behind the freshest view (the Trainer seeds partition pid
  * from the global of round r-1-(pid mod (s+1)) — deterministic
  * heterogeneity inside the bound), and the merge ADMITS ONLY replicas
  * within s rounds of the round frontier — an over-stale straggler's
  * update is skip-merged exactly like a non-drifted GM replica, because
  * the reference's SSP would have blocked that worker before it produced
  * one. s = 0 collapses to Synchronous (every worker reads the freshest
  * global, nothing can be stale); s = MaxValue is the asynchronous limit
  * (any staleness admitted).
  */
final case class SSP(s: Int) extends Protocol {
  def name = "SSP"
  override def aggregate(replicas: Seq[ModelState], prev: Option[ModelState],
      learner: OnlineLearner, stats: ProtocolStats,
      totalReplicas: Long = -1L): ModelState = {
    val frontier = if (replicas.isEmpty) 0L else replicas.map(_.seedRound).max
    val admitted = replicas.filter(r => frontier - r.seedRound <= s.toLong)
    if (admitted.isEmpty) prev match {
      // all replicas over-stale: global advances by zero, with zeroed
      // per-round counters (same double-count hazard as DriftGated)
      case Some(pm) =>
        val keep = pm.deepCopy
        keep.n = 0L
        keep.cumLoss = 0.0
        keep
      case None => learner.merge(admitted, prev)
    } else {
      stats.modelsShipped += admitted.length
      stats.bytesShipped += admitted.map(_.params.length.toLong * 8L).sum
      learner.merge(admitted, prev)
    }
  }
}

case object CentralizedTraining extends Protocol {
  def name = "CentralizedTraining"
  override def maxParallelism: Option[Int] = Some(1)
}

/** One global model trained sequentially (reference forces this for HT and
  * K-means, FlinkSpoke.scala:203-211).
  */
case object SingleLearner extends Protocol {
  def name = "SingleLearner"
  override def maxParallelism: Option[Int] = Some(1)
}

/** Elastic averaging (Zhang et al., NIPS 2015): center absorbs a fraction
  * alpha of the replica average instead of being replaced by it.
  */
final case class EASGD(alpha: Double) extends Protocol {
  def name = "EASGD"
  override def aggregate(replicas: Seq[ModelState], prev: Option[ModelState],
      learner: OnlineLearner, stats: ProtocolStats,
      totalReplicas: Long = -1L): ModelState = {
    val avg = learner.merge(replicas, prev)
    stats.modelsShipped += replicas.length
    stats.bytesShipped += replicas.map(_.params.length.toLong * 8L).sum
    prev match {
      case Some(center: LinearModel) =>
        val a = avg.asInstanceOf[LinearModel]
        val w = center.w.clone()
        var i = 0
        while (i < w.length) { w(i) = (1 - alpha) * w(i) + alpha * a.w(i); i += 1 }
        val out = new LinearModel(w, (1 - alpha) * center.b + alpha * a.b)
        out.n = avg.n; out.cumLoss = avg.cumLoss
        out
      case _ => avg // non-linear models / first round: plain average
    }
  }
}

/** Geometric-monitoring family (GM exact, FGM functional — Samoladas &
  * Garofalakis, EDBT 2018 lineage, see PAPERS.md): replicas whose parameter
  * drift from the previous global stays inside the threshold don't ship,
  * saving communication; the global advances only on shipped replicas.
  */
final case class DriftGated(override val name: String, threshold: Double)
    extends Protocol {
  override def ships(replica: ModelState, prev: Option[ModelState]): Boolean =
    prev match {
      case None => true // round one: everyone ships
      case Some(pm) =>
        val rp = replica.params; val pp = pm.params
        var s = 0.0; var i = 0
        val n = math.min(rp.length, pp.length)
        while (i < n) { val d = rp(i) - pp(i); s += d * d; i += 1 }
        math.sqrt(s) > threshold
    }

  override def aggregate(replicas: Seq[ModelState], prev: Option[ModelState],
      learner: OnlineLearner, stats: ProtocolStats,
      totalReplicas: Long = -1L): ModelState = {
    // Input may or may not be pre-filtered map-side; re-applying the ship
    // predicate is idempotent either way.
    val shipped = replicas.filter(ships(_, prev))
    val total = if (totalReplicas >= 0) totalReplicas else replicas.length.toLong
    if (shipped.isEmpty) prev match {
      // Nothing shipped: the hub's view advances by zero — return a copy of
      // the previous global with ZERO per-round counters. Returning prev
      // itself would feed its RUNNING totals back into the caller's
      // `totalFitted += merged.n` accumulation, double-counting fitted
      // points on every consecutive all-skipped round (the reference's hub
      // only counts statistics that actually arrive).
      case Some(pm) =>
        val keep = pm.deepCopy
        keep.n = 0L
        keep.cumLoss = 0.0
        keep
      case None => learner.merge(replicas, prev)
    }
    else {
      stats.modelsShipped += shipped.length
      stats.bytesShipped += shipped.map(_.params.length.toLong * 8L).sum
      val base = prev.toSeq.filterNot(_ => shipped.length.toLong == total)
      learner.merge(base ++ shipped, prev)
    }
  }
}

object Protocols {
  val names: Set[String] = Set("CentralizedTraining", "SingleLearner",
    "Asynchronous", "Synchronous", "SSP", "EASGD", "GM", "FGM")

  def create(name: String, hp: Map[String, Double] = Map.empty): Protocol = name match {
    case "Synchronous" => Synchronous
    case "Asynchronous" => Asynchronous
    case "SSP" => SSP(hp.getOrElse("staleness", 1.0).toInt)
    case "CentralizedTraining" => CentralizedTraining
    case "SingleLearner" => SingleLearner
    case "EASGD" => EASGD(hp.getOrElse("alpha", 0.5))
    case "GM" => DriftGated("GM", hp.getOrElse("threshold", 0.0))
    case "FGM" => DriftGated("FGM", hp.getOrElse("threshold", 0.01))
    case other => throw new IllegalArgumentException(s"unknown protocol: $other")
  }

  /** Reference protocol-resolution rules: HT / K-means force SingleLearner
    * (FlinkSpoke.scala:203-211); parallelism 1 forces CentralizedTraining
    * (FlinkSpoke.scala:214).
    */
  def resolve(requested: String, learnerName: String, parallelism: Int,
      hp: Map[String, Double] = Map.empty): Protocol = {
    if (learnerName == "HT" || learnerName == "K-means") SingleLearner
    else if (parallelism <= 1) CentralizedTraining
    else create(requested, hp)
  }
}
