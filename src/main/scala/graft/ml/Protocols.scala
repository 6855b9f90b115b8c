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
  * updates are skip-merged — see [[SSP]]); GM keeps its
  * communication-skipping semantics via the per-worker drift threshold
  * (replicas that moved less than the threshold don't ship); FGM is the
  * two-level FUNCTIONAL variant (see [[FGM]]) — scalar counter messages
  * between syncs, model vectors only on a confirmed global violation,
  * and then ALL workers sync (never GM's partial advance).
  */
/** `blocks` counts maxMsgParams-bounded parameter blocks shipped to the
  * merge (see [[ModelWire]]) — the reference's message count, not a round
  * count. `scalars` counts the 8-byte protocol heartbeats (FGM's drift
  * counters and exact-phi polls) separately, so the parameter-block metric
  * stays pure: a frozen FGM round moves k scalars and ZERO blocks.
  */
final case class ProtocolStats(
    var modelsShipped: Long = 0L,
    var bytesShipped: Long = 0L,
    var blocks: Long = 0L,
    var scalars: Long = 0L)

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

/** Classic geometric monitoring (the GM side of the reference's GM/FGM
  * pair — Samoladas & Garofalakis, EDBT 2018 lineage, see PAPERS.md):
  * replicas whose parameter drift from the previous global stays inside
  * the threshold don't ship, saving communication; the global advances
  * only on shipped replicas (a PARTIAL fold — contrast [[FGM]], whose
  * global condition syncs all-or-nothing).
  */
final case class DriftGated(override val name: String, threshold: Double)
    extends Protocol {
  override def ships(replica: ModelState, prev: Option[ModelState]): Boolean =
    prev match {
      case None => true // round one: everyone ships
      case Some(pm) => Protocols.driftNorm(replica.params, pm.params) > threshold
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

/** Functional geometric monitoring (the FGM side of the reference's GM/FGM
  * pair, MLNodeGenerator.scala:33,62; Samoladas & Garofalakis EDBT-2018
  * lineage) — the TWO-LEVEL protocol, not GM's per-worker gate. The safe
  * function is phi_i = ||X_i - E|| - T; by convexity of the norm,
  * sum(phi_i) <= 0 soundly bounds the drift of the AVERAGE model
  * (||avg X_i - E|| <= avg||X_i - E|| <= T), which per-worker thresholds
  * alone cannot (one big drifter can hide under k-1 workers' slack, and
  * conversely k near-threshold workers can each stay silent under GM while
  * their average drifts). Between syncs, workers ship 8-BYTE COUNTERS
  * c_i = floor(drift_i / theta) — theta the quantum, T/2 after a sync.
  * When sum(c_i) > k the hub polls the exact phi values (k more scalars):
  * psi >= 0 is a confirmed violation — ALL workers ship their models and
  * the global advances to their count-weighted average (never GM's
  * partial fold); psi < 0 is a false alarm — a new subround begins with
  * the rebalanced quantum theta' = -psi/(2k) and the global advances by
  * ZERO. T = 0 degenerates to Synchronous (every round a violation).
  *
  * The decision is GLOBAL (a sum over workers), so unlike GM it cannot be
  * a map-side [[ships]] predicate: the batch AND streaming trainers run a
  * real scalar phase between jobs (frozen rounds move k*8 bytes, never
  * parameter vectors) and call [[decide]]/[[syncFold]]; [[aggregate]]
  * keeps the identical one-shot semantics for callers that already hold
  * every replica driver-side. The quantum is driver-held mutable state
  * (like SSP's recent-globals window) — one double; FGM is deliberately a
  * PLAIN class, not a case class, so copy/equality can never silently
  * fork or discard that subround state (r9 advisor note).
  */
final class FGM(val threshold: Double) extends Protocol {
  def name = "FGM"

  /** Current quantum; reset to T/2 by every sync, rebalanced on a safe
    * poll. Driver-side state — [[decide]] only ever runs on the driver's
    * original instance; serialized executor copies never read it (their
    * [[ships]] is the default always-true). */
  private var thetaV: Double = threshold / 2.0
  def theta: Double = thetaV

  /** Worker-side counter: how many quanta of drift this replica has
    * accumulated since the last sync. */
  def counterOf(driftNorm: Double): Long =
    if (thetaV > 0) math.floor(driftNorm / thetaV).toLong else Long.MaxValue

  /** Hub decision from the per-worker drift norms (the scalar phase):
    * true = confirmed violation, sync everyone; false = global advances by
    * zero this round (counter sum under k, or a false alarm that
    * rebalanced the quantum). Charges the scalar traffic into
    * `bytesShipped` + `scalars` — never `blocks`, which stays a pure
    * parameter-block count (r9 advisor note). */
  def decide(drifts: Seq[Double], stats: ProtocolStats): Boolean = {
    val k = drifts.length
    stats.bytesShipped += k.toLong * 8L // counter messages
    stats.scalars += k.toLong
    val trigger = thetaV <= 0 ||
      drifts.foldLeft(0L)((a, dv) => a + counterOf(dv)) > k.toLong
    if (!trigger) false
    else {
      stats.bytesShipped += k.toLong * 8L // exact-phi poll
      stats.scalars += k.toLong
      val psi = drifts.foldLeft(0.0)((a, dv) => a + (dv - threshold))
      if (psi >= 0) { thetaV = threshold / 2.0; true }
      else { thetaV = -psi / (2.0 * k); false }
    }
  }

  /** The sync fold: everyone shipped, the global is their count-weighted
    * average (exactly the Synchronous merge). */
  def syncFold(replicas: Seq[ModelState], prev: Option[ModelState],
      learner: OnlineLearner, stats: ProtocolStats): ModelState = {
    stats.modelsShipped += replicas.length
    stats.bytesShipped += replicas.map(_.params.length.toLong * 8L).sum
    learner.merge(replicas, prev)
  }

  /** Zero-advance round: a copy of the previous global with zeroed
    * per-round counters (the DriftGated all-skip shape — returning prev
    * itself would double-count fitted points). */
  def frozen(prev: ModelState): ModelState = {
    val keep = prev.deepCopy
    keep.n = 0L
    keep.cumLoss = 0.0
    keep
  }

  /** One-shot path for callers that already hold every replica driver-side
    * (the streaming trainer): identical decision + fold, with the scalar
    * phases charged as in the two-phase batch path. */
  override def aggregate(replicas: Seq[ModelState], prev: Option[ModelState],
      learner: OnlineLearner, stats: ProtocolStats,
      totalReplicas: Long = -1L): ModelState = prev match {
    case None => syncFold(replicas, prev, learner, stats) // round 1 bootstrap
    case Some(pm) =>
      if (replicas.isEmpty) frozen(pm)
      else {
        val drifts = replicas.map(r => Protocols.driftNorm(r.params, pm.params))
        if (decide(drifts, stats)) syncFold(replicas, prev, learner, stats)
        else frozen(pm)
      }
  }
}

object Protocols {
  val names: Set[String] = Set("CentralizedTraining", "SingleLearner",
    "Asynchronous", "Synchronous", "SSP", "EASGD", "GM", "FGM")

  /** The l2 parameter drift shared by GM's ship gate, FGM's safe function,
    * and their oracles: ascending-index left-associated sum seeded 0.0
    * over the common prefix, then sqrt — the exact summation order the
    * ml29/ml30 DuckDB replays reproduce. */
  def driftNorm(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  def create(name: String, hp: Map[String, Double] = Map.empty): Protocol = name match {
    case "Synchronous" => Synchronous
    case "Asynchronous" => Asynchronous
    case "SSP" => SSP(hp.getOrElse("staleness", 1.0).toInt)
    case "CentralizedTraining" => CentralizedTraining
    case "SingleLearner" => SingleLearner
    case "EASGD" => EASGD(hp.getOrElse("alpha", 0.5))
    case "GM" => DriftGated("GM", hp.getOrElse("threshold", 0.0))
    case "FGM" => new FGM(hp.getOrElse("threshold", 0.01))
    case other => throw new IllegalArgumentException(s"unknown protocol: $other")
  }

  /** Reference protocol-resolution rules: HT / K-means force SingleLearner
    * (FlinkSpoke.scala:203-211); parallelism 1 forces CentralizedTraining
    * (FlinkSpoke.scala:214).
    */
  def resolve(requested: String, learnerName: String, parallelism: Int,
      hp: Map[String, Double] = Map.empty): Protocol = {
    create(resolveName(requested, learnerName, parallelism), hp)
  }

  /** Name-level resolution (the rules above without instantiation): lets a
    * caller that caches protocol INSTANCES across rounds (the streaming
    * trainer — FGM's quantum must survive between micro-batches) key the
    * cache by the resolved protocol rather than by partition count, which
    * would fork quantum state if batch partitioning varies (r9 advisor
    * note). */
  def resolveName(requested: String, learnerName: String,
      parallelism: Int): String = {
    if (learnerName == "HT" || learnerName == "K-means") "SingleLearner"
    else if (parallelism <= 1) "CentralizedTraining"
    else requested
  }
}
