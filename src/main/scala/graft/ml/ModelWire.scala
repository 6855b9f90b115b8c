package graft.ml

/** Chunked model shipping — the rebuild of the reference's `maxMsgParams`
  * message cap (DefaultJobParameters.scala:6, threaded through
  * MLNodeGenerator.scala:13-18): no parameter-carrying message exceeds
  * maxMsgParams doubles. In the per-round broadcast-merge design the ship
  * path is the executor→driver collect of trained replicas; chunking each
  * replica payload into [[ParamBlock]]s bounds every collected record to
  * maxMsgParams*8 bytes, which is what keeps a 10^7-parameter model inside
  * RPC frame limits (`spark.rpc.message.maxSize`) on a real cluster — the
  * same failure mode the reference's cap exists for.
  */
final case class ParamBlock(
    replica: Int,
    idx: Int,
    of: Int,
    /** Input dimension the replica was init'd with — lets the receiver
      * rebuild a same-shape skeleton via `learner.init(dim)` without out-of-
      * band schema knowledge (the streaming path discovers dim from data). */
    dim: Int,
    n: Long,
    cumLoss: Double,
    payload: Array[Double],
    /** Fallback for models with no flat wire form (HT's tree, K-means'
      * init buffer) — SingleLearner-forced, so at most one such replica
      * ever ships. */
    whole: Option[ModelState],
    /** Global-model round the replica was seeded from — rides the wire so
      * SSP's merge-side staleness gate sees it after reassembly. */
    seedRound: Long = 0L)

object ModelWire {

  /** Split one trained replica into <=maxMsgParams-double blocks. */
  def chunk(m: ModelState, maxMsgParams: Int, replica: Int): Seq[ParamBlock] = {
    require(maxMsgParams > 0, s"maxMsgParams must be positive: $maxMsgParams")
    if (!m.wireSupported)
      Seq(ParamBlock(replica, 0, 1, m.wireDim, m.n, m.cumLoss, Array.empty,
        Some(m), m.seedRound))
    else {
      val ps = m.wireParams
      val groups =
        if (ps.isEmpty) Seq(Array.empty[Double])
        else ps.grouped(maxMsgParams).toSeq
      groups.zipWithIndex.map { case (g, i) =>
        ParamBlock(replica, i, groups.length, m.wireDim, m.n, m.cumLoss, g,
          None, m.seedRound)
      }
    }
  }

  /** Reassemble blocks into replicas, in ascending replica order (the same
    * deterministic order a whole-model collect produces). `rebuild` turns
    * (dim, concatenated wire payload) back into a model of the right shape —
    * typically `(dim, ps) => learner.init(dim).loadWire(ps)`.
    */
  def reassemble(blocks: Seq[ParamBlock],
      rebuild: (Int, Array[Double]) => ModelState): Seq[ModelState] =
    blocks.groupBy(_.replica).toSeq.sortBy(_._1).map { case (r, bs) =>
      val sorted = bs.sortBy(_.idx)
      require(sorted.map(_.idx) == (0 until sorted.head.of),
        s"replica $r: missing/duplicate blocks ${sorted.map(_.idx).mkString(",")}")
      val m = sorted.head.whole match {
        case Some(w) => w
        case None => rebuild(sorted.head.dim, Array.concat(sorted.map(_.payload): _*))
      }
      m.n = sorted.head.n
      m.cumLoss = sorted.head.cumLoss
      m.seedRound = sorted.head.seedRound
      m
    }
}
