package graft.functions

import graft.streaming.{StatEvent, StatsState}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed statistics-merge Aggregator — the custom `Aggregator[IN, BUF, OUT]`
  * SURVEY §4 calls for: merges per-hub statistics records into per-pipeline
  * totals exactly like the reference's StatisticsAggregateFunction
  * (StateAccumulators.scala:54-126), but as a Catalyst-planned typed UDAF
  * with map-side partial aggregation (order-independent by construction:
  * sums, min, max).
  */
object StatsMergeAggregator extends Aggregator[StatEvent, StatsState, StatsState] {

  override def zero: StatsState =
    StatsState(0L, 0L, 0L, 0L, Double.NegativeInfinity, Long.MaxValue, Long.MinValue)

  override def reduce(b: StatsState, e: StatEvent): StatsState =
    StatsState(
      b.modelsShipped + e.modelsShipped,
      b.bytesShipped + e.bytesShipped,
      b.blocks + e.blocks,
      b.fitted + e.fitted,
      math.max(b.score, e.score),
      math.min(b.firstTsMs, e.eventTimeMs),
      math.max(b.lastTsMs, e.eventTimeMs))

  override def merge(a: StatsState, b: StatsState): StatsState =
    StatsState(
      a.modelsShipped + b.modelsShipped,
      a.bytesShipped + b.bytesShipped,
      a.blocks + b.blocks,
      a.fitted + b.fitted,
      math.max(a.score, b.score),
      math.min(a.firstTsMs, b.firstTsMs),
      math.max(a.lastTsMs, b.lastTsMs))

  override def finish(r: StatsState): StatsState = r

  override def bufferEncoder: Encoder[StatsState] = Encoders.product[StatsState]
  override def outputEncoder: Encoder[StatsState] = Encoders.product[StatsState]
}
