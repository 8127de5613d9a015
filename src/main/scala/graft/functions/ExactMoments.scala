package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact first/second moments over quantized (BIGINT) values — the
  * typed `Aggregator[IN, BUF, OUT]` surface of the engine.
  *
  * Accumulating (n, Σx, Σx²) in integers keeps the aggregation exactly
  * associative/commutative (no float-order sensitivity across
  * partitionings or cluster sizes); mean/variance are derived as
  * doubles only at the end, from exact sums — so results are
  * bit-reproducible at any scale and engine-portable for the oracle.
  */
final case class Moments(n: Long, sum: Long, sumsq: Long)

object ExactMomentsAgg extends Aggregator[Long, Moments, Moments] {
  override def zero: Moments = Moments(0L, 0L, 0L)
  override def reduce(b: Moments, x: Long): Moments =
    Moments(b.n + 1, b.sum + x, b.sumsq + x * x)
  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sum + b.sum, a.sumsq + b.sumsq)
  override def finish(r: Moments): Moments = r
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
