package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed fold with an initial value — the reference's deprecated
  * `fold(initial, FoldFunction)` (java/.../transformation/FoldDemo.java
  * :25-41, removed in Flink 1.12) as a first-class Spark `Aggregator`.
  *
  * Caveat vs a true left-fold: Spark aggregates partials per partition
  * and merges them, so `merge` must be associative and `zero` its
  * identity — the same contract fold itself needed to be deterministic
  * under Flink's repartitioning. Use via `udaf(...)` for DataFrames or
  * `.toColumn` on typed Datasets.
  */
class FoldAggregator[I, B: Encoder](zeroVal: B, step: (B, I) => B,
    mergeFn: (B, B) => B) extends Aggregator[I, B, B] {
  def zero: B = zeroVal
  def reduce(b: B, a: I): B = step(b, a)
  def merge(b1: B, b2: B): B = mergeFn(b1, b2)
  def finish(r: B): B = r
  def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
  def outputEncoder: Encoder[B] = implicitly[Encoder[B]]
}

object FoldAggregator {
  /** The FoldDemo shape: running concatenation / numeric fold per key. */
  def sumFold: FoldAggregator[Long, Long] =
    new FoldAggregator[Long, Long](0L, _ + _, _ + _)(Encoders.scalaLong)
}
