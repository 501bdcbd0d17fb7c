package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "smallest-N distinct ids" aggregate: collects at most `cap`
  * ids per group, keeping the numerically smallest, as a sorted array.
  *
  * This is the scale-safe replacement for
  * `row_number().over(Window.partitionBy(bucket)) <= cap` followed by
  * `collect_list`: identical result (the cap keeps the SMALLEST ids, so
  * the pick is deterministic), but ONE shuffle instead of two passes over
  * shuffled data — the window form sorts every bucket on the reducer
  * before a second aggregation reads it back. As an `Aggregator` it
  * partial-aggregates map-side, so a hot bucket (an exact-dup/template
  * cluster in a dedup corpus) ships at most `cap` longs per map task
  * instead of its full membership, and no unbounded `collect_list` array
  * ever materializes (2 GB record limit / reducer OOM guard).
  *
  * Buffer is a sorted ascending Array[Long]; inserts use binary search +
  * arraycopy (O(cap) worst case per element, only paid while the buffer
  * is still collecting or the element beats the current max — saturated
  * hot buckets reject almost all inserts in O(log cap)).
  */
class BoundedIdSet(cap: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(cap > 1, s"cap must be > 1: $cap")

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], a: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, a)
    if (i >= 0) b // already present
    else {
      val ins = -i - 1
      if (b.length >= cap) {
        if (ins >= cap) b // larger than everything kept
        else {
          // drop current max, insert in place
          val out = new Array[Long](cap)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = a
          System.arraycopy(b, ins, out, ins + 1, cap - ins - 1)
          out
        }
      } else {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = a
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      }
    }
  }

  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      // merge two sorted distinct arrays, stop at cap
      val out = new Array[Long](math.min(b1.length + b2.length, cap))
      var i = 0; var j = 0; var k = 0
      while (k < out.length && (i < b1.length || j < b2.length)) {
        val takeLeft = j >= b2.length || (i < b1.length && b1(i) <= b2(j))
        val v = if (takeLeft) b1(i) else b2(j)
        if (takeLeft) i += 1 else j += 1
        if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
      }
      if (k == out.length) out else java.util.Arrays.copyOf(out, k)
    }
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BoundedIdSet {
  /** Column form: `boundedIdSet(cap)(col)` aggregates to array<bigint>. */
  def apply(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedIdSet(cap), Encoders.scalaLong)
}
