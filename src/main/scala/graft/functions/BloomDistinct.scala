package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter distinct-count Aggregator — the engine's counterpart of
  * the reference's bloom+Redis-bitmap UV counter
  * (scala/.../demo/networkflow/UniqueVisitorWithBloom.scala:76-120), which
  * trades exactness for O(bits) memory when per-window id sets outgrow RAM.
  *
  * Buffer = byte[] bitmap (merges by OR — associative/commutative, so
  * partial aggregation distributes); finish() estimates cardinality from
  * the fill ratio: n ≈ -(m/k)·ln(1 - x/m). Prefer built-in
  * approx_count_distinct (HLL++) unless bloom semantics (bounded bitmap,
  * OR-mergeable across systems) are specifically wanted.
  */
class BloomDistinct(numBits: Int = 1 << 20, numHashes: Int = 3)
    extends Aggregator[Long, Array[Byte], Long] with Serializable {
  require(Integer.bitCount(numBits) == 1, "numBits must be a power of two")

  private def mix(v: Long, seed: Int): Int = {
    // 64-bit finalizer (splitmix64-style), public-domain constant mixing
    var h = v + seed.toLong * 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & (numBits - 1)
  }

  override def zero: Array[Byte] = new Array[Byte](numBits / 8)

  override def reduce(buf: Array[Byte], v: Long): Array[Byte] = {
    var i = 0
    while (i < numHashes) {
      val bit = mix(v, i)
      buf(bit >>> 3) = (buf(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    var set = 0L
    var i = 0
    while (i < buf.length) { set += Integer.bitCount(buf(i) & 0xff); i += 1 }
    if (set == 0) 0L
    else if (set >= numBits) Long.MaxValue
    else math.round(-(numBits.toDouble / numHashes) *
      math.log1p(-set.toDouble / numBits))
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
