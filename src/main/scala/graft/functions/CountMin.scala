package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch Aggregator — bounded-memory frequency estimation
  * (heavy hitters without a full groupBy), completing the engine's
  * sketch family: bloom (BloomDistinct), HLL (approx_count_distinct),
  * quantile (approx_percentile), frequency (here).
  *
  * Buffer = depth x width long counters packed little-endian in a byte
  * array (BINARY buffer encoder — no kryo); reduce increments one
  * counter per row, merge is elementwise add — associative and
  * commutative, so map-side partial aggregation distributes and the
  * full 100 TB stream reduces to a `depth*width*8`-byte object per
  * group. Estimates OVERCOUNT only: est(v) = min over rows of the
  * row's counter >= true(v), and est(v) <= true(v) + (e/width)·N with
  * probability 1 - e^{-depth} (Cormode & Muthukrishnan).
  *
  * Reference analog: the same bounded-memory trade as the bloom/Redis
  * UV counter (UniqueVisitorWithBloom.scala:76-120), applied to
  * frequencies instead of membership.
  */
class CountMinAgg(val depth: Int = 4, val width: Int = 1 << 12)
    extends Aggregator[Long, Array[Byte], Array[Byte]] with Serializable {
  require(depth >= 1 && width >= 2 && Integer.bitCount(width) == 1,
    s"need depth >= 1 and power-of-two width, got $depth x $width")

  override def zero: Array[Byte] = new Array[Byte](depth * width * 8)

  override def reduce(buf: Array[Byte], v: Long): Array[Byte] = {
    var r = 0
    while (r < depth) {
      CountMin.addAt(buf, (r * width + CountMin.mix(v, r, width)) * 8, 1L)
      r += 1
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var off = 0
    while (off < a.length) {
      CountMin.addAt(a, off, CountMin.readAt(b, off))
      off += 8
    }
    a
  }

  override def finish(buf: Array[Byte]): Array[Byte] = buf
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CountMin {
  /** splitmix64-style row hash into [0, width) — same public-domain
    * finalizer family as BloomDistinct.
    */
  private[functions] def mix(v: Long, seed: Int, width: Int): Int = {
    var h = v + seed.toLong * 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & (width - 1)
  }

  private[functions] def readAt(buf: Array[Byte], off: Int): Long = {
    var x = 0L
    var i = 7
    while (i >= 0) { x = (x << 8) | (buf(off + i) & 0xffL); i -= 1 }
    x
  }

  private[functions] def addAt(buf: Array[Byte], off: Int, delta: Long): Unit = {
    val x = readAt(buf, off) + delta
    var i = 0
    while (i < 8) { buf(off + i) = ((x >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** Total stream length N from a sketch: each row's counters sum to
    * exactly one increment per input row.
    */
  def rowTotal(sketch: Array[Byte], width: Int): Long = {
    var n = 0L
    var c = 0
    while (c < width) { n += readAt(sketch, c * 8); c += 1 }
    n
  }

  /** Point estimate for `v` from a sketch produced by [[CountMinAgg]]
    * with the same (depth, width).
    */
  def estimate(sketch: Array[Byte], v: Long, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = readAt(sketch, (r * width + mix(v, r, width)) * 8)
      if (c < best) best = c
      r += 1
    }
    best
  }
}
