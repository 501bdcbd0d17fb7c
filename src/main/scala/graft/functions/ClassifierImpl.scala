package graft.functions

/** JVM twin of `Classifier.tokenBucket` + the frozen-weight multi-class
  * scorer (`Classifier.scoreSoftmaxMicro`'s row kernel).
  *
  * Why typed: the columnar K-class integer fold would be referenced once
  * per output column (pred, best score), and CollapseProject inlines the
  * whole md5-hashing fold into every consumer (the scoreWith lesson) —
  * a binary scorer can dodge that by deriving its second column
  * arithmetically (q143), a K-class argmax cannot. One pass per row
  * here computes every class sum, the argmax, and the token count.
  *
  * Bucket parity is EXACT with the column path
  * (`pmod(conv(substring(md5(tok), 1, 15), 16, 10) cast long, buckets)`):
  * lowercase-hex MD5, first 15 hex digits parsed as a long (< 2^60, no
  * overflow), floor-mod. [[graft.operators.ClassifierSpec]] pins the
  * parity on the fixture corpus.
  */
object ClassifierImpl {

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def tokenBucket(tok: String, buckets: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex digits = first 7 bytes + the high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4)
    java.lang.Math.floorMod(v, buckets.toLong).toInt
  }

  /** (nToks, predIdx, bestMicro): exact integer per-class sums over the
    * token buckets, argmax with ties to the LOWEST class index.
    */
  def scoreSoftmax(text: String, weightsMicro: Array[Array[Long]]): (Long, Int, Long) = {
    val toks = MinhashImpl.tokens(if (text == null) "" else text)
    val k = weightsMicro.length
    val sums = new Array[Long](k)
    val buckets = weightsMicro(0).length
    var t = 0
    while (t < toks.length) {
      val b = tokenBucket(toks(t), buckets)
      var c = 0
      while (c < k) { sums(c) += weightsMicro(c)(b); c += 1 }
      t += 1
    }
    var best = 0
    var c = 1
    while (c < k) { if (sums(c) > sums(best)) best = c; c += 1 }
    (toks.length.toLong, best, sums(best))
  }
}
