package graft.functions

/** Single-pass JVM twin of `Repetition`'s run-length n-gram statistics,
  * for the row-predicate hot path (`Repetition.filterByRepetition`).
  *
  * Why this exists: Spark's higher-order `aggregate` is CodegenFallback —
  * every fold step allocates an accumulator InternalRow and copies the
  * carried strings, measured ~0.9 ms per doc per n-gram order at sf0.1
  * (and a FILTER multiplies fold evaluations: no subexpression
  * elimination applies inside predicates, so the original 5-field
  * condition cost ~2.5 ms/doc). This typed twin runs the same run-length
  * scan in plain Scala at ~tens of µs/doc — the q134 bigram-table
  * precedent (typed beats interpreted HOF by integer factors on
  * per-token work). The ORACLE-GATED report (q131) stays on the column
  * fold; [[graft.operators.RepetitionSpec]] pins this twin's decisions
  * to the fold-derived thresholds row for row on the fixture corpus.
  *
  * Tokenization is exactly [[MinhashImpl.tokens]] = the column path's
  * `split(trim(text), "\\s+")` (space-only trim, -1 limit).
  */
object RepetitionImpl {

  /** (total, distinct, dupOcc, dupChars, topCnt, topGramLen) over the
    * SORTED n-gram bag — same finalization rules as `Repetition.runFold`
    * (strict displacement = lexicographically smallest argmax; a gram
    * occurring c>1 times contributes c−1 dup occurrences and c·len dup
    * chars).
    */
  final case class Stats(total: Long, distinct: Long, dupOcc: Long,
      dupChars: Long, topCnt: Long, topGramLen: Long)

  def ngramStats(toks: Array[String], n: Int): Stats = {
    if (toks.length < n) return Stats(0, 0, 0, 0, 0, 0)
    val m = toks.length - n + 1
    val grams = new Array[String](m)
    var i = 0
    while (i < m) {
      if (n == 1) grams(i) = toks(i)
      else {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        grams(i) = sb.toString
      }
      i += 1
    }
    java.util.Arrays.sort(grams, java.util.Comparator.naturalOrder[String]())
    var distinct = 0L; var dupOcc = 0L; var dupChars = 0L
    var topCnt = 0L; var topLen = 0L
    var runStart = 0
    i = 1
    while (i <= m) {
      if (i == m || grams(i) != grams(runStart)) {
        val run = (i - runStart).toLong
        val g = grams(runStart)
        distinct += 1
        if (run > 1) { dupOcc += run - 1; dupChars += run * g.length }
        if (run > topCnt) { topCnt = run; topLen = g.length }
        runStart = i
      }
      i += 1
    }
    Stats(m.toLong, distinct, dupOcc, dupChars, topCnt, topLen)
  }

  /** The Gopher keep decision — identical thresholds and null semantics
    * to the column form (null text is dropped: the column condition
    * evaluates to NULL there).
    */
  def keep(text: String, maxDupWordFrac: Double,
      maxTopBigramCharFrac: Double, maxDupTrigramCharFrac: Double): Boolean = {
    if (text == null) return false
    val toks = MinhashImpl.tokens(text)
    val chars = text.length.toDouble
    val s1 = ngramStats(toks, 1)
    val keep1 = s1.total == 0 ||
      1.0 - s1.distinct.toDouble / s1.total.toDouble <= maxDupWordFrac
    if (!keep1) return false
    if (chars == 0) return true
    val s2 = ngramStats(toks, 2)
    if ((s2.topCnt * s2.topGramLen).toDouble / chars > maxTopBigramCharFrac)
      return false
    val s3 = ngramStats(toks, 3)
    s3.dupChars.toDouble / chars <= maxDupTrigramCharFrac
  }
}
