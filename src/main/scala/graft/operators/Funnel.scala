package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed conversion funnels — the per-step-deadline semantics real
  * funnel analytics use (step k counts only if it happens within the
  * conversion window AFTER a reaching step k−1), which the greedy
  * first-completion chain (q165's shape) cannot express: under a window,
  * greedy min-ts is WRONG — the earliest step-(k−1) completion can fail
  * where a later one converts, so a user's full VALID SET must be
  * carried forward, not its minimum.
  *
  * Formally: R_1 = the user's step-1 event times; R_k = { t : step-k
  * event at t with some s ∈ R_{k−1}, s < t ≤ s + window }. The user
  * reaches step k iff R_k ≠ ∅.
  *
  * Scale shape: ONE shuffle keyed by user (groupByKey), then a per-user
  * ordered fold — each group holds one user's funnel-relevant events (a
  * handful; bounded by per-user activity, the same bound every keyed
  * streaming state op in this engine lives with), sorted and scanned
  * with a two-pointer sweep per step: O(events·steps) time, no pair
  * join, no window over raw events. Output is |users| rows. This is the
  * batch twin of the CEP NFA (`streaming.Cep` runs the same
  * followedBy-within shape incrementally; see the streaming funnel in
  * `StreamingApps`).
  */
object Funnel {

  /** Per-user deepest reachable step: (user_id, n_steps) with n_steps in
    * [0, steps.length] — 0 for a user with funnel events but no step-1
    * event. `windowUs` is the per-step conversion deadline in
    * MICROSECONDS (timestamps compare at full µs precision; strict
    * s < t, inclusive t ≤ s + window, exactly replayable as
    * `t <= s + INTERVAL` in any SQL engine).
    */
  def reachedSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowUs: Long): DataFrame =
    reachedTimes(events, userCol, typeCol, tsCol, steps, windowUs)
      .select(col("user_id"), col("n_steps"))

  /** [[reachedSteps]] plus the funnel's latency signal: `step_us(k)` is
    * the EARLIEST VALID step-k time, min R_k — well-defined under the
    * valid-set semantics (unlike greedy chains, where "first completion"
    * depends on which earlier choice was taken), and the quantity
    * conversion-latency reports are built from. The array has exactly
    * `n_steps` entries; note min R_k can chain off a LATER previous-step
    * event than min R_{k−1} (the reachability point), so consecutive
    * entries need not be within one window of each other.
    */
  def reachedTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    require(windowUs > 0, s"window must be positive: $windowUs")
    val stepIdx = steps.zipWithIndex.toMap
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.length
    events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long").as("user_id"),
        col(typeCol).cast("string").as("t"),
        unix_micros(col(tsCol)).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        // TreeSet per step: R_k are SETS, so duplicate instants carry no
        // reachability information — deduping at ingestion caps a bot
        // burst's per-user memory at DISTINCT (step, µs) pairs, and the
        // sweep gets its sorted order for free
        val perStep = Array.fill(nSteps)(
          scala.collection.mutable.TreeSet.empty[Long])
        it.foreach { case (_, t, us) => perStep(stepIdx(t)) += us }
        // R_1 = all step-1 times; R_k via a two-pointer sweep: for
        // ascending candidate t the qualifying window [t − W, t) over the
        // sorted previous-step valid times advances monotonically.
        var prev = perStep(0).toArray
        val firsts = scala.collection.mutable.ArrayBuffer.empty[Long]
        if (prev.nonEmpty) firsts += prev.head
        var k = 1
        while (k < nSteps && prev.nonEmpty) {
          val cand = perStep(k).toArray
          val valid = scala.collection.mutable.ArrayBuffer.empty[Long]
          var i = 0
          cand.foreach { t =>
            while (i < prev.length && prev(i) < t - windowUs) i += 1
            if (i < prev.length && prev(i) < t) valid += t
          }
          prev = valid.toArray
          if (prev.nonEmpty) firsts += prev.head
          k += 1
        }
        (uid, firsts.length.toLong, firsts.toSeq)
      }
      .toDF("user_id", "n_steps", "step_us")
  }
}
