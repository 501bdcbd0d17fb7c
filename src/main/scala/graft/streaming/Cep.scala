package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mini CEP library: a `Pattern` AST compiled onto per-key state machines.
  *
  * Covers the reference's CEP surface
  * (scala/.../demo/loginfail/LoginFailWithCep.scala:38-54 — begin/where/
  * next/times/consecutive/within; scala/.../demo/orderpaydetect/
  * OrderTimeoutWithCEP.scala:38-56 — followedBy + within + timeout
  * extraction via side output). Spark has no CEP operator, so this is the
  * custom-operator tier: a library op on flatMapGroupsWithState — no
  * planner changes needed, state is engine-checkpointed, and the per-key
  * partitioning shuffles once on the key like any keyed aggregate (scales
  * horizontally; state size is O(open partials per key)).
  *
  * Semantics:
  *  - `next` = strict continuity (a non-matching event kills the partial).
  *  - `followedBy` = relaxed continuity (non-matching events are skipped).
  *  - `within` = max time from first matched event to last; partials past
  *    the deadline become timeouts (emitted when `emitTimeouts`, matching
  *    the reference's PatternTimeoutFunction side output).
  */
object Cep {

  /** One pattern step: events satisfying `pred`; `strict` = `next`. */
  case class Step[E](name: String, pred: E => Boolean, strict: Boolean)
      extends Serializable

  case class Pattern[E](steps: Vector[Step[E]], withinMs: Long) extends Serializable {
    def next(name: String)(pred: E => Boolean): Pattern[E] =
      copy(steps = steps :+ Step(name, pred, strict = true))
    def followedBy(name: String)(pred: E => Boolean): Pattern[E] =
      copy(steps = steps :+ Step(name, pred, strict = false))
    /** Repeat the last step `n` times total. `consecutive=true` (default)
      * gives the reference's `times(n).consecutive()` semantics — the
      * repeats require strict continuity; false allows gaps
      * (`allowCombinations`-style).
      */
    def times(n: Int, consecutive: Boolean = true): Pattern[E] = {
      val last = steps.last
      copy(steps = steps ++
        Vector.fill(n - 1)(last.copy(strict = consecutive)))
    }
    def within(ms: Long): Pattern[E] = copy(withinMs = ms)
  }

  object Pattern {
    def begin[E](name: String)(pred: E => Boolean): Pattern[E] =
      Pattern(Vector(Step(name, pred, strict = false)), withinMs = Long.MaxValue)
  }

  /** A completed match (`kind="match"`) or a timed-out partial
    * (`kind="timeout"`, the reference's timeout side output).
    */
  case class Result[E](key: String, kind: String, matchedSteps: Seq[String],
      events: Seq[E], firstTs: Long, lastTs: Long)

  private case class Partial[E](step: Int, firstTs: Long, events: List[E])

  /** Expiry instant of a partial, saturating at Long.MaxValue so a pattern
    * without `.within()` (withinMs = Long.MaxValue) never wraps negative.
    */
  private def deadlineOf(firstTs: Long, withinMs: Long): Long = {
    val d = firstTs + withinMs
    if (withinMs > 0 && d < firstTs) Long.MaxValue else d
  }

  /** Advance all partials with one event; returns (new partials, completed). */
  private def advance[E](pattern: Pattern[E], partials: List[Partial[E]],
      e: E, ts: Long): (List[Partial[E]], List[Partial[E]]) = {
    val survivors = partials.flatMap { p =>
      val nextStep = pattern.steps(p.step + 1)
      if (nextStep.pred(e)) Some(Partial(p.step + 1, p.firstTs, e :: p.events))
      else if (nextStep.strict) None
      else Some(p)
    }
    val started =
      if (pattern.steps.head.pred(e)) List(Partial(0, ts, List(e))) else Nil
    val all = survivors ++ started
    all.partition(p => p.step < pattern.steps.length - 1) match {
      case (open, done) => (open, done)
    }
  }

  private def toResult[E](key: String, kind: String, pattern: Pattern[E],
      p: Partial[E], tsOf: E => Long): Result[E] = {
    val evs = p.events.reverse
    Result(key, kind, pattern.steps.take(p.step + 1).map(_.name), evs,
      p.firstTs, evs.lastOption.map(tsOf).getOrElse(p.firstTs))
  }

  /** Run the pattern per key over one ordered event sequence (used by both
    * the batch operator and per-micro-batch processing).
    */
  private def run[E](pattern: Pattern[E], key: String, sorted: Seq[E],
      tsOf: E => Long, carryIn: List[Partial[E]], emitTimeouts: Boolean)
      : (List[Result[E]], List[Partial[E]]) = {
    var open = carryIn
    val out = List.newBuilder[Result[E]]
    sorted.foreach { e =>
      val ts = tsOf(e)
      // expire first: partials whose window closed before this event
      val (live, dead) = open.partition(p => ts - p.firstTs <= pattern.withinMs)
      if (emitTimeouts) dead.foreach(p => out += toResult(key, "timeout", pattern, p, tsOf))
      val (stillOpen, done) = advance(pattern, live, e, ts)
      // a completed match must also respect the window
      done.foreach { p =>
        if (ts - p.firstTs <= pattern.withinMs)
          out += toResult(key, "match", pattern, p, tsOf)
      }
      open = stillOpen
    }
    (out.result(), open)
  }

  /** Batch CEP: per-key, time-ordered pattern matching. Shuffles once on
    * the key; per-key sequences are processed independently (embarrassingly
    * parallel across keys at 100 TB — skewed keys are the one hazard, same
    * as any keyed op).
    */
  def detectBatch[E](ds: Dataset[E])(keyFn: E => String, tsOf: E => Long,
      pattern: Pattern[E], emitTimeouts: Boolean = false,
      endOfInputTimeouts: Boolean = false): Dataset[Result[E]] = {
    implicit val re: Encoder[Result[E]] = Encoders.kryo[Result[E]]
    implicit val se: Encoder[String] = Encoders.STRING
    ds.groupByKey(keyFn).flatMapGroups { (key, it) =>
      val sorted = it.toSeq.sortBy(tsOf)
      val (results, open) = run(pattern, key, sorted, tsOf, Nil, emitTimeouts)
      val tail = if (emitTimeouts && endOfInputTimeouts)
        open.filter(_.step >= 0).map(p => toResult(key, "timeout", pattern, p, tsOf))
      else Nil
      (results ++ tail).iterator
    }
  }

  /** Streaming CEP on flatMapGroupsWithState: partial matches live in
    * per-key state; event-time timeouts flush expired partials as timeout
    * results (reference OrderTimeoutWithCEP timeout side output). Requires
    * a watermark on the input for EventTimeTimeout + state GC.
    */
  def detectStream[E](ds: Dataset[E])(keyFn: E => String, tsOf: E => Long,
      pattern: Pattern[E], emitTimeouts: Boolean = false): Dataset[Result[E]] = {
    implicit val re: Encoder[Result[E]] = Encoders.kryo[Result[E]]
    implicit val st: Encoder[List[Partial[E]]] = Encoders.kryo[List[Partial[E]]]
    implicit val se: Encoder[String] = Encoders.STRING
    ds.groupByKey(keyFn).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: String, it: Iterator[E], state: GroupState[List[Partial[E]]]) =>
        val carry = state.getOption.getOrElse(Nil)
        // Unbounded patterns (no .within()) never expire: don't register a
        // timeout at all — the saturated deadline would otherwise be passed
        // to setTimeoutTimestamp and rejected (pre-watermark/negative).
        val bounded = pattern.withinMs != Long.MaxValue
        if (!it.hasNext && state.hasTimedOut) {
          // watermark passed the earliest deadline: expire partials
          val wm = state.getCurrentWatermarkMs()
          val (live, dead) =
            carry.partition(p => deadlineOf(p.firstTs, pattern.withinMs) >= wm)
          if (live.isEmpty) state.remove() else state.update(live)
          if (live.nonEmpty && bounded)
            state.setTimeoutTimestamp(math.max(
              live.map(p => deadlineOf(p.firstTs, pattern.withinMs)).min, wm + 1))
          (if (emitTimeouts)
            dead.map(p => toResult(key, "timeout", pattern, p, tsOf))
          else Nil).iterator
        } else {
          val sorted = it.toSeq.sortBy(tsOf)
          val (results, open) = run(pattern, key, sorted, tsOf, carry, emitTimeouts)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            if (bounded)
              // clamp past the watermark: a late partial's deadline may
              // already be behind it, and setTimeoutTimestamp rejects
              // pre-watermark instants (it then fires next micro-batch).
              state.setTimeoutTimestamp(math.max(
                open.map(p => deadlineOf(p.firstTs, pattern.withinMs)).min,
                state.getCurrentWatermarkMs() + 1))
          }
          results.iterator
        }
    }
  }
}
