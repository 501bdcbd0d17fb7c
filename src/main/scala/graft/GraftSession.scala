package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Conventions shared by Verify / Bench / tests:
  *   - UTC session timezone (oracle parity with DuckDB's naive timestamps).
  *   - AQE on: runtime coalescing + skew-join mitigation stands in for the
  *     hand-tuned parallelism the reference sets per job
  *     (e.g. reference scala/.../demo/hotitems/HotItems.scala:31).
  *   - Parquet INT64(NANOS) columns read as Long (Spark has no ns
  *     timestamp); [[Tables]] converts them to microsecond timestamps.
  *   - shuffle partitions sized to the core count, not the 200 default —
  *     on a real cluster this would be executors*cores*2-3.
  */
object GraftSession {

  /** Apply graft defaults to any builder (used by Verify/Bench/tests).
    *
    * Broadcast fuse: the Spark default (300 s) unless the caller passes
    * `broadcastFuse` explicitly. Our own entry points (Bench/Verify/
    * ScaleSmoke/StreamBench/local) pass [[longFuse]] — this box has
    * intermittent multi-x degradation windows (SCALE.md round-11b) under
    * which a broadcast build can blow 300 s and abort a whole run
    * spuriously; their broadcast sides are all bounded by design,
    * plan-gated. A library user's session keeps the stock 5-minute
    * fail-fast: a genuinely hung broadcast should surface, not stall
    * half an hour. GRAFT_BROADCAST_TIMEOUT overrides everywhere.
    *
    * The fuse is a PARAMETER (not a pre-set builder config) because
    * builder configs are last-write-wins: a caller that set the key
    * before handing the builder to tune() would be silently reverted to
    * the default by tune's own write — exactly the bug that had all four
    * drivers running on the stock 300 s fuse in round 12.
    */
  def tune(b: SparkSession.Builder,
      broadcastFuse: String = broadcastTimeout): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.broadcastTimeout", broadcastFuse)

  /** Seconds before an unfinished broadcast build aborts the query.
    * `longFuse` is what Bench/Verify/ScaleSmoke/StreamBench and the test
    * JVMs pass as tune()'s `broadcastFuse` argument. */
  def broadcastTimeout: String =
    sys.env.getOrElse("GRAFT_BROADCAST_TIMEOUT", "300")
  def longFuse: String =
    sys.env.getOrElse("GRAFT_BROADCAST_TIMEOUT", "1800")

  /** Local session for tests and ad-hoc runs — our own entry point, so it
    * opts into the long broadcast fuse (see [[tune]]'s rationale). */
  def local(cores: Int = 4): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString),
      longFuse).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
