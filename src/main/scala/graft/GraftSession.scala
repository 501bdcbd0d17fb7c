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

  /** Apply graft defaults to any builder (used by Verify/Bench/tests). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")
    // This box has intermittent multi-x degradation windows (SCALE.md
    // round-11b): under one, a broadcast build can blow the 300 s
    // default and abort a whole suite/verify run spuriously. The
    // broadcast sides here are all bounded by design (plan-gated), so
    // a longer fuse trades nothing except failing later on a genuine
    // hang.
    .config("spark.sql.broadcastTimeout", "1800")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
