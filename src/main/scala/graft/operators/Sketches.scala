package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (DataSketches HLL via the Spark
  * builtins) — the incremental-statistics discipline for a corpus that
  * only ever grows: each group's sketch is a KB-sized BINARY column
  * persisted next to the data, and a new batch builds ITS OWN sketch
  * and unions register-wise — historical data is never rescanned.
  * Complements [[graft.functions.CountMin]] (heavy hitters) on the
  * distinct-count axis; together they are the standard pair of
  * mergeable corpus-monitoring sketches.
  *
  * Scale shape: sketch build is one map-side-combining aggregate (HLL
  * updates are register maxes — commutative, so partial aggregation is
  * exact); merge is an aggregate over G sketch rows, KBs each. Nothing
  * row-shaped survives the first aggregate.
  *
  * Determinism: HLL register state is order-independent (max of
  * hashes), so sketches and estimates are deterministic for a given
  * input set. At small cardinalities the DataSketches HLL sits in its
  * exact (coupon) mode, which is what lets q125 gate the estimates
  * against an exact COUNT(DISTINCT) oracle at the test scales.
  */
object Sketches {

  /** Per-group HLL sketch of `keyCol`: (groupCol, sketch, n_rows). */
  def distinctSketch(df: DataFrame, groupCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol)).agg(
      hll_sketch_agg(col(keyCol), lgK).as("sketch"),
      count(lit(1)).as("n_rows"))

  /** Attach the distinct estimate to a sketch table. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("distinct_est", hll_sketch_estimate(col("sketch")))

  /** Merge two sketch tables (overlapping or disjoint groups): one
    * register-wise union per group; n_rows add.
    */
  def mergeSketches(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("sketch"), col("n_rows"))
      .unionByName(b.select(col(groupCol), col("sketch"), col("n_rows")))
      .groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("n_rows")).as("n_rows"))

  /** Incremental update: stored sketches + a new RAW batch — the batch
    * is the only thing scanned.
    */
  def updateWith(stored: DataFrame, batch: DataFrame, groupCol: String,
      keyCol: String, lgK: Int = 12): DataFrame =
    mergeSketches(stored, distinctSketch(batch, groupCol, keyCol, lgK),
      groupCol)

  /** Cross-group rollup: one global (sketch, n_rows, distinct_est) row
    * from the per-group sketches — distinct-union semantics, which
    * per-group counts cannot give you by addition.
    */
  def globalEstimate(sketches: DataFrame): DataFrame =
    estimate(sketches.agg(hll_union_agg(col("sketch")).as("sketch"),
      sum(col("n_rows")).as("n_rows")))
}
