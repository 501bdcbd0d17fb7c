package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Randomness comes
  * from content hashes, not RNGs, so a sample is: reproducible across
  * runs/engines (oracle-checkable), stable under appends (a row's
  * membership changes only when a smaller-hash row enters its group), and
  * consistent across tables keyed by the same id — the properties that
  * matter when the "sample" feeds a multi-week training run.
  */
object Sampling {

  /** md5-derived uniform bucket in [0, buckets): the first 8 hex chars as
    * an unsigned 32-bit value, mod buckets — engine-neutral.
    */
  def hashBucket(idCol: Column, buckets: Int): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Consistent per-group sample: the `n` rows with the smallest
    * md5(id) per group. One shuffle on the group key (rank window is
    * partitioned — no global stage); ties impossible for distinct ids.
    */
  def consistentSamplePerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic train/val/test split: each row lands in the split
    * whose cumulative weight range contains its hash bucket. Pure column
    * expression — no shuffle, no RNG; the same id always lands in the
    * same split (also across tables sharing the id space).
    *
    * @param splits (label, weight) pairs; weights normalized to sum 1.
    */
  def splitByHash(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], outCol: String = "split",
      buckets: Int = 10000): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive weights required")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.round(f * buckets))
    val b = hashBucket(col(idCol), buckets)
    // ordered when-chain; the last bound is exactly `buckets`, so the
    // final otherwise is unreachable (kept for total-ness)
    val first = when(b < bounds.head, lit(splits.head._1))
    val labeled = splits.tail.zip(bounds.tail).foldLeft(first) {
      case (acc, ((label, _), hi)) => acc.when(b < hi, lit(label))
    }.otherwise(lit(splits.last._1))
    df.withColumn(outCol, labeled)
  }
}
