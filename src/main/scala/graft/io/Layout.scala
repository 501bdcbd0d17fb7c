package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical table layout for 100 TB fact tables — the two levers that
  * remove whole stages from hot queries:
  *
  *  - **Bucketing**: persist both sides of a recurring equi-join
  *    pre-hash-partitioned on the join key (`bucketBy`). Joins between
  *    tables bucketed the same way need NO Exchange — at 100 TB that
  *    deletes the dominant cost of a fact-fact join. (The reference's
  *    keyBy-before-join does this per-job; bucketing bakes it into the
  *    storage layout once.)
  *  - **Date partitioning**: `partitionBy(day)` so time-range predicates
  *    prune entire directories (PartitionFilters at the scan) instead of
  *    filtering rows.
  *
  * Bucketed tables must go through the catalog (`saveAsTable`) — plain
  * parquet paths carry no bucketing metadata.
  */
object Layout {

  /** Persist `df` bucketed by `keyCol` into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key —
    * exchange-free when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyLeft: String, keyRight: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(keyLeft) === r(keyRight))
  }

  /** Persist `df` date-partitioned (one directory per `partCol` value). */
  def writeDatePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
}
