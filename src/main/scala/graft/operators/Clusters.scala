package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: turn near-dup PAIRS (from MinHash/LSH,
  * SimHash, or exact Jaccard — [[Dedup]]) into connected components and
  * keep one canonical document per component. This is the step a real
  * corpus-dedup pipeline runs after candidate verification: near-dup is
  * not transitive, but dedup policy is ("drop everything reachable from a
  * kept doc"), so the pair set must be closed into clusters first.
  *
  * Scale design (the 100 TB story):
  *  - label propagation with POINTER JUMPING (path doubling): each round
  *    is (a) every node takes the min label over itself + neighbors — one
  *    shuffle keyed by node id; (b) every node re-points to its label's
  *    label — one self-join shuffle. (b) halves pointer-chain depth each
  *    round, so convergence is O(log n) rounds even for path-shaped
  *    graphs where plain min-propagation needs O(diameter) — the
  *    Kiveris et al. "Connected Components in MapReduce and Beyond"
  *    (two-phase / hash-to-min) recipe.
  *  - per round state is the (node, label) table — |V| rows, never edges
  *    squared; edges are re-used unmodified every round (cached).
  *  - `localCheckpoint` after each round truncates lineage, so round k
  *    doesn't replay rounds 1..k-1 (iterative-DataFrame trap).
  *  - convergence test is `sum(label)` (labels only ever decrease, and a
  *    round that changes nothing leaves the sum fixed) — one scalar agg
  *    per round instead of an old-vs-new anti-join. Summed as
  *    DECIMAL(38,0) so 100 TB of long ids can't overflow the check.
  *
  * Reference analog: the tutorial's iterate/closeWith feedback loop
  * (java/.../transformation/IterateDemo.java:22-50) is the same
  * driver-steps-a-fixpoint shape; here the loop body is a distributed
  * min-label round instead of a per-element decrement.
  */
object Clusters {

  /** Connected components over an undirected edge list.
    *
    * @param edges  DataFrame with two long-compatible id columns
    * @return (id, cluster) — `cluster` is the MINIMUM id reachable from
    *         `id`; one row per distinct node in `edges`. Deterministic.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxRounds: Int = 25): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    // symmetrize once; dedup so multi-edges don't multiply round cost
    val e = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var sum = checksum(labels)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val jumped = ccRound(labels, e).localCheckpoint()
      val newSum = checksum(jumped)
      converged = newSum == sum
      sum = newSum
      // the superseded round's checkpoint blocks are dead the moment
      // `jumped` materializes — free them now instead of waiting for the
      // ContextCleaner's GC-driven cleanup (25 stale |V|-row snapshots
      // is real eviction pressure at corpus scale)
      freeCheckpoint(labels)
      labels = jumped
      round += 1
    }
    e.unpersist()
    // a non-converged result is silently WRONG (labels mid-propagation);
    // pointer jumping converges in O(log n) rounds, so hitting the cap
    // means something is broken — fail loudly, never return bad clusters
    require(converged,
      s"connectedComponents did not converge in $maxRounds rounds")
    labels.withColumnRenamed("label", "cluster")
  }

  /** One propagation round — (a) every node takes the min label over
    * itself + neighbors (one shuffle keyed by node id); (b) pointer jump:
    * label := label(label) — every label value is a node id present in
    * `labels`, so the lookup always hits. Factored out so ScaleSmoke can
    * plan-gate the shapes that repeat every round (the loop's
    * checkpoints hide them from the final plan).
    */
  private[graft] def ccRound(labels: DataFrame, e: DataFrame): DataFrame = {
    val viaEdges = e.join(labels.withColumnRenamed("id", "s"), "s")
      .groupBy(col("d").as("id")).agg(min(col("label")).as("nl"))
    val stepped = labels.join(viaEdges, Seq("id"), "left")
      .select(col("id"), least(col("label"), col("nl")).as("label"))
    stepped.alias("x")
      .join(labels.select(col("id").as("label"), col("label").as("ll"))
        .alias("p"), Seq("label"))
      .select(col("x.id").as("id"), col("ll").as("label"))
  }

  private def checksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("label").cast("decimal(38,0)")).as("s"))
      .head().getDecimal(0)

  /** See [[Checkpoints.free]] — the shared deterministic-release hook. */
  private def freeCheckpoint(df: DataFrame): Unit = Checkpoints.free(df)

  /** Cluster-level dedup: resolve `pairs` into components and keep, per
    * component, only the row of `df` with the minimum id (rows in no pair
    * survive untouched). Adds `cluster` (= kept id; own id for singletons)
    * and `dup_count` (component size, 1 for singletons).
    */
  def dedupByClusters(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("dup_count"))
    val m = cc.join(sizes, "cluster")
    df.join(m.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("dup_count", coalesce(col("dup_count"), lit(1L)))
      .filter(col(idCol) === col("cluster"))
  }
}
