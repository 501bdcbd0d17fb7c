package graft.plans

import org.apache.spark.sql.execution.SparkPlan

/** Shared executed-plan traversal for scale-shape assertions (used by
  * ScaleSmoke and the plan-gating specs — one copy, so the checks can't
  * drift). `walk` crosses AQE boundaries (AdaptiveSparkPlanExec, query
  * stages, reused subqueries), which plain `children` recursion does
  * not: a materialized shuffle stage is a LEAF whose real subtree hangs
  * off `plan`.
  */
object PlanWalk {
  def walk(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(walk)) ++ p.subqueries.flatMap(walk) ++
      extra.flatMap(walk)
  }

  /** Does any node at-or-below `p` aggregate? (crosses AQE stages) */
  def hasAggBelow(p: SparkPlan): Boolean = walk(p).exists(
    _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec])

  /** Partitionless windows over UNAGGREGATED input — the single-task
    * scale-killer pattern. Windows above an aggregate (reduced input,
    * the Packing bucket-totals shape) are tolerated.
    */
  def badPartitionlessWindows(root: SparkPlan): Seq[SparkPlan] =
    walk(root).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty && !hasAggBelow(w) => w
    }

  /** Distinct shuffle exchanges in an executed plan — the per-query
    * shuffle budget (every Exchange is a full rewrite of the data over
    * the network; at 100 TB an extra one is the difference between a
    * 2-stage and 3-stage job). Distinct by node identity: AQE reuse
    * (ReusedExchangeExec / shared query stages) re-surfaces the SAME
    * exchange instance, which ran once and must count once.
    */
  def shuffleExchangeCount(root: SparkPlan): Int =
    walk(root).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.map(System.identityHashCode).distinct.size

  /** The 100 TB shape gate, on an EXECUTED plan: no CartesianProduct
    * ever; BroadcastNestedLoopJoin only where the operator broadcasts a
    * designed small side (query batch / centroids / 1-row stats);
    * no partitionless window over raw (unaggregated) rows. Shared by
    * ScaleSmoke and PlanGateSpec so the checks can't drift.
    */
  def assertShapes(op: String, root: SparkPlan,
      allowBroadcastNlj: Boolean): Unit = {
    val nodes = walk(root)
    val cartesian = nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
    require(!cartesian, s"$op: CartesianProduct in executed plan")
    if (!allowBroadcastNlj) {
      val nlj = nodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
      require(!nlj, s"$op: BroadcastNestedLoopJoin in executed plan")
    }
    val bad = badPartitionlessWindows(root)
    require(bad.isEmpty,
      s"$op: partitionless WindowExec over raw input:\n${bad.mkString("\n")}")
  }
}
