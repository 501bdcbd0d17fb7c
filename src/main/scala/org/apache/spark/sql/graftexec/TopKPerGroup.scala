package org.apache.spark.sql.graftexec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

import scala.collection.mutable

/** Custom whole-operator tier (ladder step (c) — LogicalPlan + Strategy +
  * SparkPlan): exact top-k rows per group by a numeric column, kept in
  * bounded min-heaps instead of sorting each group.
  *
  * Why a physical operator: the declarative form
  * (`row_number().over(partitionBy(keys).orderBy(v.desc)) <= k`) sorts
  * every group in full — O(n log n) per group and the whole group
  * materialized in the sort. This operator holds only k rows per group:
  * O(n log k), memory O(groups·k) — the difference between a sort-spill
  * and a scan at 100 TB group sizes.
  *
  * Lives under org.apache.spark.sql because the constructors it needs
  * (Dataset.ofRows, execution internals) are private[sql] — the standard
  * packaging for Spark extension operators. Public API:
  * [[graft.plans.TopK]].
  */
case class TopKPerGroupPlan(keys: Seq[Attribute], ordCol: Attribute, k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

case class TopKPerGroupExec(keys: Seq[Attribute], ordCol: Attribute, k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Group rows must be co-located; EnsureRequirements inserts the hash
    * exchange (or reuses an existing partitioning — free after an
    * upstream groupBy on the same keys).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val ordIdx = child.output.indexWhere(_.exprId == ordCol.exprId)
    val ordType = child.output(ordIdx).dataType
    val keyExprs = keys
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // min-heap per group: dequeue evicts the smallest of the kept k
      implicit val ord: Ordering[(Double, UnsafeRow)] =
        Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
      val heaps = mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[(Double, UnsafeRow)]]()
      it.foreach { row =>
        val v = ordType match {
          case DoubleType => row.getDouble(ordIdx)
          case LongType => row.getLong(ordIdx).toDouble
          case t => throw new IllegalArgumentException(
            s"topKPerGroup order column must be double/long, got $t")
        }
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, null) match {
          case null =>
            val h = mutable.PriorityQueue.empty[(Double, UnsafeRow)]
            heaps.put(key.copy(), h) // copy: UnsafeProjection reuses its buffer
            h
          case h => h
        }
        if (heap.size < kk) {
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy())) // copy: iterator reuses row
        } else if (v > heap.head._1) {
          heap.dequeue()
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sortBy(-_._1).map(_._2))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Planner strategy mapping the logical node to the exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(keys, ordCol, k, child) =>
      TopKPerGroupExec(keys, ordCol, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** private[sql] bridge helpers. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
