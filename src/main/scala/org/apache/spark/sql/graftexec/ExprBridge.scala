package org.apache.spark.sql.graftexec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Expression, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst-Expression bridge. Spark 4 made `Column` wrap a
  * `ColumnNode` and hid the conversion behind the `sql`-private
  * `ExpressionUtils`; graft needs it in exactly one place —
  * constructing a `BloomFilterMightContain` probe over a
  * `ScalarSubquery`-wrapped `bloom_filter_agg` (the plan shape Spark's
  * own `InjectRuntimeFilter` emits; neither expression is registered
  * for SQL, so there is no public-API spelling). Lives in this package
  * for the same reason `TopKPerGroup` does: it is Spark-internal
  * plumbing, not engine logic.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The runtime-bloom-filter probe predicate: aggregate `dimHashes`
    * (must be a single LongType column, e.g. an xxhash64 projection)
    * through `bloom_filter_agg` inside a scalar subquery, and test
    * `probeHash` against it with `might_contain`. The subquery executes
    * once; the probe is codegen'd — no driver-held bitmap, no closure
    * capture.
    */
  def bloomMightContain(dimHashes: DataFrame, expectedKeys: Long,
      numBits: Long, probeHash: Column): Column = {
    val dimPlan = dimHashes.queryExecution.analyzed
    require(dimPlan.output.size == 1,
      s"dimHashes must project exactly one column, got ${dimPlan.output}")
    val bfAgg = new BloomFilterAggregate(dimPlan.output.head,
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    val agg = Aggregate(Nil, Seq(Alias(bfAgg, "__bf")()), dimPlan)
    column(BloomFilterMightContain(ScalarSubquery(agg),
      expression(probeHash)))
  }
}
