package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two ArrayType(Double) columns.
  *
  * Tier (b) of the custom-operator ladder (compose > Expression > plan
  * node > mapPartitions): Spark's higher-order alternative
  * (`aggregate(zip_with(a,b,*),0,+)`) is CodegenFallback — interpreted
  * per element with per-call allocations. This expression generates a
  * tight primitive loop inside whole-stage codegen (no boxing, no
  * intermediate array), which matters when the pair loop runs millions of
  * times in ANN scoring. Accumulation order is the same left-to-right
  * fold, so results are bit-identical to the interpreted version.
  */
/** Note: no ExpectsInputTypes (AbstractDataType is private[sql] in
  * Spark 4) — callers must supply array&lt;double&gt; on both sides, as
  * graft.operators.Similarity does via toDoubleVec.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
