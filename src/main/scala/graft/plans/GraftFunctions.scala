package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native Catalyst expressions — usable from both
  * the Column API (via [[dot]]) and SQL text (`SELECT graft_dot(a, b)`).
  */
object GraftFunctions {

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_dot requires 2 arguments (array<double>, array<double>), got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }, "built-in")

  /** Codegen'd dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Codegen'd L2 norm = sqrt(dot(v, v)) — bit-identical to the
    * interpreted left-fold (same sequential accumulation), without the
    * per-element HOF interpretation tax.
    */
  def norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(call_function("graft_dot", v, v))
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
}
