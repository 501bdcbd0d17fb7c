package graft

import org.apache.spark.sql.SparkSession

/** One-shot audit: print every gate query's executed-plan shuffle-exchange
  * count at sf0.001 as a Scala map literal — the source of the budgets
  * pinned in PlanGateSpec. Re-run after intentional plan changes and paste
  * the diff; an unexplained increase is a regression, not a new budget.
  */
object ExchangeAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // Optional 2nd arg: comma-separated query names to audit (subset while
    // iterating; absent = full surface, the budget-table contract).
    val only = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.local(8)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.count()
        val n = plans.PlanWalk.shuffleExchangeCount(df.queryExecution.executedPlan)
        println(s"""AUDIT    "$name" -> $n,""")
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        println(s"""AUDIT    // $name FAILED: ${msg.take(120)}""")
      }
    }
    spark.stop()
  }
}
