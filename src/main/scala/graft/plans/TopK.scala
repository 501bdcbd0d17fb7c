package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftexec.{GraftBridge, TopKPerGroupPlan, TopKStrategy}

/** Public API for the custom Top-K-per-group physical operator
  * (org.apache.spark.sql.graftexec.TopKPerGroupExec — see its Scaladoc for
  * the O(n log k) vs full-sort rationale). Registers the planner strategy
  * on first use via the public `spark.experimental.extraStrategies` hook
  * (also injectable through GraftExtensions for spark.sql.extensions).
  */
object TopK {

  /** Exact top-k rows per group by `orderCol` (double/long, descending).
    * Row order within a group is by `orderCol` descending; ties keep
    * arbitrary-but-stable heap order — add a unique secondary to the
    * order column upstream if total determinism is required.
    */
  def topKPerGroup(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def resolve(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(keyCols.map(resolve), resolve(orderCol), k, analyzed))
  }
}
