package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named queries to files — the plan
  * evidence the optimization rounds commit under plans/rNN/ (guide §1.2:
  * capture the plan shape before and after each change). No execution:
  * plans are compiled, not run (store-read gates that must build their
  * store at plan time still do so).
  *
  * Usage: sbt 'runMain graft.PlanDump plans/r18 before q85_semantic_dedup ...'
  *        (query list empty = every declared query)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus),
      GraftSession.longFuse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val res = scala.util.Try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.explainString(FormattedMode)
      }
      val text = res.getOrElse(s"PLAN FAILED: ${res.failed.get}")
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), text)
      println(s"[plandump] $name -> ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
