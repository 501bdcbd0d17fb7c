package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    Tables.documents(spark, sfDir).count()
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    val names = args.toSeq
    names.foreach { n =>
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"PROF $n run$i ${(System.nanoTime()-t0)/1e9}%.3f s rows=$c")
      }
    }
    spark.stop()
  }
}
