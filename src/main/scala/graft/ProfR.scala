package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfR {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFR $name ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    import spark.implicits._
    (1 to 3).foreach { i =>
      val idx = graft.operators.Retrieval.buildIndex(docs, "doc_id", "text")
      t(s"postings$i") { idx.postings.count() }
      t(s"terms$i") { idx.terms.count() }
      t(s"stats$i") { idx.stats.count() }
      val qs = Seq((1L,"table scan fast"),(2L,"join merge batch"),(3L,"window agg stream")).toDF("query_id","qtext")
      t(s"search$i") { graft.operators.Retrieval.searchBm25(idx, qs, 5).count() }
    }
    spark.stop()
  }
}
