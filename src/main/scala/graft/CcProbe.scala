package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch diagnostic for the CC loop's per-round cost at scale —
  * prints edge/label counts and step wall times per round (mirrors the
  * [[graft.operators.Clusters.connectedComponents]] loop structure).
  * Not part of the driver contract; run via
  * `SPARK_GRAFT_SCALE_REP=80 sbt "runMain graft.CcProbe"`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REP", "80").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = (cpus.toInt * math.max(1, rep / 8)).toString
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = ScaleSmoke.replicateDocs(Tables.documents(spark, sfDir), rep)
      .repartition(cpus.toInt * 2)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val C = graft.operators.Clusters
    var e = t("candidates+e0") {
      graft.operators.Dedup.minhashCandidatesFast(
          docs, "doc_id", "text", 3, 16, 8)
        .select(col("id_a").cast("long").as("s"),
          col("id_b").cast("long").as("d"))
        .localCheckpoint()
    }
    var labels = t("labels0") { e.select(col("s").as("id"))
      .union(e.select(col("d").as("id"))).distinct()
      .withColumn("label", col("id")).localCheckpoint() }
    println(s"PROBE nodes=${labels.count()} edges=${e.count()}")

    var round = 0
    var converged = false
    var sum: java.math.BigDecimal = null
    while (round < 25 && !converged) {
      val live = if (round == 0) None
        else Some(C.relabelLive(e, labels)
          .persist(StorageLevel.MEMORY_AND_DISK_SER))
      val jumped = t(s"r$round step") {
        (live match {
          case None => C.neighborMinRound(labels, e)
          case Some(lv) => C.liveRound(labels, lv)
        }).localCheckpoint()
      }
      val newSum = t(s"r$round checksum") {
        jumped.agg(org.apache.spark.sql.functions.sum(
          col("label").cast("decimal(38,0)"))).head().getDecimal(0) }
      converged = newSum == sum
      sum = newSum
      live.foreach { lv =>
        if (!converged) {
          val eNew = t(s"r$round contract") {
            C.contractLive(lv).localCheckpoint() }
          println(s"PROBE r$round survivors=${eNew.count()}")
          // mirror the production loop's per-round block release —
          // without it later rounds are measured under eviction
          // pressure connectedComponents doesn't actually have
          graft.operators.Checkpoints.free(e)
          e = eNew
        }
        lv.unpersist(blocking = false)
      }
      graft.operators.Checkpoints.free(labels)
      labels = jumped
      round += 1
    }
    println(s"PROBE rounds=$round converged=$converged")
    spark.stop()
  }
}
