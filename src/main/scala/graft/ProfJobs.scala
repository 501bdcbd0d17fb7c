package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement tool (guide §1: measure first): per-query JOB/STAGE
  * accounting for the bench surface. For each query name passed as an
  * arg, runs the query like Bench does (clearCache + gc, then
  * `.count()`) and reports wall seconds next to the number of Spark
  * jobs, stages, tasks, summed executor task time, and shuffle
  * read/write bytes the action triggered. The split tells WHERE a slow
  * query spends: `wall >> taskTime/cores` = per-job fixed overhead
  * (iteration rounds, actions, barriers — the 100 TB pass count), while
  * `taskTime ~ wall*cores` = real distributed compute.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ProfJobs q85_semantic_dedup ...'
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus),
      GraftSession.longFuse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup (Bench parity)
    try {
      Tables.lineitem(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
      SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q116_bm25_retrieval").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }

    val runs = sys.env.get("SPARK_GRAFT_PROF_RUNS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(2)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        spark.catalog.clearCache()
        System.gc()
        // settle the listener bus so counts attribute to THIS run
        Thread.sleep(500)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); shufR.set(0); shufW.set(0)
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        println(f"PROFJOBS $name run$i wall=$wall%.3f s jobs=${jobs.get}" +
          f" stages=${stages.get} tasks=${tasks.get}" +
          f" taskTime=${taskTimeMs.get / 1e3}%.2f s" +
          f" shufR=${shufR.get / 1e6}%.1f MB shufW=${shufW.get / 1e6}%.1f MB" +
          f" rows=$rows")
      }
    }
    spark.stop()
  }
}
