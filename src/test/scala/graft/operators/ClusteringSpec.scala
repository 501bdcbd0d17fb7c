package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 2-d blobs + ids such that one seed lands in each
  // (seeds are the 2 lowest ids: 0 is in blob A, 1 in blob B)
  private def blobs = Seq(
    (0L, Array(0.0f, 0.1f)), (2L, Array(0.2f, 0.0f)), (4L, Array(0.1f, 0.2f)),
    (1L, Array(9.0f, 9.1f)), (3L, Array(9.2f, 9.0f)), (5L, Array(9.1f, 9.2f))
  ).toDF("vec_id", "embedding")

  test("kmeans separates two blobs; cluster ids are the seed ids") {
    val got = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("kmeans iteration tightens assignments (d2 vs the updated centroid shrinks)") {
    val one = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 1)
      .select($"vec_id", $"d2_r").as[(Long, Double)].collect().toMap
    val two = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 2)
      .select($"vec_id", $"d2_r").as[(Long, Double)].collect().toMap
    // mean-centroids fit their cluster at least as well as the raw seeds do
    assert(two.values.sum <= one.values.sum + 1e-9)
  }

  test("kmeans is deterministic run-to-run (rounded centroids, struct-min ties)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run() = Clustering.kmeans(e, "vec_id", "embedding", k = 4, iters = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(run() == run())
  }

  test("clusterProfile counts every row once") {
    val a = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 2)
    val prof = Clustering.clusterProfile(a)
      .select($"cluster", $"n").as[(Long, Long)].collect().toMap
    assert(prof.values.sum == 6L)
    assert(prof.keySet == Set(0L, 1L))
  }

  test("assignToCentroids matches kmeans assignments on the training data (batch)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val viaKmeans = Clustering.kmeans(e, "vec_id", "embedding", k = 4, iters = 2)
      .select($"vec_id", $"cluster", $"d2_r").as[(Long, Long, Double)].collect().toSet
    val cents = Clustering.fitCentroids(e, "vec_id", "embedding", k = 4, iters = 2)
    val viaAssign = Clustering.assignToCentroids(e, "embedding", cents)
      .select($"vec_id", $"cluster", $"d2_r").as[(Long, Long, Double)].collect().toSet
    assert(viaAssign == viaKmeans)
  }

  test("assignToCentroids runs in a streaming query (no join, no state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val cents = Array((0L, Array(0.0, 0.0)), (1L, Array(9.0, 9.0)))
    val out = Clustering.assignToCentroids(
      in.toDF().toDF("vec_id", "embedding"), "embedding", cents)
    val q = out.writeStream.format("memory").queryName("assign_stream")
      .outputMode("append").start()
    try {
      in.addData((10L, Array(0.5f, 0.5f)), (11L, Array(8.5f, 9.5f)))
      q.processAllAvailable()
      val got = spark.table("assign_stream")
        .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
      assert(got == Map(10L -> 0L, 11L -> 1L))
    } finally q.stop()
  }

  test("clusterBalancedSample caps each cluster at n, deterministically") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Clustering.kmeans(e, "vec_id", "embedding", k = 4, iters = 2)
    def sample() = Clustering.clusterBalancedSample(a, "vec_id", n = 3)
      .select($"cluster", $"vec_id").as[(Long, Long)].collect().toSet
    val s = sample()
    assert(s == sample())
    val perCluster = s.groupBy(_._1).view.mapValues(_.size)
    assert(perCluster.values.forall(_ <= 3))
    // sampling never invents rows
    val all = a.select($"cluster", $"vec_id").as[(Long, Long)].collect().toSet
    assert(s.subsetOf(all))
  }
}
