package graft.operators

import graft.functions.VectorFunctions.toDoubleVec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

/** Distributed k-means over an embedding column — the corpus-diversity
  * clustering step of a training-data pipeline (cluster-balanced sampling,
  * domain discovery, IVF coarse quantizers).
  *
  * Scale design (the MLlib/broadcast-centroid shape): the CORPUS never
  * moves — each Lloyd's iteration broadcasts the k×dim centroid table
  * (tiny: k ≤ ~64k keeps it a few MB) against the corpus scan, assigns via
  * a map-side argmin, and recomputes centroids with one uniform-keyed
  * aggregate on (cluster, dim). Only k×dim doubles ever reach the driver,
  * per iteration, regardless of corpus size; lineage is truncated there so
  * the plan stays flat at any iteration count.
  *
  * Determinism / oracle parity: seeds are the k smallest-id rows (their id
  * IS the cluster id); per-pair squared distances are rounded to
  * `distScale` before the argmin (ties → lowest cluster id); recomputed
  * centroid coordinates are rounded to `centroidScale` — rounding at each
  * step resynchronizes floating-point state across engines, so a DuckDB
  * CTE chain reproduces the assignment exactly (same trick as the md5
  * MinHash/SimHash oracle paths, reference flink-tutorial has no k-means —
  * this is pipeline-tier functionality beyond the reference).
  */
object Clustering {

  /** Lloyd's k-means. Returns one row per input: (idCol, cluster, d2_r)
    * after `iters` assignment rounds (`iters - 1` centroid updates).
    * A cluster that captures no points in some round simply disappears
    * (standard Lloyd's degeneracy; deterministic here, mirrored by the
    * oracle). Input vectors must share one length.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, distScale: Int = 4, centroidScale: Int = 6): DataFrame =
    lloyd(df, idCol, vecCol, k, iters, distScale, centroidScale)._1
      .select(col("__id").as(idCol), col("cluster"), col("d2_r"))

  /** The fitted centroids themselves (cid = seed id), for
    * [[assignToCentroids]] — k×dim doubles, driver-small by design.
    */
  def fitCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, distScale: Int = 4, centroidScale: Int = 6)
      : Array[(Long, Array[Double])] =
    lloyd(df, idCol, vecCol, k, iters, distScale, centroidScale)._2

  private def lloyd(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, distScale: Int, centroidScale: Int)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    require(k > 0 && iters > 0, s"k=$k, iters=$iters must be positive")
    val spark = df.sparkSession
    val corpus = df.select(col(idCol).cast("long").as("__id"),
      toDoubleVec(col(vecCol)).as("__v"))

    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)

    // assignment: per corpus row, the centroid minimizing rounded d2
    // (broadcast nested-loop on k rows — the corpus side never shuffles)
    def assign(cents: DataFrame): DataFrame =
      corpus.crossJoin(broadcast(cents))
        .withColumn("__d2", round(d2(col("__v"), col("__cv")), distScale))
        .groupBy(col("__id"))
        .agg(min(struct(col("__d2"), col("__cid"))).as("__m"),
          first(col("__v")).as("__v"))
        .select(col("__id"), col("__m.__cid").as("cluster"),
          col("__m.__d2").as("d2_r"), col("__v"))

    // k×dim doubles to the driver: truncates lineage AND is the broadcast
    // pattern a real cluster uses — the corpus itself never moves
    def materialize(cents: DataFrame): DataFrame = {
      val rows = cents.collect().toSeq
      val schema = StructType(Seq(StructField("__cid", LongType, nullable = false),
        StructField("__cv", ArrayType(DoubleType), nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row(r.getLong(0), r.getSeq[Double](1))), 1), schema)
    }

    // seeds: the k smallest ids; the seed id is the cluster id (no window,
    // no row_number — TakeOrderedAndProject handles the top-k)
    var centroids = materialize(corpus.orderBy(col("__id")).limit(k)
      .select(col("__id").as("__cid"),
        transform(col("__v"), x => round(x, centroidScale)).as("__cv")))

    var assigned = assign(centroids)
    for (_ <- 1 until iters) {
      // recompute: one aggregate keyed by (cluster, dim) — uniform keys,
      // bounded by k×dim groups — then reassemble the ordered coordinate
      // array and round to resync cross-engine floating point
      val updated = assigned
        .select(col("cluster"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy(col("cluster"), col("__p"))
        .agg(avg(col("__x")).as("__m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("__p"), col("__m")))),
          s => round(s.getField("__m"), centroidScale)).as("__cv"))
        .select(col("cluster").as("__cid"), col("__cv"))
      centroids = materialize(updated)
      assigned = assign(centroids)
    }
    val centArray = centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (assigned, centArray)
  }

  /** Cluster sizes + mean rounded distance — the diagnostic a curation run
    * logs to decide k (inertia per cluster, relative balance).
    */
  def clusterProfile(assignments: DataFrame): DataFrame =
    assignments.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(avg(col("d2_r")), 4).as("mean_d2"))

  /** Cluster-balanced sample: at most `n` rows per cluster, picked by the
    * deterministic md5 order (same law as
    * [[Sampling.consistentSamplePerGroup]]) — the diversity-sampling step
    * that keeps a dominant cluster from flooding a training mix.
    */
  def clusterBalancedSample(assignments: DataFrame, idCol: String,
      n: Int): DataFrame =
    Sampling.consistentSamplePerGroup(assignments, Seq("cluster"), idCol, n)

  /** Assign rows (batch OR stream) to FIXED centroids — the online half
    * of clustering: train centroids offline with [[fitCentroids]], then
    * route arriving documents to their cluster in-flight (corpus-mix
    * steering, per-cluster quotas). Pure map-side column work — centroids
    * are inlined as literals (k×dim doubles, the broadcast-variable
    * pattern as expressions) and the argmin is a struct-ordered
    * `array_min`, so there is NO join, NO shuffle, and NO state: the
    * same select runs identically under batch and any streaming output
    * mode. Appends `cluster` and `d2_r` (same law as [[kmeans]]).
    */
  def assignToCentroids(df: DataFrame, vecCol: String,
      centroids: Array[(Long, Array[Double])], distScale: Int = 4): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    // struct-ordered array_min: lexicographic (d2, cid) min without a
    // groupBy, so the same expression runs in a streaming select
    val cents = centroids.map { case (cid, cv) =>
      struct(round(aggregate(
          zip_with(toDoubleVec(col(vecCol)), typedLit(cv.toSeq),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), distScale).as("d2"),
        lit(cid).as("cid"))
    }
    df.withColumn("__m", array_min(array(cents: _*)))
      .withColumn("cluster", col("__m.cid"))
      .withColumn("d2_r", col("__m.d2"))
      .drop("__m")
  }
}
