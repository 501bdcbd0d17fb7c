package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the learned
  * counterpart of [[Similarity.randomProject]]'s data-oblivious JL
  * compression: fit once on (a sample of) the corpus, then project
  * every vector onto the top-k variance axes (optionally whitened).
  * Standard front door for the semantic tiers — IVF/PQ and
  * embedding-cosine dedup all get cheaper and often better-conditioned
  * in a compressed, decorrelated space.
  *
  * Scale shape (the MLlib Gramian pattern): fitting reduces the corpus
  * to ONE dense buffer of d·(d+3)/2 + 1 doubles (count, per-dim sums,
  * upper-triangular co-moment sums) via `treeAggregate` — map-side
  * full reduction, tree-depth combine, nothing row-shaped ever moves
  * to the driver; the d×d eigensolve is a driver-side Jacobi on a
  * matrix whose size is set by the embedding dim, not the corpus.
  * Projection is a map-only pass with the k axes broadcast as
  * literals (codegen'd zip_with/aggregate dot products) — no shuffle
  * anywhere in fit or transform.
  *
  * Determinism: double accumulation order varies with partitioning, so
  * fitted axes are stable only to float tolerance (specs compare to a
  * single-node reference at 1e-8); eigenvector sign is pinned by
  * making each axis's largest-|component| positive. The float
  * eigensolve is not SQL-oracle material by nature — PcaSpec is its
  * semantics gate — but the corpus-scale half IS: [[gramianMicro]]
  * emits the quantized moment sums as exact integers for the DuckDB
  * driver gate (q123), and PcaSpec ties the two together by deriving
  * the model from the gate's output.
  */
object Pca {

  /** Fitted model: per-dim mean, top-k axes (rows, descending
    * eigenvalue), and the population eigenvalues (variance per axis).
    */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double])

  /** Fit a k-component PCA on `vecCol` (Array[Float|Double], fixed
    * dim `dim`). One distributed pass; population covariance (1/n).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(dim > 0, s"dim must be positive: $dim")
    require(k > 0 && k <= dim, s"k must be in [1, $dim]: $k")
    val nTri = dim * (dim + 1) / 2
    // acc layout: [0] count, [1..dim] sums, [dim+1 ..] upper-tri co-moments
    // drop null vectors, vectors carrying null elements (a boxed null
    // would surface as an opaque NPE inside the seqOp), and vectors
    // carrying non-finite elements — a single NaN/Inf would otherwise
    // propagate through the co-moment sums into an all-NaN model
    val acc = df.select(col(vecCol).cast("array<double>").as("v"))
      .na.drop(Seq("v"))
      .filter(forall(col("v"),
        x => x.isNotNull && !isnan(x) && abs(x) < lit(Double.PositiveInfinity)))
      .rdd.map(_.getSeq[Double](0))
      .treeAggregate(new Array[Double](1 + dim + nTri))(
        seqOp = (a, v) => {
          require(v.length == dim,
            s"vector length ${v.length} != declared dim $dim")
          a(0) += 1.0
          var i = 0
          var t = 1 + dim
          while (i < dim) {
            val xi = v(i)
            a(1 + i) += xi
            var j = i
            while (j < dim) { a(t) += xi * v(j); t += 1; j += 1 }
            i += 1
          }
          a
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    val n = acc(0)
    require(n > 1, s"need at least 2 vectors to fit PCA, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = acc(t) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      t += 1
    }
    val (evals, evecs) = symEigen(cov)
    // descending eigenvalue; sign pinned to largest-|component| positive
    val order = evals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    val comps = order.take(k).map { c =>
      val axis = Array.tabulate(dim)(r => evecs(r)(c))
      val piv = axis.indices.maxBy(i => math.abs(axis(i)))
      if (axis(piv) < 0) axis.map(-_) else axis
    }
    PcaModel(mean, comps, order.take(k).map(evals))
  }

  /** Project `vecCol` onto the model's axes: adds `pc1..pck` double
    * columns (whitened = divided by sqrt(eigenvalue) when `whiten`).
    * Map-only; axes enter the plan as broadcast literals.
    */
  def transform(df: DataFrame, vecCol: String, model: PcaModel,
      whiten: Boolean = false): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit,
      (x, m) => x - m)
    model.components.zipWithIndex.foldLeft(df) { case (d, (axis, i)) =>
      val proj = aggregate(
        zip_with(centered, typedLit(axis.toSeq), (x, w) => x * w),
        lit(0.0), (s, x) => s + x)
      val scaled: Column =
        if (whiten) proj / math.sqrt(math.max(model.eigenvalues(i), 1e-12))
        else proj
      d.withColumn(s"pc${i + 1}", scaled)
    }
  }

  /** Oracle-replayable gate for [[fit]]'s corpus-scale half: the
    * micro-unit-quantized moment sums. Each element is quantized to
    * `floor(x·1e6 + 0.5)` (exact BIGINT — the q95 micro-unit
    * discipline), so every sum is order-free integer arithmetic that a
    * SQL engine replays bit-identically; the float eigensolve stays
    * spec-gated ([[fit]] / PcaSpec). Output rows, one per moment:
    * `(i, j, s)` with `j >= i >= 0` the upper-tri co-moment sums
    * Σ mᵢ·mⱼ, `(i, -1)` the first-moment sums Σ mᵢ, and `(-1, -1)`
    * the row count.
    *
    * Scale shape: the corpus is touched once by a treeAggregate into a
    * d·(d+3)/2+1-long exact-integer moment vector ([[fit]]'s own
    * reduction shape — integer sums are order-free, so the result is
    * engine-exact no matter how partitions combine); only the
    * model-sized vector ever moves or reaches the driver. The earlier
    * relational form (explode 2145 structs/row into a hash aggregate)
    * produced the identical frame but materialized |corpus|·2145
    * exploded rows — 13× slower at sf0.1, worse with scale.
    */
  def gramianMicro(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val spark = df.sparkSession
    import spark.implicits._
    val nTri = dim * (dim + 1) / 2
    val total = nTri + dim + 1
    val micro = df
      .select(org.apache.spark.sql.functions.transform(
        col(vecCol).cast("array<double>"),
        x => floor(x * lit(1000000.0d) + lit(0.5d)).cast("long")).as("m"))
      .as[Seq[Long]]
    val acc = micro.rdd.treeAggregate(new Array[Long](total))(
      seqOp = { (a, mseq) =>
        if (mseq != null && mseq.length == dim) {
          val m = mseq.toArray
          var k = 0
          var i = 0
          while (i < dim) {
            var j = i
            while (j < dim) { a(k) += m(i) * m(j); k += 1; j += 1 }
            a(nTri + i) += m(i)
            i += 1
          }
          a(total - 1) += 1L
        }
        a
      },
      combOp = { (a, b) =>
        var k = 0
        while (k < total) { a(k) += b(k); k += 1 }
        a
      })
    val rows = Seq.newBuilder[(Long, Long, Long)]
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      rows += ((i.toLong, j.toLong, acc(k))); k += 1
    }
    for (i <- 0 until dim) rows += ((i.toLong, -1L, acc(nTri + i)))
    rows += ((-1L, -1L, acc(total - 1)))
    rows.result().toDF("i", "j", "s")
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-columns). O(d^3) per sweep — fine
    * for embedding dims (d ≤ a few thousand); d is model-sized, never
    * corpus-sized.
    */
  private[operators] def symEigen(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag: Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += m(i)(j) * m(i)(j)
      s
    }
    val scale = math.max(1e-300, m.map(_.map(math.abs).max).max)
    var sweep = 0
    while (sweep < 100 && offDiag > 1e-24 * scale * scale) {
      for (p <- 0 until d; q <- p + 1 until d if m(p)(q) != 0.0) {
        val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
        val tt =
          if (theta == 0.0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(tt * tt + 1.0)
        val s = tt * c
        val mpp = m(p)(p); val mqq = m(q)(q); val mpq = m(p)(q)
        m(p)(p) = c * c * mpp - 2.0 * s * c * mpq + s * s * mqq
        m(q)(q) = s * s * mpp + 2.0 * s * c * mpq + c * c * mqq
        m(p)(q) = 0.0; m(q)(p) = 0.0
        for (kk <- 0 until d if kk != p && kk != q) {
          val mpk = m(p)(kk); val mqk = m(q)(kk)
          m(p)(kk) = c * mpk - s * mqk; m(kk)(p) = m(p)(kk)
          m(q)(kk) = s * mpk + c * mqk; m(kk)(q) = m(q)(kk)
        }
        for (kk <- 0 until d) {
          val vkp = v(kk)(p); val vkq = v(kk)(q)
          v(kk)(p) = c * vkp - s * vkq
          v(kk)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }
}
