package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature logistic-regression quality classifier — the
  * fasttext/CCNet-style "does this page look like reference text" filter
  * of a web-curation pipeline, re-expressed for Spark:
  *
  *  - Features are hashed bag-of-words: token → md5-prefix bucket (the
  *    house cross-engine hash discipline, same as q129's host ids), so
  *    the feature space is a fixed `buckets`-sized vector regardless of
  *    vocabulary — no vocabulary dictionary is ever built or shipped.
  *  - Training is full-batch gradient descent. Per iteration: a map-only
  *    pass scores every document against the broadcast weight vector
  *    (a literal array — `buckets` doubles), and ONE bucket-keyed
  *    aggregation (map-side partial) produces the gradient, which is
  *    `buckets`-bounded — the only rows that ever reach the driver.
  *    The corpus is never collected, cached, or re-keyed by document.
  *  - Scoring is a pure map pass (aggregate over the token array).
  *
  * At 100 TB: per iteration = one corpus scan + one exchange whose input
  * is partial-aggregated to ≤ buckets rows per task — the same bounded
  * shape as PageRank's per-iteration join+agg. Weights (~8·buckets bytes)
  * broadcast as plan literals.
  *
  * Determinism: the float GD loop is spec-gated ([[ClassifierSpec]]) —
  * IEEE sums over a shuffled corpus are order-dependent by nature. The
  * corpus-scale half IS oracle-gated: at w = 0 every p is exactly 0.5,
  * so twice the gradient, `2·∂L/∂w_b = Σ_docs (1−2y)·count_b(doc)`, is an
  * exact integer per bucket — q133 replays it in DuckDB (the PCA-gramian
  * discipline: gate the aggregation, spec the numerics).
  */
object Classifier {

  /** Stable cross-engine feature bucket: first 15 md5 hex digits (60 bit)
    * mod `buckets`. DuckDB replay:
    * `CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % buckets`.
    */
  def tokenBucket(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))

  private def tokenArr(text: Column): Column = split(trim(text), "\\s+")

  /** Per-occurrence feature buckets for a document's text — map-only. */
  def bucketArr(text: Column, buckets: Int): Column =
    transform(tokenArr(text), t => tokenBucket(t, buckets))

  /** Twice the logistic-loss gradient at w = 0 per feature bucket:
    * grad2(b) = Σ_docs (1 − 2·y) · count_b(doc) — exact BIGINT (at the
    * zero vector p = ½ exactly, so (p − y) = ±½). Also emits the bucket's
    * total occurrence count. One bucket-keyed aggregation.
    */
  def gradientAtZero(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int): DataFrame =
    df.select(
        when(col(labelCol), lit(-1L)).otherwise(lit(1L)).as("s"),
        explode(bucketArr(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("s")).cast("long").as("grad2"),
        count(lit(1)).as("n_terms"))

  /** Trained model: `weights(b)` per bucket + intercept. */
  final case class LogRegModel(weights: Array[Double], bias: Double) {
    def buckets: Int = weights.length
  }

  /** Full-batch logistic regression on hashed bag-of-words counts.
    * `labelCol` must be boolean. Gradients are length-normalized per
    * document (each occurrence contributes 1/n_tokens) so long pages
    * don't dominate — the fasttext mean-of-embeddings convention.
    */
  def fit(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int, iters: Int = 20, lr: Double = 0.5): LogRegModel = {
    var w = Array.fill(buckets)(0.0)
    var b = 0.0
    // (bucket occurrences, 1/len weight, y) — computed once, map-only shape
    val base = df.select(
      bucketArr(col(textCol), buckets).as("bk"),
      col(labelCol).cast("int").cast("double").as("y"))
      .withColumn("inv", when(size(col("bk")) > 0,
        lit(1.0) / size(col("bk"))).otherwise(lit(0.0)))
    val n = math.max(1L, base.count()).toDouble
    for (_ <- 0 until iters) {
      val wLit = array(w.map(lit): _*)
      val margin = aggregate(col("bk"), lit(0.0),
        (acc, bkt) => acc + element_at(wLit, (bkt + 1L).cast("int")))
        .*(col("inv")) + b
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      // per-feature coefficient (p−y)/len plus a bias pseudo-bucket −1
      // carrying (p−y): ONE bucket-keyed job per iteration, ≤ buckets+1
      // rows reach the driver
      val grads = base
        .withColumn("c", (p - col("y")) * col("inv"))
        .withColumn("pb", p - col("y"))
        .select(explode(concat(
          transform(col("bk"),
            bkt => struct(bkt.as("bucket"), col("c").as("v"))),
          array(struct(lit(-1L).as("bucket"), col("pb").as("v"))))).as("e"))
        .groupBy(col("e.bucket")).agg(sum(col("e.v")).as("g"))
        .collect()
      val w2 = w.clone()
      grads.foreach { r =>
        val bkt = r.getLong(0).toInt
        if (bkt < 0) b = b - lr * r.getDouble(1) / n
        else w2(bkt) = w2(bkt) - lr * r.getDouble(1) / n
      }
      w = w2
    }
    LogRegModel(w, b)
  }

  /** Map-only scoring: idCol, `score` = σ(mean-normalized w·x + b). */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: LogRegModel): DataFrame = {
    val wLit = array(model.weights.map(lit): _*)
    val bk = bucketArr(col(textCol), model.buckets)
    val inv = when(size(bk) > 0, lit(1.0) / size(bk)).otherwise(lit(0.0))
    val margin = aggregate(bk, lit(0.0),
      (acc, bkt) => acc + element_at(wLit, bkt.cast("int") + 1)) * inv + model.bias
    df.select(col(idCol),
      (lit(1.0) / (lit(1.0) + exp(-margin))).as("score"))
  }

  /** Map-only EXACT-integer scoring against a FIXED micro-unit weight
    * vector riding as a plan literal: `score_micro = Σ_occurrences
    * w_micro(bucket)` — an exact BIGINT per document, so the scoring
    * half of the classifier is engine-replayable (the q136 λ-scoring
    * discipline; q143 gates it). This is the production path once a
    * model is FROZEN: quantize the trained weights once
    * (`w_micro = floor(w·1e6 + 0.5)`) and every subsequent corpus pass
    * is deterministic integer arithmetic — [[fit]]'s float loop stays
    * spec-gated ([[ClassifierSpec]]), exactly like the PCA eigensolve
    * atop the gated gramian. Output: (idCol, n_toks, score_micro);
    * length-normalize downstream as score_micro / n_toks if the
    * fasttext mean convention is wanted (kept separate so the gated
    * column stays a pure integer sum).
    */
  def scoreMicro(df: DataFrame, idCol: String, textCol: String,
      weightsMicro: Array[Long]): DataFrame = {
    val wLit = typedLit(weightsMicro.toSeq)
    val bk = bucketArr(col(textCol), weightsMicro.length)
    // the hashed array is referenced exactly once (inside the aggregate);
    // n_toks re-splits without hashing — the scoreWith CollapseProject
    // lesson
    df.select(col(idCol),
      size(tokenArr(col(textCol))).cast("long").as("n_toks"),
      aggregate(bk, lit(0L),
        (acc, b) => acc + element_at(wLit, b.cast("int") + 1))
        .as("score_micro"))
  }

  /** Threshold filter over [[score]] — keep documents the model rates
    * at or above `minScore`. Map-only.
    */
  def filterByModel(df: DataFrame, idCol: String, textCol: String,
      model: LogRegModel, minScore: Double): DataFrame = {
    val wLit = array(model.weights.map(lit): _*)
    val bk = bucketArr(col(textCol), model.buckets)
    val inv = when(size(bk) > 0, lit(1.0) / size(bk)).otherwise(lit(0.0))
    val margin = aggregate(bk, lit(0.0),
      (acc, bkt) => acc + element_at(wLit, bkt.cast("int") + 1)) * inv + model.bias
    df.filter(lit(1.0) / (lit(1.0) + exp(-margin)) >= minScore)
  }
}
