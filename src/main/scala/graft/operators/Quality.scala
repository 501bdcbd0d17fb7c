package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality scoring: unigram language-model log-probability
  * per document — the cheap tier of the standard "perplexity filter"
  * (score each doc under a reference LM; drop the tails). The LM here is
  * the corpus's own unigram distribution; swapping in an external token
  * frequency table gives the CCNet-style filter unchanged.
  *
  * Determinism across engines: per-token logprobs are quantized to
  * integer MICRO-UNITS (`floor(ln(f/T)·1e6 + 0.5)`) at the vocabulary
  * level (one ln per DISTINCT token), and per-doc scores are integer
  * SUMS of those units — addition order cannot change the result, so
  * the score is bit-exact in any engine. The only float op is one ln
  * per vocab entry, where a 1-ulp divergence must land exactly on a
  * floor boundary to matter.
  *
  * Scale: tokenize-explode is map-side; the frequency table is
  * vocabulary-sized (shuffles by token — uniform hash keys); scoring
  * re-joins tokens to the vocab table (broadcast when the vocab is
  * small, shuffle otherwise) and reduces per doc — one uniform-key
  * shuffle each way at 100 TB.
  */
object Quality {

  /** (id, token) rows; whitespace tokenization, empty docs dropped. */
  private def tokenTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val tt = if (t == null) "" else t.trim
        if (tt.isEmpty) Iterator.empty
        else tt.split("\\s+").iterator.map(w => (id, w))
      }
      .toDF(idCol, "tok")
  }

  /** Per-document unigram score: (idCol, n_tokens, lp_micro, avg_lp).
    * `lp_micro` = Σ over tokens of ln p(w) in 1e-6 units (exact BIGINT);
    * `avg_lp` = lp_micro / n_tokens / 1e6 (deterministic double).
    * Empty docs are absent from the output (no tokens to score).
    */
  def unigramLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = tokenTable(df, idCol, textCol)
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val total = freq.agg(sum(col("f")).as("t"))
    val vocab = freq.crossJoin(broadcast(total))
      .withColumn("lpu",
        floor(log(col("f").cast("double") / col("t").cast("double")) * 1e6 + 0.5)
          .cast("long"))
      .select(col("tok"), col("lpu"))
    tok.join(vocab, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lpu")).as("lp_micro"))
      .withColumn("avg_lp",
        col("lp_micro").cast("double") / col("n_tokens").cast("double") / 1e6)
  }

  /** Keep documents whose `avg_lp` lies inside [lo, hi] — the standard
    * both-tails trim (gibberish scores low; degenerate repetition /
    * boilerplate scores suspiciously high). Cutoffs are caller-supplied
    * (at corpus scale: approx_percentile over a sample, or fixed SLOs);
    * docs with no tokens are dropped with the tails.
    */
  def filterByLogprobBand(df: DataFrame, idCol: String, textCol: String,
      lo: Double, hi: Double): DataFrame = {
    val keep = unigramLogprob(df, idCol, textCol)
      .filter(col("avg_lp") >= lo && col("avg_lp") <= hi)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
