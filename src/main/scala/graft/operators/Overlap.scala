package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-overlap analytics: pairwise n-gram Jaccard between GROUPS of
  * documents (sources, snapshots, shards) — the "how much of source A
  * also lives in source B" report that drives mixing weights and
  * crawl-dedup priorities (cf. overlap matrices in public corpus reports
  * like RefinedWeb/Dolma).
  *
  * Two tiers:
  *  - [[overlapExact]]: exact distinct-shingle sets per group, pairwise
  *    intersections via a shingle equi-join. Shuffles are all uniform
  *    (hash of (group, shingle) / shingle); per-shingle join fan-out is
  *    bounded by the number of groups G (a shingle present in every
  *    group makes C(G,2) pairs), and G is small by definition for
  *    source-level analytics. The right tier up to ~dozens of groups.
  *  - [[overlapMinhash]]: per-group minhash signature built as an
  *    element-wise min over per-DOC signatures — associative and
  *    mergeable, so partial aggregation reduces the shuffle to G·k rows
  *    regardless of corpus size, and the corpus is touched in ONE
  *    map-side pass (no shingle table at all). The 100 TB tier; the
  *    estimate's stderr is ~sqrt(j(1-j)/k).
  */
object Overlap {

  /** Distinct (group, shingle) pairs — typed single-pass shingling (the
    * interpreted HOF form is ~50x slower, see MinhashImpl scaladoc).
    */
  private def groupShingles(df: DataFrame, groupCol: String,
      textCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (g, t) =>
        graft.functions.MinhashImpl.shingles(t, n).iterator.map(s => (g, s)) }
      .toDF(groupCol, "shingle")
      .distinct()
  }

  /** Exact pairwise overlap: (src_a, src_b, inter, union_sz, jaccard_r)
    * for every unordered group pair with a non-empty intersection,
    * src_a < src_b. `jaccard_r` is rounded at `roundScale` (exact BIGINT
    * inter/union feed one deterministic double division).
    */
  def overlapExact(df: DataFrame, groupCol: String, textCol: String,
      n: Int, roundScale: Int = 6): DataFrame = {
    val gs = groupShingles(df, groupCol, textCol, n)
    val sz = gs.groupBy(col(groupCol)).agg(count(lit(1)).as("sz"))
    val inter = gs.as("a")
      .join(gs.as("b"), col(s"a.shingle") === col(s"b.shingle") &&
        col(s"a.$groupCol") < col(s"b.$groupCol"))
      .groupBy(col(s"a.$groupCol").as("src_a"), col(s"b.$groupCol").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col(groupCol).as("src_a"), col("sz").as("sza")), "src_a")
      .join(sz.select(col(groupCol).as("src_b"), col("sz").as("szb")), "src_b")
      .select(col("src_a"), col("src_b"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("union_sz"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"),
          roundScale).as("jaccard_r"))
  }

  /** Minhash estimate of the same matrix: (src_a, src_b, jaccard_est).
    * Per-doc signatures (xxhash64 one-hash family) reduce element-wise
    * per group; the group signature of a union of docs IS the
    * element-wise min of their signatures, so the estimate converges on
    * the true group-level Jaccard with k. Emits ALL pairs (including
    * overlap 0 — a sketch cannot distinguish empty from tiny).
    */
  def overlapMinhash(df: DataFrame, groupCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val comps = df.select(col(groupCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (g, t) =>
        val sh = graft.functions.MinhashImpl.shingles(t, n)
        if (sh.isEmpty) Iterator.empty
        else {
          val sig = graft.functions.XxMinhashImpl.signature(sh, k)
          sig.iterator.zipWithIndex.map { case (c, i) => (g, i, c) }
        }
      }
      .toDF(groupCol, "i", "comp")
      .groupBy(col(groupCol), col("i")).agg(min(col("comp")).as("comp"))
    comps.as("a")
      .join(comps.as("b"), col("a.i") === col("b.i") &&
        col(s"a.$groupCol") < col(s"b.$groupCol"))
      .groupBy(col(s"a.$groupCol").as("src_a"), col(s"b.$groupCol").as("src_b"))
      .agg((sum(when(col("a.comp") === col("b.comp"), 1L).otherwise(0L))
        .cast("double") / k).as("jaccard_est"))
  }
}
