package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation. Web-scale training
  * pipelines propagate quality/importance over the host link graph
  * (domain-level PageRank is a stock crawl-prioritization and
  * quality-weighting signal); this is that operator, distributed and
  * engine-reproducible.
  *
  * Arithmetic is exact-integer ("micro-unit" discipline, cf.
  * [[Quality]]'s logprob units): ranks live on a fixed integer scale,
  * per-edge contributions use floor division, and the damping step is
  * `(d_pct * sum) div 100` — no float anywhere, so any engine replays
  * bit-identically and summation order can't matter.
  *
  * Scale shape: each iteration is one hash join of the rank table with
  * the edge list plus one aggregation keyed by destination — the same
  * contracted-loop discipline as [[Clusters]] (driver loop, bounded
  * rounds, lineage cut per round, nothing corpus-sized ever collected;
  * the only driver scalar is the node count). Dangling-node mass is
  * dropped (the standard simplification), so ranks are comparable
  * within a run, not a strict probability distribution.
  */
object Graphs {

  /** PageRank over a directed edge list (`src`, `dst`), `iters` fixed
    * iterations: returns (id, rank) for every node, rank on the
    * `scale` integer scale. Duplicate edges count once (deduped here).
    */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampPct > 0 && dampPct < 100, s"dampPct in (0,100): $dampPct")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val n = nodes.count() // the one driver scalar (planning metadata)
    require(n > 0, "empty graph")
    val baseTerm = (scale * (100 - dampPct) / 100) / n
    var rank = nodes.withColumn("rank", lit(scale / n))
    var i = 0
    while (i < iters) {
      val contribs = rank
        .join(outdeg, Seq("id"))
        .join(e, rank("id") === e("src"))
        .select(col("dst").as("id"), expr("rank div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      val old = rank
      rank = nodes.join(contribs, Seq("id"), "left")
        .withColumn("rank",
          lit(baseTerm) + expr(s"($dampPct * coalesce(s, 0L)) div 100"))
        .select(col("id"), col("rank"))
        .localCheckpoint(true)
      old.unpersist()
      i += 1
    }
    rank
  }
}
