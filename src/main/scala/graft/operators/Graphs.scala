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
    *
    * The rank and node tables are |V|-sized and are NEVER broadcast
    * (shuffle_hash hints — the [[Clusters]] rule: checkpoint statistics
    * make small-SF Spark pick a broadcast plan that is a category error
    * at graph scale). Out-degree is denormalized onto the edge artifact
    * once, so each iteration is exactly one rank-edge join plus one
    * destination-keyed aggregate; lineage is cut every
    * `checkpointEvery` rounds (bounded chains don't pay a
    * materialization per round, long loops can't grow unbounded DAGs).
    */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampPct: Int = 85,
      checkpointEvery: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampPct > 0 && dampPct < 100, s"dampPct in (0,100): $dampPct")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1: $checkpointEvery")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
    // one edge artifact with out-degree attached (the posting-norm trick)
    val ew = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .hint("shuffle_hash"), Seq("src"))
      .localCheckpoint(true)
    val nodes = ew.select(col("src").as("id"))
      .union(ew.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count() // the one driver scalar (planning metadata)
    require(n > 0, "empty graph")
    val baseTerm = (scale * (100 - dampPct) / 100) / n
    var rank = nodes.withColumn("rank", lit(scale / n))
    var lastCp: DataFrame = null
    var i = 0
    while (i < iters) {
      val contribs = rank.withColumnRenamed("id", "src")
        .join(ew.hint("shuffle_hash"), Seq("src"))
        .select(col("dst").as("id"), expr("rank div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      rank = nodes.join(contribs.hint("shuffle_hash"), Seq("id"), "left")
        .withColumn("rank",
          lit(baseTerm) + expr(s"($dampPct * coalesce(s, 0L)) div 100"))
        .select(col("id"), col("rank"))
      if (i % checkpointEvery == checkpointEvery - 1 && i != iters - 1) {
        rank = rank.localCheckpoint(true)
        if (lastCp != null) lastCp.unpersist()
        lastCp = rank
      }
      i += 1
    }
    rank
  }
}
