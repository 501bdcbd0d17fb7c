package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift reports between two corpus snapshots — the
  * monitoring layer a continuously-refreshed training corpus needs: "did
  * this week's crawl shift the length/quality/score distribution per
  * language?" is a question about two SKETCH tables, never about raw
  * rows.
  *
  * Metric: Population Stability Index over a shared fixed histogram
  * grid, PSI = Σ_buckets (p_a − p_b)·ln(p_a / p_b) with add-one (Laplace)
  * smoothing so empty buckets stay finite. PSI is symmetric in direction
  * of drift, zero iff the smoothed distributions agree, and the industry
  * rule-of-thumb thresholds (0.1 watch / 0.25 act) travel with it.
  *
  * Determinism contract (the gate's): per-bucket smoothed proportions
  * are single IEEE divisions of exact integers, and each bucket's term
  * rounds to 1e-6 units through the house `floor(x·1e6 + 0.5)`
  * convention before the BIGINT sum — the same ln-micro discipline the
  * LM tier gates (Quality.unigramLogprob), so DuckDB replays `psi_micro`
  * bit for bit.
  *
  * Scale shape: each snapshot collapses to a |groups|-row histogram
  * sketch in one partial-aggregated pass ([[Sketches.histogramSketch]]);
  * the PSI itself is a zip_with over two nBuckets arrays on joined
  * sketch rows — sketch-sized compute, corpus-sized never.
  */
object Drift {

  /** PSI per group between snapshots `a` and `b` over the FIXED `grid`
    * (both histograms must share it — bucket indices are positional).
    * Groups present in only one snapshot are reported with an all-empty
    * histogram on the missing side (full-outer semantics): appearing or
    * vanishing wholesale is the loudest drift there is, and smoothing
    * keeps the terms finite.
    *
    * Output: (group, n_a, n_b, psi_micro) — psi_micro = PSI in 1e-6
    * units as BIGINT, one row per group in either snapshot.
    */
  def psiReport(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, grid: Sketches.Grid): DataFrame =
    psiFromHistograms(
      Sketches.histogramSketch(a, groupCol, valueCol,
        grid.lo.toDouble, grid.hi.toDouble, grid.nBuckets),
      Sketches.histogramSketch(b, groupCol, valueCol,
        grid.lo.toDouble, grid.hi.toDouble, grid.nBuckets),
      groupCol, grid.nBuckets)

  /** PSI from two PREBUILT histogram-sketch tables (the
    * [[Sketches.histogramSketch]] / [[Sketches.maintainHistograms]]
    * layout: (group, n, counts)) sharing the same grid — this is the
    * form a live drift monitor calls: this week's MAINTAINED store vs a
    * frozen reference store, no corpus rescans at report time. Both
    * sides must share the bucketization; indices are positional.
    */
  def psiFromHistograms(ha0: DataFrame, hb0: DataFrame, groupCol: String,
      nB: Int): DataFrame =
    psiFromHistogramsBy(ha0, hb0, Seq(groupCol), nB)

  /** [[psiFromHistograms]] with a COMPOSITE group key (the
    * [[Sketches.histogramSketchBy]] layout). */
  def psiFromHistogramsBy(ha0: DataFrame, hb0: DataFrame,
      groupCols: Seq[String], nB: Int): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val keys = groupCols.map(col)
    // explicit aliases: both sides can share lineage (drift of a frame
    // against itself, or two filters of one parquet read), which makes
    // unqualified refs ambiguous under DetectAmbiguousSelfJoin
    val ha = ha0.select(keys :+ col("n").as("n_a") :+
      col("counts").as("ca"): _*).alias("__ha")
    val hb = hb0.select(keys :+ col("n").as("n_b") :+
      col("counts").as("cb"): _*).alias("__hb")
    val empty = array_repeat(lit(0L), nB)
    // NULL-SAFE key equality (<=>): histogramSketch keeps a null-group
    // sketch row, and plain full-outer equality would split it into two
    // spurious "appeared"/"vanished" rows — a false maximal-drift alarm
    // for a group whose distribution may be identical across snapshots
    val cond = groupCols
      .map(c => col(s"__ha.$c") <=> col(s"__hb.$c")).reduce(_ && _)
    val joined = ha.join(hb, cond, "full_outer")
      .select(groupCols.map(c =>
        coalesce(col(s"__ha.$c"), col(s"__hb.$c")).as(c)) ++
        Seq(col("n_a"), col("n_b"), col("ca"), col("cb")): _*)
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("ca", coalesce(col("ca"), empty))
      .withColumn("cb", coalesce(col("cb"), empty))
    // smoothed proportions: p = (cnt + 1) / (n + nBuckets) — exact
    // integer numerator/denominator, one correctly-rounded division per
    // side, so both engines see identical doubles entering ln
    def p(cnt: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (cnt + lit(1L)).cast("double") / (n + lit(nB.toLong)).cast("double")
    joined
      .withColumn("psi_micro",
        aggregate(
          zip_with(col("ca"), col("cb"), (x, y) => {
            val pa = p(x, col("n_a"))
            val pb = p(y, col("n_b"))
            floor((pa - pb) * log(pa / pb) * lit(1e6) + lit(0.5))
              .cast("long")
          }),
          lit(0L), (acc, t) => acc + t))
      .select(keys :+ col("n_a") :+ col("n_b") :+ col("psi_micro"): _*)
  }

  /** Per-DIMENSION vector drift: each embedding coordinate becomes a
    * marginal distribution in exact micro units (float→double cast ·
    * 1e6, floor — no sums, so no order sensitivity), and every
    * (group, dim) pair gets its own PSI between the two snapshots. The
    * actionable embedding-drift report — "the encoder moved dims 3 and
    * 17 for language X" — in |groups|·dims sketch rows: one zero-shuffle
    * posexplode pass per snapshot, then the histogram aggregates.
    * All dims share `grid` (marginals of a normalized embedding live in
    * the same numeric range). The grid is in MICRO units — values are
    * scaled by 1e6 before sketching — so size it to cover
    * ±max|coordinate|·1e6 (a raw-unit grid would clamp everything into
    * the edge buckets and silently read zero drift).
    */
  def psiByDimension(a: DataFrame, b: DataFrame, groupCol: String,
      vecCol: String, grid: Sketches.Grid): DataFrame = {
    def marginals(df: DataFrame): DataFrame =
      df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
        .withColumn("dim", col("dim").cast("long"))
        .withColumn("v_micro",
          floor(col("__x").cast("double") * 1e6 + 0.5).cast("long"))
    val nB = grid.nBuckets
    psiFromHistogramsBy(
      Sketches.histogramSketchBy(marginals(a), Seq(groupCol, "dim"),
        "v_micro", grid.lo.toDouble, grid.hi.toDouble, nB),
      Sketches.histogramSketchBy(marginals(b), Seq(groupCol, "dim"),
        "v_micro", grid.lo.toDouble, grid.hi.toDouble, nB),
      Seq(groupCol, "dim"), nB)
  }

  /** Corpus-diversity report over one categorical dimension: group
    * counts → Shannon entropy in the house ln-micro convention plus the
    * top group's share — the "is the corpus collapsing onto one
    * source/language?" dashboard numbers. Per-group terms
    * `floor(−p·ln(p)·1e6 + 0.5)` sum as exact BIGINTs (p is one
    * correctly-rounded division of exact integers, the lpu discipline),
    * so any engine replays `entropy_micro` bit for bit. Uniform over G
    * groups reads ln(G)·1e6; a single group reads 0.
    *
    * Scale shape: one partial-aggregated count per group, then
    * |groups|-row arithmetic under a 1-row totals broadcast.
    * Output: (dim, n_groups, n_rows, entropy_micro, top_share_micro).
    */
  def diversityReport(df: DataFrame, dimCol: String): DataFrame =
    diversityReportMulti(df, Seq(dimCol))

  /** [[diversityReport]] for SEVERAL dimensions in ONE corpus pass
    * (the blendByRankBySketch both-signals-one-pass discipline): each
    * row explodes to one (dim, value) pair per requested dimension,
    * one partial-aggregated count shuffle covers them all, and
    * everything after is |dims|·|groups|-row arithmetic. Output: one
    * row per dimension.
    */
  def diversityReportMulti(df: DataFrame, dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "at least one dimension required")
    val pairs = df.select(explode(array(dimCols.map(d =>
        struct(lit(d).as("dim"), col(d).cast("string").as("g"))): _*))
        .as("p"))
      .select(col("p.dim").as("dim"), col("p.g").as("g"))
      .filter(col("g").isNotNull)
    val counts = pairs.groupBy(col("dim"), col("g"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("dim"))
      .agg(sum(col("n")).as("total"))
    val p = col("n").cast("double") / col("total").cast("double")
    counts
      .join(broadcast(totals), Seq("dim"))
      .withColumn("term",
        floor(-p * log(p) * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("n")).as("n_rows"),
        sum(col("term")).as("entropy_micro"),
        max(col("n")).as("__top"),
        first(col("total")).as("__t"))
      .withColumn("top_share_micro",
        Num.longFloorDiv(col("__top") * 1000000L, col("__t")))
      .select(col("dim"), col("n_groups"), col("n_rows"),
        col("entropy_micro"), col("top_share_micro"))
  }

  /** [[psiReport]] with the shared grid discovered over BOTH snapshots'
    * values (one min/max pass on the unioned value column) — the grid is
    * returned because it is positional metadata every re-report against
    * either snapshot must reuse.
    */
  def psiReportAuto(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, nBuckets: Int): (DataFrame, Sketches.Grid) = {
    val values = a.select(col(valueCol)).unionByName(b.select(col(valueCol)))
    val g = Sketches.discoverGrid(values, valueCol, nBuckets)
    (psiReport(a, b, groupCol, valueCol, g), g)
  }
}
