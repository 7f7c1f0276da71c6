package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph operators over edge DataFrames. Complements
 * [[Dedup.connectedComponents]] (cluster resolution) with authority
 * scoring — the web-corpus curation signal (host/page rank feeds
 * quality weighting in CommonCrawl-scale pipelines).
 */
object Graph {

  /** Fixed-point scale: ranks are BIGINT multiples of 10^-12. */
  val Scale: Long = 1000000000000L

  /**
   * PageRank with damping 0.85 for a FIXED number of iterations, in
   * pure integer (fixed-point) arithmetic:
   *
   *   r_0(v)    = Scale div n
   *   r_t+1(v)  = (0.15·Scale div n) + Σ_{u→v} (17·r_t(u)) div (20·outdeg(u))
   *
   * Every step is integer multiply/divide/sum — no floating point, so
   * the result is bit-identical on any engine and independent of
   * aggregation order (the property that lets an external SQL oracle
   * recompute it exactly; float PageRank can never hash-match across
   * engines). Dangling mass simply decays, the standard simplification.
   *
   * Scale shape: each iteration is one equi-join of the edge list with
   * the current ranks plus a partial-aggregated sum keyed on the
   * destination — the same shuffle pattern as one round of
   * [[Dedup.connectedComponents]]. Edges and degrees are consumed every
   * round → persisted (released by the per-query sweep, the
   * [[Dedup.lshCandidates]] contract). The iteration count is fixed and
   * small, so rounds chain lazily into one job — at true 100 TB scale
   * you would checkpoint each round exactly like the component loop.
   *
   * @param edges directed edge DataFrame (`srcCol`, `dstCol`); dedup'd
   *              internally. For an undirected walk, union both
   *              directions before calling.
   * @param symmetric set true when the edge list is symmetric (u→v ⇒
   *                  v→u, the undirected-walk encoding): then every
   *                  node has in-edges, so the per-round dangling-node
   *                  left join AND the separate node-set build are
   *                  skipped — the rank state domain is exactly the
   *                  out-degree table. Directed graphs must keep the
   *                  default (a node with out-edges but no in-edges
   *                  would otherwise vanish from the state).
   * @return (node, rank) — rank in units of 10^-12
   */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 5, symmetric: Boolean = false,
               assumeDistinct: Boolean = false): DataFrame = {
    val raw = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    // `assumeDistinct` skips the dedup shuffle when the caller already
    // guarantees a distinct edge list (e.g. built from a distinct pair
    // set) — on a multi-million-edge build that is the largest exchange
    // in the whole query
    val e = (if (assumeDistinct) raw else raw.distinct()).persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nodes =
      if (symmetric) outdeg.select(col("src").as("node"))
      else e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().persist()
    // graph cardinality only — a scalar, never row data
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val base = (Scale * 3L / 20L) / n
    var ranks = nodes.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      // per-NODE contributions first (node-sized), then spread onto the
      // static edge list with a broadcast join: the cached edges are
      // never shuffled — the only per-round exchange carries map-side-
      // combined partial sums keyed on dst. (At node counts past
      // broadcast size, drop the hint and pre-partition both edge list
      // and rank state on src once — same plan, co-partitioned.)
      // broadcast the node-sized degree table: the contrib build then
      // needs NO exchange at all (ranks scan → broadcast join → project),
      // leaving one exchange per round (the inflow partial-sum)
      val contrib = ranks
        .join(broadcast(outdeg.withColumnRenamed("src", "node")), Seq("node"))
        // `div` (integral divide), not `/`: the double round-trip can
        // round a near-integer quotient the wrong way
        .select(col("node").as("src"), expr("(r * 17) div (20 * deg)").as("c"))
      val inflow = e.join(broadcast(contrib), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("inflow"))
      // LAZY local checkpoint per round: the returned frame plans as a
      // flat LogicalRDD leaf, so round t+1 doesn't replan rounds 1..t
      // (the unchecked 5-round tree reaches ~200 nodes and AQE
      // recompilation dominates). Lazy, so the rounds still execute
      // inside the caller's single job; blocks are node-sized and
      // released by the per-query sweep.
      val next =
        if (symmetric)
          inflow.select(col("node"), (lit(base) + col("inflow")).as("r"))
        else nodes
          .join(inflow, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + coalesce(col("inflow"), lit(0L))).as("r"))
      ranks = next.localCheckpoint(false)
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  /**
   * Per-vertex triangle participation counts over an undirected graph,
   * via degree-ordered edge orientation (the standard distributed
   * formulation): each undirected edge is directed from its lower
   * (degree, id) endpoint to the higher, so every triangle is
   * enumerated exactly once and the wedge fan-out per vertex is
   * bounded by O(√(2m)) regardless of skew — a hub vertex never sits
   * at the center of a wedge, which is what makes naive neighborhood
   * joins quadratic on power-law graphs. Three equi-joins total
   * (orientation, wedge build, closure probe); no cartesian product,
   * nothing on the driver.
   *
   * The orientation key is a (degree, id) struct compared
   * lexicographically — valid for any 64-bit id space.
   *
   * @param edges undirected edge list (`srcCol`, `dstCol`); duplicates
   *              and self-loops are dropped internally.
   * @return (node, triangles) for every vertex on ≥1 triangle
   */
  def triangleCounts(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val ord = deg.select(col("node"),
      struct(col("d"), col("node").as("n")).as("ord"))
    // orient low→high by the (degree, id) total order; carry the dst
    // key so the wedge join below never re-joins the degree table
    val oriented = und
      .join(ord.select(col("node").as("u"), col("ord").as("uord")), Seq("u"))
      .join(ord.select(col("node").as("v"), col("ord").as("vord")), Seq("v"))
      .select(
        when(col("uord") < col("vord"), col("u")).otherwise(col("v")).as("a"),
        when(col("uord") < col("vord"), col("v")).otherwise(col("u")).as("b"),
        greatest(col("uord"), col("vord")).as("bord"))
      .persist()
    // wedges (a→b, a→c) with b ≺ c, closed by probing the oriented
    // edge set for b→c — each triangle appears exactly once as a≺b≺c
    val e1 = oriented.select(col("a"), col("b"), col("bord"))
    val e2 = oriented.select(col("a"), col("b").as("c"), col("bord").as("cord"))
    val wedges = e1.join(e2, Seq("a")).where(col("bord") < col("cord"))
      .select(col("a"), col("b"), col("c"))
    // persisted `oriented` is read 3× (two wedge sides + the probe) in
    // one job; the per-query sweep releases the blocks, the
    // [[Dedup.lshCandidates]] contract
    val tri = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
