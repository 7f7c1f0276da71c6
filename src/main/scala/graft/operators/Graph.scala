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
   * @return (node, rank) — rank in units of 10^-12
   */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 5): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    // graph cardinality only — a scalar, never row data
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val base = (Scale * 3L / 20L) / n
    var ranks = nodes.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      val inflow = e
        .join(ranks.select(col("node").as("src"), col("r")), Seq("src"))
        .join(outdeg, Seq("src"))
        // `div` (integral divide), not `/`: the double round-trip can
        // round a near-integer quotient the wrong way
        .select(col("dst").as("node"), expr("(r * 17) div (deg * 20)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      ranks = nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank"))
  }
}
