package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Run, collect and RELEASE: every pageRank call persists edge/degree/
    * node frames plus per-round checkpoints — sweep them so the shared
    * test session doesn't accumulate stale blocks across suites (the
    * leak class SessionHygiene exists for). */
  private def collected(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
    try df.collect().map(r => (r.getLong(0), r.getLong(1)))
    finally graft.SessionHygiene.sweep(spark)

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    collected(Graph.pageRank(edges.toDF("src", "dst"), iters = iters)).toMap

  test("symmetric 2-cycle: both nodes keep the uniform rank") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)))
    assert(r(1L) == r(2L))
    // base + full inflow of the other node's rank: stays near Scale/2 each
    assert(math.abs(r(1L) - Graph.Scale / 2) < Graph.Scale / 100)
  }

  test("star graph: the hub outranks the spokes") {
    // undirected star around node 0 with 4 spokes
    val fwd = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
    val r = ranks(fwd)
    assert((1L to 4L).forall(i => r(0L) > r(i)), s"hub must dominate: $r")
    // spokes are symmetric → identical fixed-point ranks, exactly
    assert((2L to 4L).forall(i => r(i) == r(1L)))
  }

  test("rank mass is conserved up to floor-division loss") {
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val r = ranks(fwd)
    val total = r.values.sum
    // every floor division drops < 1 unit per edge per round
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale * 9 / 10, s"too much mass lost: $total")
  }

  test("symmetric fast path equals the general path on symmetric input") {
    val fwd = (1L to 50L).map(i => (i, i % 50 + 1))
    val sym = fwd ++ fwd.map { case (a, b) => (b, a) }
    val gen = collected(Graph.pageRank(sym.toDF("src", "dst"))).sorted
    val fast = collected(Graph.pageRank(sym.toDF("src", "dst"), symmetric = true)).sorted
    assert(gen.sameElements(fast))
  }

  test("deterministic across partitionings") {
    val e = (1L to 200L).map(i => (i, (i * 7) % 200 + 1))
    val a = collected(Graph.pageRank(e.toDF("src", "dst"))).sorted
    val b = collected(Graph.pageRank(e.toDF("src", "dst").repartition(13))).sorted
    assert(a.sameElements(b))
  }

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    collected(Graph.triangleCounts(edges.toDF("src", "dst"))).toMap

  /** Brute-force reference: count id-ordered closed triples. */
  private def naiveTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tri = for {
      (i, ai) <- nodes.zipWithIndex
      (j, aj) <- nodes.zipWithIndex.drop(ai + 1) if und((i, j))
      k <- nodes.drop(aj + 1) if und((j, k)) && und((i, k))
    } yield Seq(i, j, k)
    tri.flatten.groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
  }

  test("K4: four triangles, every vertex on three") {
    val vs = Seq(1L, 2L, 3L, 4L)
    val edges = for (a <- vs; b <- vs if a < b) yield (a, b)
    val t = triangles(edges)
    assert(t == vs.map(_ -> 3L).toMap)
  }

  test("star graph has no triangles (and no output rows)") {
    val edges = (1L to 30L).map(i => (0L, i))
    assert(triangles(edges).isEmpty)
  }

  test("self-loops, duplicates and reversed edges don't invent triangles") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(triangles(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches the brute-force reference on a pseudo-random graph") {
    // deterministic LCG edge set over 40 nodes, ~160 edges
    val edges = (0 until 200).map { i =>
      val a = (i * 2654435761L) % 40
      val b = (i * 40503L + 13) % 40
      (a, b)
    }.filter { case (a, b) => a != b }
    assert(triangles(edges) == naiveTriangles(edges))
  }

  test("triangle counts are correct for ids past 32 bits (struct orientation key)") {
    val b = 1L << 33
    val edges = Seq((b + 1, b + 2), (b + 2, b + 3), (b + 3, b + 1), (b + 3, b + 4))
    assert(triangles(edges) == Map(b + 1 -> 1L, b + 2 -> 1L, b + 3 -> 1L))
  }

  test("triangle counts are partitioning-invariant") {
    val edges = (0 until 300).map { i =>
      ((i * 48271L) % 60, (i * 16807L + 7) % 60)
    }.filter { case (a, b) => a != b }
    val a = triangles(edges)
    val b = collected(Graph.triangleCounts(
      edges.toDF("src", "dst").repartition(17))).toMap
    assert(a == b)
  }
}
