package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def packs(rows: Seq[(String, Long, Long)], budget: Long,
                    inputParts: Int = 1): Map[(String, Long), Long] =
    Packing.greedyPack(
        rows.toDF("g", "ord", "w").repartition(inputParts), "g", "ord", "w", budget)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap

  test("greedy packing: accumulate until the budget, then reset") {
    val got = packs(Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 1L)), 10)
    // 5+5=10 fits; +5 would be 15 → new pack; +1 fits there
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L, ("a", 4L) -> 1L))
  }

  test("an item heavier than the budget occupies its own pack") {
    val got = packs(Seq(("a", 1L, 3L), ("a", 2L, 15L), ("a", 3L, 3L)), 10)
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 1L, ("a", 3L) -> 2L))
  }

  test("groups pack independently and the result is input-partitioning-invariant") {
    val rows = (1L to 50L).flatMap(i => Seq(("x", i, 7L), ("y", i, 3L)))
    val one = packs(rows, 20, inputParts = 1)
    assert(packs(rows, 20, inputParts = 7) == one)
    assert(one(("x", 50L)) > one(("y", 50L)), "heavier group must use more packs")
    // y: 3 tokens × 50 with budget 20 → 6 per pack → last lands in pack 8
    assert(one(("y", 50L)) == 8L)
  }
}
