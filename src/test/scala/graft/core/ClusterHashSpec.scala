package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Golden vectors and properties from FIXTURES.md §1-2, derived from the
 * reference algorithm (clusterhash_extension.cpp:44-89) and cross-checked
 * against Redis CLUSTER KEYSLOT.
 */
class ClusterHashSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("crc table matches CRC16/XMODEM (spot entries + check value)") {
    assert(ClusterHash.tableEntry(0) == 0x0000)
    assert(ClusterHash.tableEntry(1) == 0x1021)
    assert(ClusterHash.tableEntry(2) == 0x2042)
    assert(ClusterHash.tableEntry(3) == 0x3063)
    assert(ClusterHash.tableEntry(252) == 0x2e93)
    assert(ClusterHash.tableEntry(253) == 0x3eb2)
    assert(ClusterHash.tableEntry(254) == 0x0ed1)
    assert(ClusterHash.tableEntry(255) == 0x1ef0)
    assert(ClusterHash.crc16("123456789".getBytes("UTF-8")) == 0x31c3)
  }

  val golden: Seq[(String, Int, Int)] = Seq(
    ("user:1000", 1649, 1),
    ("product:5432", 13236, 5),
    ("{user:1000}:profile", 1649, 1),
    ("{user:1000}:sessions", 1649, 1),
    ("{user:profile}:1000", 1391, 1),
    ("foo", 12182, 5),
    ("bar", 5061, 2),
    ("hello", 866, 1),
    ("", 0, 1),
    ("{}", 15257, 6),
    ("{}x", 10595, 4),
    ("a{b}c", 3300, 2),
    ("{{inner}}", 9846, 4),
    ("key{", 2667, 1),
    ("key}", 10925, 5),
    ("{user1000}.following", 3443, 2),
    ("{user1000}.followers", 3443, 2),
    ("user:1", 10778, 4),
    ("user:2", 6777, 3),
    ("user:999", 9804, 4),
  )

  test("golden key→slot→node vectors") {
    golden.foreach { case (key, slot, node) =>
      assert(ClusterHash.getSlot(key) == slot, s"slot of '$key'")
      assert(ClusterHash.getNode(key) == node, s"node of '$key'")
    }
  }

  test("node boundaries match the reference ranges exactly") {
    val bounds = Seq(0 -> 1, 2730 -> 1, 2731 -> 2, 5460 -> 2, 5461 -> 3,
      8191 -> 3, 8192 -> 4, 10922 -> 4, 10923 -> 5, 13652 -> 5,
      13653 -> 6, 16383 -> 6)
    bounds.foreach { case (slot, node) =>
      assert(ClusterHash.nodeOfSlot(slot) == node, s"slot $slot")
    }
  }

  test("user:1..1000 node distribution matches README example") {
    val counts = (1 to 1000).map(i => ClusterHash.getNode(s"user:$i"))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counts == Map(1 -> 167, 2 -> 165, 3 -> 167, 4 -> 170, 5 -> 168, 6 -> 163))
  }

  test("slot in range and node consistent for arbitrary strings") {
    val anyStr = Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)
    checkProp(Prop.forAll(anyStr) { s =>
      val slot = ClusterHash.getSlot(s)
      val node = ClusterHash.getNode(s)
      slot >= 0 && slot < ClusterHash.TotalSlots &&
        node >= 1 && node <= 6 && node == ClusterHash.nodeOfSlot(slot)
    })
  }

  test("same non-empty hash tag implies same slot") {
    val tagGen = Gen.alphaNumStr.suchThat(_.nonEmpty)
    checkProp(Prop.forAll(tagGen, Gen.alphaNumStr, Gen.alphaNumStr) { (tag, a, b) =>
      ClusterHash.getSlot(s"{$tag}$a") == ClusterHash.getSlot(s"{$tag}$b")
    })
  }

  test("keys without braces hash the whole key") {
    checkProp(Prop.forAll(Gen.alphaNumStr) { s =>
      ClusterHash.getSlot(s) ==
        ClusterHash.crc16(s.getBytes("UTF-8")) % ClusterHash.TotalSlots
    })
  }

  test("multi-byte UTF-8 keys hash their bytes, not chars") {
    // "é" = 0xC3 0xA9; crc over those two bytes
    val bytes = "é".getBytes("UTF-8")
    assert(bytes.length == 2)
    assert(ClusterHash.getSlot("é") == ClusterHash.crc16(bytes) % 16384)
    // tag extraction scans bytes; multi-byte chars around a tag don't break it
    assert(ClusterHash.getSlot("é{tag}û") == ClusterHash.getSlot("{tag}"))
  }

  test("generalized N-node mapping: covers all slots, contiguous, n=6 = reference") {
    for (n <- Seq(1, 2, 3, 4, 5, 6, 7, 16, 100)) {
      val nodes = (0 until ClusterHash.TotalSlots).map(ClusterHash.nodeOfSlotN(_, n))
      assert(nodes.head == 1 && nodes.last == n)
      assert(nodes.distinct == (1 to n)) // contiguous ascending coverage
      val sizes = nodes.groupBy(identity).view.mapValues(_.size).values.toSet
      assert(sizes.size <= 2, s"n=$n sizes should differ by at most 1")
    }
    // n=6 must be byte-for-byte the reference mapping (incl. slot 13653 → 6)
    (0 until ClusterHash.TotalSlots).foreach { s =>
      assert(ClusterHash.nodeOfSlotN(s, 6) == ClusterHash.nodeOfSlot(s))
    }
  }
}
