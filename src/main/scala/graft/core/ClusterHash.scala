package graft.core

/**
 * Core key→slot→node algorithm of the engine: the Redis Cluster hash-slot
 * scheme (CRC16-XMODEM over an optional `{hash-tag}`, mod 16384) plus a
 * fixed 6-shard slot→node mapping.
 *
 * Semantics match the reference extension exactly
 * (/root/reference/src/clusterhash_extension.cpp:44-89):
 *   - crc16: poly 0x1021, init 0, no reflect, no xor-out; check value
 *     crc16("123456789") == 0x31C3 (cpp:44-50).
 *   - getSlot: if the key contains `{` and a later `}` with a non-empty
 *     tag between them, only the tag bytes are hashed (cpp:52-63).
 *   - getNode: hardcoded contiguous ranges over 16384 slots → shards 1..6
 *     (cpp:65-89). NOTE the ranges are NOT floor(slot*6/16384): slot 13653
 *     maps to shard 6 (cpp:81), the formula would give 5.
 *
 * Everything operates on raw bytes (UTF-8), never on Java chars, so
 * multi-byte keys hash identically to the reference's std::string bytes.
 *
 * All methods are static and allocation-free so the Catalyst expressions
 * in [[graft.functions]] can call them from generated code.
 */
object ClusterHash {

  /** 2^14 hash slots, as in Redis Cluster (cpp:15). */
  final val TotalSlots = 16384

  /** Number of shards in the reference's fixed topology (cpp:71-85). */
  final val NumNodes = 6

  private final val OpenBrace: Byte = '{'
  private final val CloseBrace: Byte = '}'

  /**
   * CRC16-XMODEM lookup table, generated from the polynomial rather than
   * pasted, and verified against the reference table by the test suite
   * (first entries 0x0000,0x1021,0x2042,…; check value 0x31C3).
   */
  private val crcTable: Array[Char] = {
    val t = new Array[Char](256)
    var n = 0
    while (n < 256) {
      var c = n << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) (c << 1) ^ 0x1021 else c << 1
        k += 1
      }
      t(n) = (c & 0xffff).toChar
      n += 1
    }
    t
  }

  /** Table entry, exposed for the test suite's table-equivalence check. */
  def tableEntry(i: Int): Int = crcTable(i)

  /** CRC16-XMODEM over bytes [from, until). */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc = ((crc << 8) & 0xff00) ^ crcTable(((crc >> 8) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  def crc16(bytes: Array[Byte]): Int = crc16(bytes, 0, bytes.length)

  /**
   * Hash slot for a key, honouring the `{hash-tag}` convention: hash only
   * the bytes between the first `{` and the first `}` after it, iff that
   * tag is non-empty; otherwise hash the whole key (cpp:52-63).
   */
  def getSlot(bytes: Array[Byte]): Int = {
    val n = bytes.length
    var open = 0
    while (open < n && bytes(open) != OpenBrace) open += 1
    if (open < n) {
      var close = open + 1
      while (close < n && bytes(close) != CloseBrace) close += 1
      // close == open+1 means an empty tag "{}" — ignored, whole key hashed
      if (close < n && close != open + 1) {
        return crc16(bytes, open + 1, close) % TotalSlots
      }
    }
    crc16(bytes, 0, n) % TotalSlots
  }

  def getSlot(key: String): Int =
    getSlot(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /**
   * Shard 1..6 owning a slot, per the reference's literal ranges
   * (cpp:71-85). Kept as explicit boundaries — see class doc for why a
   * formula is wrong at slot 13653.
   */
  def nodeOfSlot(slot: Int): Int = {
    if (slot < 0 || slot >= TotalSlots) throw new IllegalArgumentException(s"slot out of range: $slot")
    if (slot <= 2730) 1
    else if (slot <= 5460) 2
    else if (slot <= 8191) 3
    else if (slot <= 10922) 4
    else if (slot <= 13652) 5
    else 6
  }

  /** Shard 1..6 for a key (slot → fixed 6-node ranges). */
  def getNode(bytes: Array[Byte]): Int = nodeOfSlot(getSlot(bytes))

  def getNode(key: String): Int =
    getNode(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /**
   * Generalized N-node mapping (our extension; the reference README
   * documents a 2-arg `cluster_node(key, n)` but ships only the 1-arg
   * 6-shard form — see SURVEY.md §2.1). Convention: slots are split into
   * n contiguous ranges; the first `16384 mod n` ranges get one extra
   * slot, mirroring the reference's 6-node layout (sizes
   * 2731,2730,2731,2731,2730,2731 do NOT follow that rule — so for n == 6
   * we defer to the reference's literal ranges for exact parity).
   */
  def nodeOfSlotN(slot: Int, n: Int): Int = {
    if (n <= 0 || n > TotalSlots) throw new IllegalArgumentException(s"node count out of range: $n")
    if (slot < 0 || slot >= TotalSlots) throw new IllegalArgumentException(s"slot out of range: $slot")
    if (n == NumNodes) return nodeOfSlot(slot)
    val base = TotalSlots / n
    val extra = TotalSlots % n
    // First `extra` nodes own (base+1) slots each
    val bigSpan = (base + 1) * extra
    if (slot < bigSpan) slot / (base + 1) + 1
    else (slot - bigSpan) / base + extra + 1
  }

  def getNodeN(bytes: Array[Byte], n: Int): Int = nodeOfSlotN(getSlot(bytes), n)
}
