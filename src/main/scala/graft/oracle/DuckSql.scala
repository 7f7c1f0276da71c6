package graft.oracle

import graft.core.ClusterHash

/**
 * Builders for DuckDB oracle SQL (`SparkEntry.oracleSql`). The driver runs
 * these against the same parquet tables and hash-compares results with our
 * Spark output.
 *
 * Stock DuckDB has no `cluster_slot`, so for cluster-function queries we
 * emit SQL that *recomputes* CRC16-XMODEM with a `list_reduce` fold over
 * the key's character codes and a 256-entry table literal. The table is
 * the standard public CRC16/XMODEM table (same one the reference pastes at
 * clusterhash_extension.cpp:18-41); our unit tests pin it to the check
 * value crc16("123456789")=0x31C3, so the oracle stays independent of the
 * Scala implementation. Keys fed to these oracles must be ASCII (`ord`
 * yields code points, not bytes); non-ASCII behavior is covered by the
 * golden-vector unit tests instead.
 */
object DuckSql {

  /** The CRC16/XMODEM table as a DuckDB list literal. */
  private val crcTableLiteral: String =
    (0 until 256).map(ClusterHash.tableEntry).mkString("[", ",", "]")

  /**
   * CTE pipeline computing `slot` (and optionally `node`) for each row of
   * `base`, which must expose a `key` column. `cols` are the base columns
   * to carry through to the output, in order, before slot/node.
   *
   * The CRC fold is UNROLLED into `maxKeyLen` vectorized projection steps
   * (one per character position) instead of a per-byte `list_reduce`
   * lambda: the interpreted lambda cost ~18 µs per byte (15 s for 60k
   * keys — which is why p12 went without an oracle in rounds 1-2), while
   * the unrolled form runs the same 60k keys in ~0.12 s. Keys longer
   * than `maxKeyLen` raise a loud `error()` rather than silently
   * truncating the hash.
   */
  def withSlotNode(base: String, cols: Seq[String], slotCol: Option[String] = Some("slot"),
                   nodeCol: Option[String] = None, nodeNCol: Option[(String, Int)] = None,
                   maxKeyLen: Int = 32): String = {
    val outCols = cols ++
      slotCol.map(c => s"CAST(__c % 16384 AS INTEGER) AS $c") ++
      nodeCol.map(c => s"CAST(${node6Case("(__c % 16384)")} AS INTEGER) AS $c") ++
      nodeNCol.map { case (c, n) => s"CAST(${nodeNExpr("(__c % 16384)", n)} AS INTEGER) AS $c" }
    // every 4th step is MATERIALIZED: each step references __c three
    // times, so letting DuckDB fuse all 32 projections would blow the
    // substituted expression up 3^32-fold (the optimizer hangs —
    // filters pushed through the chain triggered it); materializing
    // every 4 steps caps fused expressions at 3^4 while keeping the
    // per-step materialization overhead negligible (~0.1-0.2 s for the
    // largest oracle inputs)
    val steps = (1 to maxKeyLen).map { i =>
      val mat = if (i % 4 == 0) "MATERIALIZED " else ""
      s"__s$i AS $mat(SELECT * REPLACE (CASE WHEN length(__hkey) >= $i THEN " +
        s"xor((__c*256)%65536, ($crcTableLiteral)[xor(__c//256, ord(substr(__hkey,$i,1)))%256+1]) " +
        s"ELSE __c END AS __c) FROM __s${i - 1})"
    }.mkString(",\n")
    s"""WITH __base AS ($base),
       |__eff AS (SELECT *,
       |  CASE WHEN strpos(key,'{')>0 AND strpos(substr(key,strpos(key,'{')+1),'}')>=2
       |       THEN substr(key,strpos(key,'{')+1,strpos(substr(key,strpos(key,'{')+1),'}')-1)
       |       ELSE key END AS __hkey FROM __base),
       |__s0 AS (SELECT *, CASE WHEN length(__hkey) > $maxKeyLen
       |  THEN error('key exceeds unrolled CRC steps: ' || __hkey) ELSE 0 END AS __c FROM __eff),
       |$steps
       |SELECT ${outCols.mkString(", ")} FROM __s$maxKeyLen""".stripMargin
  }

  /** The reference's literal 6-shard ranges (clusterhash_extension.cpp:71-85). */
  def node6Case(slotExpr: String): String =
    s"""CASE WHEN $slotExpr <= 2730 THEN 1 WHEN $slotExpr <= 5460 THEN 2
       | WHEN $slotExpr <= 8191 THEN 3 WHEN $slotExpr <= 10922 THEN 4
       | WHEN $slotExpr <= 13652 THEN 5 ELSE 6 END""".stripMargin.replace("\n", "")

  /**
   * Independent arithmetic for the generalized N-node mapping (first
   * `16384 mod n` nodes own one extra slot) — mirrors
   * [[ClusterHash.nodeOfSlotN]]'s contract without sharing code.
   */
  def nodeNExpr(slotExpr: String, n: Int): String = {
    require(n != 6, "n=6 uses the reference ranges, not the formula")
    val base = 16384 / n
    val extra = 16384 % n
    val bigSpan = (base + 1) * extra
    s"(CASE WHEN $slotExpr < $bigSpan THEN $slotExpr // ${base + 1} + 1" +
      s" ELSE ($slotExpr - $bigSpan) // $base + ${extra + 1} END)"
  }
}
