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
   */
  def withSlotNode(base: String, cols: Seq[String], slotCol: Option[String] = Some("slot"),
                   nodeCol: Option[String] = None, nodeNCol: Option[(String, Int)] = None): String = {
    val outCols = cols ++
      slotCol.map(c => s"CAST(__c % 16384 AS INTEGER) AS $c") ++
      nodeCol.map(c => s"CAST(${node6Case("(__c % 16384)")} AS INTEGER) AS $c") ++
      nodeNCol.map { case (c, n) => s"CAST(${nodeNExpr("(__c % 16384)", n)} AS INTEGER) AS $c" }
    s"""WITH __base AS ($base),
       |__eff AS (SELECT *,
       |  CASE WHEN strpos(key,'{')>0 AND strpos(substr(key,strpos(key,'{')+1),'}')>=2
       |       THEN substr(key,strpos(key,'{')+1,strpos(substr(key,strpos(key,'{')+1),'}')-1)
       |       ELSE key END AS __hkey FROM __base),
       |__crc AS (SELECT *, list_reduce(
       |   list_prepend(0, list_transform(range(1,length(__hkey)+1), i -> ord(substr(__hkey,i,1)))),
       |   (acc,b) -> xor((acc*256)%65536, ($crcTableLiteral)[xor(acc//256, b)%256+1])) AS __c FROM __eff)
       |SELECT ${outCols.mkString(", ")} FROM __crc""".stripMargin
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
