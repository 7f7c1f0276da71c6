package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) keys: interleave the bits of two dimension values so
 * that sorting by the single key clusters rows that are close in BOTH
 * dimensions. The standard multi-dimensional layout trick at 100 TB
 * (Delta/Iceberg `OPTIMIZE ZORDER BY`): files written in z-key ranges
 * carry tight min/max footer stats on *every* interleaved dimension, so
 * a scan with predicates on either (or both) dimensions prunes most
 * files — unlike a plain sort, which clusters only its leading column.
 *
 * Implementation is the classic mask-shift bit spread (4 shift+mask
 * rounds per dimension, all fixed-point integer ops that stay inside
 * whole-stage codegen — no UDF). The same arithmetic is expressible in
 * plain SQL, so z-keys are oracle-checkable end to end.
 */
object ZOrder {

  /** Spread the low 16 bits of `x` into the even bit positions of a
    * 32-bit value: bit i of x lands at bit 2i. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xffffL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00ff00ffL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0f0f0f0fL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two 16-bit dimension values: x's bits at even
    * positions, y's at odd — z(x,y) ∈ [0, 2^32). Inputs outside
    * [0, 65536) would silently alias after the 16-bit mask (65536 → 0),
    * destroying the locality the key exists for — so they raise
    * instead; bucket wider dimensions first (`% 65536`, `div`, hour
    * truncation …). */
  def zkey(x: Column, y: Column): Column = {
    def checked(v: Column, name: String): Column =
      when(v >= 0 && v < 65536, v)
        .otherwise(raise_error(concat(
          lit(s"zkey: $name dimension out of [0, 65536): "), v.cast("string"))))
    spread16(checked(x, "x"))
      .bitwiseOR(shiftleft(spread16(checked(y, "y")), 1)).cast("long")
  }

  /**
   * Z-order layout write: range-partition on the z-key (contiguous
   * z-ranges per output partition, balanced by sampling) and sort rows
   * within each partition, so every produced file covers one tight
   * z-range = one small tile in (x, y) space. `outputPartitions` sizes
   * files; at scale pick it so each file lands near the parquet
   * row-group sweet spot.
   */
  def zorderWrite(df: DataFrame, x: Column, y: Column, path: String,
                  outputPartitions: Int): Unit = {
    // unique temp name: a user column literally named "__z" must not be
    // silently replaced and dropped
    val zc = s"__graft_zkey_${java.util.UUID.randomUUID.toString.take(8)}"
    df.withColumn(zc, zkey(x, y))
      .repartitionByRange(outputPartitions, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
