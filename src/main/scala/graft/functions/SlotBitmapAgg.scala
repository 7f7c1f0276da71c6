package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed UDAF surface (SURVEY.md §2.3 "UDF/UDAF"): exact count of distinct
 * hash slots seen, via a fixed 16384-bit bitmap (2 KiB buffer). Unlike
 * `countDistinct` this needs no expand/dedup shuffle — buffers merge with
 * bitwise OR, so it behaves like a partial-aggregating sketch with an
 * exact answer (the slot domain is tiny and fixed, clusterhash
 * extension's TOTAL_SLOTS, cpp:15).
 */
object SlotBitmapAgg extends Aggregator[Int, Array[Long], Long] {
  private val Words = 16384 / 64

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(b: Array[Long], slot: Int): Array[Long] = {
    b(slot >>> 6) |= (1L << (slot & 63))
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < Words) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column form: `distinct_slots(slotCol)`. */
  def distinct_slots(slot: Column): Column =
    org.apache.spark.sql.functions.udaf(SlotBitmapAgg).apply(slot)
}
