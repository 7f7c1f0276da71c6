package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/**
 * Deterministic Bloom filter over 64-bit hashes — the memory-bounded
 * membership structure a 100 TB ingest uses to pre-filter new documents
 * against the existing corpus WITHOUT a join: the filter is KB-to-MB
 * sized regardless of corpus row count, builds in one scan (partial
 * aggregation: per-partition bitmaps OR together), broadcasts to the
 * new batch, and each new row tests k bits locally. A hit means "maybe
 * present" (the false-positive rate is the classic (1-e^(-kn/m))^k);
 * a miss is a guarantee of absence, so the expensive exact join only
 * runs on the (tiny) maybe set.
 *
 * Everything is deterministic and SQL-recomputable, so the whole
 * approximate answer — including which rows are false positives —
 * hash-matches a DuckDB oracle (same property as [[KmvSketchAgg]];
 * feed it [[TextFunctions.fnv1a64_mix]] hashes). Bit positions use
 * double hashing (Kirsch–Mitzenmacher): from the 62 low bits of the
 * hash, u1 = low 31 bits, u2 = next 31 bits forced odd, bit_i =
 * (u1 + i·u2) mod m — pure non-negative integer arithmetic that any
 * engine reproduces exactly.
 *
 * Buffer: a fixed mBits/64-word bitmap (e.g. 1 KiB at m=8192); `merge`
 * is a word-wise OR, so the shuffle carries one bitmap per partition,
 * never per row. NULL hashes are ignored, matching builtin aggregates.
 */
class BloomFilterAgg(mBits: Int, k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return b
    var i = 0
    while (i < k) {
      val pos = BloomFilterAgg.position(boxed.longValue(), i, mBits)
      b((pos >>> 6).toInt) |= (1L << (pos & 63).toInt)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomFilterAgg {
  /** The i-th bit position for hash `h`: double hashing over the 62
    * low bits (non-negative in both two's-complement and unsigned
    * views, so every engine agrees). */
  def position(h: Long, i: Int, mBits: Int): Long = {
    val hm = h & 0x3FFFFFFFFFFFFFFFL
    val u1 = hm & 0x7FFFFFFFL
    val u2 = (hm >>> 31) | 1L
    (u1 + i.toLong * u2) % mBits.toLong
  }

  /** Column form of [[position]]'s (u1, u2) derivation — the ONE
    * Kirsch–Mitzenmacher scheme shared by the Bloom bit positions and
    * the CMS counter columns ([[CountMinAgg.estimate]]); the SQL-string
    * twin in [[mightContainExpr]] is pinned equal by the specs. */
  def doubleHashParams(h: Column): (Column, Column) = {
    import org.apache.spark.sql.functions._
    val hm = h.bitwiseAND(lit(0x3FFFFFFFFFFFFFFFL))
    (hm.bitwiseAND(lit(0x7FFFFFFFL)), shiftright(hm, 31).bitwiseOR(lit(1L)))
  }

  /** Column form: `bloom_agg(hashCol, mBits, k)` → array<long> bitmap. */
  def bloom_agg(hash: Column, mBits: Int, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new BloomFilterAgg(mBits, k)).apply(hash)

  /** Loop body shared by the interpreted eval and the generated code
    * of [[BloomMightContain]]: probe all k positions of `h` in the
    * bitmap. */
  def mightContainArray(bf: ArrayData, h: Long, mBits: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val pos = position(h, i, mBits)
      if ((bf.getLong((pos >>> 6).toInt) & (1L << (pos & 63).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Native membership probe: true = maybe present, false = definitely
    * absent. Codegen'd ([[BloomMightContain]]), so the probe fuses into
    * the new batch's scan stage — which matters because at ingest scale
    * the NEW side is the big one; the bitmap is a broadcast scalar. */
  def might_contain(bf: Column, h: Column, mBits: Int, k: Int): Column =
    Bridge.column(BloomMightContain(Bridge.expression(bf), Bridge.expression(h), mBits, k))

  /** SQL-string twin of [[might_contain]] built from `bit_get` over
    * named columns — kept as an independent second formulation that the
    * specs pin equal to the native expression. */
  def mightContainExpr(bfCol: String, hCol: String, mBits: Int, k: Int): Column = {
    import org.apache.spark.sql.functions.expr
    val hm = s"($hCol & 4611686018427387903)" // low 62 bits, non-negative
    val u1 = s"($hm & 2147483647)"
    val u2 = s"(shiftright($hm, 31) | 1)"
    val pos = s"(($u1 + i * $u2) % $mBits)"
    expr(
      s"aggregate(sequence(0, ${k - 1}), true, (acc, i) -> acc AND " +
        s"bit_get(element_at($bfCol, CAST($pos DIV 64 AS INT) + 1), " +
        s"CAST($pos % 64 AS INT)) = 1)")
  }
}

/** `bloom_might_contain(bitmap, hash)` — native, codegen'd Bloom probe
  * over a [[BloomFilterAgg]] bitmap (mBits/k fixed at plan time; must
  * match the build, same caller-owned invariant as
  * [[CountMinAgg.estimate]]). Null bitmap or hash → null. */
case class BloomMightContain(left: Expression, right: Expression, mBits: Int, k: Int)
  extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bloom_might_contain"
  override def inputTypes = Seq(ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(bf: Any, h: Any): Any =
    BloomFilterAgg.mightContainArray(
      bf.asInstanceOf[ArrayData], h.asInstanceOf[Long], mBits, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bf, h) =>
      s"graft.functions.BloomFilterAgg.mightContainArray($bf, $h, $mBits, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
