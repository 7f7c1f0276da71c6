package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.TextHash

/**
 * Native expressions for document fingerprinting (codegen'd, no UDFs —
 * these run in the scan's fused loop at 100 TB).
 */

/** `rolling_fingerprint(text)` → min Karp-Rabin hash of 8-byte windows. */
case class RollingFingerprint(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "rolling_fingerprint"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    TextHash.rollingMin(input.asInstanceOf[UTF8String].getBytes, 8)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextHash.rollingMin($c.getBytes(), 8)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** `fingerprint_set(text, window, p)` → array<long>: mod-sampled rolling
  * Karp-Rabin fingerprints (winnowing/MOSS family), distinct + sorted. */
case class FingerprintSet(child: Expression, window: Int, modP: Int)
    extends UnaryExpression with ExpectsInputTypes {
  // fail at plan time, not as an ArithmeticException (h % 0) or
  // zero-width windows deep inside execution
  require(window > 0, s"fingerprint_set: window must be positive, got $window")
  require(modP > 0, s"fingerprint_set: modP must be positive, got $modP")
  override def prettyName: String = "fingerprint_set"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHash.fingerprintSet(input.asInstanceOf[UTF8String].getBytes, window, modP))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.fingerprintSet($c.getBytes(), $window, $modP))")
  override protected def withNewChildInternal(newChild: Expression): FingerprintSet =
    copy(child = newChild)
}

/** `simhash64(tokens)` → 64-bit SimHash of a string array. CodegenFallback:
  * array unpacking dominates; the per-row cost is the 64-bit vote loop. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "simhash64"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any = {
    // the declared ArrayType(StringType) admits null ELEMENTS, which
    // the kernel's .toString would NPE on — skip them (they carry no
    // token signal), keeping non-null tokens' votes intact
    val arr = input.asInstanceOf[ArrayData].toObjectArray(StringType)
      .filter(_ != null)
    TextHash.simHash64(arr.asInstanceOf[Array[AnyRef]])
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `hashed_count_vector(tokens, dim)` → array<double>: hashing-trick
  * count vector, ONE pass over the tokens (16 filter ops per token
  * would be the HOF alternative). CodegenFallback as [[SimHash64]]:
  * array unpacking dominates. */
case class HashedCountVector(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // power of two only: the featurizer's oracle-reproducibility contract
  // (signed floorMod == unsigned SQL mod) needs 2^64 ≡ 0 (mod dim)
  require(dim > 0 && (dim & (dim - 1)) == 0,
    s"hashed_count_vector dim must be a power of two, got $dim")
  override def prettyName: String = "hashed_count_vector"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toObjectArray(StringType)
      .filter(_ != null) // null elements carry no token signal (as SimHash64)
    new GenericArrayData(TextHash.hashedCounts(arr.asInstanceOf[Array[AnyRef]], dim))
  }
  override protected def withNewChildInternal(newChild: Expression): HashedCountVector =
    copy(child = newChild)
}

/** `shingle_hashes(text, n)` → array<long>: distinct FNV-1a hashes of all
  * n-word shingles, one fused byte-level pass (no token/shingle strings). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "shingle_hashes"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHash.wordShingleHashes(input.asInstanceOf[UTF8String].getBytes, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.wordShingleHashes($c.getBytes(), $n))")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `token_stats(text)` → array<int> [hits_de, hits_en, hits_es, hits_fr,
  * hits_zh, n_tokens, sum_token_chars] in one fused byte pass. */
case class TokenStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "token_stats"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.TextStatsCore.stats(input.asInstanceOf[UTF8String].getBytes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextStatsCore.stats($c.getBytes()))")
  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** `fnv1a64(text)` → 64-bit FNV-1a hash of the UTF-8 bytes. Unlike
  * xxhash64 this is trivially recomputable in oracle SQL (a byte fold),
  * which is what makes KMV sketches over it hash-checkable end to end. */
case class Fnv1a64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "fnv1a64"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    TextHash.fnv1a64(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextHash.fnv1a64($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** `fnv1a64_mix(text)` → fmix64-finalized FNV-1a64 — the uniform variant
  * for order-statistics sketches (see [[TextHash.fnv1a64Mixed]]). */
case class Fnv1a64Mix(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "fnv1a64_mix"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    TextHash.fnv1a64Mixed(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextHash.fnv1a64Mixed($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Mix =
    copy(child = newChild)
}

/** `repetition_stats(text)` → array<int> [n_tokens, n_distinct,
  * top_word_count, n_bigrams, top_bigram_count] in one fused byte pass. */
case class RepetitionStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "repetition_stats"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.TextStatsCore.repetition(input.asInstanceOf[UTF8String].getBytes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextStatsCore.repetition($c.getBytes()))")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object TextFunctions {
  def token_stats(text: Column): Column =
    Bridge.column(TokenStats(Bridge.expression(text)))
  def repetition_stats(text: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text)))
  def rolling_fingerprint(text: Column): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(text)))
  def fingerprint_set(text: Column, window: Int = 16, modP: Int = 8): Column =
    Bridge.column(FingerprintSet(Bridge.expression(text), window, modP))
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def hashed_count_vector(tokens: Column, dim: Int): Column =
    Bridge.column(HashedCountVector(Bridge.expression(tokens), dim))
  def shingle_hashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
  def fnv1a64(text: Column): Column =
    Bridge.column(Fnv1a64(Bridge.expression(text)))
  def fnv1a64_mix(text: Column): Column =
    Bridge.column(Fnv1a64Mix(Bridge.expression(text)))
}
