package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.ClusterHash

/**
 * Catalyst scalar expressions for the cluster-hash functions — the Spark
 * equivalent of the reference's vectorized `ScalarFunction`s
 * (clusterhash_extension.cpp:93-123). Real `Expression`s rather than
 * ScalaUDFs so that:
 *   - whole-stage codegen fuses them into the surrounding pipeline
 *     (`doGenCode` emits a static call — analogous to the reference's
 *     tight `UnaryExecutor` loop over DataChunk vectors, cpp:96-100);
 *   - `ConstantFolding` folds literal calls at plan time (the reference
 *     relies on DuckDB's equivalent for `SELECT cluster_slot('user:1000')`);
 *   - NULL in → NULL out without branching in the hot loop
 *     (`nullIntolerant`, matching UnaryExecutor's null-mask handling);
 *   - they are safe to use inside partitioning expressions
 *     (`deterministic` by construction).
 */
abstract class ClusterHashExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
}

/** `cluster_slot(key)` → hash slot 0..16383 (cpp:116-118). */
case class ClusterSlot(child: Expression) extends ClusterHashExpression {
  override def prettyName: String = "cluster_slot"
  protected override def nullSafeEval(input: Any): Any =
    ClusterHash.getSlot(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.ClusterHash.getSlot($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): ClusterSlot =
    copy(child = newChild)
}

/** `cluster_node(key)` → shard 1..6 via fixed slot ranges (cpp:119-121). */
case class ClusterNode(child: Expression) extends ClusterHashExpression {
  override def prettyName: String = "cluster_node"
  protected override def nullSafeEval(input: Any): Any =
    ClusterHash.getNode(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.ClusterHash.getNode($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): ClusterNode =
    copy(child = newChild)
}

/**
 * `cluster_node(key, n)` → node 1..n. Our generalization of the 2-arg form
 * the reference README documents but does not ship (README.md:84,115 vs
 * cpp:119-121 — see SURVEY.md §2.1). n == 6 reproduces the reference
 * ranges exactly.
 */
case class ClusterNodeN(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "cluster_node"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(key: Any, n: Any): Any =
    ClusterHash.getNodeN(key.asInstanceOf[UTF8String].getBytes, n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.core.ClusterHash.getNodeN($k.getBytes(), $n)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ClusterNodeN =
    copy(left = newLeft, right = newRight)
}

/**
 * Registration — the Spark analogue of the reference's extension load
 * path (`clusterhash_init` → `ExtensionUtil::RegisterFunction`,
 * cpp:114-124): injects both functions into the session's
 * FunctionRegistry so `spark.sql("SELECT cluster_slot(k) ...")` resolves.
 * DataFrame users get the typed `Column` helpers below without any
 * registration.
 */
object ClusterHashFunctions {

  /** Column-API form: `df.select(cluster_slot($"key"))`. */
  def cluster_slot(key: Column): Column =
    Bridge.column(ClusterSlot(Bridge.expression(key)))

  /** Column-API form: `df.select(cluster_node($"key"))`. */
  def cluster_node(key: Column): Column =
    Bridge.column(ClusterNode(Bridge.expression(key)))

  /** Column-API form of the generalized n-node mapping. */
  def cluster_node(key: Column, n: Column): Column =
    Bridge.column(
      ClusterNodeN(Bridge.expression(key), Bridge.expression(n)))

  private def slotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(k) => ClusterSlot(k)
    case _ => throw new IllegalArgumentException(
      s"cluster_slot requires exactly 1 argument, got ${args.length}")
  }

  private def nodeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(k) => ClusterNode(k)
    case Seq(k, n) => ClusterNodeN(k, n)
    case _ => throw new IllegalArgumentException(
      s"cluster_node requires 1 or 2 arguments, got ${args.length}")
  }

  /** Register the full native-function surface for SQL in this session:
    * the cluster functions plus every pipeline kernel, so a SQL-first
    * user of the reference gets the whole library without touching the
    * Column API. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cluster_slot", slotBuilder, "built-in")
    registry.createOrReplaceTempFunction("cluster_node", nodeBuilder, "built-in")
    GraftFunctionBuilders.all.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // the typed aggregators too — SQL-first users get the whole surface
    // (the extensions path covers scalars only: injectFunction wants
    // Expression builders, which typed Aggregators don't have)
    spark.udf.register("distinct_slots",
      org.apache.spark.sql.functions.udaf(SlotBitmapAgg))
    spark.udf.register("kmv_distinct",
      org.apache.spark.sql.functions.udaf(new KmvSketchAgg(256)))
    spark.udf.register("hll_distinct",
      org.apache.spark.sql.functions.udaf(new HllSketchAgg(6)))
    // sketch family + grouped top-k at FIXED shapes (typed params
    // aren't expressible through the udf registry; the Column API
    // keeps the knobs). bloom_build matches Dedup.bloomPrefilter's
    // default (1024, 3) so SQL-built bitmaps are bit-compatible with
    // the operator's.
    spark.udf.register("bloom_build",
      org.apache.spark.sql.functions.udaf(new BloomFilterAgg(1024, 3)))
    spark.udf.register("cms_build",
      org.apache.spark.sql.functions.udaf(new CountMinAgg(512, 3)))
    spark.udf.register("top_k_pairs",
      org.apache.spark.sql.functions.udaf(new TopKAgg(10)))
  }
}

/**
 * SQL builders for the pipeline kernels (shared by the per-session
 * [[ClusterHashFunctions.register]] path and the global
 * [[GraftExtensions]] path). Int-valued shape parameters (shingle n,
 * frame count, resize dims) must be foldable literals — they size
 * per-row output buffers at codegen time.
 */
private[functions] object GraftFunctionBuilders {

  private def litInt(e: Expression, fn: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: expected a literal 32-bit integer argument, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: shape arguments must be literal integers")

  private def bad(fn: String, usage: String): Nothing =
    throw new IllegalArgumentException(s"$fn: expected $usage")

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_fingerprint" -> {
      case Seq(t) => RollingFingerprint(t)
      case _ => bad("rolling_fingerprint", "(text)")
    },
    "fingerprint_set" -> {
      case Seq(t) => FingerprintSet(t, 16, 8)
      case Seq(t, w, p) => FingerprintSet(t,
        litInt(w, "fingerprint_set"), litInt(p, "fingerprint_set"))
      case _ => bad("fingerprint_set", "(text[, window, mod_p])")
    },
    "simhash64" -> {
      case Seq(toks) => SimHash64(toks)
      case _ => bad("simhash64", "(token_array)")
    },
    "shingle_hashes" -> {
      case Seq(t) => ShingleHashes(t, 3)
      case Seq(t, n) => ShingleHashes(t, litInt(n, "shingle_hashes"))
      case _ => bad("shingle_hashes", "(text[, n])")
    },
    "token_stats" -> {
      case Seq(t) => TokenStats(t)
      case _ => bad("token_stats", "(text)")
    },
    "repetition_stats" -> {
      case Seq(t) => RepetitionStats(t)
      case _ => bad("repetition_stats", "(text)")
    },
    "fnv1a64" -> {
      case Seq(t) => Fnv1a64(t)
      case _ => bad("fnv1a64", "(text)")
    },
    "fnv1a64_mix" -> {
      case Seq(t) => Fnv1a64Mix(t)
      case _ => bad("fnv1a64_mix", "(text)")
    },
    "vec_dot" -> {
      case Seq(a, b) => VecDot(a, b)
      case _ => bad("vec_dot", "(vec, vec)")
    },
    "pq_encode" -> {
      case Seq(v, b) => PqEncode(v, b)
      case _ => bad("pq_encode", "(vec, codebook_literal)")
    },
    "pq_adc" -> {
      case Seq(q, c, b) => PqAdc(q, c, b)
      case _ => bad("pq_adc", "(query_vec, codes, codebook_literal)")
    },
    "media_features" -> {
      case Seq(p) => graft.operators.MediaFeatures(p)
      case _ => bad("media_features", "(payload)")
    },
    "frame_checksums" -> {
      case Seq(p, n) => graft.operators.FrameChecksums(p, litInt(n, "frame_checksums"))
      case _ => bad("frame_checksums", "(payload, n_frames)")
    },
    "media_resize" -> {
      case Seq(p, sw, sh, dw, dh) => graft.operators.MediaResize(p,
        litInt(sw, "media_resize"), litInt(sh, "media_resize"),
        litInt(dw, "media_resize"), litInt(dh, "media_resize"))
      case _ => bad("media_resize", "(payload, srcW, srcH, dstW, dstH)")
    },
    "ahash64" -> {
      case Seq(p, sw, sh) => graft.operators.AHash64(p,
        litInt(sw, "ahash64"), litInt(sh, "ahash64"))
      case _ => bad("ahash64", "(payload, srcW, srcH)")
    },
    "bloom_might_contain" -> {
      case Seq(bf, h, m, kk) => BloomMightContain(bf, h,
        litInt(m, "bloom_might_contain"), litInt(kk, "bloom_might_contain"))
      case _ => bad("bloom_might_contain", "(bitmap, hash, mBits, k)")
    },
  )
}

/**
 * `SparkSessionExtensions` hook so the functions can be wired globally via
 * `spark.sql.extensions=graft.functions.GraftExtensions` — the closest
 * Spark analogue of DuckDB's `LOAD clusterhash`.
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cluster_slot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(classOf[ClusterSlot].getName, "cluster_slot"),
      (args: Seq[Expression]) => args match {
        case Seq(k) => ClusterSlot(k)
        case _ => throw new IllegalArgumentException("cluster_slot(key)")
      }))
    ext.injectFunction((
      FunctionIdentifier("cluster_node"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(classOf[ClusterNode].getName, "cluster_node"),
      (args: Seq[Expression]) => args match {
        case Seq(k) => ClusterNode(k)
        case Seq(k, n) => ClusterNodeN(k, n)
        case _ => throw new IllegalArgumentException("cluster_node(key[, n])")
      }))
    GraftFunctionBuilders.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
  }
}
