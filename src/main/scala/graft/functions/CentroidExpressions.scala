package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Scan-local IVF coarse-quantizer kernels — the THIRD serving tier
 * (round 13), past both the per-centroid-literal-struct tier (one
 * expression node per centroid → bounded at ~32 lists by codegen'd
 * projection size) and the broadcast-table tier (free nlist, but the
 * ×nlist row expansion streams through an aggregation and assignment
 * pays a join-back). Here the WHOLE centroid matrix rides the plan as
 * ONE `Literal` node (the [[PqOps]] codebook pattern), is parsed once
 * at plan time, and enters generated code as a reference object — so
 * assignment and probe selection are single fused loops inside the
 * scan projection: no row expansion, no aggregation, no join-back, at
 * ANY nlist an executor can hold (nlist × dim doubles — 33 MB at
 * 65 536 × 64, shipped once per stage with the serialized plan, the
 * same volume the table tier broadcasts).
 *
 * Arithmetic is BIT-IDENTICAL to the literal tier (and therefore to
 * every spliced-centroid DuckDB oracle): cosine = dot/(√sv·√sc) with
 * all three sums left-folded from 0.0 in one pass, 0 when the norm
 * product is 0; argmax ties → LOWEST cid (the struct-argmax rule);
 * probe ties → HIGHEST cid (the reverse-array-sort rule). NaN inputs
 * are impossible for finite parquet floats and finite centroids —
 * documented, not handled, as the PQ kernels.
 */
object IvfOps {
  /** Parse a foldable array<array<double>> centroid matrix once at
    * plan time (the [[PqOps.parseBooks]] contract, one level down). */
  def parseCents(e: Expression, fn: String): Array[Array[Double]] = {
    require(e.foldable, s"$fn: centroids must be a foldable literal")
    val evaled = e.eval()
    require(evaled != null, s"$fn: centroid literal is null")
    val ad = evaled.asInstanceOf[ArrayData]
    require(ad.numElements() > 0, s"$fn: no centroids")
    val cents = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    require(cents.forall(_.length == cents(0).length),
      s"$fn: centroids have uneven dims")
    cents
  }

  /** Cosine of the row vector against one centroid — the one fused
    * pass whose three accumulators fold in exactly the order the
    * literal tier's vec_dot/norm composition folds them. */
  def cosTo(v: ArrayData, vIsFloat: Boolean, c: Array[Double]): Double = {
    val n = c.length
    if (v.numElements() != n)
      throw new IllegalArgumentException(
        s"centroid kernel: dimension mismatch ${v.numElements()} vs $n")
    var dot = 0.0; var sv = 0.0; var sc = 0.0; var i = 0
    while (i < n) {
      val x = if (vIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      dot += x * c(i); sv += x * x; sc += c(i) * c(i); i += 1
    }
    val prod = math.sqrt(sv) * math.sqrt(sc)
    if (prod == 0.0) 0.0 else dot / prod
  }

  /** Argmax-cosine centroid id, ties → LOWEST cid (strict `>` over an
    * ascending-cid scan keeps the first of an equal run). */
  def argmaxCid(v: ArrayData, vIsFloat: Boolean, cents: Array[Array[Double]]): Int = {
    var best = 0; var bestS = cosTo(v, vIsFloat, cents(0)); var i = 1
    while (i < cents.length) {
      val s = cosTo(v, vIsFloat, cents(i))
      if (s > bestS) { best = i; bestS = s }
      i += 1
    }
    best
  }

  /** Top-`nprobe` centroid ids by (cosine DESC, cid DESC), in rank
    * order — the probe rule every spliced oracle encodes (`ORDER BY s
    * DESC, cid DESC`). Bounded insertion buffer, one pass. */
  def probeCids(v: ArrayData, vIsFloat: Boolean, cents: Array[Array[Double]],
                nprobe: Int): ArrayData = {
    val k = math.min(nprobe, cents.length)
    val ss = new Array[Double](k); val cc = new Array[Int](k)
    var filled = 0; var i = 0
    while (i < cents.length) {
      val s = cosTo(v, vIsFloat, cents(i))
      // candidate (s, i) beats slot j iff s > ss(j), or s == ss(j) and
      // i > cc(j) — i ascending means an equal-score later cid slots
      // BEFORE its equal-score predecessors
      if (filled < k || s > ss(k - 1) || (s == ss(k - 1) && i > cc(k - 1))) {
        var lo = 0
        while (lo < filled && !(s > ss(lo) || (s == ss(lo) && i > cc(lo)))) lo += 1
        val upto = math.min(filled, k - 1)
        var j = upto
        while (j > lo) { ss(j) = ss(j - 1); cc(j) = cc(j - 1); j -= 1 }
        if (lo < k) { ss(lo) = s; cc(lo) = i }
        if (filled < k) filled += 1
      }
      i += 1
    }
    new GenericArrayData(cc.take(filled).map(Integer.valueOf))
  }
}

/** `centroid_argmax(vec, cents)` → int: the owning list id. */
case class CentroidArgmax(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "centroid_argmax"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  private lazy val vIsFloat = PqOps.isFloatVec(left, "centroid_argmax")
  private lazy val cents = IvfOps.parseCents(right, "centroid_argmax")

  protected override def nullSafeEval(v: Any, c: Any): Any =
    IvfOps.argmaxCid(v.asInstanceOf[ArrayData], vIsFloat, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev, (v, _) => s"graft.functions.IvfOps.argmaxCid($v, $vIsFloat, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}

/** `centroid_probes(vec, cents, nprobe)` → array<int>, rank order. */
case class CentroidProbes(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def prettyName: String = "centroid_probes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val vIsFloat = PqOps.isFloatVec(first, "centroid_probes")
  private lazy val cents = IvfOps.parseCents(second, "centroid_probes")
  private lazy val nprobe: Int = {
    require(third.foldable, "centroid_probes: nprobe must be a literal")
    val n = third.eval().asInstanceOf[Int]
    require(n >= 1, s"centroid_probes: nprobe must be >= 1, got $n")
    n
  }

  protected override def nullSafeEval(v: Any, c: Any, n: Any): Any =
    IvfOps.probeCids(v.asInstanceOf[ArrayData], vIsFloat, cents, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev, (v, _, _) =>
      s"graft.functions.IvfOps.probeCids($v, $vIsFloat, $ref, $nprobe)")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CentroidProbes =
    copy(first = f, second = s, third = t)
}

object CentroidFunctions {
  /** One Literal node holding the whole centroid matrix (nlist × dim). */
  def centsLit(cents: Array[Array[Double]]): Column =
    Bridge.column(Literal.create(
      cents.map(_.toSeq).toSeq,
      ArrayType(ArrayType(DoubleType, false), false)))

  def centroid_argmax(vec: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(CentroidArgmax(Bridge.expression(vec), Bridge.expression(centsLit(cents))))

  def centroid_probes(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(CentroidProbes(Bridge.expression(vec), Bridge.expression(centsLit(cents)),
      Bridge.expression(Bridge.column(Literal(nprobe)))))
}
