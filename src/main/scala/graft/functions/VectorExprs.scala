package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity-search path — the
  * codegen'd forms of the `aggregate`/`zip_with` HOF formulations in
  * `Similarity` (retained there as `*Hof` for parity tests).
  *
  * The HOF dot product allocates a zipped array per row pair and folds
  * through interpreted lambdas; at re-rank volume (candidates × dim)
  * that dominates ANN queries. These run as single static calls inside
  * whole-stage codegen.
  */
private object VectorExprs {

  /** Element i as double, for float or double array data. */
  def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two float/double array columns. Arithmetic is
  * bit-identical to the HOF form: sequential index-order folds in
  * double of (a·b), Σa², Σb², then `dot / (sqrt(na) * sqrt(nb))`.
  */
case class CosineExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isNumericArray(left.dataType) && VectorExprs.isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on dim mismatch / null elements
  override def prettyName: String = "graft_cosine"

  private lazy val leftIsFloat = VectorExprs.isFloatArray(left.dataType)
  private lazy val rightIsFloat = VectorExprs.isFloatArray(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineExpr.compute(
      a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r =
        graft.functions.CosineExpr.compute($a, $leftIsFloat, $b, $rightIsFloat);
      ${ev.isNull} = ${ev.value}_r == null;
      ${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_r.doubleValue();
    """)

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object CosineExpr {
  /** Boxed Double; null mirrors the HOF formulation's NULL: zip_with
    * pads a length mismatch with null and any null product nullifies
    * the whole aggregate fold, so a dim mismatch or a null element in
    * either array yields NULL (not a similarity over a silent-zero or
    * truncated vector).
    */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = VectorExprs.elem(a, i, aFloat)
      val y = VectorExprs.elem(b, i, bFloat)
      dot += x * y
      i += 1
    }
    i = 0
    while (i < n) { val v = VectorExprs.elem(a, i, aFloat); na += v * v; i += 1 }
    i = 0
    while (i < n) { val v = VectorExprs.elem(b, i, bFloat); nb += v * v; i += 1 }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Random-hyperplane LSH bucket id: bit i of the result is set when
  * `vec · plane_i > 0`, planes drawn from `Random(seed).nextGaussian`
  * in the same (plane-major) order as `Similarity.hyperplanes`.
  * Value-identical to the HOF `lshBucketHof` (parity-asserted).
  */
case class LshBucketExpr(child: Expression, numPlanes: Int, dim: Int, seed: Long)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 63, "numPlanes must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  private lazy val childIsFloat = VectorExprs.isFloatArray(child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    LshBucketExpr.compute(input.asInstanceOf[ArrayData], childIsFloat, numPlanes, dim, seed)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucketExpr.compute($c, $childIsFloat, $numPlanes, $dim, ${seed}L)")

  protected override def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {

  // planes are deterministic in (numPlanes, dim, seed); bounded cache
  // per executor (a seed sweep must not accumulate matrices forever)
  private val MaxCachedPlaneSets = 64
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  private def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    if (planeCache.size > MaxCachedPlaneSets) planeCache.clear()
    planeCache.computeIfAbsent((numPlanes, dim, seed), { key =>
      val rnd = new scala.util.Random(key._3)
      Array.fill(key._1, key._2)(rnd.nextGaussian())
    })
  }

  def compute(v: ArrayData, vFloat: Boolean, numPlanes: Int, dim: Int, seed: Long): Long = {
    // HOF semantics: a dim mismatch or null element nullifies every
    // plane's dot, and `when(null > 0, bit).otherwise(0)` leaves all
    // bits unset -> bucket 0
    if (v.numElements() != dim) return 0L
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return 0L; i += 1 }
    val ps = planes(numPlanes, dim, seed)
    var out = 0L
    var p = 0
    while (p < numPlanes) {
      val plane = ps(p)
      var dot = 0.0
      i = 0
      while (i < dim) {
        dot += VectorExprs.elem(v, i, vFloat) * plane(i)
        i += 1
      }
      if (dot > 0) out |= 1L << p
      p += 1
    }
    out
  }
}
