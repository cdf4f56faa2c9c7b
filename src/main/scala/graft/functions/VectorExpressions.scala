package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen-friendly vector math over `array<float>` / `array<double>`
 * embedding columns.
 *
 * The same math composed from `zip_with` + `aggregate` higher-order
 * functions evaluates interpreted (a lambda frame and an intermediate
 * array per row) — measured ~10-30× slower on the cosine hot path.
 * These expressions run one tight JVM loop per row straight over the
 * `ArrayData`, and accumulate in exactly the same element order as the
 * higher-order formulation (and as DuckDB's `list_dot_product`), so
 * results are bit-identical to the oracle.
 */
object VectorExpressions {

  private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    // refuse rather than silently truncate: a 63-dim row scored against
    // 64-dim queries would return a plausible-looking wrong similarity
    // (DuckDB's list_dot_product errors on the same input)
    require(n == b.numElements(),
      s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Single-pass (dot, |a|², |b|²) → cosine. Accumulation order matches
    * sequential `aggregate`: acc = ((0 + p₀) + p₁) + … */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = checkDims(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = checkDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def cosineEval(a: Any, b: Any, aFloat: Boolean, bFloat: Boolean): Double =
    cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  def dotEval(a: Any, b: Any, aFloat: Boolean, bFloat: Boolean): Double =
    dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  /**
   * Deterministic SRP hyperplane component for (plane, dim): uniform on
   * the [-1, 1) lattice k/10⁶ − 1, derived from the same two-argument
   * xxhash64 fold Spark's `xxhash64(plane, dim)` computes (seed 42).
   * Plain Scala — callable at plan/oracle-generation time with no
   * session, so the identical matrix can be embedded as literals in
   * DuckDB oracle SQL.
   */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = XXH64.hashLong(dim.toLong, XXH64.hashLong(plane.toLong, 42L))
    java.lang.Math.floorMod(h, 2000000L).toDouble / 1000000.0 - 1.0
  }

  /** The planes × dims hyperplane matrix (for oracle SQL literals). */
  def planeMatrix(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => planeComponent(p, d))

  /** SRP bucket id: bit p is set iff emb · plane_p > 0. Projection
    * accumulates in dim order (matches `list_dot_product`). */
  def srpBucket(emb: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val n = emb.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)
        proj += x * planeComponent(p, d)
        d += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def srpEval(emb: Any, planes: Int, isFloat: Boolean): Long =
    srpBucket(emb.asInstanceOf[ArrayData], planes, isFloat)

  private[functions] def numericArrayCheck(dt: DataType, who: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$who expects array<float|double>, got $other")
    }

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** `cosine_sim(array<float|double>, array<float|double>) -> double` */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = numericArrayCheck(left.dataType, "cosine_sim")
    if (l.isSuccess) numericArrayCheck(right.dataType, "cosine_sim") else l
  }
  override def dataType: DataType = DoubleType
  private lazy val aF = isFloatArray(left.dataType)
  private lazy val bF = isFloatArray(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = cosineEval(a, b, aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorExpressions.cosineEval($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** `dot_product(array<float|double>, array<float|double>) -> double` */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = numericArrayCheck(left.dataType, "dot_product")
    if (l.isSuccess) numericArrayCheck(right.dataType, "dot_product") else l
  }
  override def dataType: DataType = DoubleType
  private lazy val aF = isFloatArray(left.dataType)
  private lazy val bF = isFloatArray(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = dotEval(a, b, aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorExpressions.dotEval($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** `srp_bucket(array<float|double>, planes) -> long` */
case class SrpBucketExpr(child: Expression, planes: Int)
    extends UnaryExpression {
  import VectorExpressions._
  require(planes > 0 && planes <= 62, s"planes out of range: $planes")
  override def checkInputDataTypes(): TypeCheckResult =
    numericArrayCheck(child.dataType, "srp_bucket")
  override def dataType: DataType = LongType
  private lazy val isF = isFloatArray(child.dataType)
  override def nullSafeEval(input: Any): Any = srpEval(input, planes, isF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorExpressions.srpEval($c, $planes, $isF);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "srp_bucket"
}
