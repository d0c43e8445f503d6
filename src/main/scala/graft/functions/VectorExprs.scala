package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over embedding columns — codegen'd calls
  * into [[VectorKernels]] so ANN scoring stays inside whole-stage codegen
  * (the zip_with/aggregate HOF shape is interpreted).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def numericArray(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericArray(left.dataType).isDefined && numericArray(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def aFloat = numericArray(left.dataType).get
  private def bFloat = numericArray(right.dataType).get

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosine($a, $b, $aFloat, $bFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 1-based nearest-centroid cell id by dot-product argmax against a small
  * centroid matrix carried as a codegen reference object (the IVF cell
  * assignment: zero fan-out, zero shuffle — the round-1 shape exploded
  * corpus×nCells rows through a window).
  */
case class NearestCentroidExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroid(input.asInstanceOf[ArrayData], cents, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCentroid($c, $ref, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
