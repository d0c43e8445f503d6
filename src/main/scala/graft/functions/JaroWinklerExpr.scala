package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler similarity.
  *
  * A codegen'd expression (not a Scala UDF) so the pairwise scoring stage
  * stays inside whole-stage codegen — the generated code calls the static
  * kernel directly, the same pattern Spark's built-in `levenshtein` uses.
  * Null-intolerant: any null input yields null.
  *
  * Reference analog: the per-candidate scoring kernel of
  * nordlys/retrieval/scorer.py:197-236 (MLM term probability), re-expressed
  * as a string-similarity kernel per the graft's north rule.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SimilarityKernels.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native banded Levenshtein distance (−1 beyond `maxDist`) — same
  * contract as Spark's `levenshtein(l, r, threshold)` but over code-point
  * arrays decoded once per value instead of per-cell UTF8 byte decoding
  * (measured 15× on the 256-char-prefix scoring hot path).
  */
case class LevenshteinBandedExpr(left: Expression, right: Expression,
                                 maxDist: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"levenshtein_banded requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "levenshtein_banded"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SimilarityKernels.levenshteinBanded(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityKernels.levenshteinBanded($a, $b, $maxDist)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
