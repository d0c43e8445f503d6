package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.JaroWinklerExpr

/** Catalyst integration:
  *  - `jaro_winkler` as a SQL function (usable from `spark.sql(...)`)
  *  - [[JaroWinklerLengthPrune]], an optimizer rule that strengthens
  *    `jaro_winkler(a, b) >= τ` filters (τ > 0.8) with a cheap length-ratio
  *    prefilter, so the O(|a|·|b|) kernel short-circuits on obviously
  *    dissimilar pairs — the Spark-native version of the reference's
  *    threshold pushdown into candidate generation
  *    (nordlys/erd/query/query.py:249-256).
  *
  * Install either via config (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * or post-hoc on a live session with [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.jaroWinklerFunction)
    e.injectOptimizerRule(_ => JaroWinklerLengthPrune)
  }
}

object GraftExtensions {
  private[plans] val jaroWinklerFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo("graft.functions.JaroWinklerExpr", null, "jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings in [0,1].",
        "", "", "", "string_funcs", "", "", "built-in"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaro_winkler requires exactly 2 arguments")
        JaroWinklerExpr(children.head, children(1))
      })

  /** Post-hoc install on an existing session (extensions config only takes
    * effect at session construction). Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftinternal.Internals.registerFunction(
      spark, "jaro_winkler", jaroWinklerFunction._3)
    if (!spark.experimental.extraOptimizations.contains(JaroWinklerLengthPrune)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaroWinklerLengthPrune
    }
  }
}

/** For `jw(a,b) ≥ τ`: jw ≤ 0.8 + 0.2·(min(len)/max(len)) (from
  * jaro ≤ (2 + min/max)/3 and the ≤0.4·(1−jaro) Winkler boost), hence
  * jw ≥ τ ⟹ min(len) ≥ (5τ−4)·max(len). The added conjunct is cheap
  * (two lengths) and Catalyst's And short-circuits the expensive kernel.
  * Guarded for idempotence — the rule runs inside a fixed-point batch.
  */
object JaroWinklerLengthPrune extends Rule[LogicalPlan] {

  private def boundFor(jw: JaroWinklerExpr, tau: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Length(jw.left), Length(jw.right))), DoubleType),
      Multiply(
        Cast(Greatest(Seq(Length(jw.left), Length(jw.right))), DoubleType),
        Literal(5 * tau - 4)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      // canonical children of length-bounds already present in this filter
      val existing: Set[Expression] = cond.collect {
        case GreaterThanOrEqual(c: Cast, _) => c.child match {
          case Least(Seq(Length(a), Length(b))) => Some(And(a, b).canonicalized)
          case _ => None
        }
      }.flatten.toSet
      val newCond = cond.transformUp {
        case geq @ GreaterThanOrEqual(jw: JaroWinklerExpr, Literal(tau: Double, DoubleType))
            if tau > 0.8 && !existing.contains(And(jw.left, jw.right).canonicalized) =>
          And(boundFor(jw, tau), geq)
      }
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
  }
}
