package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite exact `count(DISTINCT x)` into an
  * HyperLogLog++ sketch when the aggregate's input is large enough that the
  * exact distinct shuffle is the bottleneck — SURVEY §4's "exact→approx RI
  * rewrite above a size threshold" realized as a `Rule[LogicalPlan]`.
  *
  * The reference sizes its sampling adaptively from row counts
  * (data_relationship_tester.py:328-358); this is the same cost-based idea
  * applied inside the optimizer: the QUERY stays exact-looking, the PLAN
  * degrades gracefully to a sketch at scale. Off by default; opt in with
  *
  *   spark.graft.approxDistinct.enabled=true
  *   spark.graft.approxDistinct.minInputBytes=<threshold, default 1 GiB>
  *   spark.graft.approxDistinct.rsd=<relative error, default 0.023>
  *
  * The rewrite keeps each AggregateExpression's resultId, so downstream
  * attribute references (and column names) are untouched. Distinct counts
  * over multiple columns are left alone (HLL++ is single-child).
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.approxDistinct.enabled", "false").toBoolean
  private def minBytes: BigInt =
    BigInt(spark.conf.get("spark.graft.approxDistinct.minInputBytes", (1L << 30).toString))
  private def rsd: Double =
    spark.conf.get("spark.graft.approxDistinct.rsd", "0.023").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate if agg.child.stats.sizeInBytes >= minBytes =>
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case AggregateExpression(c: Count, mode, true, filter, rid)
                if c.children.size == 1 =>
              AggregateExpression(
                HyperLogLogPlusPlus(c.children.head, rsd), mode, isDistinct = false,
                filter, rid)
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = rewritten)
    }
}

/** Session extensions entry point (`spark.sql.extensions=graft.plans
  * .GraftExtensions`): injects the approx-distinct optimizer rule and the
  * native `graft_dot` expression into SQL — the full custom-plan surface
  * (brief's preference order (c): Rule + extension registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(ApproxDistinctRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => graft.functions.DotProduct(exprs(0), exprs(1))))
    // text/dedup scalar surface: same Column trees as the DataFrame API
    graft.functions.TextFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextFunctions", name),
        builder))
    }
    // native one-pass text expressions (hot-path twins of the HOF builds)
    val natives: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "graft_repstats" ->
        ((exprs: Seq[Expression]) => graft.functions.RepetitionStats(exprs.head)),
      "graft_chartristats" ->
        ((exprs: Seq[Expression]) => graft.functions.CharTrigramStats(exprs.head)),
      "graft_ngrams" -> ((exprs: Seq[Expression]) =>
        graft.functions.WordNGrams(exprs.head, exprs(1).eval().asInstanceOf[Int])),
      "graft_shingles" -> ((exprs: Seq[Expression]) =>
        graft.functions.WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    natives.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextNativeFunctions", name),
        builder))
    }
  }
}
