package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: in front of every top-level `levenshtein(a, b) ≤ k`
  * filter conjunct, plant the FREE lower bound
  * `abs(length(a) − length(b)) ≤ k` — valid because edit distance can never
  * be less than the length difference, so the rewrite is
  * semantics-preserving (null flows match too: either predicate is null
  * exactly when a or b is null, and Filter treats null as false either
  * way). The bound is O(1) per row while the Levenshtein DP is
  * O(|a|·|b|); `And` short-circuits in codegen, so candidate pairs from a
  * blocked ER join ([[graft.queries.Relational.qFuzzyJoin]]) skip the DP
  * whenever lengths already disagree by more than k — at 100 TB that is
  * most of them.
  *
  * The rule is a plain `Rule[LogicalPlan]` registered two ways: injected
  * cluster-wide via [[graft.functions.GraftSparkExtensions]]
  * (`injectOptimizerRule`), or per-session via [[install]]
  * (`experimental.extraOptimizations`, which Spark runs AFTER the main
  * optimizer batches — by then alias-collapsing has inlined the
  * Levenshtein call into the Filter, which is exactly the shape matched).
  * Idempotent: a bound that is already a conjunct (semantically) is not
  * added again, so fixed-point re-runs are stable. */
object LevenshteinLengthBound extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** The length-difference bound for one matched comparison; only fires on
    * deterministic inputs (duplicating a nondeterministic expression would
    * double-evaluate it) and an IntegerType threshold (post-analysis
    * insertions must already be type-correct — no implicit casts here). */
  private def boundOf(c: Expression): Option[Expression] = c match {
    case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.deterministic =>
      Some(LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k))
    case LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.deterministic =>
      Some(LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), k))
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev: Levenshtein)
        if lev.deterministic =>
      Some(LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k))
    case GreaterThan(k @ Literal(_, IntegerType), lev: Levenshtein)
        if lev.deterministic =>
      Some(LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), k))
    case _ => None
  }

  /** Bounds-first rewrite of one predicate tree, or None if nothing new.
    * Only TOP-LEVEL conjuncts are considered: a bound hoisted out of an OR
    * branch would wrongly constrain the other branch. */
  private def rewrite(cond: Expression): Option[Expression] = {
    val cs = conjuncts(cond)
    val add = cs.flatMap(boundOf)
      .filterNot(b => cs.exists(_.semanticEquals(b)))
    if (add.isEmpty) None
    else Some(add.foldRight(cond)((b, acc) => And(b, acc)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      rewrite(cond).map(c => f.copy(condition = c)).getOrElse(f)
    // predicate pushdown moves the verify comparison INTO the join
    // condition of a blocked ER self-join — the hot place for the bound
    case j: Join if j.condition.isDefined =>
      rewrite(j.condition.get).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  /** Per-session installation (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
