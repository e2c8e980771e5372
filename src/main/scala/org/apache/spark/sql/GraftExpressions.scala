package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 routes Column construction through ColumnNodes and keeps the
  * classic converters `private[sql]`; extension libraries bridge from
  * inside the package — the standard pattern for custom expressions. */
object GraftExpressions {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (for graft's native
    * operators, e.g. the broadcast as-of join) — `Dataset.ofRows` is
    * `private[sql]`, bridged here like the converters above. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Append a planner strategy per-session (idempotent) — the runtime twin
    * of `SparkSessionExtensions.injectPlannerStrategy`. */
  def addStrategy(spark: SparkSession,
                  s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Register graft's native expressions as SQL functions on a session, so
    * `spark.sql("SELECT minhash_sig(hs, 16)")` works alongside the Column
    * API (the FunctionRegistry lives behind sessionState — reachable from
    * this package, which is why registration sits here). Idempotent. */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    graft.functions.GraftFunctionSet.all.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
