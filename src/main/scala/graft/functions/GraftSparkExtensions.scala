package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Deployment hook: `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * registers graft's native SQL functions, optimizer rule, and planner
  * strategy on every session the cluster builds. The function list is
  * [[GraftFunctionSet.all]] — the same one the imperative per-session
  * `GraftExpressions.registerFunctions` consumes, so the two registration
  * sites cannot drift. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => graft.plans.LevenshteinLengthBound)
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    GraftFunctionSet.all.foreach(extensions.injectFunction)
  }
}
