package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension installing the engine's native Catalyst functions and
  * optimizer rules. Activate with `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    functions.F.injections.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => functions.Md5PrefixStrengthReduction)
    e.injectPlannerStrategy(_ => plans.AsOfStrategy)
  }
}
