package graft.plans

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: install graft's native expressions
  * at session build time —
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *     // or: .withExtensions(new GraftExtensions)
  * }}}
  *
  * This is the deployment path for a shared cluster (functions available to
  * every session, SQL included); [[graft.functions.GraftFunctions.register]]
  * remains the runtime path for sessions graft does not build. Both consume
  * [[GraftFunctions.all]], so the two registration paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // whole-operator extension: plans TopKPerKeyNode as the bounded-heap
    // physical operator (see graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
