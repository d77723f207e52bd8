package graft.plans

import graft.functions.{DotQ, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  * remains the runtime path for sessions graft does not build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot_q"),
      info("graft_dot_q", classOf[DotQ]),
      (children: Seq[Expression]) => DotQ(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", classOf[RollingHash]),
      (children: Seq[Expression]) => RollingHash(children.head)))
  }
}
