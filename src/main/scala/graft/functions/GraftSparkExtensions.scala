package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point: makes every graft scalar function
  * available in plain SQL on any session built with
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftSparkExtensions
  * }}}
  *
  * (the injection-based analog of [[GraftExpressions.register]], which
  * registers on an already-built session). Both register the same
  * expressions; this form survives session cloning and works from
  * spark-sql/JDBC where no driver code runs.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExpressions.type].getName, "", name,
        s"_FUNC_: $usage", "", "", "", "", "", "", "built-in")
    // the COMPLETE function list, shared with GraftExpressions.register so
    // the spark-sql/JDBC path can never lag the driver-side registry
    GraftExpressions.sqlFunctions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}
