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
      new ExpressionInfo(classOf[GraftExpressions.type].getName, name, usage, "", "")
    ext.injectFunction((FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", "polynomial rolling hash over UTF-8 bytes"),
      es => GraftExpressions.RollingHash(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit SimHash over an array of token strings"),
      es => GraftExpressions.SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "strict sequential dot product of two numeric arrays"),
      es => GraftExpressions.DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "strict sequential squared L2 distance of two numeric arrays"),
      es => GraftExpressions.L2Squared(es(0), es(1))))
  }
}
