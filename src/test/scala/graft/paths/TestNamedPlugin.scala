package graft.paths

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

/** Class-loadable plugin fixture whose template prefix (`tn`) differs from
  * its class name — exercises `PathFormatterPlugin.prefixNames` resolving
  * config class names to instance names for validation.
  */
class TestNamedPlugin extends PathFormatterPlugin {
  val name = "tn"
  override def enrich(records: DataFrame): DataFrame = records
  override def param(contents: String): Option[Column] = Some(lit(s"tn-$contents"))
}
