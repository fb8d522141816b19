package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row deduplication with the reference's two asymmetric semantics:
  *
  *  - CSV dedup: distinct-by-projected-fields, keep-LAST occurrence, output
  *    ordered by position of the surviving (last) occurrence
  *    (format/CsvAvroConverterFactory.kt:30-86).
  *  - Generic/JSON dedup: whole-row, keep-FIRST occurrence, original order
  *    (format/RecordConverterFactory.kt:63-92).
  *
  * Both are a single hash-shuffle on the key projection (Window +
  * row_number) — fully distributed, no driver state, AQE-sizable. NOT
  * `dropDuplicates` (which keeps an arbitrary first and would not give
  * keep-last).
  */
object Dedup {

  /** Keep the row with the greatest `pos` per key; ties broken arbitrarily
    * (positions are unique in intended use).
    */
  def keepLast(df: DataFrame, keys: Seq[Column], pos: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(pos.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep the row with the least `pos` per key. */
  def keepFirst(df: DataFrame, keys: Seq[Column], pos: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(pos.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The reference's key-projection rule (format/CsvAvroConverterFactory.kt:
    * 203-221): use `distinctFields` if all are present in the frame, else the
    * complement of `ignoreFields`, else all columns.
    */
  def keyColumns(df: DataFrame, distinctFields: Set[String], ignoreFields: Set[String]): Seq[Column] = {
    val names = df.columns.toSeq
    val keys =
      if (distinctFields.nonEmpty && distinctFields.subsetOf(names.toSet)) names.filter(distinctFields)
      else if (ignoreFields.nonEmpty) names.filterNot(ignoreFields)
      else names
    keys.map(n => col("`" + n.replace("`", "``") + "`"))
  }
}
