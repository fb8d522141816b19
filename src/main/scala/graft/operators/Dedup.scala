package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row deduplication with the reference's two asymmetric semantics:
  *
  *  - CSV dedup: distinct-by-projected-fields, keep-LAST occurrence, output
  *    ordered by position of the surviving (last) occurrence
  *    (format/CsvAvroConverterFactory.kt:30-86).
  *  - Generic/JSON dedup: whole-row, keep-FIRST occurrence, original order
  *    (format/RecordConverterFactory.kt:63-92).
  *
  * Keep-last/first is an argmax/argmin reduction, so both run as a single
  * hash aggregation with `max_by`/`min_by` — the map-side PARTIAL combine
  * collapses duplicates before the shuffle, so shuffle volume is
  * |distinct keys| per task and a hot key (skewed duplicate cluster) never
  * concentrates its rows in one partition the way a Window sort would. NOT
  * `dropDuplicates` (which keeps an arbitrary first and would not give
  * keep-last).
  */
object Dedup {

  private def argBy(df: DataFrame, keys: Seq[Column], pos: Column, last: Boolean): DataFrame = {
    val rowStruct = struct(df.columns.toSeq.map(n => col("`" + n.replace("`", "``") + "`")): _*)
    val pick = if (last) max_by(rowStruct, pos) else min_by(rowStruct, pos)
    val agged = df.groupBy(keys: _*).agg(pick.as("__row"))
    agged.select(df.columns.toSeq.map(n =>
      col("`__row`.`" + n.replace("`", "``") + "`").as(n)): _*)
  }

  /** Keep the row with the greatest `pos` per key; ties broken arbitrarily
    * (positions are unique in intended use).
    */
  def keepLast(df: DataFrame, keys: Seq[Column], pos: Column): DataFrame =
    argBy(df, keys, pos, last = true)

  /** Keep the row with the least `pos` per key. */
  def keepFirst(df: DataFrame, keys: Seq[Column], pos: Column): DataFrame =
    argBy(df, keys, pos, last = false)

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
