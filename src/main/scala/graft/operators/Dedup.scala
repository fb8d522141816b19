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
    val rowStruct = struct(df.columns.toSeq.map(n => col(graft.model.Flatten.quote(n))): _*)
    val pick = if (last) max_by(rowStruct, pos) else min_by(rowStruct, pos)
    val agged = df.groupBy(keys: _*).agg(pick.as("__row"))
    agged.select(df.columns.toSeq.map(n =>
      col("`__row`." + graft.model.Flatten.quote(n)).as(n)): _*)
  }

  /** Keep the row with the greatest `pos` per key; ties broken arbitrarily
    * (positions are unique in intended use).
    */
  def keepLast(df: DataFrame, keys: Seq[Column], pos: Column): DataFrame =
    argBy(df, keys, pos, last = true)

  /** Keep the row with the least `pos` per key. */
  def keepFirst(df: DataFrame, keys: Seq[Column], pos: Column): DataFrame =
    argBy(df, keys, pos, last = false)

  /** Incremental exact dedup against a large history WITHOUT joining the
    * history per batch: survivors of `batch` whose `keyCol` does not occur
    * in `history`, computed the Bloom-guarded way —
    *
    *  1. ONE aggregation folds the history keys into a Bloom filter
    *     (Spark's `BloomFilterAggregate` — map-side partial filters merge
    *     before a single-row shuffle; the digest is `numBits/8` bytes,
    *     ~1.2 MB for the 1M-item/3% default, independent of history width);
    *  2. the batch probes the digest ROW-LOCALLY (`BloomFilterMightContain`
    *     over the filter as a plan literal — no shuffle, no broadcast join,
    *     stays inside whole-stage codegen): definite-new rows (filter says
    *     "absent", which is never wrong) pass through untouched;
    *  3. only the might-contain HITS — true duplicates plus the fpp share
    *     of the batch — anti-join the history for the exact verdict, so
    *     the only shuffle of history keys is semi-join-pruned to the hit
    *     set.
    *
    * Result is EXACT (the filter only short-circuits definite-news); fpp
    * trades digest size against verify-join volume. At 100 TB the digest
    * re-derives per batch from one linear history scan, or is persisted
    * and re-used across batches by the caller (the filter is mergeable).
    *
    * Sizing: `expectedItems = 0` (the default) measures the history key
    * count with one metadata-cheap count — the number a real incremental
    * pipeline tracks anyway — and sizes the digest to `max(100k, count)`;
    * pass an explicit positive value to skip that action (e.g. when the
    * caller already knows the cardinality). An undersized filter degrades
    * fpp (more verify volume), never correctness. `numBits` is capped by
    * Spark's `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
    * (default 8 MB).
    *
    * CONTRACT: this operator is EAGER — merely CONSTRUCTING the returned
    * frame runs Spark jobs on the driver (the sizing count when auto-sized,
    * and always the one-row digest aggregation collected as a plan
    * literal). It is not a free plan-builder like the other operators.
    */
  def bloomDedupAgainst(history: DataFrame, batch: DataFrame, keyCol: String,
      expectedItems: Long = 0L, fpp: Double = 0.03): DataFrame = {
    import graft.functions.GraftExpressions
    require(expectedItems >= 0 && fpp > 0 && fpp < 1,
      s"expectedItems=$expectedItems, fpp=$fpp out of range")
    GraftExpressions.register(history.sparkSession)
    val sizedItems =
      if (expectedItems > 0) expectedItems
      else math.max(100000L, history.select(col(keyCol)).count())
    val numBits = math.ceil(
      -sizedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val digest = Scale.widen(history).select(col(keyCol))
      .agg(GraftExpressions.bloomAgg(col(keyCol), sizedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    // null digest = empty history: everything in the batch is new
    if (digest == null) return batch
    val mightContain = GraftExpressions.bloomMightContain(lit(digest), col(keyCol))
    val definiteNew = batch.filter(!mightContain)
    val hits = batch.filter(mightContain)
    val verified = hits.join(
      history.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definiteNew.unionByName(verified)
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
    keys.map(n => col(graft.model.Flatten.quote(n)))
  }
}
