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
    * Sizing: `expectedItems = 0` (the default) sizes the digest WITHOUT a
    * separate counting pass — the ONE digest aggregation carries
    * `count(keyCol)` alongside the Bloom partials (both map-side-combine
    * into the same single-row exchange), built at [[AutoSizeCapacity]]
    * capacity. Histories at or under the capacity are done in that one
    * linear scan; a history whose measured count overflows it rebuilds the
    * digest exactly-sized in a second pass (those histories paid
    * count + build = two scans before this fusion too, so the fused path
    * is never worse and saves a full history scan in the common case).
    * A TINY history (≤ capacity/32 keys) also rebuilds exactly-sized —
    * the second scan is near-free at that cardinality and it keeps a
    * bounded-small-history caller from shipping a 228 KB capacity digest
    * per batch forever.
    * Pass an explicit positive value to pin the size (e.g. when the caller
    * already tracks the cardinality). An undersized filter degrades fpp
    * (more verify volume), never correctness. `numBits` is capped by
    * Spark's `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
    * (default 8 MB).
    *
    * CONTRACT: this operator is EAGER — merely CONSTRUCTING the returned
    * frame runs a Spark job on the driver (the one-row digest aggregation
    * collected as a plan literal; a second one only for auto-sized
    * histories beyond [[AutoSizeCapacity]]). It is not a free plan-builder
    * like the other operators.
    */
  def bloomDedupAgainst(history: DataFrame, batch: DataFrame, keyCol: String,
      expectedItems: Long = 0L, fpp: Double = 0.03): DataFrame = {
    import graft.functions.GraftExpressions
    require(expectedItems >= 0 && fpp > 0 && fpp < 1,
      s"expectedItems=$expectedItems, fpp=$fpp out of range")
    GraftExpressions.register(history.sparkSession)
    def numBitsFor(items: Long): Long = math.ceil(
      -items * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // NO Scale.widen here: the digest aggregation is one linear hash pass
    // whose parallelism follows the scan's natural splits — at 100 TB those
    // are ample, and at small scale the pass is sub-second single-core.
    // widen's partition-count peek compiles a full physical plan per call
    // (measured ~0.3 s of pure driver overhead on this sub-second operator).
    def build(items: Long): Array[Byte] =
      history.select(col(keyCol))
        .agg(GraftExpressions.bloomAgg(col(keyCol), items, numBitsFor(items)).as("bf"))
        .head().getAs[Array[Byte]](0)
    val digest =
      if (expectedItems > 0) build(expectedItems)
      else {
        // fused sizing: count rides the digest aggregation's own scan
        val row = history.select(col(keyCol))
          .agg(
            GraftExpressions.bloomAgg(
              col(keyCol), AutoSizeCapacity, numBitsFor(AutoSizeCapacity)).as("bf"),
            count(col(keyCol)).as("__n"))
          .head()
        val n = row.getLong(1)
        // TINY histories (≤ capacity/32 = 8k keys) rebuild exactly-sized:
        // the capacity digest is ~228 KB regardless of n, and for a caller
        // probing against a small bounded history every batch that literal
        // (and every map-side partial of any later re-derivation) stays
        // 30× larger than needed forever. The rebuild's second scan is
        // over ≤8k rows — microseconds of work against one job's ~50 ms
        // scheduling floor, paid only while the history is actually tiny.
        // Between 8k and capacity the one-pass digest is kept as built
        // (better-than-target fpp, no second job).
        if (n > AutoSizeCapacity || (n > 0 && n <= AutoSizeCapacity / 32))
          build(math.max(n, 1024L))
        else row.getAs[Array[Byte]](0)
      }
    // null digest = empty history: everything in the batch is new
    if (digest == null) return batch
    val mightContain = GraftExpressions.bloomMightContain(lit(digest), col(keyCol))
    val definiteNew = batch.filter(!mightContain)
    val hits = batch.filter(mightContain)
    // NO pre-distinct on the history side: an anti join's verdict ignores
    // build-side duplicates, an incremental-dedup history is near-unique by
    // construction (appended batch survivors), and the distinct is a full
    // extra hash-aggregate over the biggest table in the plan — measured 2×
    // the verify-join wall at 10× sf0.1. (A caller with a mass-duplicate
    // history trades slightly higher join-shuffle volume, never wrongness.)
    val verified = hits.join(
      history.select(col(keyCol)), Seq(keyCol), "left_anti")
    definiteNew.unionByName(verified)
  }

  /** Auto-size capacity of the fused one-pass sizing in
    * [[bloomDedupAgainst]]: 256k items ≈ a 228 KB digest at the default 3%
    * fpp. The digest aggregate allocates its FULL bitmap in every map-side
    * partial, so capacity is also the per-partial exchange weight (32
    * partials × 228 KB ≈ 7 MB — a 1M capacity measured ~2× the one-pass
    * agg wall from the 29 MB partial merge alone). Under-capacity
    * histories get BETTER than the target fpp (same bits, fewer items);
    * over-capacity ones rebuild exactly-sized in a second pass — the same
    * two scans the pre-fusion formulation always paid.
    */
  val AutoSizeCapacity: Long = 1L << 18

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
