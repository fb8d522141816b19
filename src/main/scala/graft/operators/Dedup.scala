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
    * linear scan, then the digest is FOLDED down to the measured
    * cardinality's size driver-side ([[foldDigest]] — bit-exact equivalent
    * to a direct exact-size build, no second scan), so a small bounded
    * history never ships the 256 KB capacity bitmap as its per-plan
    * literal. A history whose measured count overflows the capacity
    * rebuilds the digest exactly-sized in a second pass (those histories
    * paid count + build = two scans before this fusion too, so the fused
    * path is never worse and saves a full history scan in the common
    * case).
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
        // fused sizing: count rides the digest aggregation's own scan.
        // The capacity build uses a POWER-OF-TWO bit count (≥ the fpp
        // formula's size) so the measured-n digest can then be FOLDED down
        // to exact size driver-side — zero extra scan, zero extra job.
        val capBits = nextPow2(numBitsFor(AutoSizeCapacity))
        val row = history.select(col(keyCol))
          .agg(
            GraftExpressions.bloomAgg(col(keyCol), AutoSizeCapacity, capBits).as("bf"),
            count(col(keyCol)).as("__n"))
          .head()
        val n = row.getLong(1)
        // over-capacity: rebuild exactly-sized in a second pass (the same
        // two scans the pre-fusion formulation always paid). At or under
        // capacity: fold the capacity digest in half until it reaches the
        // measured cardinality's size — a 3k-key history's plan literal is
        // then ~4 KB instead of the 256 KB capacity bitmap, without the
        // second job a rebuild would schedule per batch forever on a
        // bounded-small-history caller.
        if (n > AutoSizeCapacity) build(n)
        else if (n == 0) row.getAs[Array[Byte]](0)
        else foldDigest(row.getAs[Array[Byte]](0), numBitsFor(n))
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
    * [[bloomDedupAgainst]]: 256k items ≈ a 256 KB (2²¹-bit, power-of-two
    * for foldability) digest at the default 3% fpp. The digest aggregate
    * allocates its FULL bitmap in every map-side partial, so capacity is
    * also the per-partial exchange weight (32 partials × 256 KB ≈ 8 MB —
    * a 1M capacity measured ~2× the one-pass agg wall from the 29 MB
    * partial merge alone). Under-capacity histories FOLD the digest down
    * to the measured cardinality's size ([[foldDigest]]); over-capacity
    * ones rebuild exactly-sized in a second pass — the same two scans the
    * pre-fusion formulation always paid.
    */
  val AutoSizeCapacity: Long = 1L << 18

  private def nextPow2(x: Long): Long =
    java.lang.Long.highestOneBit(math.max(1L, x - 1)) << 1

  /** Shrink a Spark sketch `BloomFilterImpl` digest by OR-folding its bit
    * array in half until another halving would drop below `targetBits`.
    * Folding B → B/2 is BIT-EXACT equivalent to having built at B/2 with
    * the same hash count: a set bit at `h mod B` lands on `(h mod B) mod
    * (B/2) = h mod (B/2)`, which is exactly where a direct B/2 build would
    * set it — so no false negatives ever, and the false-positive rate is
    * the direct-build rate at the folded size — BOTH sketch versions index
    * bits as `hash % bitSize` (verified against the shipped
    * BloomFilterImpl/V2 bytecode). Serialized layouts handled: V1 (int
    * version, int numHashFunctions, int wordCount, longs) and V2 (same
    * plus an int seed before the word count), big-endian; any other
    * version is returned unchanged (correctness never depends on folding,
    * only literal size does).
    */
  private[operators] def foldDigest(digest: Array[Byte], targetBits: Long): Array[Byte] = {
    if (digest == null) return digest
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(digest))
    val version = in.readInt()
    if (version != 1 && version != 2) return digest
    val k = in.readInt()
    val seed = if (version == 2) Some(in.readInt()) else None
    val words = in.readInt()
    val data = new Array[Long](words)
    var i = 0
    while (i < words) { data(i) = in.readLong(); i += 1 }
    var w = words
    while (w % 2 == 0 && (w / 2) * 64L >= targetBits) {
      val half = w / 2
      var j = 0
      while (j < half) { data(j) |= data(j + half); j += 1 }
      w = half
    }
    if (w == words) return digest
    val bos = new java.io.ByteArrayOutputStream(16 + w * 8)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(version); out.writeInt(k)
    seed.foreach(out.writeInt)
    out.writeInt(w)
    var j = 0
    while (j < w) { out.writeLong(data(j)); j += 1 }
    out.flush()
    bos.toByteArray
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
