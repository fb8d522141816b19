package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal joins Spark has no native operator for, each expressed as a
  * shuffle-bounded composition instead of a range/cross join:
  *
  *  - [[asofJoin]]: most-recent-match join (DuckDB `ASOF JOIN`, kdb `aj`) —
  *    the union-tag-window shape: both sides shuffle ONCE on the key, one
  *    sort per partition, a running `last(ignoreNulls)` propagates the
  *    latest right payload to every left row. No join node at all, so
  *    there is no candidate-pair blow-up for hot keys and no range
  *    predicate the optimizer would turn into a nested-loop join.
  *  - [[rangeJoin]]: point-in-interval join via bounded bucket explosion —
  *    each interval replicates to its ⌈len/width⌉ covering buckets, points
  *    map to exactly one bucket, and the match becomes an equi-join on
  *    (keys, bucket) plus an exact residual filter. Work scales with
  *    |intervals|·len/width + |points|, never |points|·|intervals|.
  */
object TemporalJoin {

  /** For each left row: the single most recent right row with the same
    * `keys` and `rightTime` ≤ `leftTime` (ties at equal time, or between
    * duplicate right timestamps, resolve to the greatest `payload` struct —
    * deterministic). `payload` columns are appended with their right-side
    * names (must not collide with left columns). `inner = false` keeps
    * unmatched left rows with null payload. `tolerance` (same unit as the
    * time columns) rejects matches staler than `leftTime - tolerance` —
    * the match becomes null/dropped, like kdb's `wj`/pandas `merge_asof`
    * tolerance.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      inner: Boolean = true, tolerance: Option[Long] = None): DataFrame =
    asofJoinImpl(left, right, keys, leftTime, rightTime, payload, inner, tolerance,
      forward = false)

  /** merge_asof `direction="forward"`: the EARLIEST right row with
    * `rightTime` ≥ `leftTime` (equal times match). Same plan shape —
    * implemented by running the backward join over negated numeric times,
    * so the tolerance bound becomes `rightTime - leftTime ≤ tolerance`.
    * Time columns must be numeric (epoch micros etc.).
    */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      inner: Boolean = true, tolerance: Option[Long] = None): DataFrame =
    asofJoinImpl(left, right, keys, leftTime, rightTime, payload, inner, tolerance,
      forward = true)

  private def asofJoinImpl(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      inner: Boolean, tolerance: Option[Long], forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val collide = payload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with left columns: $collide")
    val reserved = Set("__t", "__tag", "__rp", "__m").intersect(left.columns.toSet)
    require(reserved.isEmpty, s"left columns collide with internal names: $reserved")
    require(!payload.contains("__rt"), "payload column name __rt is reserved")
    val lCols = left.columns.toSeq
    // a NULL right time can never satisfy time <= leftTime (ASOF's >= is
    // false on NULL) — and unfiltered it would sort FIRST in the window and
    // become a spurious baseline match for every left row. Likewise a NULL
    // key never equals anything in SQL/DuckDB ASOF semantics, but the window
    // partitioning would group NULL keys together and match them — so
    // NULL-key right rows are dropped (NULL-key left rows then partition
    // with no right rows and correctly resolve to no match)
    // forward direction = backward over negated (numeric) times
    def dir(c: org.apache.spark.sql.Column) = if (forward) -c else c
    // the right time travels inside the payload struct (first field) so a
    // tolerance bound can be checked after the running-last match resolves
    val rightNonNull = keys.foldLeft(col(rightTime).isNotNull)((acc, k) => acc && col(k).isNotNull)
    val rSel = right.filter(rightNonNull).select(
      keys.map(col) ++ Seq(dir(col(rightTime)).as("__t"), lit(0).as("__tag"),
        struct((col(rightTime).as("__rt") +: payload.map(col)): _*).as("__rp")): _*)
    val lSel = left.withColumn("__t", dir(col(leftTime))).withColumn("__tag", lit(1))
    // union by name: the right side carries null left columns and vice versa.
    // right rows (__tag 0) sort before left rows at equal time → equal
    // timestamps match, like ASOF's >=; __rp last in the order makes the
    // duplicate-right-timestamp winner the greatest payload struct
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = lSel.unionByName(rSel, allowMissingColumns = true)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    // staler-than-tolerance matches become non-matches (null payload)
    val gap = if (forward) col("__m.__rt") - col(leftTime)
              else col(leftTime) - col("__m.__rt")
    val matched = tolerance.fold(matched0)(tol => matched0.withColumn("__m",
      when(gap <= tol, col("__m"))))
    val kept = if (inner) matched.filter(col("__m").isNotNull) else matched
    kept.select(lCols.map(col) ++ payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Inner join of `points` to every interval of `intervals` containing
    * them: same `keys`, `startCol` ≤ `pointTime` < `endCol` (half-open).
    * Time columns must be integral (e.g. epoch micros); `bucketWidth` is in
    * the same unit and bounds the replication factor to
    * ⌈interval-length / bucketWidth⌉ + 1 rows per interval. Every matching
    * (point, interval) pair meets in EXACTLY one bucket (the point's own),
    * so no dedup is needed. All columns from both frames are kept; name
    * collisions beyond `keys` are the caller's to avoid.
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTime: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "input columns collide with the internal bucket column __b")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast(LongType)
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(
        bucketOf(col(startCol)), bucketOf(col(endCol) - lit(1L)))))
    val pt = points.withColumn("__b", bucketOf(col(pointTime)))
    pt.join(iv, keys :+ "__b")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__b")
  }
}
