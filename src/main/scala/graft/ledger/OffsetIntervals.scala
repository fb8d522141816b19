package graft.ledger

import java.time.Instant
import scala.collection.mutable.ArrayBuffer

/** Sorted, merged offset-interval set for one (topic, partition) — the
  * exactly-once ledger state of the reference
  * (accounting/OffsetIntervals.kt:6-206, OffsetRangeSet.kt:27-80),
  * re-implemented from its observable semantics:
  *
  *  - `add` inserts an [from,to] range and merges adjacent/overlapping
  *    intervals (adjacent = gap of exactly 1); `lastProcessed` of a merged
  *    interval is the max of the inputs.
  *  - `contains(range, lastModified)` is true iff the range is covered by a
  *    single interval AND that interval's `lastProcessed >= lastModified`
  *    (a re-uploaded source file must be reprocessed).
  *  - `remove` cuts [from,to] back out (cleaner rollback), splitting an
  *    enclosing interval in two.
  *
  * State stays O(number of gaps), which is what keeps a 100 TB backlog's
  * ledger driver-resident. Interval endpoints are kept in sorted order;
  * operations use binary search.
  */
final class OffsetIntervals {
  private val froms = ArrayBuffer.empty[Long]
  private val tos = ArrayBuffer.empty[Long]
  private val lastProcessed = ArrayBuffer.empty[Instant]

  def size: Int = froms.length
  def isEmpty: Boolean = froms.isEmpty

  def intervals: Seq[(Long, Long, Instant)] =
    froms.indices.map(i => (froms(i), tos(i), lastProcessed(i)))

  /** Index of the last interval with from <= x, or -1. */
  private def searchFrom(x: Long): Int = {
    var lo = 0; var hi = froms.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (froms(mid) <= x) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  def add(from: Long, to: Long, processed: Instant): Unit = {
    require(from <= to, s"invalid range [$from,$to]")
    // find all intervals overlapping or adjacent to [from-1, to+1]
    var i = searchFrom(to + 1)
    // walk left to the first interval that touches
    var firstTouch = -1
    var j = i
    while (j >= 0 && tos(j) >= from - 1) { firstTouch = j; j -= 1 }
    if (firstTouch == -1) {
      // no overlap: insert after i
      val at = i + 1
      froms.insert(at, from); tos.insert(at, to); lastProcessed.insert(at, processed)
    } else {
      val mergedFrom = math.min(froms(firstTouch), from)
      val mergedTo = math.max(tos(i), to)
      var mergedLp = processed
      var k = firstTouch
      while (k <= i) {
        if (lastProcessed(k).isAfter(mergedLp)) mergedLp = lastProcessed(k)
        k += 1
      }
      froms.remove(firstTouch + 1, i - firstTouch)
      tos.remove(firstTouch + 1, i - firstTouch)
      lastProcessed.remove(firstTouch + 1, i - firstTouch)
      froms(firstTouch) = mergedFrom
      tos(firstTouch) = mergedTo
      lastProcessed(firstTouch) = mergedLp
    }
  }

  def contains(from: Long, to: Long, lastModified: Instant): Boolean = {
    val i = searchFrom(from)
    i >= 0 && tos(i) >= to && !lastProcessed(i).isBefore(lastModified)
  }

  def contains(offset: Long, lastModified: Instant): Boolean =
    contains(offset, offset, lastModified)

  /** Sub-ranges of `[from,to]` already covered by intervals whose
    * `lastProcessed >= lastModified` — the record-granular form of
    * [[contains]] (reference: the per-record seen-offset filter,
    * worker/RestructureWorker.kt:137-149). Clamped to `[from,to]`, sorted,
    * non-overlapping. A partially-covered file re-extracts ONLY the
    * uncovered spans (cleaner rollback, reference-ledger migration).
    */
  def covered(from: Long, to: Long, lastModified: Instant): Seq[(Long, Long)] = {
    val out = ArrayBuffer.empty[(Long, Long)]
    var i = math.max(searchFrom(from), 0)
    while (i < froms.length && froms(i) <= to) {
      if (tos(i) >= from && !lastProcessed(i).isBefore(lastModified))
        out += ((math.max(froms(i), from), math.min(tos(i), to)))
      i += 1
    }
    out.toSeq
  }

  def remove(from: Long, to: Long): Unit = {
    var i = searchFrom(to)
    while (i >= 0 && tos(i) >= from) {
      val f = froms(i); val t = tos(i); val lp = lastProcessed(i)
      if (f >= from && t <= to) {
        // fully covered → drop
        froms.remove(i); tos.remove(i); lastProcessed.remove(i)
      } else if (f < from && t > to) {
        // enclosing → split
        tos(i) = from - 1
        froms.insert(i + 1, to + 1); tos.insert(i + 1, t); lastProcessed.insert(i + 1, lp)
      } else if (f < from) {
        tos(i) = from - 1
      } else { // t > to
        froms(i) = to + 1
      }
      i -= 1
    }
  }
}
