package graft.ledger

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Semantics ported from the reference's OffsetIntervalsTest and
  * OffsetRangeSetTest (accounting package, see SURVEY.md §5) — re-derived
  * cases, not copied code.
  */
class LedgerSpec extends AnyFunSuite {
  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private val t1 = Instant.parse("2026-01-02T00:00:00Z")

  test("add single offsets and merge adjacent") {
    val iv = new OffsetIntervals
    iv.add(1, 1, t0)
    iv.add(3, 3, t0)
    assert(iv.intervals.map(i => (i._1, i._2)) == Seq((1L, 1L), (3L, 3L)))
    iv.add(2, 2, t0) // bridges the gap
    assert(iv.intervals.map(i => (i._1, i._2)) == Seq((1L, 3L)))
  }

  test("overlapping ranges merge, lastProcessed max wins") {
    val iv = new OffsetIntervals
    iv.add(0, 10, t0)
    iv.add(5, 20, t1)
    assert(iv.intervals == Seq((0L, 20L, t1)))
    iv.add(25, 30, t0)
    assert(iv.size == 2)
  }

  test("contains requires full coverage and fresh lastProcessed") {
    val iv = new OffsetIntervals
    iv.add(0, 10, t0)
    assert(iv.contains(0, 10, t0))
    assert(iv.contains(3, 7, t0))
    assert(!iv.contains(5, 12, t0))   // not fully covered
    assert(!iv.contains(3, 7, t1))    // source modified after processing
    assert(!iv.contains(11, t0))
  }

  test("remove: exact, middle split, edges") {
    val iv = new OffsetIntervals
    iv.add(0, 10, t0)
    iv.remove(3, 5) // split
    assert(iv.intervals.map(i => (i._1, i._2)) == Seq((0L, 2L), (6L, 10L)))
    iv.remove(0, 2) // exact
    assert(iv.intervals.map(i => (i._1, i._2)) == Seq((6L, 10L)))
    iv.remove(9, 20) // right edge
    assert(iv.intervals.map(i => (i._1, i._2)) == Seq((6L, 8L)))
    iv.remove(0, 6) // left edge
    assert(iv.intervals.map(i => (i._1, i._2)) == Seq((7L, 8L)))
  }

  test("property: every added offset is contained; intervals stay sorted+disjoint") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val xs = List.fill(60)(rnd.nextLong(80))
      val iv = new OffsetIntervals
      xs.foreach(x => iv.add(x, x, t0))
      xs.foreach(x => assert(iv.contains(x, t0)))
      val is = iv.intervals
      is.sliding(2).foreach {
        case Seq((_, to1, _), (from2, _, _)) => assert(to1 + 1 < from2)
        case _ =>
      }
      // reference-set cross-check
      val expected = xs.toSet
      is.foreach { case (f, t, _) => (f to t).foreach(x => assert(expected.contains(x))) }
      assert(is.map { case (f, t, _) => t - f + 1 }.sum == expected.size)
    }
  }

  test("property: add is idempotent and order-independent on interval shape") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val rs = List.fill(25) { val a = rnd.nextLong(100); (a, a + rnd.nextLong(10)) }
      val iv1 = new OffsetIntervals
      rs.foreach { case (f, t) => iv1.add(f, t, t0) }
      val iv2 = new OffsetIntervals
      rs.reverse.foreach { case (f, t) => iv2.add(f, t, t0); iv2.add(f, t, t0) }
      assert(iv1.intervals.map(i => (i._1, i._2)) == iv2.intervals.map(i => (i._1, i._2)))
    }
  }

  test("property: JSON round-trip preserves containment, removal and re-serialization exactly") {
    val rnd = new scala.util.Random(814)
    for (_ <- 1 to 100) {
      val set = new OffsetRangeSet
      val ops = List.fill(30) {
        val topic = s"t${rnd.nextInt(3)}"
        val part = rnd.nextInt(3)
        val from = rnd.nextLong(200)
        (topic, part, from, from + rnd.nextLong(20), if (rnd.nextBoolean()) t0 else t1)
      }
      ops.foreach { case (t, p, f, to, at) => set.add(t, p, f, to, at) }
      val back = OffsetRangeSet.fromJson(set.toJson)
      // identical serialization AND identical membership on probe points
      assert(back.toJson == set.toJson)
      for (_ <- 1 to 50) {
        val t = s"t${rnd.nextInt(3)}"; val p = rnd.nextInt(3)
        val f = rnd.nextLong(220); val to = f + rnd.nextLong(5)
        assert(back.contains(t, p, f, to, t0) == set.contains(t, p, f, to, t0), s"($t,$p,$f,$to)")
      }
      // removal commutes with the round-trip
      val (rt, rp, rf, rto, _) = ops(rnd.nextInt(ops.size))
      set.remove(rt, rp, rf, rto)
      back.remove(rt, rp, rf, rto)
      assert(back.toJson == set.toJson, s"removal diverged after round-trip ($rt,$rp,$rf,$rto)")
    }
  }

  test("OffsetRangeSet JSON round-trip (Redis-compatible schema)") {
    val set = new OffsetRangeSet
    set.add("topicA", 0, 0, 100, t0)
    set.add("topicA", 1, 5, 10, t1)
    set.add("topicB", 0, 7, 7, t0)
    val json = set.toJson
    assert(json.contains("\"partitions\""))
    assert(json.contains("\"lastProcessed\":\"2026-01-01T00:00:00Z\""))
    val back = OffsetRangeSet.fromJson(json)
    assert(back.toJson == json)
    assert(back.contains("topicA", 0, 10, 50, t0))
    assert(!back.contains("topicB", 0, 8, 8, t0))
  }

  test("legacy offsets.csv import: reference format (quoted topics, optional lastModified)") {
    // reference-format fixture (OffsetFilePersistence.kt:70-93 writer shape)
    val csv =
      """offsetFrom,offsetTo,partition,topic,lastModified
        |0,100,0,topicA,2026-01-01T00:00:00Z
        |5,10,1,"topicA",2026-01-02T00:00:00Z
        |7,7,0,topicB
        |
        |200,300,0,topicA,2026-01-01T00:00:00Z""".stripMargin
    val set = new OffsetRangeSet
    OffsetRangeSet.addLegacyCsv(csv.linesIterator, set)
    assert(set.contains("topicA", 0, 0, 100, t0))
    assert(set.contains("topicA", 0, 250, 260, t0))
    assert(!set.contains("topicA", 0, 150, 150, t0)) // gap preserved
    assert(set.contains("topicA", 1, 5, 10, t0))     // quoted topic unquoted
    assert(set.contains("topicB", 0, 7, 7, t0))      // lastModified defaulted
    // merged set round-trips through the JSON ledger unchanged
    assert(OffsetRangeSet.fromJson(set.toJson).toJson == set.toJson)
  }
}
