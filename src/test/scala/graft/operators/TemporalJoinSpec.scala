package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: picks the most recent right row; equal timestamps match; unmatched drop (inner)") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"), (2L, 50L, "other"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 60L, 600.0))
      .toDF("k", "rt", "rv")
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .orderBy("k", "t").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // t=10 matches rt=10 (>=), t=20 matches rt=15, t=5 has no prior row →
    // dropped, k=2 t=50 < rt=60 → dropped
    assert(got.toSeq == Seq((1L, 10L, 100.0), (1L, 20L, 150.0)))
  }

  test("asofJoin: outer keeps unmatched left rows with null payload") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0)).toDF("k", "rt", "rv")
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"), inner = false)
      .collect()
    assert(got.length == 1 && got(0).isNullAt(2))
  }

  test("asofJoin: duplicate right timestamps resolve to the greatest payload struct, deterministically") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 2L, 20.0), (1L, 10L, 7L, 70.0), (1L, 10L, 5L, 50.0))
      .toDF("k", "rt", "rid", "rv").repartition(3)
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rid", "rv"))
      .collect()(0)
    assert(got.getLong(2) == 7L && got.getDouble(3) == 70.0)
  }

  test("rangeJoin: half-open containment, bucket-spanning intervals, exactly-once matches") {
    // interval [10, 40) with bucketWidth 10 spans buckets 1..3; points at
    // the boundaries probe inclusion (10 in, 40 out)
    val points = Seq((1L, 9L), (1L, 10L), (1L, 25L), (1L, 39L), (1L, 40L), (2L, 25L))
      .toDF("k", "t")
    val intervals = Seq((1L, 10L, 40L, "iv1"), (1L, 35L, 45L, "iv2"))
      .toDF("k", "s", "e", "iv")
    val got = TemporalJoin.rangeJoin(points, intervals, Seq("k"), "t", "s", "e", bucketWidth = 10L)
      .select(col("t"), col("iv")).orderBy(col("t"), col("iv"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((10L, "iv1"), (25L, "iv1"), (39L, "iv1"), (39L, "iv2"), (40L, "iv2")))
  }

  test("rangeJoin: empty and inverted intervals match nothing") {
    val points = Seq((1L, 10L)).toDF("k", "t")
    val intervals = Seq((1L, 10L, 10L, "empty"), (1L, 20L, 5L, "inverted")).toDF("k", "s", "e", "iv")
    assert(TemporalJoin.rangeJoin(points, intervals, Seq("k"), "t", "s", "e", 10L).count() == 0)
  }

  test("asofJoin: tolerance rejects stale matches (inner drops, outer nulls)") {
    val left = Seq((1L, 100L, "fresh"), (1L, 500L, "stale")).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 9.0)).toDF("k", "rt", "rv")
    val inner = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"),
      tolerance = Some(50L)).collect()
    assert(inner.map(_.getString(2)).toSeq == Seq("fresh")) // 500-90 > 50 dropped
    val outer = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"),
      inner = false, tolerance = Some(50L))
      .orderBy("t").collect()
    assert(outer.length == 2 && !outer(0).isNullAt(3) && outer(1).isNullAt(3))
  }

  test("asofJoinForward: earliest future match, equal times included, tolerance bounds the gap") {
    val left = Seq((1L, 10L), (1L, 16L), (1L, 99L)).toDF("k", "t")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (1L, 20L, 200.0)).toDF("k", "rt", "rv")
    val got = TemporalJoin.asofJoinForward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .orderBy("t").collect().map(r => (r.getLong(1), r.getDouble(2)))
    // t=10 matches rt=10 (equal), t=16 matches rt=20 (earliest future),
    // t=99 has no future row → dropped
    assert(got.toSeq == Seq((10L, 100.0), (16L, 200.0)))
    val tight = TemporalJoin.asofJoinForward(left, right, Seq("k"), "t", "rt", Seq("rv"),
      tolerance = Some(2L)).collect().map(_.getLong(1)).toSeq
    assert(tight == Seq(10L)) // 20-16 > 2 rejected
  }

  test("asofJoin: null timestamps never match (ASOF >= is false on NULL)") {
    val left = Seq((1L, Some(10L), "ok"), (1L, None, "null-time")).toDF("k", "t", "tag")
    val right = Seq((1L, None, 999.0), (1L, Some(5L), 50.0)).toDF("k", "rt", "rv")
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .collect().map(r => (r.getString(2), r.getDouble(3)))
    // the null-rt right row must NOT become a baseline match; the null-t
    // left row has no match and drops under inner semantics
    assert(got.toSeq == Seq(("ok", 50.0)))
  }

  test("asofJoin: NULL keys never match (SQL equality-join semantics)") {
    val left = Seq((Some(1L), 10L, "keyed"), (Option.empty[Long], 10L, "null-key"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 5L, 50.0), (Option.empty[Long], 5L, 999.0))
      .toDF("k", "rt", "rv")
    // NULL = NULL is false: the null-key left row must not match the
    // null-key right row (it would under raw window partitioning)
    val inner = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .collect().map(r => (r.getString(2), r.getDouble(3)))
    assert(inner.toSeq == Seq(("keyed", 50.0)))
    val outer = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"), inner = false)
      .orderBy(col("tag")).collect()
    assert(outer.length == 2 && !outer(0).isNullAt(3) && outer(1).isNullAt(3))
  }

  test("asofJoin + rangeJoin: random workloads match the brute-force reference") {
    val rnd = new scala.util.Random(11) // seeded — deterministic test
    val nKeys = 5
    val lefts = Seq.fill(120)((rnd.nextInt(nKeys).toLong, rnd.nextInt(100).toLong))
    // distinct right timestamps per key → unambiguous expected match
    val rights = (for (k <- 0 until nKeys; t <- 0 until 100 if rnd.nextBoolean())
      yield (k.toLong, t.toLong, rnd.nextInt(1000).toLong)).distinct
    val lDf = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "t")
    val rDf = rights.toDF("k", "rt", "rv")

    // as-of: most recent rt <= t per key
    val expectedAsof = lefts.zipWithIndex.flatMap { case ((k, t), i) =>
      rights.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
        .map(r => (i.toLong, r._3))
    }.toMap
    val gotAsof = TemporalJoin.asofJoin(lDf, rDf, Seq("k"), "t", "rt", Seq("rv"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(gotAsof == expectedAsof)

    // range: every (point, interval) containment pair, exactly once
    val ivs = (for (k <- 0 until nKeys; i <- 0 until 10) yield {
      val s = rnd.nextInt(100).toLong
      (k.toLong, i.toLong + k * 100, s, s + 1 + rnd.nextInt(40).toLong)
    }).toSeq
    val ivDf = ivs.map { case (k, id, s, e) => (k, id, s, e) }.toDF("k", "ivid", "s", "e")
    val expectedRange = (for {
      ((k, t), i) <- lefts.zipWithIndex
      (ik, ivid, s, e) <- ivs if ik == k && t >= s && t < e
    } yield (i.toLong, ivid)).sorted
    val gotRange = TemporalJoin.rangeJoin(lDf, ivDf, Seq("k"), "t", "s", "e", bucketWidth = 7L)
      .select(col("lid"), col("ivid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(gotRange == expectedRange)
  }
}
