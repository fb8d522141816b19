package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the hand-rolled primitive top-k heaps against a plain
  * sort-based model: the round-12 rewrite replaced `PriorityQueue` with
  * sift up/down over parallel arrays, and the oracle's fixed data cannot
  * reach the order-sensitivity invariants — NaN/±Inf scores, -0.0 vs 0.0,
  * score ties broken by id/tie, duplicate entries, arbitrary partition
  * splits and merge orders, serde round-trips mid-stream. The heap
  * contract: output ≡ sort by (score desc via Double.compare — NaN
  * greatest, -0.0 < 0.0; then id/tie asc) take k, REGARDLESS of arrival
  * partitioning, merge order, or intermediate serialization.
  */
class TopKHeapPropertySpec extends AnyFunSuite {

  private val scoreGen: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-10.0, 10.0),
    3 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0), // forced ties incl. signed zero
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue))
  private val idGen: Gen[Long] = Gen.chooseNum(0L, 12L) // small range → duplicate ids
  private val entriesGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(scoreGen, idGen))
  private val kGen: Gen[Int] = Gen.frequency(6 -> Gen.chooseNum(1, 8), 1 -> Gen.const(0))

  // the documented total order: score desc (Double.compare), id asc
  private val bestFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
  private def model(entries: Seq[(Double, Long)], k: Int): Seq[Long] =
    entries.sorted(bestFirst).take(k).map(_._2)

  private def chunked[A](xs: List[A], cuts: List[Int]): List[List[A]] =
    if (xs.isEmpty) List(Nil)
    else {
      val marks = cuts.map(c => math.abs(c) % (xs.size + 1)).distinct.sorted
      val bounds = (0 :: marks ::: List(xs.size)).distinct.sorted
      bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    }

  test("property: TopKIds heap ≡ sort-take-k under any partitioning, merge order and serde") {
    val prop = Prop.forAll(entriesGen, kGen, Gen.listOf(Gen.chooseNum(0, 64)),
        Gen.long) { (entries, k, cuts, shuffleSeed) =>
      val expected = model(entries, k)

      // sequential adds
      val seq = new GraftExpressions.TopKIds.Buffer(k)
      entries.foreach { case (s, i) => seq.add(s, i) }

      // partition → per-chunk buffers → merge in a seeded-shuffled order
      val chunks = chunked(entries, cuts)
      val partials = chunks.map { ch =>
        val b = new GraftExpressions.TopKIds.Buffer(k)
        ch.foreach { case (s, i) => b.add(s, i) }
        b
      }
      val rnd = new scala.util.Random(shuffleSeed)
      val shuffledPartials = rnd.shuffle(partials)
      val merged = new GraftExpressions.TopKIds.Buffer(k)
      shuffledPartials.foreach(merged.addAll)

      // serde round-trip mid-stream: serialize each partial, deserialize,
      // keep merging — the shuffle does exactly this to every map-side heap
      val viaSerde = new GraftExpressions.TopKIds.Buffer(k)
      shuffledPartials.foreach { b =>
        viaSerde.addAll(GraftExpressions.TopKIds.Buffer.fromBytes(b.toBytes))
      }

      val ok = seq.idsBestFirst.toSeq == expected &&
        merged.idsBestFirst.toSeq == expected &&
        viaSerde.idsBestFirst.toSeq == expected
      if (!ok) Console.err.println(
        s"[topk-fuzz] k=$k entries=$entries\n  expected=$expected\n" +
          s"  seq=${seq.idsBestFirst.toSeq} merged=${merged.idsBestFirst.toSeq} " +
          s"serde=${viaSerde.idsBestFirst.toSeq}")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(131118L)),
      prop)
    assert(res.passed, s"TopKIds heap fuzz failed: ${res.status}")
  }

  // payload is a pure function of (score, tie), so equal-keyed entries are
  // interchangeable and the model's choice among them cannot disagree with
  // the heap's
  private def payloadOf(s: Double, t: Long): String = s"$s:$t"
  private val tieCmpLong: (Any, Any) => Int = (a, b) =>
    java.lang.Long.compare(a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())

  test("property: TopKPayload heap ≡ sort-take-k under any partitioning, merge order and serde") {
    // serde goes through the real aggregate expression (UnsafeProjection
    // over (score, tie, payload)), the exact shuffle path
    def mkExpr(k: Int) = GraftExpressions.TopKPayload(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      BoundReference(2, StringType, nullable = true),
      Literal(k))
    val prop = Prop.forAll(entriesGen, kGen, Gen.listOf(Gen.chooseNum(0, 64)),
        Gen.long) { (entries, k, cuts, shuffleSeed) =>
      val expected = model(entries, k).zip(entries.sorted(bestFirst).take(k))
        .map { case (_, (s, t)) => payloadOf(s, t) }
      def newBuf() = new GraftExpressions.TopKPayload.Buffer(k, tieCmpLong)
      def addTo(b: GraftExpressions.TopKPayload.Buffer, s: Double, t: Long): Unit =
        b.add(s, java.lang.Long.valueOf(t), UTF8String.fromString(payloadOf(s, t)))

      val seq = newBuf()
      entries.foreach { case (s, t) => addTo(seq, s, t) }

      val partials = chunked(entries, cuts).map { ch =>
        val b = newBuf()
        ch.foreach { case (s, t) => addTo(b, s, t) }
        b
      }
      val rnd = new scala.util.Random(shuffleSeed)
      val shuffledPartials = rnd.shuffle(partials)
      val merged = newBuf()
      shuffledPartials.foreach(merged.addAll)

      val expr = mkExpr(k)
      val viaSerde = newBuf()
      shuffledPartials.foreach { b =>
        viaSerde.addAll(expr.deserialize(expr.serialize(b)))
      }

      def out(b: GraftExpressions.TopKPayload.Buffer): Seq[String] =
        b.payloadsBestFirst.toSeq.map(_.toString)
      val ok = out(seq) == expected && out(merged) == expected && out(viaSerde) == expected
      if (!ok) Console.err.println(
        s"[topkp-fuzz] k=$k entries=$entries\n  expected=$expected\n" +
          s"  seq=${out(seq)} merged=${out(merged)} serde=${out(viaSerde)}")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(131119L)),
      prop)
    assert(res.passed, s"TopKPayload heap fuzz failed: ${res.status}")
  }
}
