package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.GraftExpressions

/** Kernel ≡ declarative equivalence for the window-fingerprint expression:
  * [[GraftExpressions.WindowMd5Fps]] must be byte-identical to the
  * slice→concat_ws→md5 tree it replaces (TextDedup.
  * windowFingerprintsDeclarative) on every token-array shape — unicode,
  * empty strings, null elements (concat_ws skips them), null arrays,
  * shorter-than-w inputs — and the distinct variant must equal
  * `array_distinct` of the plain one. The fingerprints feed the oracle-
  * checked span family, so a byte drift would silently change q_repeated_
  * spans/q_mask_spans results.
  */
class WindowFpsKernelSpec extends SparkSpec {
  import spark.implicits._

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("", "a", "é中文", "é", "tok tok", "\\", "\"", "0", "longtokenlongtokenlongtoken"),
    Gen.listOfN(3, Gen.choose(33.toChar, 126.toChar)).map(_.mkString))
  private val arrGen: Gen[List[Option[String]]] =
    Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(9 -> tokenGen.map(Some(_)), 1 -> Gen.const(None))))

  test("property: window-fp kernel ≡ declarative tree (plain and distinct) on any token array") {
    val prop = Prop.forAll(Gen.listOfN(6, arrGen), Gen.chooseNum(1, 10)) { (arrs, w) =>
      val df = arrs.map(a => Tuple1(a.map(_.orNull)))
        .toDF("toks")
        .select(col("toks").cast("array<string>").as("toks"))
      val got = df.select(
          GraftExpressions.windowFps(col("toks"), w, distinct = false).as("k"),
          GraftExpressions.windowFps(col("toks"), w, distinct = true).as("kd"),
          TextDedup.windowFingerprintsDeclarative(col("toks"), w).as("d"))
        .withColumn("dd", array_distinct(col("d")))
        .collect()
      got.forall { r =>
        val k = r.getSeq[String](0); val kd = r.getSeq[String](1)
        val d = r.getSeq[String](2); val dd = r.getSeq[String](3)
        val ok = k == d && kd == dd
        if (!ok) Console.err.println(
          s"[winfp-fuzz] w=$w\n  kernel=$k\n  declarative=$d\n  kernelDistinct=$kd\n  declDistinct=$dd")
        ok
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60).withInitialSeed(Seed(131120L)),
      prop)
    assert(res.passed, s"window-fp kernel fuzz failed: ${res.status}")
  }

  test("null array → empty result, matching the declarative otherwise(array()) branch") {
    val df = Seq((1L, Some(Seq("a", "b", "c"))), (2L, None))
      .toDF("id", "toks")
      .select(col("id"), col("toks").cast("array<string>").as("toks"))
    val rows = df.select(col("id"),
        GraftExpressions.windowFps(col("toks"), 2, distinct = false).as("k"),
        TextDedup.windowFingerprintsDeclarative(col("toks"), 2).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1).size == 2)
    assert(rows(0).getSeq[String](1) == rows(0).getSeq[String](2))
    assert(!rows(1).isNullAt(1) && rows(1).getSeq[String](1).isEmpty,
      "kernel must yield an empty array (not null) for a null token array")
    assert(rows(1).getSeq[String](2).isEmpty)
  }
}
