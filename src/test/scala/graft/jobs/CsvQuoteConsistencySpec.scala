package graft.jobs

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Consistency fuzz of the TWO RFC4180 quoting implementations: the
  * driver-side `csvQuote` (builds the header string that attempt-slot
  * resolution compares against existing files) and the codegen'd
  * `csvQuoteCol` (renders every data row). A drift between them would
  * mis-match headers during dynamic-schema attempt resolution and route
  * rows into the wrong attempt file.
  */
class CsvQuoteConsistencySpec extends SparkSpec {
  import spark.implicits._

  private val ch: Gen[Char] = Gen.frequency(
    4 -> Gen.alphaNumChar,
    4 -> Gen.oneOf(',', '"', '\n', '\r', '\t', ' ', '\\', '\''),
    1 -> Gen.oneOf('é', '中'))
  private val s: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))

  test("property: driver csvQuote ≡ codegen csvQuoteCol on adversarial content") {
    val prop = Prop.forAll(Gen.listOfN(16, s)) { fields =>
      val colSide = fields.toDF("f")
        .select(Restructure.csvQuoteCol(col("f")).as("q"))
        .collect().map(_.getString(0)).toSeq
      val driverSide = fields.map(Restructure.csvQuote)
      colSide == driverSide || {
        Console.err.println(s"[quotefuzz] diverged: " +
          fields.zip(colSide.zip(driverSide)).collect {
            case (f, (c, d)) if c != d => s"'$f' -> col '$c' vs driver '$d'"
          }.mkString("; "))
        false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100).withInitialSeed(Seed(4181L)),
      prop)
    assert(res.passed, s"quote consistency fuzz failed: ${res.status}")
  }
}
