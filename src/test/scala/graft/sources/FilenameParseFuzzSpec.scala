package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Consistency fuzz of the TWO filename-parse implementations: the driver
  * regex (`TopicFiles.parseFilename`, used for work-list planning and
  * ledger commits) and the column-side SQL regex (`topicCol` etc., used by
  * the S8 operator and the cleaner) MUST agree on every input — a drift
  * between them would commit ledger ranges under one key and verify/clean
  * under another.
  */
class FilenameParseFuzzSpec extends SparkSpec {
  import spark.implicits._

  // plausible and adversarial names: topics with '+', '.', unicode, dashes;
  // unpadded and padded numbers; missing parts; wrong extensions
  private val topicGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("events", "android_phone_acceleration", "a+b", "t.opic", "é中",
      "with-dash", "+", "x"),
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
  private val numGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0L, 123456789L).map(_.toString),
    Gen.chooseNum(0L, 99L).map(n => f"$n%010d"))
  private val nameGen: Gen[String] = Gen.frequency(
    6 -> (for { t <- topicGen; p <- numGen; f <- numGen; to <- numGen }
      yield s"$t+$p+$f+$to.avro"),
    3 -> (for { t <- topicGen; p <- numGen; f <- numGen } yield s"$t+$p+$f.avro"),
    1 -> Gen.oneOf("noplus.avro", "t+1.avro", "t+1+2.csv", "t+1+2+3+4.avro",
      "t+-1+2.avro", "t++2.avro", "", ".avro", "t+1+2+.avro"))

  test("property: driver parse ≡ column-side parse on every filename shape") {
    val prop = Prop.forAll(Gen.listOfN(8, nameGen)) { names =>
      val driver = names.map(n => n -> TopicFiles.parseFilename(n)).toMap
      val rows = names.toDF("n").select(col("n"),
          TopicFiles.topicCol(col("n")).as("t"),
          TopicFiles.partitionCol(col("n")).as("p"),
          TopicFiles.fromOffsetCol(col("n")).as("f"),
          TopicFiles.toOffsetCol(col("n")).as("o"))
        .collect()
      rows.forall { r =>
        val n = r.getString(0)
        driver(n) match {
          case Some(pr) =>
            r.getString(1) == pr.topic && !r.isNullAt(2) && r.getInt(2) == pr.partition &&
              r.getLong(3) == pr.from &&
              (if (pr.to.isEmpty) r.isNullAt(4) else !r.isNullAt(4) && r.getLong(4) == pr.to.get)
          case None =>
            // column side signals no-match as empty topic extraction
            r.getString(1) == "" || {
              Console.err.println(s"[fnfuzz] driver rejected '$n' but column parsed '${r.getString(1)}'")
              false
            }
        }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(Seed(100818L)),
      prop)
    assert(res.passed, s"filename parse fuzz failed: ${res.status}")
  }
}
