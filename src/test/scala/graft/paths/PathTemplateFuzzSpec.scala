package graft.paths

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzz of the path-template front door: ANY template string must either
  * be rejected by `validate` with a clean message, or compile to a Column
  * that evaluates on real rows without throwing — a config typo must never
  * surface as an analysis/runtime exception from deep inside the engine.
  */
class PathTemplateFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", StructType(Seq(
      StructField("projectId", StringType), StructField("userId", StringType),
      StructField("sourceId", StringType)))),
    StructField("value", StructType(Seq(
      StructField("time", DoubleType), StructField("status", StringType))))))

  private lazy val rows = Seq(
    (("p1", "u1", "s1"), (1.6095816e9, "UP")),
    ((null.asInstanceOf[String], "u2", "s2"), (Double.NaN, null.asInstanceOf[String])))
    .toDF("key", "value")
    .select(
      struct($"key._1".as("projectId"), $"key._2".as("userId"), $"key._3".as("sourceId")).as("key"),
      struct($"value._1".as("time"), $"value._2".as("status")).as("value"))

  // template fragments: known params, unknown params, lookup params with
  // and without real fields, time formats, literals incl. regex/path
  // metacharacters, unterminated braces
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("${topic}", "${filename}", "${attempt}", "${extension}",
      "${projectId}", "${userId}", "${sourceId}"),
    // bare ${time} is illegal like ${bogus} (reference allows only the
    // time:<fmt> prefix form) — generated here to assert it REJECTS
    Gen.oneOf("${key:userId}", "${key:nope}", "${value:status}", "${value:missing}",
      "${time:yyyyMM}", "${time:HH-mm}", "${bogus}", "${}", "${time}"),
    Gen.oneOf("lit", "a-b_c", "x.y", "[", "(", "*", "$", "{", "}", "${unterminated",
      "emojié", " "),
    Gen.const("/"))

  private val template: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, fragment).map(_.mkString))

  test("property: any template validates-or-errors cleanly; valid ones evaluate on real rows") {
    val prop = Prop.forAll(template) { t =>
      PathTemplate.validate(t) match {
        case Left(msg) =>
          msg.nonEmpty // rejection must carry a message
        case Right(()) =>
          val params = PathTemplate.fixedParams(schema, col("value.time"), lit("topicA"), ".csv")
          val c = PathTemplate.compile(t, params, Some(col("value.time")), Some(schema))
          val got = rows.select(c.as("p")).collect().map(_.getString(0))
          // every row produces a non-null, non-empty path (unknown-*
          // fallbacks, never dropped rows)
          got.length == 2 && got.forall(p => p != null && p.nonEmpty)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withInitialSeed(Seed(814L)),
      prop)
    assert(res.passed, s"template fuzz failed: ${res.status}")
  }

  test("compile stays permissive for unknown params (defense in depth below validate)") {
    // validate rejects ${bogus} at config time; a programmatically-built
    // template that skips validate must still fall back, not throw or drop
    val params = PathTemplate.fixedParams(schema, col("value.time"), lit("t"), ".csv")
    val c = PathTemplate.compile("${bogus}/${topic}/${key:nothere}/${filename}",
      params, Some(col("value.time")), Some(schema))
    val got = rows.select(c.as("p")).collect().map(_.getString(0))
    assert(got.length == 2 && got.forall(_.nonEmpty), got.toSeq.toString)
  }
}
