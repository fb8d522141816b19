package graft.paths

import graft.SparkSpec
import graft.time.TimeExtract
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PathTemplateSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize splits literals and params") {
    val toks = PathTemplate.tokenize("${a}/x/${b}.csv")
    assert(toks == Seq(PathTemplate.Param("a"), PathTemplate.Literal("/x/"),
      PathTemplate.Param("b"), PathTemplate.Literal(".csv")))
  }

  test("validate requires topic and filename (or attempt+extension)") {
    assert(PathTemplate.validate("${projectId}/${topic}/${filename}").isRight)
    assert(PathTemplate.validate("${topic}/${attempt}${extension}").isRight)
    assert(PathTemplate.validate("${projectId}/${filename}").isLeft)
    assert(PathTemplate.validate("${topic}/x").isLeft)
  }

  test("sanitizeId removes junk and falls back to default") {
    val df = Seq("a b/c!", "###", "ok_-1").toDF("s")
    val got = df.select(PathTemplate.sanitizeId(col("s"), "unknown-user").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("abc", "unknown-user", "ok_-1"))
  }

  test("golden path: reference-style nested template with time params") {
    // analog of FormattedPathFactoryTest golden `t/p/u/s/202101/02/20210102_1000.csv.gz`
    val df = Seq(("p", "u", "s", 1.6095816E9)).toDF("projectId", "userId", "sourceId", "t")
      .select(struct(col("projectId"), col("userId"), col("sourceId")).as("key"), col("t"))
    val time = col("t")
    val params = PathTemplate.fixedParams(
      df.schema.asInstanceOf[StructType], time, lit("topicX"), ".csv.gz")
    val c = PathTemplate.compile(
      "${projectId}/${userId}/${topic}/${time:yyyyMM}/${time:dd}/${filename}",
      params, timeEpochSec = Some(time))
    val got = df.select(c.as("path")).collect()(0).getString(0)
    assert(got == "p/u/topicX/202101/02/20210102_1000.csv.gz")
  }

  test("key:/value: lookup params with unknown fallbacks") {
    val df = Seq(("CONNECTED", "u1")).toDF("serverStatus", "uid")
      .select(struct(col("uid").as("userId")).as("key"),
        struct(col("serverStatus")).as("value"))
    val schema = df.schema
    val c = PathTemplate.compile("${value:serverStatus}/${key:missing}/${topic}/${filename}",
      Map("topic" -> lit("t"), "filename" -> lit("f.csv")),
      recordSchema = Some(schema))
    assert(df.select(c.as("p")).collect()(0).getString(0) == "CONNECTED/unknown-key/t/f.csv")
  }

  test("null time → unknown-time filename") {
    val df = Seq((1)).toDF("x")
    val params = Map(
      "topic" -> lit("t"),
      "filename" -> concat(TimeExtract.timeBin(lit(null).cast(DoubleType)), lit(".csv")))
    val c = PathTemplate.compile("${topic}/${filename}", params)
    assert(df.select(c.as("p")).collect()(0).getString(0) == "t/unknown-time.csv")
  }
}
