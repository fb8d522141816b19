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

  test("validate rejects bare ${time} — only time:<fmt> is legal (FixedPathFormatterPlugin.kt:44-52)") {
    val got = PathTemplate.validate("${topic}/${time}/${filename}")
    assert(got.isLeft)
    assert(got.swap.toOption.get.contains("time"), s"message should name the offender: $got")
    assert(PathTemplate.validate("${topic}/${time:yyyyMM}/${filename}").isRight)
  }

  test("fixedParams renders attempt 0 as empty suffix for static topics (toAttemptSuffix)") {
    val df = Seq(("u", 1.6095816e9)).toDF("uid", "t")
      .select(struct(col("uid").as("userId")).as("key"), col("t"))
    val params = PathTemplate.fixedParams(
      df.schema.asInstanceOf[StructType], col("t"), lit("topicX"), ".csv")
    val c = PathTemplate.compile("${topic}/${time:yyyyMMdd}${attempt}${extension}",
      params, timeEpochSec = Some(col("t")))
    assert(df.select(c.as("p")).collect()(0).getString(0) == "topicX/20210102.csv")
  }

  test("validate rejects ${fixed:x}; class-named plugins validate under their REAL prefix") {
    // `fixed` provides only bare params (reference FixedPathFormatterPlugin
    // has no prefix) — a raw config name list must not legalize ${fixed:x},
    // which compile can never resolve
    assert(PathTemplate.validate("${topic}/${fixed:x}/${filename}",
      Seq("fixed", "time", "key", "value")).isLeft)
    // a class-named plugin's template prefix is its instance .name
    val names = PathFormatterPlugin.prefixNames(
      Seq("fixed", "time", "mp", "graft.paths.TestNamedPlugin"))
    assert(names == Seq("time", "mp", "tn"), names.toString)
    assert(PathTemplate.validate("${topic}/${tn:x}/${filename}", names).isRight)
    assert(PathTemplate.validate("${topic}/${graft.paths.TestNamedPlugin:x}/${filename}",
      names).isLeft)
  }

  test("${time:fmt} on a garbage epoch falls back to unknown-time, never overflows") {
    // timestamp_seconds(1e15) overflows, which ANSI mode (the Spark 4
    // default) turns into a job-killing error; the range guard must route
    // it to unknown-time like the filename bin does
    val df = Seq(1.0e15, Double.NaN, 1.6095816e9).toDF("t")
    val c = PathTemplate.compile("${topic}/${time:yyyyMM}/${filename}",
      Map("topic" -> lit("t"), "filename" -> lit("f.csv")),
      timeEpochSec = Some(col("t")))
    val got = df.select(c.as("p")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("t/unknown-time/f.csv", "t/unknown-time/f.csv", "t/202101/f.csv"), got)
  }

  test("key:/value: lookups resolve case-insensitively to the ACTUAL field spelling") {
    val df = Seq(("CONNECTED", "u1")).toDF("serverStatus", "uid")
      .select(struct(col("uid").as("userId")).as("key"),
        struct(col("serverStatus")).as("value"))
    val c = PathTemplate.compile("${value:serverstatus}/${topic}/${filename}",
      Map("topic" -> lit("t"), "filename" -> lit("f.csv")),
      recordSchema = Some(df.schema))
    // under caseSensitive=true the unresolved template spelling would fail
    // analysis; resolving to the schema's name must keep working
    spark.conf.set("spark.sql.caseSensitive", "true")
    try assert(df.select(c.as("p")).collect()(0).getString(0) == "CONNECTED/t/f.csv")
    finally spark.conf.set("spark.sql.caseSensitive", "false")
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

  test("mp: plugin golden path — organization/group/externalId/attributes from a broadcast dimension") {
    // reference MPPathFormatterPlugin.kt:102-118 param names and fallbacks;
    // dimension tables stand in for the portal REST fetch
    val projects = Seq(("p1", "org-A", Map("cohort" -> "c 9"))) // attr needs sanitizing
      .toDF("id", "organization", "attributes")
    val subjects = Seq(("p1", "u1", "grpX", "ext-7", Map("site" -> "lab/2")))
      .toDF("projectId", "id", "group", "externalId", "attributes")
    val plugin = new MpPathFormatterPlugin(
      new MpDimensionSource.Static(projects, subjects))

    val records = Seq(("p1", "u1", 1.6095816E9), ("p2", "uX", 1.6095816E9))
      .toDF("projectId", "userId", "t")
      .select(struct(col("projectId"), col("userId")).as("key"), col("t"))
    val enriched = plugin.enrich(records)
    val params = Map("topic" -> lit("t"), "filename" -> lit("f.csv"))
    val c = PathTemplate.compile(
      "${mp:organization}/${mp:project}/${mp:group}/${mp:externalId}/${mp:site}/${mp:project:cohort}/${topic}/${filename}",
      params, plugins = Seq(plugin))
    val got = enriched.select(col("key.projectId"), c.as("p")).orderBy("projectId")
      .collect().map(_.getString(1)).toSeq
    // matched record: portal values, sanitized ("lab/2" → "lab2", "c 9" → "c9")
    assert(got(0) == "org-A/p1/grpX/ext-7/lab2/c9/t/f.csv")
    // unmatched record: reference fallbacks (unknown-*, group → "default";
    // defaults are used verbatim, reference sanitizeId(value, default))
    assert(got(1) == "unknown-organization/unknown-project/default/unknown-user/unknown-site/unknown-project:cohort/t/f.csv")
  }

  test("mp: plugin enrich is a no-op-safe left join (row count preserved, no key column → defaults)") {
    val projects = Seq(("p1", "org-A", Map.empty[String, String])).toDF("id", "organization", "attributes")
    val subjects = Seq(("p1", "u1", "g", "e", Map.empty[String, String]))
      .toDF("projectId", "id", "group", "externalId", "attributes")
    val plugin = new MpPathFormatterPlugin(
      new MpDimensionSource.Static(projects, subjects))
    val noKey = Seq((1, 2)).toDF("a", "b")
    val e = plugin.enrich(noKey)
    assert(e.count() == 1)
    val v = e.select(PathTemplate.compile("${mp:organization}/${topic}/${filename}",
      Map("topic" -> lit("t"), "filename" -> lit("f")), plugins = Seq(plugin)).as("p"))
      .collect()(0).getString(0)
    assert(v == "unknown-organization/t/f")
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
