package graft.time

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TimeExtractSpec extends SparkSpec {
  import spark.implicits._

  test("priority: value.time wins over key.start and value.timeReceived") {
    val df = Seq((Some(100.5), 7000L, 999.0)).toDF("vtime", "kstart", "vrec")
      .select(
        struct(col("kstart").as("start")).as("key"),
        struct(col("vtime").as("time"), col("vrec").as("timeReceived")).as("value"))
    val t = df.select(TimeExtract.timeColumn(df.schema).as("t")).collect()(0).getDouble(0)
    assert(t == 100.5)
  }

  test("key.start is epoch millis; used when value.time is null") {
    val df = Seq((Option.empty[Double], 7000L, 999.0)).toDF("vtime", "kstart", "vrec")
      .select(
        struct(col("kstart").as("start")).as("key"),
        struct(col("vtime").as("time"), col("vrec").as("timeReceived")).as("value"))
    val t = df.select(TimeExtract.timeColumn(df.schema).as("t")).collect()(0).getDouble(0)
    assert(t == 7.0) // 7000 ms → 7 s
  }

  test("ISO dateTime string with and without Z; case-insensitive field match") {
    val df = Seq(("2021-01-02T10:00:00Z"), ("2021-01-02T10:00:00")).toDF("DateTime")
      .select(struct(col("DateTime")).as("value"))
    val ts = df.select(TimeExtract.timeColumn(df.schema).as("t")).collect().map(_.getDouble(0))
    assert(ts.toSeq == Seq(1.6095816E9, 1.6095816E9))
  }

  test("no candidate fields → null; timeBin renders unknown-time") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = df.select(TimeExtract.timeBin(TimeExtract.timeColumn(df.schema)).as("bin"))
      .collect()(0).getString(0)
    assert(out == "unknown-time")
  }

  test("timeBin hourly UTC format") {
    val df = Seq(1.6095816E9).toDF("t") // 2021-01-02T10:00:00Z
    val bin = df.select(TimeExtract.timeBin(col("t")).as("b")).collect()(0).getString(0)
    assert(bin == "20210102_1000")
  }
}
