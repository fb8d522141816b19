package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.jobs.RestructureJobConfig
import graft.paths.PathTemplate
import graft.time.TimeExtract
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // events.parquet with nanosAsLong: ts arrives as long nanos
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def streamDir: String = {
    val d = Files.createTempDirectory("graft-stream")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def eventStream = spark.readStream.schema(rawSchema).parquet(streamDir)
    .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  test("windowed bin counts with watermark match the batch aggregation") {
    val q = StreamingOps.windowedBinCounts(eventStream)
      .writeStream.format("memory").queryName("bins").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only closed windows; check a prefix is consistent
      val got = spark.sql(
        "SELECT date_format(window.start, 'yyyyMMdd_HH00') AS bin, event_type, n FROM bins")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val expect = graft.Tables.load(spark, sf, "events")
        .groupBy(date_format(col("ts"), "yyyyMMdd_HH00").as("bin"), col("event_type"))
        .count().collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.nonEmpty)
      got.foreach { case (k, n) => assert(expect(k) == n, s"window $k") }
    } finally q.stop()
  }

  test("flatMapGroupsWithState user stats accumulate to batch totals") {
    implicit val s = spark
    val ev = eventStream.select($"event_id", $"user_id", $"event_type", $"value")
      .as[StreamingOps.EventRow]
    val q = StreamingOps.userStats(ev)
      .writeStream.format("memory").queryName("ustats").outputMode("append").start()
    try {
      q.processAllAvailable()
      // last update per user = running total
      val got = spark.sql(
        """SELECT user_id, n FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC) rn FROM ustats)
          |WHERE rn = 1""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = graft.Tables.load(spark, sf, "events")
        .groupBy("user_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally q.stop()
  }

  test("streaming restructure writes exactly-named bins via foreachBatch") {
    val out = Files.createTempDirectory("graft-stream-out")
    val ckpt = Files.createTempDirectory("graft-ckpt")
    val cfg = RestructureJobConfig(inputRoot = "/unused", outputRoot = out.toString)
    val source = eventStream
    val epochSec = col("ts").cast(DoubleType)
    val pathCol = PathTemplate.compile(PathTemplate.defaultTemplate, Map(
      "projectId" -> lit("proj"),
      "userId" -> concat(lit("u"), (col("user_id") % 4).cast(StringType)),
      "topic" -> lit("events"),
      "filename" -> concat(TimeExtract.timeBin(epochSec), lit(".csv"))))
    val q = StreamingRestructure.start(spark, source, pathCol, cfg, "events", ckpt.toString)
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()

    import scala.jdk.CollectionConverters._
    val files = Files.walk(out).iterator().asScala
      .filter(Files.isRegularFile(_)).map(p => out.relativize(p).toString)
      .filterNot(p => p.split('/').last.startsWith(".")).toSeq
    assert(files.nonEmpty)
    assert(files.forall(f => f.matches("proj/u\\d/events/\\d{8}_\\d{4}\\.csv")))
    val totalRows = files.map { f =>
      Files.readAllLines(out.resolve(f)).size - 1 // minus header
    }.sum
    assert(totalRows == graft.Tables.load(spark, sf, "events").count())
  }
}
