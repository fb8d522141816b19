package graft.jobs

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroRead

/** Driver-heap stress for the bin-write path at >=1e5 bins (not part of
  * `sbt test` — run with `sbt "Test/runMain graft.jobs.BinStress [bins]"`).
  *
  * Exercises the scale-critical driver surfaces end-to-end:
  *  - merge planning (existence/header probe) as a distributed job — cold
  *    run collects nothing, append run collects only existing bins;
  *  - schema sidecars + stale-temp sweep riding the write tasks;
  *  - the per-bin atomic temp->target commit across 1e5 files.
  *
  * Prints one JSON line with wall times and GC'd driver heap at each
  * phase; "flat" = the post-phase heap returns to the baseline order, no
  * O(bins) driver residue at all (since round 12 the engine itself
  * reports count + bounded path sample, never the full stat list).
  */
object BinStress {
  private def gcUsedMb(): Long = {
    System.gc(); System.runFinalization(); System.gc()
    val r = Runtime.getRuntime
    (r.totalMemory - r.freeMemory) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val bins = args.headOption.map(_.toInt).getOrElse(100000)
    val rowsPerBin = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft-binstress").toString
    val fs = new HPath(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setWriteChecksum(false); fs.setVerifyChecksum(false)
    val cfg = RestructureJobConfig(inputRoot = out, outputRoot = out)
    val dataSchema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    // ~1.6k directories x ~64 bins each
    def frame() = spark.range(bins.toLong * rowsPerBin).select(
      (col("id") % bins).as("bin"),
      concat(lit("v"), col("id")).as("a"),
      (col("id") * 2).cast(StringType).as("b"),
      lit("f0").as(AvroRead.FileCol), col("id").as(AvroRead.PosCol))
    val pathCol = concat(lit("stress/d"), (col("bin") / 64).cast(LongType),
      lit("/b"), col("bin"), lit(".csv"))
    val sidecar = Some("""{"type":"record","name":"stress"}""".getBytes("UTF-8"))

    // the engine's report is count + bounded sample (maxReportedPaths),
    // so the heap signal is the merge-planning residue alone
    val h0 = gcUsedMb()
    var t = System.nanoTime()
    val coldCount = Restructure.writeCsvBins(spark, cfg, fs, "stress", frame(),
      dataSchema, pathCol, TopicJobConfig(), sidecar).count
    val coldSec = (System.nanoTime() - t) / 1e9
    val h1 = gcUsedMb()
    require(coldCount == bins, s"expected $bins bins, wrote $coldCount")
    require(fs.exists(new HPath(s"$out/stress/d0/schema-stress.json")), "sidecar missing")

    // append pass: every one of the 1e5 bins now EXISTS, so the probe
    // returns the full existing set and the merge re-reads + rewrites
    t = System.nanoTime()
    val appendCount = Restructure.writeCsvBins(spark, cfg, fs, "stress", frame(),
      dataSchema, pathCol, TopicJobConfig(), sidecar).count
    val appendSec = (System.nanoTime() - t) / 1e9
    val h2 = gcUsedMb()
    require(appendCount == bins, s"append expected $bins bins, got $appendCount")

    // chunked-append pass: force the giant-re-run path (8 chunks + a
    // remainder commit) over the same 1e5 EXISTING bins — the driver holds
    // at most bins/8 path strings at a time; heap must stay flat
    t = System.nanoTime()
    val chunkCfg = cfg.copy(mergeChunkBins = math.max(1, bins / 8))
    val chunkCount = Restructure.writeCsvBins(spark, chunkCfg, fs, "stress", frame(),
      dataSchema, pathCol, TopicJobConfig(), sidecar).count
    val chunkSec = (System.nanoTime() - t) / 1e9
    val h3 = gcUsedMb()
    require(chunkCount == bins, s"chunked append expected $bins bins, got $chunkCount")

    // hot-bin skew phase: 50% of all rows land in ONE bin (the
    // all-null-time → unknown-time producer-failure regime); one bin =
    // one exactly-named file = one writer task streaming it, so this
    // measures the serialization floor the filename contract imposes
    val skewOut = java.nio.file.Files.createTempDirectory("graft-binstress-skew").toString
    val skewFs = new HPath(skewOut).getFileSystem(spark.sparkContext.hadoopConfiguration)
    skewFs.setWriteChecksum(false); skewFs.setVerifyChecksum(false)
    val skewCfg = RestructureJobConfig(inputRoot = skewOut, outputRoot = skewOut)
    val skewRows = bins.toLong * rowsPerBin
    def skewFrame() = spark.range(skewRows).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % bins).as("bin"),
      concat(lit("v"), col("id")).as("a"),
      (col("id") * 2).cast(StringType).as("b"),
      lit("f0").as(AvroRead.FileCol), col("id").as(AvroRead.PosCol))
    t = System.nanoTime()
    val skewCount = Restructure.writeCsvBins(spark, skewCfg, skewFs, "skew", skewFrame(),
      dataSchema, pathCol, TopicJobConfig(), sidecar).count
    val skewSec = (System.nanoTime() - t) / 1e9
    val h4 = gcUsedMb()
    try skewFs.delete(new HPath(skewOut), true) catch { case _: Exception => () }

    println(s"""{"bins":$bins,"rows":${bins.toLong * rowsPerBin},""" +
      s""""cold_sec":${math.round(coldSec * 10) / 10.0},""" +
      s""""append_sec":${math.round(appendSec * 10) / 10.0},""" +
      s""""chunked_append_sec":${math.round(chunkSec * 10) / 10.0},"chunks":8,""" +
      s""""skew_sec":${math.round(skewSec * 10) / 10.0},"skew_bins":$skewCount,""" +
      s""""skew_hot_rows":${skewRows / 2},""" +
      s""""heap_mb_baseline":$h0,"heap_mb_after_cold":$h1,"heap_mb_after_append":$h2,""" +
      s""""heap_mb_after_chunked":$h3,"heap_mb_after_skew":$h4}""")
    // best-effort cleanup of ~1e5 temp files
    try fs.delete(new HPath(out), true) catch { case _: Exception => () }
    spark.stop()
  }
}
