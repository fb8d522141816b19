package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bin paths containing URI-escapable characters (space, %, +, non-ASCII)
  * must round-trip EXACTLY through the append-merge machinery: the merge
  * re-derives each existing row's bin path from `input_file_name`, which
  * returns a percent-ENCODED URI — a naive strip would re-bin
  * "my topic/x.csv" rows under "my%20topic/x.csv", silently duplicating
  * the bin. Unsanitized path params (`value:` lookups, plugin output) can
  * genuinely produce such paths.
  */
class PathCharsSpec extends SparkSpec {

  test("input_file_name returns percent-encoded URIs (assumption pin)") {
    // the decode step in existingBinFrames exists because of THIS behavior;
    // if a Spark upgrade changes it, this pin fails before the merge corrupts
    val dir = Files.createTempDirectory("graft-ifn")
    // no non-ASCII here: the test JVM's sun.jnu.encoding can't create such
    // filenames on this host; space/%/+ are the URI-encoding hazards anyway
    val sub = dir.resolve("my topic+x%20y")
    Files.createDirectories(sub)
    Files.write(sub.resolve("part one.csv"), "a,b\n1,2\n".getBytes("UTF-8"))
    val got = spark.read.option("header", "true")
      .csv(sub.resolve("part one.csv").toString)
      .select(input_file_name().as("f")).head().getString(0)
    info(s"input_file_name = $got")
    assert(got.contains("my%20topic") || got.contains("my topic"),
      s"unexpected input_file_name shape: $got")
  }

  test("append-merge round-trips bins whose paths carry space, %, + (plain, gzip, zip)") {
    import org.apache.spark.sql.types._
    import graft.sources.AvroRead
    val dataSchema = StructType(Seq(StructField("a", StringType)))
    for ((gz, zip) <- Seq((false, false), (true, false), (false, true))) {
      val out = Files.createTempDirectory("graft-pathchars").toString
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cfg = RestructureJobConfig(inputRoot = out, outputRoot = out,
        gzip = gz, zip = zip)
      val ext = cfg.extension
      def frame(tag: String) = {
        import spark.implicits._
        Seq(
          (s"plain/bin$ext", s"$tag-0"),
          (s"my topic/has space$ext", s"$tag-1"),
          (s"pct%20dir/x%y$ext", s"$tag-2"),
          (s"plus+dir/a+b$ext", s"$tag-3"))
          .toDF("__p", "a")
          .select(col("a"), col("__p"),
            lit("f0").as(AvroRead.FileCol),
            monotonically_increasing_id().as(AvroRead.PosCol))
      }
      def write(tag: String) = Restructure.writeCsvBins(spark, cfg, fs, "t",
        frame(tag), dataSchema, col("__p"), TopicJobConfig())
      val cold = write("c")
      assert(cold.count == 4, s"($gz,$zip) cold: $cold")
      val append = write("d")
      assert(append.count == 4,
        s"($gz,$zip) append re-binned a special-char path: $append")
      assert(append.sample.toSet == cold.sample.toSet, s"($gz,$zip): $cold vs $append")
      // every bin holds BOTH rows — the existing row survived the merge
      // under its original path instead of forking an encoded twin
      for (p <- cold.sample) {
        val full = new org.apache.hadoop.fs.Path(s"$out/$p")
        val raw: java.io.InputStream =
          if (zip) { val z = new java.util.zip.ZipInputStream(fs.open(full)); z.getNextEntry; z }
          else if (gz) new java.util.zip.GZIPInputStream(fs.open(full))
          else fs.open(full)
        val lines = scala.io.Source.fromInputStream(raw, "UTF-8").getLines().toList
        raw.close()
        assert(lines.size == 3, s"($gz,$zip) bin $p: $lines") // header + 2 rows
      }
    }
  }
}
