package graft.jobs

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.GZIPInputStream

import graft.SparkSpec

/** Output-format coverage: gzip bins (K5), JSON-lines bins (K3), corrupt-
  * target quarantine (K9), bucket routing (G8).
  */
class FormatsSpec extends SparkSpec {

  private val fixtures = Paths.get("/root/reference/src/integrationTest/resources")
  private val statusFile =
    "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro"

  private def setup(): (Path, Path) = {
    val work = Files.createTempDirectory("graft-fmt")
    val in = work.resolve("in")
    Files.createDirectories(in.resolve(statusFile).getParent)
    Files.copy(fixtures.resolve(statusFile), in.resolve(statusFile),
      StandardCopyOption.REPLACE_EXISTING)
    (in, work.resolve("out"))
  }

  private val binDir =
    "STAGING_PROJECT/1543bc93-3c17-4381-89a5-c5d6272b827c/application_server_status"

  test("CSV values with commas, quotes, newlines survive write + append-merge") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"userId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"note","type":"string"}]}}]}""".stripMargin)
    val work = Files.createTempDirectory("graft-quote")
    val dir = work.resolve("in/notes/partition=0")
    Files.createDirectories(dir)
    def write(name: String, notes: Seq[String]): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, dir.resolve(name).toFile)
      notes.foreach { n =>
        val k = new GenericData.Record(schema.getField("key").schema)
        k.put("userId", "u1")
        val v = new GenericData.Record(schema.getField("value").schema)
        v.put("time", 1.6095816e9); v.put("note", n)
        val r = new GenericData.Record(schema)
        r.put("key", k); r.put("value", v)
        w.append(r)
      }
      w.close()
    }
    val tricky = Seq("plain", "with,comma", "with \"quotes\"", "multi\nline", "both,\"and\"\nnl")
    write("notes+0+0000000000+0000000004.avro", tricky)
    val out = work.resolve("out")
    val cfg = RestructureJobConfig(inputRoot = work.resolve("in").toString, outputRoot = out.toString)
    Restructure.run(spark, cfg)

    val bin = s"$out/unknown-project/u1/notes/20210102_1000.csv"
    def readNotes(): Seq[String] = spark.read
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .csv(bin).select("`value.note`").collect().map(_.getString(0)).toSeq
    assert(readNotes().sorted == tricky.sorted, "first write mangled special chars")

    // append-merge must keep quoted/multiline rows whole
    val work2 = Files.createTempDirectory("graft-quote2")
    val dir2 = work2.resolve("in/notes/partition=0")
    Files.createDirectories(dir2)
    val w2dir = dir2 // second batch, same bin
    val schema2 = schema
    val wtr = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema2))
    wtr.create(schema2, w2dir.resolve("notes+0+0000000005+0000000005.avro").toFile)
    val k2 = new GenericData.Record(schema2.getField("key").schema)
    k2.put("userId", "u1")
    val v2 = new GenericData.Record(schema2.getField("value").schema)
    v2.put("time", 1.6095816e9); v2.put("note", "second,\"run\"\nrow")
    val r2 = new GenericData.Record(schema2)
    r2.put("key", k2); r2.put("value", v2)
    wtr.append(r2); wtr.close()
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = work2.resolve("in").toString, outputRoot = out.toString,
      ledgerPath = Some(out.resolve("_ledger2.json").toString)))
    assert(readNotes().sorted == (tricky :+ "second,\"run\"\nrow").sorted,
      "append-merge mangled quoted/multiline rows")
  }

  test("multiple input roots merge into one topic work list (paths.inputs list)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"userId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"n","type":"long"}]}}]}""".stripMargin)
    val work = Files.createTempDirectory("graft-multi-in")
    def write(root: String, topic: String, name: String, ns: Seq[Long]): Unit = {
      val dir = work.resolve(s"$root/$topic/partition=0")
      Files.createDirectories(dir)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, dir.resolve(name).toFile)
      ns.foreach { n =>
        val k = new GenericData.Record(schema.getField("key").schema)
        k.put("userId", "u1")
        val v = new GenericData.Record(schema.getField("value").schema)
        v.put("time", 1.6095816e9); v.put("n", n)
        val r = new GenericData.Record(schema)
        r.put("key", k); r.put("value", v)
        w.append(r)
      }
      w.close()
    }
    // topic t_shared lives in both roots (different offset slices);
    // t_only_b exists only in the second root
    write("in_a", "t_shared", "t_shared+0+0000000000+0000000001.avro", Seq(0L, 1L))
    write("in_b", "t_shared", "t_shared+0+0000000002+0000000003.avro", Seq(2L, 3L))
    write("in_b", "t_only_b", "t_only_b+0+0000000000+0000000000.avro", Seq(9L))
    val out = work.resolve("out")
    val result = Restructure.run(spark, RestructureJobConfig(
      inputRoot = work.resolve("in_a").toString,
      extraInputRoots = Seq(work.resolve("in_b").toString),
      outputRoot = out.toString))
    val byTopic = result.processedTopics.map(t => t.topic -> t.records).toMap
    assert(byTopic == Map("t_shared" -> 4L, "t_only_b" -> 1L))
    val shared = spark.read.option("header", "true")
      .csv(out.resolve("unknown-project/u1/t_shared/20210102_1000.csv").toString)
      .select("`value.n`").collect().map(_.getString(0).toLong).toSeq.sorted
    assert(shared == Seq(0L, 1L, 2L, 3L))
    // the yml list surface maps through (paths.inputs → roots)
    val l = ConfigLoader.load(
      """paths:
        |  inputs: [a, b, c]
        |""".stripMargin)
    assert(l.job.inputRoot == "a" && l.job.extraInputRoots == Seq("b", "c"))
    // CLI positional paths REPLACE the yaml list
    val cli = ConfigLoader.load("paths:\n  inputs: [a, b]\n",
      cli = CliArgs.parse(Seq("x", "y")))
    assert(cli.job.inputRoot == "x" && cli.job.extraInputRoots == Seq("y"))
  }

  test("gzip CSV bins: .csv.gz extension, valid gzip, same content") {
    val (in, out) = setup()
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString, gzip = true))
    val bin = out.resolve(s"$binDir/20200128_1300.csv.gz")
    assert(Files.exists(bin))
    val content = new String(
      new GZIPInputStream(Files.newInputStream(bin)).readAllBytes(), "UTF-8")
    assert(content.startsWith("key.projectId,key.userId,key.sourceId,value.time"))
    assert(content.contains("1.58021982003E9,CONNECTED,"))
  }

  test("gzip append: second run merges into the existing compressed bin") {
    val (in, out) = setup()
    val cfg = RestructureJobConfig(inputRoot = in.toString, outputRoot = out.toString, gzip = true)
    Restructure.run(spark, cfg)
    val bin = out.resolve(s"$binDir/20200128_1400.csv.gz")
    def lines(): Seq[String] = new String(
      new GZIPInputStream(Files.newInputStream(bin)).readAllBytes(), "UTF-8")
      .split("\n").toSeq
    val before = lines().size
    // second slice of the same topic (new offsets) lands in the same bins
    val more =
      "application_server_status/partition=1/application_server_status+1+0000000021.avro"
    Files.createDirectories(in.resolve(more).getParent)
    Files.copy(fixtures.resolve(more), in.resolve(more),
      StandardCopyOption.REPLACE_EXISTING)
    Restructure.run(spark, cfg)
    val after = lines()
    assert(after.size > before, s"gzip merge lost rows: $before -> ${after.size}")
    assert(after.head.startsWith("key.projectId"), "header preserved")
    assert(after.count(_.startsWith("key.projectId")) == 1, "single header after merge")
  }

  test("JSON-lines bins: nested objects, explicit nulls, one record per line") {
    val (in, out) = setup()
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString, format = "json"))
    // fixture file: 1 record in the 1300 bin, 2 in the 1400 bin
    val bin = out.resolve(s"$binDir/20200128_1300.json")
    assert(Files.exists(bin))
    val lines = Files.readAllLines(bin)
    assert(lines.size() == 1)
    assert(Files.readAllLines(out.resolve(s"$binDir/20200128_1400.json")).size() == 2)
    assert(lines.get(0).startsWith("{\"key\":{\"projectId\":\"STAGING_PROJECT\""))
    assert(lines.get(0).contains("\"ipAddress\":null")) // nulls written, not dropped
  }

  test("JSON append: second run merges with the existing bin (no data loss)") {
    val (in, out) = setup()
    val cfg = RestructureJobConfig(inputRoot = in.toString, outputRoot = out.toString, format = "json")
    Restructure.run(spark, cfg)
    val bin = out.resolve(s"$binDir/20200128_1400.json")
    val before = Files.readAllLines(bin).size
    // second file lands in the same bins
    val in2 = Files.createTempDirectory("graft-fmt-json2")
    val f2 = "application_server_status/partition=1/application_server_status+1+0000000021.avro"
    Files.createDirectories(in2.resolve(f2).getParent)
    Files.copy(fixtures.resolve(f2), in2.resolve(f2))
    Restructure.run(spark, cfg.copy(inputRoot = in2.toString,
      ledgerPath = Some(out.resolve("_ledger2.json").toString)))
    val after = Files.readAllLines(bin).size
    assert(after > before, s"JSON bin lost prior rows: $before -> $after")
    assert(Files.readAllLines(bin).get(0).startsWith("{\"key\":"))
  }

  test("JSON + zip: single-entry .json.zip bins, append merges through the unzip path") {
    val (in, out) = setup()
    val cfg = RestructureJobConfig(inputRoot = in.toString, outputRoot = out.toString,
      format = "json", zip = true)
    Restructure.run(spark, cfg)
    val bin = out.resolve(s"$binDir/20200128_1400.json.zip")
    assert(Files.exists(bin))
    def readLines(): Seq[String] = {
      val zin = new java.util.zip.ZipInputStream(Files.newInputStream(bin))
      val entry = zin.getNextEntry
      assert(entry.getName == "20200128_1400.json")
      val content = new String(zin.readAllBytes(), "UTF-8")
      assert(zin.getNextEntry == null)
      zin.close()
      content.linesIterator.toSeq
    }
    val before = readLines()
    assert(before.nonEmpty && before.head.startsWith("{\"key\":"))
    val in2 = Files.createTempDirectory("graft-fmt-jsonzip2")
    val f2 = "application_server_status/partition=1/application_server_status+1+0000000021.avro"
    Files.createDirectories(in2.resolve(f2).getParent)
    Files.copy(fixtures.resolve(f2), in2.resolve(f2))
    Restructure.run(spark, cfg.copy(inputRoot = in2.toString,
      ledgerPath = Some(out.resolve("_ledger2.json").toString)))
    val after = readLines()
    assert(after.size > before.size, s"json+zip merge lost rows: ${before.size} -> ${after.size}")
    assert(after.forall(_.startsWith("{")))
  }

  test("JSON + path plugin: enrichment columns route the path but never reach records") {
    import org.apache.spark.sql.functions.col
    import graft.paths.{MpDimensionSource, MpPathFormatterPlugin}
    val sql = spark
    import sql.implicits._
    val (in, out) = setup()
    val projects = Seq(("STAGING_PROJECT", "org-A", Map.empty[String, String]))
      .toDF("id", "organization", "attributes")
    val subjects = Seq(("STAGING_PROJECT", "1543bc93-3c17-4381-89a5-c5d6272b827c",
      "grpX", "ext-7", Map.empty[String, String]))
      .toDF("projectId", "id", "group", "externalId", "attributes")
    val plugin = new MpPathFormatterPlugin(new MpDimensionSource.Static(projects, subjects))
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString, format = "json",
      pathTemplate = "${mp:organization}/${mp:group}/${projectId}/${userId}/${topic}/${filename}",
      pathPlugins = Seq(plugin)))
    // path derived from the plugin's dimension join
    val bin = out.resolve(s"org-A/grpX/$binDir/20200128_1300.json")
    assert(Files.exists(bin), s"expected plugin-routed bin at $bin")
    val lines = Files.readAllLines(bin)
    assert(lines.size() == 1)
    // the __mp_* enrichment structs must not leak into written records
    assert(!lines.get(0).contains("__mp"), s"plugin columns leaked: ${lines.get(0)}")
    assert(lines.get(0).startsWith("{\"key\":{\"projectId\":\"STAGING_PROJECT\""))
  }

  test("corrupt existing target is quarantined, fresh bin written (K9)") {
    val (in, out) = setup()
    val cfg = RestructureJobConfig(inputRoot = in.toString, outputRoot = out.toString, gzip = true)
    // plant a corrupt .csv.gz where the bin will land
    val bin = out.resolve(s"$binDir/20200128_1300.csv.gz")
    Files.createDirectories(bin.getParent)
    Files.write(bin, Array[Byte](1, 2, 3, 4, 5))
    Restructure.run(spark, cfg)
    assert(Files.exists(out.resolve(s"$binDir/20200128_1300.csv.gz.corrupted")))
    val content = new String(
      new GZIPInputStream(Files.newInputStream(bin)).readAllBytes(), "UTF-8")
    assert(content.contains("CONNECTED"))
  }

  test("zip bins: single level-7 entry named without .zip, valid content (K6)") {
    val (in, out) = setup()
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString, zip = true))
    val bin = out.resolve(s"$binDir/20200128_1300.csv.zip")
    assert(Files.exists(bin))
    val zin = new java.util.zip.ZipInputStream(Files.newInputStream(bin))
    val entry = zin.getNextEntry
    assert(entry.getName == "20200128_1300.csv")
    val content = new String(zin.readAllBytes(), "UTF-8")
    assert(content.contains("1.58021982003E9,CONNECTED,"))
    assert(zin.getNextEntry == null) // single entry
    // idempotent re-run over same bin must merge through the zip
    val in2 = Files.createTempDirectory("graft-fmt-zip2")
    val f2 = "application_server_status/partition=1/application_server_status+1+0000000021.avro"
    Files.createDirectories(in2.resolve(f2).getParent)
    Files.copy(fixtures.resolve(f2), in2.resolve(f2))
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in2.toString, outputRoot = out.toString, zip = true,
      ledgerPath = Some(out.resolve("_ledger2.json").toString)))
    val zin2 = new java.util.zip.ZipInputStream(Files.newInputStream(bin))
    zin2.getNextEntry
    val merged = new String(zin2.readAllBytes(), "UTF-8")
    assert(merged.linesIterator.size > content.linesIterator.size)
  }

  test("topic-parallel run produces the same output as sequential") {
    val (in, out) = setup()
    // add the second topic
    val acc = "android_phone_acceleration/partition=0/android_phone_acceleration+0+0003018784.avro"
    Files.createDirectories(in.resolve(acc).getParent)
    Files.copy(fixtures.resolve(acc), in.resolve(acc))
    val r = Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString, topicParallelism = 2))
    assert(r.processedTopics.map(_.topic).toSet ==
      Set("application_server_status", "android_phone_acceleration"))
    assert(Files.exists(out.resolve(s"$binDir/20200128_1300.csv")))
    assert(r.ledger.contains("android_phone_acceleration", 0, 3018784, 3018784,
      java.time.Instant.EPOCH))
  }

  test("bucket routing prefixes the template-derived bucket (G8)") {
    val (in, out) = setup()
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString,
      bucketTemplate = Some("bucket-${value:serverStatus}")))
    assert(Files.exists(out.resolve(
      s"bucket-CONNECTED/$binDir/20200128_1300.csv")))
  }

  test("disabled bucket formats fall back to the default name (G8, " +
      "FormattedPathFactory.kt:51-60)") {
    val (in, out) = setup()
    // the formatted name is bucket-CONNECTED; the regex full-matches it
    // case-insensitively (Kotlin toRegex(IGNORE_CASE).matches parity)
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString,
      bucketTemplate = Some("bucket-${value:serverStatus}"),
      bucketDisabledFormats = Seq("bucket-conn.*"),
      bucketDefaultName = "safe-bucket"))
    assert(Files.exists(out.resolve(s"safe-bucket/$binDir/20200128_1300.csv")))
    assert(!Files.exists(out.resolve(s"bucket-CONNECTED/$binDir/20200128_1300.csv")))
  }

  test("a corrupt topic fails alone: other topics extract, failure reported, re-extract next run") {
    // reference RadarKafkaRestructure.kt:100-103 — per-topic isolation
    val (in, out) = setup() // good topic: application_server_status
    val badDir = in.resolve("broken_topic/partition=0")
    Files.createDirectories(badDir)
    Files.write(badDir.resolve("broken_topic+0+0000000000+0000000002.avro"),
      "this is not an avro container".getBytes)
    val cfg = RestructureJobConfig(inputRoot = in.toString, outputRoot = out.toString)
    val result = Restructure.run(spark, cfg)
    assert(result.processedTopics.map(_.topic) == Seq("application_server_status"),
      "good topic must extract despite the corrupt one")
    assert(result.failedTopics.map(_._1) == Seq("broken_topic"),
      s"corrupt topic must be reported: ${result.failedTopics}")
    assert(Files.exists(out.resolve(s"$binDir/20200128_1300.csv")))
    // the failed topic committed nothing to the ledger -> a later run (with
    // the file fixed) extracts it
    assert(!result.ledger.contains("broken_topic", 0, 0, 2, java.time.Instant.EPOCH))
    val result2 = Restructure.run(spark, cfg)
    assert(result2.failedTopics.map(_._1) == Seq("broken_topic"), "still failing, still isolated")
    assert(result2.processedTopics.isEmpty, "good topic already extracted (ledger)")
  }

  test("non-matching disabled formats leave the formatted bucket intact; " +
      "partial matches do not disable (full-match semantics)") {
    val (in, out) = setup()
    // "CONN" matches a substring only — Kotlin Regex.matches needs the
    // whole string, so the formatted bucket must survive
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString,
      bucketTemplate = Some("bucket-${value:serverStatus}"),
      bucketDisabledFormats = Seq("CONN", "other-bucket"),
      bucketDefaultName = "safe-bucket"))
    assert(Files.exists(out.resolve(
      s"bucket-CONNECTED/$binDir/20200128_1300.csv")))
    assert(!Files.exists(out.resolve(s"safe-bucket/$binDir/20200128_1300.csv")))
  }
}
