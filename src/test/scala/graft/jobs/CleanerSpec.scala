package graft.jobs

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SparkSpec

class CleanerSpec extends SparkSpec {

  private val fixtures = Paths.get("/root/reference/src/integrationTest/resources")
  private val closedFile =
    "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro"
  private val openFile =
    "application_server_status/partition=1/application_server_status+1+0000000021.avro"

  private def setup(): (Path, Path, RestructureJobConfig) = {
    val work = Files.createTempDirectory("graft-cleaner")
    val in = work.resolve("in")
    val out = work.resolve("out")
    Seq(closedFile, openFile).foreach { f =>
      Files.createDirectories(in.resolve(f).getParent)
      Files.copy(fixtures.resolve(f), in.resolve(f), StandardCopyOption.REPLACE_EXISTING)
    }
    val cfg = RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString,
      topics = Map("application_server_status" -> TopicJobConfig(
        pathTemplate = Some("${projectId}/${userId}/${topic}/${value:serverStatus}/${filename}"))))
    (in, out, cfg)
  }

  test("cleaner deletes verified closed-range file, keeps newest open-ended file") {
    val (in, _, cfg) = setup()
    Restructure.run(spark, cfg)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.deleted.map(p => Paths.get(p).getFileName.toString) ==
      Seq("application_server_status+1+0000000018+0000000020.avro"))
    assert(result.rolledBack.isEmpty)
    assert(!Files.exists(in.resolve(closedFile)))
    assert(Files.exists(in.resolve(openFile)))
  }

  test("chunked target verification (mergeChunkBins=1) reaches the same delete/rollback verdicts") {
    // the fixture's records span several serverStatus bins, so chunk size 1
    // forces multiple per-chunk anti-join passes plus the no-target
    // remainder pass; verdicts must match the single-pass plan exactly
    val (in, _, cfg0) = setup()
    val cfg = cfg0.copy(mergeChunkBins = 1)
    Restructure.run(spark, cfg)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.deleted.map(p => Paths.get(p).getFileName.toString) ==
      Seq("application_server_status+1+0000000018+0000000020.avro"))
    assert(result.rolledBack.isEmpty)
    assert(!Files.exists(in.resolve(closedFile)))
    assert(Files.exists(in.resolve(openFile)))
    // and a bin deleted out from under the cleaner rolls back, chunked too
    val (in2, out2, cfg2a) = setup()
    val cfg2 = cfg2a.copy(mergeChunkBins = 1)
    Restructure.run(spark, cfg2)
    import scala.jdk.CollectionConverters._
    Files.walk(out2).iterator().asScala
      .filter(p => p.toString.endsWith(".csv")).foreach(Files.delete)
    val r2 = Cleaner.run(spark, cfg2, ageMs = 0)
    assert(r2.deleted.isEmpty && r2.rolledBack.nonEmpty)
    assert(Files.exists(in2.resolve(closedFile)))
  }

  test("cleaner.maxFilesPerTopic caps deletions per iteration; next run takes the rest") {
    val (in, _, cfg) = setup()
    Restructure.run(spark, cfg)
    // cap 0: eligible file survives this iteration
    val capped = Cleaner.run(spark, cfg, ageMs = 0, maxFilesPerTopic = Some(0))
    assert(capped.deleted.isEmpty && Files.exists(in.resolve(closedFile)))
    // next iteration with headroom deletes it
    val next = Cleaner.run(spark, cfg, ageMs = 0, maxFilesPerTopic = Some(1))
    assert(next.deleted.size == 1 && !Files.exists(in.resolve(closedFile)))
  }

  test("verification round-trips EVERY time-field flavor of the extraction chain") {
    // TimeExtract's chain and the cleaner's render-back converter chain are
    // dual implementations — this sweep pins them per flavor: a drift in
    // any converter would leave records "missing" and the file undeleted
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    final case class Flavor(name: String, keyField: Option[(String, String)],
        valueField: Option[(String, String)], put: (GenericData.Record, GenericData.Record, Int) => Unit)
    val flavors = Seq(
      Flavor("value.time", None, Some(("time", "double")),
        (_, v, i) => v.put("time", 1.58021982e9 + i * 7200)),
      Flavor("key.timeStart", Some(("timeStart", "double")), None,
        (k, _, i) => k.put("timeStart", 1.58021982e9 + i * 7200)),
      Flavor("key.start", Some(("start", "long")), None,
        (k, _, i) => k.put("start", 1580219820000L + i * 7200000L)),
      Flavor("value.dateTime", None, Some(("dateTime", "string")),
        (_, v, i) => v.put("dateTime", f"2020-01-28T${10 + i}%02d:00:00Z")),
      Flavor("value.date", None, Some(("date", "string")),
        (_, v, i) => v.put("date", f"2020-01-${10 + i}%02d")),
      Flavor("value.timeReceived", None, Some(("timeReceived", "double")),
        (_, v, i) => v.put("timeReceived", 1.58021982e9 + i * 7200)),
      Flavor("value.timeCompleted", None, Some(("timeCompleted", "double")),
        (_, v, i) => v.put("timeCompleted", 1.58021982e9 + i * 7200)))
    flavors.foreach { fl =>
      val keyExtra = fl.keyField.fold("")(f => s""",{"name":"${f._1}","type":"${f._2}"}""")
      val valExtra = fl.valueField.fold("")(f => s""",{"name":"${f._1}","type":"${f._2}"}""")
      val schema = new Schema.Parser().parse(
        s"""{"type":"record","name":"R","fields":[
           |{"name":"key","type":{"type":"record","name":"K","fields":[
           |  {"name":"userId","type":"string"}$keyExtra]}},
           |{"name":"value","type":{"type":"record","name":"V","fields":[
           |  {"name":"x","type":"string"}$valExtra]}}]}""".stripMargin)
      val work = Files.createTempDirectory(s"graft-clnchain")
      val dir = work.resolve("in/t/partition=0")
      Files.createDirectories(dir)
      def write(name: String, is: Range): Unit = {
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, dir.resolve(name).toFile)
        is.foreach { i =>
          val k = new GenericData.Record(schema.getField("key").schema)
          k.put("userId", "u1")
          val v = new GenericData.Record(schema.getField("value").schema)
          v.put("x", s"r$i")
          fl.put(k, v, i)
          val r = new GenericData.Record(schema)
          r.put("key", k); r.put("value", v)
          w.append(r)
        }
        w.close()
      }
      write("t+0+0000000000+0000000002.avro", 0 until 3)
      write("t+0+0000000003+0000000005.avro", 3 until 6)
      val cfg = RestructureJobConfig(
        inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString)
      val run = Restructure.run(spark, cfg)
      assert(run.failedTopics.isEmpty, s"[${fl.name}] ${run.failedTopics}")
      val result = Cleaner.run(spark, cfg, ageMs = 0)
      assert(result.failedTopics.isEmpty, s"[${fl.name}] ${result.failedTopics}")
      assert(result.deleted.map(p => Paths.get(p).getFileName.toString) ==
        Seq("t+0+0000000000+0000000002.avro"),
        s"[${fl.name}] chain round-trip failed: deleted=${result.deleted} " +
          s"rolledBack=${result.rolledBack}")
    }
  }

  test("a topic whose source turned unreadable fails alone: others still delete") {
    // reference SourceDataCleaner.kt:67-69 warn-and-continue semantics
    val (in, _, cfg) = setup()
    val badClosed = in.resolve("bad_topic/partition=1/bad_topic+1+0000000018+0000000020.avro")
    val badOpen = in.resolve("bad_topic/partition=1/bad_topic+1+0000000021.avro")
    Files.createDirectories(badClosed.getParent)
    Files.copy(fixtures.resolve(closedFile), badClosed)
    Files.copy(fixtures.resolve(openFile), badOpen)
    Restructure.run(spark, cfg) // extracts both topics, ledger covers both
    // source rot: the extracted file is later corrupted in place; mtime kept
    // old so the ledger still considers it processed (eligible for deletion)
    Files.write(badClosed, "no longer an avro container".getBytes)
    badClosed.toFile.setLastModified(1000L)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.deleted.map(p => Paths.get(p).getFileName.toString) ==
      Seq("application_server_status+1+0000000018+0000000020.avro"),
      s"good topic must still delete: ${result.deleted}")
    assert(result.failedTopics.map(_._1) == Seq("bad_topic"), s"${result.failedTopics}")
    assert(Files.exists(badClosed), "failed topic's files must stay put")
  }

  test("cleaner verifies gzip-compressed bins (header read through the decompressor)") {
    val (in, _, cfg0) = setup()
    val cfg = cfg0.copy(gzip = true)
    Restructure.run(spark, cfg)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.rolledBack.isEmpty && result.deleted.nonEmpty)
    assert(!Files.exists(in.resolve(closedFile)))
  }

  test("cleaner verifies JSON-format output (typed leaf lookup, inference read)") {
    // the JSON verification branch resolves the stored time field as a
    // nested leaf over inferred JSON — previously untested; chunked too
    for (chunk <- Seq(1000000, 1)) {
      val (in, out, cfg0) = setup()
      val cfg = cfg0.copy(format = "json", mergeChunkBins = chunk)
      Restructure.run(spark, cfg)
      val result = Cleaner.run(spark, cfg, ageMs = 0)
      assert(result.rolledBack.isEmpty, s"chunk=$chunk: json bins unreadable during verification")
      assert(result.deleted.map(p => Paths.get(p).getFileName.toString) ==
        Seq("application_server_status+1+0000000018+0000000020.avro"), s"chunk=$chunk")
      assert(!Files.exists(in.resolve(closedFile)) && Files.exists(in.resolve(openFile)))
      // and a json bin deleted out from under the cleaner rolls back
      import scala.jdk.CollectionConverters._
      val (in2, out2, cfg2a) = setup()
      val cfg2 = cfg2a.copy(format = "json", mergeChunkBins = chunk)
      Restructure.run(spark, cfg2)
      Files.walk(out2).iterator().asScala
        .filter(p => p.toString.endsWith(".json") &&
          !p.getFileName.toString.startsWith("schema-") &&
          !p.getFileName.toString.startsWith("_")).foreach(Files.delete)
      val r2 = Cleaner.run(spark, cfg2, ageMs = 0)
      assert(r2.deleted.isEmpty && r2.rolledBack.nonEmpty, s"chunk=$chunk: $r2")
      assert(Files.exists(in2.resolve(closedFile)))
    }
  }

  test("cleaner verifies through zip bins (decompressed read)") {
    val (in, _, cfg0) = setup()
    val cfg = cfg0.copy(zip = true)
    Restructure.run(spark, cfg)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.rolledBack.isEmpty, "zip bins must be readable during verification")
    assert(result.deleted.nonEmpty)
    assert(!Files.exists(in.resolve(closedFile)))
    // no unzip temp directories left behind on the output tree
    import scala.jdk.CollectionConverters._
    val outDir = java.nio.file.Paths.get(cfg.outputRoot)
    val leftovers = java.nio.file.Files.walk(outDir).iterator().asScala
      .filter(_.getFileName.toString.contains("graft-unzip")).toSeq
    assert(leftovers.isEmpty, s"unzip temps leaked: $leftovers")
  }

  test("cleaner verifies zip bins CHUNKED (mergeChunkBins=1): same verdicts, no temp leaks") {
    val (in, _, cfg0) = setup()
    val cfg = cfg0.copy(zip = true, mergeChunkBins = 1)
    Restructure.run(spark, cfg)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.rolledBack.isEmpty && result.deleted.nonEmpty)
    assert(!Files.exists(in.resolve(closedFile)))
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.walk(java.nio.file.Paths.get(cfg.outputRoot))
      .iterator().asScala.filter(_.getFileName.toString.contains("graft-unzip")).toSeq
    assert(leftovers.isEmpty, s"unzip temps leaked: $leftovers")
  }

  test("verification converts key.start millis to seconds (priority chain parity)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"userId","type":"string"},{"name":"start","type":"long"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"n","type":"int"}]}}]}""".stripMargin)
    val work = Files.createTempDirectory("graft-clean-ms")
    val dir = work.resolve("in/ms_topic/partition=0")
    Files.createDirectories(dir)
    def write(name: String, startMs: Long): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, dir.resolve(name).toFile)
      val k = new GenericData.Record(schema.getField("key").schema)
      k.put("userId", "u1"); k.put("start", startMs)
      val v = new GenericData.Record(schema.getField("value").schema)
      v.put("n", 1)
      val r = new GenericData.Record(schema)
      r.put("key", k); r.put("value", v)
      w.append(r); w.close()
    }
    write("ms_topic+0+0000000000+0000000000.avro", 1609581600000L) // 2021-01-02T10:00Z
    write("ms_topic+0+0000000001.avro", 1609581601000L)            // newest, kept
    val cfg = RestructureJobConfig(inputRoot = work.resolve("in").toString,
      outputRoot = work.resolve("out").toString)
    Restructure.run(spark, cfg)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.rolledBack.isEmpty,
      "millis/seconds mismatch would make verification fail and roll back")
    assert(result.deleted.map(p => Paths.get(p).getFileName.toString) ==
      Seq("ms_topic+0+0000000000+0000000000.avro"))
  }

  test("failed verification rolls ledger back instead of deleting; re-run re-extracts") {
    val (in, out, cfg) = setup()
    val r1 = Restructure.run(spark, cfg)
    // corrupt the output: remove one bin file the records live in
    val bin = out.resolve(
      "STAGING_PROJECT/1543bc93-3c17-4381-89a5-c5d6272b827c/application_server_status/CONNECTED/20200128_1300.csv")
    Files.delete(bin)
    val result = Cleaner.run(spark, cfg, ageMs = 0)
    assert(result.deleted.isEmpty)
    assert(result.rolledBack.nonEmpty)
    assert(Files.exists(in.resolve(closedFile)))
    // rollback makes the file visible to restructure again
    val r2 = Restructure.run(spark, cfg)
    assert(r2.processedTopics.exists(_.files.exists(_.endsWith("0000000018+0000000020.avro"))))
    assert(Files.exists(bin))
  }
}
