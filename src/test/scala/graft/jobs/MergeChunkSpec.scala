package graft.jobs

import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec

/** Chunked merge-planning equivalence (the 10^7-pre-existing-bins driver
  * ceiling): when a batch touches more existing bins than
  * `mergeChunkBins`, the merge plans and COMMITS per chunk via
  * toLocalIterator instead of collecting the full existing-path list.
  * These tests force multi-chunk consumption at toy scale (chunk size 2
  * against 6-8 existing bins) and assert byte-value equivalence with the
  * single-collect plan an unchunked config produces — same bins, same
  * merged rows, same dedup survivors.
  */
class MergeChunkSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"R","fields":[
      |{"name":"key","type":{"type":"record","name":"K","fields":[
      |  {"name":"userId","type":"string"}]}},
      |{"name":"value","type":{"type":"record","name":"V","fields":[
      |  {"name":"time","type":"double"},
      |  {"name":"v","type":"string"}]}}]}""".stripMargin

  private def writeAvro(dir: java.nio.file.Path, name: String,
      rows: Seq[(String, String)], baseTime: Double): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, dir.resolve(name).toFile)
    rows.foreach { case (u, v) =>
      val k = new GenericData.Record(schema.getField("key").schema)
      k.put("userId", u)
      val value = new GenericData.Record(schema.getField("value").schema)
      value.put("time", baseTime); value.put("v", v)
      val r = new GenericData.Record(schema)
      r.put("key", k); r.put("value", value)
      w.append(r)
    }
    w.close()
  }

  /** (binRelativePath -> sorted data lines) for every csv/json bin under out. */
  private def binContents(out: java.nio.file.Path, ext: String): Map[String, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    Files.walk(out).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(ext) &&
        !p.getFileName.toString.startsWith(".") &&
        !p.getFileName.toString.startsWith("schema-") &&
        !p.getFileName.toString.startsWith("_"))
      .map { p =>
        val lines = Files.readAllLines(p).asScala.toSeq
        out.relativize(p).toString -> (if (ext == ".csv") lines.drop(1).sorted else lines.sorted)
      }.toMap
  }

  private def runBoth(format: String, dedup: Boolean): Unit = {
    val users1 = (0 until 6).map(i => s"u$i")
    val users2 = (0 until 8).map(i => s"u$i") // u6,u7 are NEW bins on append
    def mkWork(): (java.nio.file.Path, java.nio.file.Path) = {
      val work = Files.createTempDirectory("graft-chunk")
      val dir = work.resolve("in/topicA/partition=0")
      Files.createDirectories(dir)
      writeAvro(dir, "topicA+0+0000000000+0000000011.avro",
        users1.flatMap(u => Seq(u -> s"$u-a", u -> s"$u-b")), 1.6095816e9)
      (work, dir)
    }
    def append(dir: java.nio.file.Path): Unit =
      writeAvro(dir, "topicA+0+0000000012+0000000027.avro",
        users2.flatMap(u => Seq(u -> s"$u-b", u -> s"$u-c")), 1.6095816e9)

    def go(chunk: Int): Map[String, Seq[String]] = {
      val (work, dir) = mkWork()
      val cfg = RestructureJobConfig(
        inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
        format = format, dedup = dedup, mergeChunkBins = chunk)
      Restructure.run(spark, cfg)
      append(dir)
      Restructure.run(spark, cfg)
      binContents(work.resolve("out"), if (format == "json") ".json" else ".csv")
    }

    // chunk=2 forces ceil(6/2)=3 chunks + a new-bins remainder commit;
    // the default config collects once — outputs must be identical
    val chunked = go(2)
    val single = go(1000000)
    assert(chunked.keySet == single.keySet,
      s"bin sets diverge: ${chunked.keySet.diff(single.keySet)} vs ${single.keySet.diff(chunked.keySet)}")
    assert(chunked.keySet.size == 8, s"expected 8 bins, got ${chunked.keySet.size}")
    for ((bin, lines) <- chunked)
      assert(lines == single(bin), s"bin $bin diverges under chunked merge:\n$lines\nvs\n${single(bin)}")
  }

  test("chunked csv append-merge ≡ single-collect plan (existing + new bins, no dedup)") {
    runBoth("csv", dedup = false)
  }

  test("chunked csv append-merge ≡ single-collect plan with keep-last dedup") {
    // the duplicated value per user (u-b appears in both batches) must
    // dedup identically whether its bin committed in chunk 1 or chunk 3
    runBoth("csv", dedup = true)
  }

  test("chunked json append-merge ≡ single-collect plan") {
    runBoth("json", dedup = true)
  }

  test("chunked zip append-merge ≡ single-collect plan (single-scan unzip path)") {
    def go(chunk: Int): Map[String, Seq[String]] = {
      val work = Files.createTempDirectory("graft-chunk-zip")
      val dir = work.resolve("in/topicA/partition=0")
      Files.createDirectories(dir)
      val users1 = (0 until 6).map(i => s"u$i")
      val users2 = (0 until 8).map(i => s"u$i")
      writeAvro(dir, "topicA+0+0000000000+0000000011.avro",
        users1.flatMap(u => Seq(u -> s"$u-a", u -> s"$u-b")), 1.6095816e9)
      val cfg = RestructureJobConfig(
        inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
        zip = true, mergeChunkBins = chunk)
      Restructure.run(spark, cfg)
      writeAvro(dir, "topicA+0+0000000012+0000000027.avro",
        users2.flatMap(u => Seq(u -> s"$u-b", u -> s"$u-c")), 1.6095816e9)
      Restructure.run(spark, cfg)
      import scala.jdk.CollectionConverters._
      Files.walk(work.resolve("out")).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".csv.zip"))
        .map { p =>
          val zin = new java.util.zip.ZipInputStream(Files.newInputStream(p))
          assert(zin.getNextEntry != null)
          val lines = new String(zin.readAllBytes(), "UTF-8").linesIterator.toSeq
          zin.close()
          work.resolve("out").relativize(p).toString -> lines.drop(1).sorted
        }.toMap
    }
    val chunked = go(2)
    val single = go(1000000)
    assert(chunked.keySet == single.keySet && chunked.keySet.size == 8)
    for ((bin, lines) <- chunked)
      assert(lines == single(bin), s"zip bin $bin diverges:\n$lines\nvs\n${single(bin)}")
    // no unzip temp residue survives the commits
    assert(!chunked.keySet.exists(_.contains("graft-unzip")))
  }

  test("property: chunked ≡ single-collect across random corpus shapes and chunk sizes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val gen = for {
      nUsers1 <- Gen.chooseNum(2, 7)
      extra <- Gen.chooseNum(0, 4)      // users appearing only in batch 2
      chunkSize <- Gen.chooseNum(1, 4)  // vs nUsers1 existing bins
      dedup <- Gen.oneOf(true, false)
      hours <- Gen.chooseNum(1, 2)      // 1-2 time bins per user
    } yield (nUsers1, extra, chunkSize, dedup, hours)
    val prop = Prop.forAll(gen) { case (nUsers1, extra, chunkSize, dedup, hours) =>
      def go(chunk: Int): Map[String, Seq[String]] = {
        val work = Files.createTempDirectory("graft-chunk-prop")
        val dir = work.resolve("in/topicA/partition=0")
        Files.createDirectories(dir)
        def rows(users: Seq[String], tag: String) = users.flatMap { u =>
          (0 until hours).map(h => (u, s"$u-$tag-h$h"))
        }
        val users1 = (0 until nUsers1).map(i => s"u$i")
        val users2 = (0 until nUsers1 + extra).map(i => s"u$i")
        val b1 = rows(users1, "a") ++ rows(users1, "b") // "b" rows duplicate keys later
        val b2 = rows(users2, "b") ++ rows(users2, "c")
        writeAvro(dir, f"topicA+0+${0}%010d+${b1.size - 1}%010d.avro", b1, 1.6095816e9)
        val cfg = RestructureJobConfig(
          inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
          dedup = dedup, mergeChunkBins = chunk)
        Restructure.run(spark, cfg)
        writeAvro(dir, f"topicA+0+${b1.size}%010d+${b1.size + b2.size - 1}%010d.avro",
          b2, 1.6095816e9)
        Restructure.run(spark, cfg)
        binContents(work.resolve("out"), ".csv")
      }
      val chunked = go(chunkSize)
      val single = go(1000000)
      val ok = chunked == single
      if (!ok) Console.err.println(
        s"[chunkprop] users=$nUsers1+$extra chunk=$chunkSize dedup=$dedup hours=$hours:\n$chunked\nvs\n$single")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withInitialSeed(Seed(1111L)), prop)
    assert(res.passed, s"chunk-equivalence property failed: ${res.status}")
  }

  test("crash-between-chunks recovery: re-running the batch after a lost ledger is idempotent") {
    // the chunked-commit safety argument rests on this: a crash after
    // some chunks committed but BEFORE the ledger flush re-runs the WHOLE
    // batch, and the append contract (existing rows join the merge and
    // dedup keeps one copy) must converge to the same bins — simulated
    // here by deleting the ledger after a chunked append and re-running
    val work = Files.createTempDirectory("graft-chunk-crash")
    val dir = work.resolve("in/topicA/partition=0")
    Files.createDirectories(dir)
    val users = (0 until 8).map(i => s"u$i")
    writeAvro(dir, "topicA+0+0000000000+0000000015.avro",
      users.flatMap(u => Seq(u -> s"$u-a", u -> s"$u-b")), 1.6095816e9)
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
      dedup = true, mergeChunkBins = 2)
    Restructure.run(spark, cfg)
    writeAvro(dir, "topicA+0+0000000016+0000000031.avro",
      users.flatMap(u => Seq(u -> s"$u-b", u -> s"$u-c")), 1.6095816e9)
    Restructure.run(spark, cfg) // chunked append (4 chunks)
    val afterAppend = binContents(work.resolve("out"), ".csv")
    // "crash": the ledger flush never happened — wipe it and re-run the
    // same input state; every file re-extracts into the existing bins
    Files.delete(work.resolve("out/_ledger.json"))
    Restructure.run(spark, cfg)
    val afterReplay = binContents(work.resolve("out"), ".csv")
    assert(afterReplay == afterAppend,
      s"replay diverged:\n$afterReplay\nvs\n$afterAppend")
  }

  test("crash BETWEEN chunks: partially committed bins replay to byte-identical bins and ledger") {
    // The per-chunk safety argument: chunks PARTITION the bin space, so at
    // any crash point each bin is either wholly old or wholly merged, and
    // the ledger holds only the PREVIOUS batch's marks (it flushes after
    // the whole topic). This test constructs that exact intermediate state
    // — some bins merged (the committed chunks), the rest restored to
    // their pre-append bytes, ledger restored to its post-run-1 state —
    // then re-runs and asserts the final bins are BYTE-identical to the
    // crash-free chunked append, and the ledger covers the same ranges.
    import scala.jdk.CollectionConverters._
    val work = Files.createTempDirectory("graft-chunk-midcrash")
    val dir = work.resolve("in/topicA/partition=0")
    Files.createDirectories(dir)
    val users = (0 until 8).map(i => s"u$i")
    writeAvro(dir, "topicA+0+0000000000+0000000015.avro",
      users.flatMap(u => Seq(u -> s"$u-a", u -> s"$u-b")), 1.6095816e9)
    val out = work.resolve("out")
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = out.toString,
      dedup = true, mergeChunkBins = 2)
    Restructure.run(spark, cfg)
    def binFiles(): Map[String, Array[Byte]] =
      Files.walk(out).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".csv") &&
          !p.getFileName.toString.startsWith("."))
        .map(p => out.relativize(p).toString -> Files.readAllBytes(p)).toMap
    def ledgerRanges(): String =
      new String(Files.readAllBytes(out.resolve("_ledger.json")), "UTF-8")
        .replaceAll(""","lastProcessed":"[^"]*"""", "")
    val preAppendBins = binFiles()
    val preAppendLedger = Files.readAllBytes(out.resolve("_ledger.json"))
    writeAvro(dir, "topicA+0+0000000016+0000000031.avro",
      users.flatMap(u => Seq(u -> s"$u-b", u -> s"$u-c")), 1.6095816e9)
    Restructure.run(spark, cfg) // clean chunked append: 4 chunks of 2 bins
    val cleanBins = binFiles()
    val cleanLedger = ledgerRanges()
    assert(cleanBins.keySet == preAppendBins.keySet && cleanBins.keySet.size == 8)
    // crash state: chunks are consumed in hash-partition order, so ANY
    // subset of bins rolled back to pre-append content is a reachable
    // crash point; roll back 5 of 8 and restore the run-1 ledger
    val rolledBack = cleanBins.keySet.toSeq.sorted.drop(3)
    rolledBack.foreach(p => Files.write(out.resolve(p), preAppendBins(p)))
    Files.write(out.resolve("_ledger.json"), preAppendLedger)
    Restructure.run(spark, cfg) // replay of the appending batch
    val replayBins = binFiles()
    assert(replayBins.keySet == cleanBins.keySet)
    for ((p, bytes) <- replayBins)
      assert(java.util.Arrays.equals(bytes, cleanBins(p)),
        s"bin $p not byte-identical after mid-chunk crash replay:\n" +
          s"${new String(bytes, "UTF-8")}\nvs\n${new String(cleanBins(p), "UTF-8")}")
    assert(ledgerRanges() == cleanLedger,
      s"ledger ranges diverged after replay:\n${ledgerRanges()}\nvs\n$cleanLedger")
  }

  test("crash BETWEEN chunks, zip mode: partial commits replay to identical bin contents") {
    // same crash construction as the csv case, but zip bins are NOT
    // byte-deterministic (the single zip entry embeds its write mtime), so
    // the invariant is identical unzipped CONTENT + ledger ranges
    import scala.jdk.CollectionConverters._
    val work = Files.createTempDirectory("graft-chunk-zipcrash")
    val dir = work.resolve("in/topicA/partition=0")
    Files.createDirectories(dir)
    val users = (0 until 6).map(i => s"u$i")
    writeAvro(dir, "topicA+0+0000000000+0000000011.avro",
      users.flatMap(u => Seq(u -> s"$u-a", u -> s"$u-b")), 1.6095816e9)
    val out = work.resolve("out")
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = out.toString,
      dedup = true, zip = true, mergeChunkBins = 2)
    Restructure.run(spark, cfg)
    def zipBins(): Map[String, (Array[Byte], Seq[String])] =
      Files.walk(out).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".csv.zip"))
        .map { p =>
          val zin = new java.util.zip.ZipInputStream(Files.newInputStream(p))
          assert(zin.getNextEntry != null)
          val content = new String(zin.readAllBytes(), "UTF-8")
          zin.close()
          out.relativize(p).toString -> (Files.readAllBytes(p), content.linesIterator.toSeq)
        }.toMap
    def ledgerRanges(): String =
      new String(Files.readAllBytes(out.resolve("_ledger.json")), "UTF-8")
        .replaceAll(""","lastProcessed":"[^"]*"""", "")
    val preBins = zipBins()
    val preLedger = Files.readAllBytes(out.resolve("_ledger.json"))
    writeAvro(dir, "topicA+0+0000000012+0000000023.avro",
      users.flatMap(u => Seq(u -> s"$u-b", u -> s"$u-c")), 1.6095816e9)
    Restructure.run(spark, cfg) // clean chunked zip append (3 chunks)
    val cleanBins = zipBins()
    val cleanLedger = ledgerRanges()
    assert(cleanBins.keySet.size == 6)
    // crash state: roll 4 of 6 bins back to their pre-append ZIP BYTES and
    // restore the run-1 ledger
    cleanBins.keySet.toSeq.sorted.drop(2).foreach(p =>
      Files.write(out.resolve(p), preBins(p)._1))
    Files.write(out.resolve("_ledger.json"), preLedger)
    Restructure.run(spark, cfg)
    val replayBins = zipBins()
    assert(replayBins.keySet == cleanBins.keySet)
    for ((p, (_, lines)) <- replayBins)
      assert(lines == cleanBins(p)._2,
        s"zip bin $p content diverged after mid-chunk crash replay:\n$lines\nvs\n${cleanBins(p)._2}")
    assert(ledgerRanges() == cleanLedger)
    // no unzip temp residue from any of the three runs
    assert(!Files.walk(out).iterator().asScala.exists(_.getFileName.toString.contains("graft-unzip")))
  }

  test("crash-orphaned unzip temp dirs: stale ones reclaimed at job entry, fresh ones spared") {
    val work = Files.createTempDirectory("graft-chunk-unzsweep")
    val dir = work.resolve("in/topicA/partition=0")
    Files.createDirectories(dir)
    writeAvro(dir, "topicA+0+0000000000+0000000001.avro",
      Seq("u0" -> "a", "u1" -> "b"), 1.6095816e9)
    val out = work.resolve("out")
    Files.createDirectories(out)
    // a crashed run's leftover (old mtime, old entries), a concurrent run's
    // recent temp, and a LONG-RUNNING concurrent unzip: dir mtime past the
    // age bar but entries still being written — liveness is keyed on the
    // newest entry, so only the fully idle temp may be reclaimed
    val stale = out.resolve(".graft-unzip-dead")
    val live = out.resolve(".graft-unzip-live")
    val longRunning = out.resolve(".graft-unzip-longrun")
    Files.createDirectories(stale); Files.createDirectories(live)
    Files.createDirectories(longRunning)
    val oldMs = System.currentTimeMillis() - 2 * 3600 * 1000L
    Files.write(stale.resolve("x.unz"), "junk".getBytes)
    Files.setLastModifiedTime(stale.resolve("x.unz"),
      java.nio.file.attribute.FileTime.fromMillis(oldMs))
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(oldMs))
    // the fresh entry sits SEVERAL path segments down (real unzip temps use
    // multi-segment $p.unz bin paths) and every DIRECTORY on the way is old
    // (creating a file only touches its immediate parent, which we also age
    // to model a long-lived leaf dir): liveness must come from a RECURSIVE
    // newest-file scan — a one-level child look would reclaim this live temp
    val deep = longRunning.resolve("proj/user/topic")
    Files.createDirectories(deep)
    Files.write(deep.resolve("fresh.unz"), "live".getBytes)
    val oldFt = java.nio.file.attribute.FileTime.fromMillis(oldMs)
    Files.setLastModifiedTime(deep, oldFt)
    Files.setLastModifiedTime(deep.getParent, oldFt)
    Files.setLastModifiedTime(deep.getParent.getParent, oldFt)
    Files.setLastModifiedTime(longRunning,
      java.nio.file.attribute.FileTime.fromMillis(oldMs))
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = out.toString))
    assert(!Files.exists(stale), "stale unzip temp not reclaimed")
    assert(Files.exists(live), "live (recent) unzip temp must be spared")
    assert(Files.exists(longRunning),
      "old dir with fresh entries is a live long unzip — must be spared")
  }

  test("written-paths report: exact count, sample bounded by maxReportedPaths") {
    val work = Files.createTempDirectory("graft-chunk-report")
    val dir = work.resolve("in/topicA/partition=0")
    Files.createDirectories(dir)
    val users = (0 until 8).map(i => s"u$i")
    writeAvro(dir, "topicA+0+0000000000+0000000007.avro",
      users.map(u => u -> s"$u-a"), 1.6095816e9)
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
      maxReportedPaths = 3)
    val result = Restructure.run(spark, cfg)
    val bins = result.processedTopics.head.bins
    assert(bins.count == 8, s"count must stay exact above the cap: $bins")
    assert(bins.sample.size == 3, s"sample must be cap-bounded: $bins")
    assert(bins.sample == bins.sample.sorted)
    // below the cap the sample IS the full sorted list
    val work2 = Files.createTempDirectory("graft-chunk-report2")
    val dir2 = work2.resolve("in/topicA/partition=0")
    Files.createDirectories(dir2)
    writeAvro(dir2, "topicA+0+0000000000+0000000003.avro",
      users.take(2).map(u => u -> s"$u-a"), 1.6095816e9)
    val r2 = Restructure.run(spark, RestructureJobConfig(
      inputRoot = work2.resolve("in").toString, outputRoot = work2.resolve("out").toString))
    val b2 = r2.processedTopics.head.bins
    assert(b2.count == 2 && b2.sample.size == 2, s"small runs report every path: $b2")
  }

  test("zip merge plans ONE scan per header group, not one per bin") {
    val work = Files.createTempDirectory("graft-chunk-plan")
    val dir = work.resolve("in/topicA/partition=0")
    Files.createDirectories(dir)
    val users = (0 until 8).map(i => s"u$i")
    writeAvro(dir, "topicA+0+0000000000+0000000007.avro",
      users.map(u => u -> s"$u-a"), 1.6095816e9)
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
      zip = true)
    Restructure.run(spark, cfg)
    import scala.jdk.CollectionConverters._
    val bins = Files.walk(work.resolve("out")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".csv.zip"))
      .map(p => work.resolve("out").relativize(p).toString).toSeq
    assert(bins.size == 8)
    import spark.implicits._
    val prepared = Seq.empty[(String, String, String, String, Long)]
      .toDF("key.userId", "value.time", "value.v", "__path", "__pos")
      .withColumn("__file", org.apache.spark.sql.functions.lit(""))
    val fs = new org.apache.hadoop.fs.Path(cfg.outputRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val temps = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    try {
      val merged = Restructure.mergeChunk(spark, cfg, fs, prepared,
        bins.map(p => (p, 0, "")), "csv", None, temps)
      // all 8 bins share one header -> exactly ONE existing-bin read in
      // the plan (plus the in-memory prepared leaf); a per-bin fold would
      // show 8. The bespoke whole-file bin reader surfaces as a LogicalRDD
      // leaf (it was a file-source LogicalRelation before round 17).
      val scans = merged.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
      assert(scans.size == 1, s"expected one existing-bin read, got ${scans.size}")
    } finally temps.foreach(t => fs.delete(t, true))
  }
}
