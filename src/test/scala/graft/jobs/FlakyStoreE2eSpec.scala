package graft.jobs

import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}

import graft.SparkSpec

/** A registered Hadoop FileSystem (scheme `flaky`) over local storage whose
  * `rename` misbehaves in configurable ways, scoped to BinWriter commit
  * temps (`.name.tmp-*` sources) so ledger/quarantine renames pass through.
  * Mode and counters are JVM-global statics because local-mode executors
  * share the driver process — exactly the property that lets an e2e drive
  * the executor-side commit path through the double.
  */
class FlakyLocalFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = FlakyLocalFileSystem.FsUri

  // SWEEP-BEFORE-COMMIT misbehavior: an external dot-temp cleanup deletes
  // the bin temp BEFORE renameOver's first stat (srcLen = -1 path), while
  // the target already carries either a speculative twin's IDENTICAL bytes
  // ("sweep-temp-twin" — must be adopted via the write-time fingerprint) or
  // a foreign writer's same-length INVERTED bytes ("sweep-temp-foreign" —
  // only the content fingerprint can refuse it; length matches). Plain
  // java.io/nio operations avoid re-entering the Hadoop layer.
  override def getFileStatus(f: HPath): org.apache.hadoop.fs.FileStatus = {
    val m = FlakyLocalFileSystem.mode.get()
    if ((m == "sweep-temp-twin" || m == "sweep-temp-foreign") &&
        f.getName.startsWith(".") && f.getName.contains(".tmp-")) {
      val local = java.nio.file.Paths.get(f.toUri.getPath)
      // only a CLOSED temp (bytes flushed) — create-time stats pass through
      if (java.nio.file.Files.exists(local) && java.nio.file.Files.size(local) > 0) {
        val cut = f.getName.lastIndexOf(".tmp-")
        val target = java.nio.file.Paths.get(
          new HPath(f.getParent, f.getName.substring(1, cut)).toUri.getPath)
        val bytes = java.nio.file.Files.readAllBytes(local)
        val planted =
          if (m == "sweep-temp-twin") bytes
          else bytes.map(b => (~b).toByte) // same length, different content
        java.nio.file.Files.write(target, planted)
        FlakyLocalFileSystem.plantRecords.add((target.toString, planted))
        java.nio.file.Files.delete(local)
        FlakyLocalFileSystem.sweepPlants.incrementAndGet()
        throw new java.io.FileNotFoundException(f.toString)
      }
    }
    super.getFileStatus(f)
  }

  override def rename(src: HPath, dst: HPath): Boolean = {
    // PARQUET-COMMIT misbehavior (streaming history writes): budget-limited
    // false reports on FileOutputCommitter renames (attempt/task dirs under
    // `_temporary`) — the move completes server-side but the store reports
    // failure, the committer throws, and the caller sees a failed write it
    // must replay. Checked BEFORE the BinWriter gate: these temps are
    // directories named by the committer, not `.name.tmp-*` files.
    if (FlakyLocalFileSystem.mode.get() == "parquet-commit-false" &&
        src.toString.contains("_temporary")) {
      if (FlakyLocalFileSystem.parquetFalseBudget.get() > 0 &&
          FlakyLocalFileSystem.parquetFalseBudget.getAndDecrement() > 0) {
        super.rename(src, dst)
        FlakyLocalFileSystem.parquetFalseReports.incrementAndGet()
        return false
      }
      return super.rename(src, dst)
    }
    // misbehave only on BIN commit temps: ledger flushes ride the same
    // temp+rename protocol since round 15, but poisoning them would fail
    // the run at the (unisolated) end-of-run flush instead of exercising
    // the per-topic commit paths these tests target
    if (!src.getName.startsWith(".") || !src.getName.contains(".tmp-") ||
        dst.getName.contains("_ledger"))
      return super.rename(src, dst)
    // a real store answers an already-moved source with plain `false`;
    // RawLocalFileSystem's copy fallback would throw instead
    if (!exists(src)) return false
    FlakyLocalFileSystem.mode.get() match {
      case "report-false" =>
        // the move completes server-side but the store reports failure
        // (transient error after the move) — the fallback's length-checked
        // acceptance must adopt the committed target
        super.rename(src, dst)
        FlakyLocalFileSystem.falseReports.incrementAndGet()
        false
      case "foreign-target" =>
        // the temp vanishes and a FOREIGN writer's file of a different
        // length appears at the target — acceptance must refuse it
        val out = create(dst, true)
        try out.write(FlakyLocalFileSystem.ForeignBytes) finally out.close()
        // recorded only after the plant's write CLOSED: this plant is
        // complete, so the spec may demand byte-identical survival of it
        FlakyLocalFileSystem.plantRecords.add(
          (dst.toUri.getPath, FlakyLocalFileSystem.ForeignBytes))
        delete(src, false)
        FlakyLocalFileSystem.foreignPlants.incrementAndGet()
        false
      case "equal-length-foreign" =>
        // the adversarial variant of foreign-target: the planted file has
        // the temp's EXACT length but different bytes (each byte inverted).
        // Round 15's length-only acceptance ADOPTED this as a commit — the
        // documented residual; the first/last-block fingerprint must refuse
        // it and fail the topic
        val st = getFileStatus(src)
        val bytes = new Array[Byte](st.getLen.toInt)
        val inS = open(src)
        try inS.readFully(0, bytes) finally inS.close()
        bytes.indices.foreach(i => bytes(i) = (~bytes(i)).toByte)
        val out = create(dst, true)
        try out.write(bytes) finally out.close()
        FlakyLocalFileSystem.plantRecords.add((dst.toUri.getPath, bytes))
        delete(src, false)
        FlakyLocalFileSystem.equalLengthPlants.incrementAndGet()
        false
      case "middle-mutated-foreign" =>
        // the MAXIMALLY adversarial variant: same length AND identical
        // first/last FpBlock bytes — only bytes in the middle differ.
        // The head/tail fingerprint cannot distinguish this plant from
        // the temp; only the write-time streaming CRC32C can refuse it.
        // (Meaningful only when the temp is > 2*FpBlock long, which the
        // driving spec guarantees.)
        val st = getFileStatus(src)
        val bytes = new Array[Byte](st.getLen.toInt)
        val inS = open(src)
        try inS.readFully(0, bytes) finally inS.close()
        val lo = graft.jobs.BinWriter.FpBlock
        val hi = bytes.length - graft.jobs.BinWriter.FpBlock
        require(hi > lo, s"temp too small for a middle mutation: ${bytes.length}")
        ((lo + hi) / 2 until math.min(hi, (lo + hi) / 2 + 16))
          .foreach(i => bytes(i) = (~bytes(i)).toByte)
        val out = create(dst, true)
        try out.write(bytes) finally out.close()
        FlakyLocalFileSystem.plantRecords.add((dst.toUri.getPath, bytes))
        delete(src, false)
        FlakyLocalFileSystem.middleMutatedPlants.incrementAndGet()
        false
      case _ => super.rename(src, dst)
    }
  }
}

object FlakyLocalFileSystem {
  val FsUri: URI = URI.create("flaky:///")
  val ForeignBytes: Array[Byte] = "zz".getBytes("UTF-8")
  val mode = new AtomicReference[String]("off")
  val falseReports = new AtomicInteger(0)
  val foreignPlants = new AtomicInteger(0)
  val equalLengthPlants = new AtomicInteger(0)
  val middleMutatedPlants = new AtomicInteger(0)
  val sweepPlants = new AtomicInteger(0)
  // (local path, planted bytes) of every plant whose write CLOSED before
  // the mock returned: these are complete by construction, so specs can
  // assert byte-identical survival of them and reserve prefix tolerance
  // for unrecorded plants (a sibling task killed mid-write by the job
  // abort)
  val plantRecords = new java.util.concurrent.ConcurrentLinkedQueue[(String, Array[Byte])]()
  // parquet-commit-false mode: how many committer renames may still
  // misbehave (bounded so a replay eventually succeeds), and how many did
  val parquetFalseBudget = new AtomicInteger(0)
  val parquetFalseReports = new AtomicInteger(0)
  def reset(): Unit = {
    mode.set("off"); falseReports.set(0); foreignPlants.set(0); equalLengthPlants.set(0)
    middleMutatedPlants.set(0); sweepPlants.set(0); plantRecords.clear()
    parquetFalseBudget.set(0); parquetFalseReports.set(0)
  }
}

/** E2e restructure through a NON-rename-atomic store (round-14 verdict
  * task #2): the unit specs pin `BinWriter.renameOver`'s acceptance
  * predicate in isolation; these drive FULL `Restructure.run`s — listing,
  * extraction, executor-side bin commit, sidecar first-touch, merge-probe
  * quarantine, and ledger commit — through a FileSystem whose rename
  * misbehaves mid-run, the class the reference covers with real MinIO
  * (reference src/integrationTest/.../RestructureS3IntegrationTest.kt:68-221).
  * (The sidecar create-if-absent RACE itself stays unit-pinned in
  * BinWriterSpec — a deterministic e2e interleaving does not exist — but
  * every sidecar here is created through the flaky scheme's create path.)
  */
class FlakyStoreE2eSpec extends SparkSpec {

  private val fixtures = Paths.get("/root/reference/src/integrationTest/resources")
  private val serverStatusFiles = Seq(
    "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro",
    "application_server_status/partition=1/application_server_status+1+0000000021.avro")
  private val firstOut =
    "STAGING_PROJECT/1543bc93-3c17-4381-89a5-c5d6272b827c/application_server_status/CONNECTED"
  private val golden1300 =
    """key.projectId,key.userId,key.sourceId,value.time,value.serverStatus,value.ipAddress
      |STAGING_PROJECT,1543bc93-3c17-4381-89a5-c5d6272b827c,99caf236-bbe6-4eed-9c63-fba77349821d,1.58021982003E9,CONNECTED,
      |STAGING_PROJECT,1543bc93-3c17-4381-89a5-c5d6272b827c,99caf236-bbe6-4eed-9c63-fba77349821d,1.58021982003E9,CONNECTED,
      |""".stripMargin

  private def copyIn(in: Path, files: Seq[String]): Unit = files.foreach { f =>
    val dst = in.resolve(f)
    Files.createDirectories(dst.getParent)
    Files.copy(fixtures.resolve(f), dst, StandardCopyOption.REPLACE_EXISTING)
  }

  private def cfg(in: Path, out: Path, gzip: Boolean = false) = RestructureJobConfig(
    inputRoot = in.toString,
    outputRoot = s"flaky:$out", // the store under test
    gzip = gzip,
    topics = Map("application_server_status" -> TopicJobConfig(
      pathTemplate = Some("${projectId}/${userId}/${topic}/${value:serverStatus}/${filename}"))))

  private def withFlaky[A](mode: String)(body: => A): A = {
    FlakyLocalFileSystem.reset()
    FlakyLocalFileSystem.mode.set(mode)
    spark.sparkContext.hadoopConfiguration.set(
      "fs.flaky.impl", classOf[FlakyLocalFileSystem].getName)
    try body finally FlakyLocalFileSystem.mode.set("off")
  }

  private def outFiles(out: Path): Set[String] =
    Files.walk(out).iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => out.relativize(p).toString)
      .filterNot(_.startsWith("_ledger"))
      .filterNot(_.split('/').last.startsWith("."))
      .toSet

  test("e2e: every bin commit rides the false-reporting-rename fallback; output and ledger exact") {
    val work = Files.createTempDirectory("graft-flaky-ok")
    val in = work.resolve("in"); val out = work.resolve("out")
    copyIn(in, serverStatusFiles)
    withFlaky("report-false") {
      val result = Restructure.run(spark, cfg(in, out))
      assert(result.failedTopics.isEmpty, result.failedTopics.toString)
      // the misbehavior actually fired on the commit path (one false
      // report per committed bin, at least the two time bins)
      assert(FlakyLocalFileSystem.falseReports.get() >= 2,
        s"fallback never exercised: ${FlakyLocalFileSystem.falseReports.get()}")
      // byte-exact content THROUGH the misbehaving store
      assert(new String(Files.readAllBytes(out.resolve(s"$firstOut/20200128_1300.csv")),
        "UTF-8") == golden1300)
      // sidecar created through the flaky scheme's create path
      assert(new String(Files.readAllBytes(
        out.resolve(s"$firstOut/schema-application_server_status.json")), "UTF-8")
        .contains("\"ApplicationServerStatus\""))
      // ledger committed (persisted through the flaky store as well)
      assert(result.ledger.contains("application_server_status", 1, 18, 20,
        java.time.Instant.EPOCH))
      assert(result.ledger.contains("application_server_status", 1, 21, 21,
        java.time.Instant.EPOCH))
      // incremental no-op replay reads that ledger back through the store
      val second = Restructure.run(spark, cfg(in, out))
      assert(second.processedTopics.isEmpty)
    }
  }

  test("e2e: foreign-length target fails the topic without adopting or destroying it; retry replays cleanly") {
    val work = Files.createTempDirectory("graft-flaky-foreign")
    val in = work.resolve("in"); val out = work.resolve("out")
    copyIn(in, serverStatusFiles.take(1))
    withFlaky("foreign-target") {
      val result = Restructure.run(spark, cfg(in, out))
      // the topic FAILED — no partial ledger commit
      assert(result.failedTopics.map(_._1) == Seq("application_server_status"))
      assert(!result.ledger.contains("application_server_status", 1, 18, 20,
        java.time.Instant.EPOCH))
      assert(FlakyLocalFileSystem.foreignPlants.get() >= 1)
      // the foreign writer's file was neither adopted nor deleted: the
      // evidence is still in place. Every plant RECORDED by the mock
      // completed its write before the mock returned — in particular the
      // bin whose commit threw — so those files must survive
      // BYTE-IDENTICAL (a zero-length or truncated survivor there would
      // mean the code under test modified the evidence). Only UNRECORDED
      // plants (a sibling task killed by the job abort mid-write) get
      // prefix tolerance.
      val recorded = FlakyLocalFileSystem.plantRecords.asScala.toSeq
      assert(recorded.nonEmpty, "no complete plant recorded")
      recorded.foreach { case (p, bytes) =>
        val f = Paths.get(p)
        assert(Files.exists(f), s"complete foreign plant $p destroyed")
        assert(java.util.Arrays.equals(Files.readAllBytes(f), bytes),
          s"complete foreign plant $p modified: " +
            s"'${new String(Files.readAllBytes(f), "UTF-8").take(40)}'")
      }
      val recordedPaths = recorded.map(_._1).toSet
      val foreign = outFiles(out).filterNot(_.endsWith(".json"))
      assert(foreign.nonEmpty)
      foreign.map(out.resolve).filterNot(p => recordedPaths(p.toString)).foreach { p =>
        val b = Files.readAllBytes(p)
        val pfx = java.util.Arrays.copyOf(FlakyLocalFileSystem.ForeignBytes, b.length)
        assert(b.length <= FlakyLocalFileSystem.ForeignBytes.length &&
          java.util.Arrays.equals(b, pfx),
          s"foreign evidence modified: '${new String(b, "UTF-8").take(40)}'")
      }
    }
    // the foreign writer's files get cleaned up out-of-band; the retry —
    // still on a store whose renames report false — must replay the whole
    // batch (nothing was ledger-committed) and land the golden bytes
    outFiles(out).filterNot(_.endsWith(".json"))
      .foreach(f => Files.delete(out.resolve(f)))
    withFlaky("report-false") {
      val retry = Restructure.run(spark, cfg(in, out))
      assert(retry.failedTopics.isEmpty, retry.failedTopics.toString)
      assert(retry.ledger.contains("application_server_status", 1, 18, 20,
        java.time.Instant.EPOCH))
      // file 0 alone contributes the header + one row of the golden bin
      val expected = golden1300.linesIterator.take(2).mkString("", "\n", "\n")
      assert(new String(Files.readAllBytes(out.resolve(s"$firstOut/20200128_1300.csv")),
        "UTF-8") == expected)
    }
  }

  test("e2e: EQUAL-LENGTH foreign target is refused by the content fingerprint and fails the topic") {
    val work = Files.createTempDirectory("graft-flaky-eqlen")
    val in = work.resolve("in"); val out = work.resolve("out")
    copyIn(in, serverStatusFiles.take(1))
    withFlaky("equal-length-foreign") {
      val result = Restructure.run(spark, cfg(in, out))
      // round 15 ADOPTED this file (length matched); the fingerprint now
      // fails the topic instead — no ledger commit, evidence intact
      assert(result.failedTopics.map(_._1) == Seq("application_server_status"),
        result.failedTopics.toString)
      assert(!result.ledger.contains("application_server_status", 1, 18, 20,
        java.time.Instant.EPOCH))
      assert(FlakyLocalFileSystem.equalLengthPlants.get() >= 1)
      val planted = outFiles(out).filterNot(_.endsWith(".json"))
      assert(planted.nonEmpty)
      planted.foreach { f =>
        val bytes = Files.readAllBytes(out.resolve(f))
        // still the foreign writer's inverted bytes — neither adopted as a
        // commit nor overwritten by a retry
        assert(!new String(bytes, "UTF-8").startsWith("key.projectId"),
          s"planted file $f was replaced by real content")
      }
    }
  }

  test("e2e: temp swept before first stat + same-length FOREIGN target => fingerprint refuses, topic FAILS") {
    val work = Files.createTempDirectory("graft-flaky-sweepf")
    val in = work.resolve("in"); val out = work.resolve("out")
    copyIn(in, serverStatusFiles.take(1))
    withFlaky("sweep-temp-foreign") {
      val result = Restructure.run(spark, cfg(in, out))
      // srcLen is unknowable (the temp vanished before the first stat) and
      // the planted file has the temp's exact LENGTH — only the write-time
      // fingerprint can refuse it, and it must: topic fails, no ledger
      // commit, evidence intact
      assert(result.failedTopics.map(_._1) == Seq("application_server_status"),
        result.failedTopics.toString)
      assert(!result.ledger.contains("application_server_status", 1, 18, 20,
        java.time.Instant.EPOCH))
      assert(FlakyLocalFileSystem.sweepPlants.get() >= 1)
      val recorded = FlakyLocalFileSystem.plantRecords.asScala.toSeq
      assert(recorded.nonEmpty)
      recorded.foreach { case (p, bytes) =>
        val f = Paths.get(p)
        assert(Files.exists(f), s"complete foreign plant $p destroyed")
        assert(java.util.Arrays.equals(Files.readAllBytes(f), bytes),
          s"complete foreign plant $p modified (adopted or overwritten)")
      }
    }
  }

  test("e2e: temp swept before first stat + twin's IDENTICAL bytes => adopted, output and ledger exact") {
    val work = Files.createTempDirectory("graft-flaky-sweept")
    val in = work.resolve("in"); val out = work.resolve("out")
    copyIn(in, serverStatusFiles)
    withFlaky("sweep-temp-twin") {
      val result = Restructure.run(spark, cfg(in, out))
      // the write-time fingerprint validates the twin's bytes — the run
      // completes as if the rename had succeeded
      assert(result.failedTopics.isEmpty, result.failedTopics.toString)
      assert(FlakyLocalFileSystem.sweepPlants.get() >= 2,
        s"sweep path never exercised: ${FlakyLocalFileSystem.sweepPlants.get()}")
      assert(new String(Files.readAllBytes(out.resolve(s"$firstOut/20200128_1300.csv")),
        "UTF-8") == golden1300)
      assert(result.ledger.contains("application_server_status", 1, 18, 20,
        java.time.Instant.EPOCH))
      assert(result.ledger.contains("application_server_status", 1, 21, 21,
        java.time.Instant.EPOCH))
    }
  }

  test("commit: same-length same-head/tail MIDDLE-mutated foreign target is refused by the streaming crc") {
    val work = Files.createTempDirectory("graft-flaky-mid")
    val out = work.resolve("out"); Files.createDirectories(out)
    // A bin comfortably larger than 2*FpBlock (16 KiB), so the plant's
    // mutated bytes lie OUTSIDE both fingerprint blocks: length, head
    // block, and tail block all match the temp exactly. Before the
    // write-time CRC32C this plant was ADOPTED as the commit — the
    // documented round-17 blind spot; now the full-content check must
    // refuse it and fail the task.
    val line = "v" * 120
    val rows = Iterator.tabulate(400)(i => ("topicA/big.csv", i.toString, f"$i%06d,$line"))
    val confEntries = Map("fs.flaky.impl" -> classOf[FlakyLocalFileSystem].getName)
    withFlaky("middle-mutated-foreign") {
      val err = intercept[java.io.IOException] {
        BinWriter.writePartition(rows, s"flaky:$out", confEntries, Some("h"),
          gzip = false, zip = false).toList
      }
      assert(err.getMessage.contains("failed to commit"), err.getMessage)
      assert(FlakyLocalFileSystem.middleMutatedPlants.get() >= 1)
      // evidence intact: the planted file survives byte-identical
      val recorded = FlakyLocalFileSystem.plantRecords.asScala.toSeq
      assert(recorded.nonEmpty)
      recorded.foreach { case (p, bytes) =>
        val f = Paths.get(p)
        assert(Files.exists(f), s"complete foreign plant $p destroyed")
        assert(java.util.Arrays.equals(Files.readAllBytes(f), bytes),
          s"complete foreign plant $p modified (adopted or overwritten)")
      }
    }
    // control: the same store, same bin size, but the target carries a
    // byte-identical TWIN — the crc matches and the commit is adopted
    val rows2 = Iterator.tabulate(400)(i => ("topicB/big.csv", i.toString, f"$i%06d,$line"))
    withFlaky("report-false") {
      val written = BinWriter.writePartition(rows2, s"flaky:$out", confEntries,
        Some("h"), gzip = false, zip = false).toList
      assert(written == List("topicB/big.csv"))
      assert(Files.size(out.resolve("topicB/big.csv")) > 2L * BinWriter.FpBlock)
    }
  }

  test("e2e: corrupt existing gzip target is quarantined mid-merge and the bin restarts, all through the flaky store") {
    val work = Files.createTempDirectory("graft-flaky-quar")
    val in = work.resolve("in"); val out = work.resolve("out")
    copyIn(in, serverStatusFiles.take(1))
    val bin = out.resolve(s"$firstOut/20200128_1300.csv.gz")
    withFlaky("report-false") {
      assert(Restructure.run(spark, cfg(in, out, gzip = true)).failedTopics.isEmpty)
      assert(Files.exists(bin))
    }
    // the committed gzip bin rots in place (bit flip / partial overwrite)
    val garbage = "not gzip at all".getBytes("UTF-8")
    Files.write(bin, garbage)
    // a later batch (the open-ended offsets-21+ file) merges into the same
    // bin: the probe must find it unreadable and quarantine it
    copyIn(in, serverStatusFiles.drop(1))
    withFlaky("report-false") {
      val result = Restructure.run(spark, cfg(in, out, gzip = true))
      assert(result.failedTopics.isEmpty, result.failedTopics.toString)
      assert(result.ledger.contains("application_server_status", 1, 21, 21,
        java.time.Instant.EPOCH))
      // quarantined alias preserves the corrupt bytes
      val quarantined = out.resolve(s"$firstOut/20200128_1300.csv.gz.corrupted")
      assert(Files.exists(quarantined), outFiles(out).toString)
      assert(java.util.Arrays.equals(Files.readAllBytes(quarantined), garbage))
      // the bin restarted fresh: valid gzip, one header, only the new batch
      val inz = new GZIPInputStream(Files.newInputStream(bin))
      val lines = scala.io.Source.fromInputStream(inz, "UTF-8").getLines().toSeq
      assert(lines.head.startsWith("key.projectId,"))
      assert(lines.count(_.startsWith("key.projectId")) == 1)
      assert(lines.size >= 2, s"restarted bin empty: $lines")
    }
  }
}
