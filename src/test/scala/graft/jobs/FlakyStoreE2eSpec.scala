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
        delete(src, false)
        FlakyLocalFileSystem.equalLengthPlants.incrementAndGet()
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
  // parquet-commit-false mode: how many committer renames may still
  // misbehave (bounded so a replay eventually succeeds), and how many did
  val parquetFalseBudget = new AtomicInteger(0)
  val parquetFalseReports = new AtomicInteger(0)
  def reset(): Unit = {
    mode.set("off"); falseReports.set(0); foreignPlants.set(0); equalLengthPlants.set(0)
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
      // evidence is still in place. The bin whose commit threw has a
      // COMPLETE plant by construction (its rename mock returned before
      // the IOException); a SIBLING task killed by the job abort can leave
      // its own plant truncated mid-write (the mock's create+write is not
      // atomic under task kill), so tolerate a strict PREFIX of the
      // foreign bytes — still catching both real violations: an adopted
      // commit is golden CSV (not a prefix of "zz"), a destroyed plant is
      // an absent file
      val foreign = outFiles(out).filterNot(_.endsWith(".json"))
      assert(foreign.nonEmpty)
      val planted = foreign.map(f => Files.readAllBytes(out.resolve(f)))
      assert(planted.exists(java.util.Arrays.equals(_, FlakyLocalFileSystem.ForeignBytes)),
        "no intact foreign plant survived the failed run")
      planted.foreach { b =>
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
