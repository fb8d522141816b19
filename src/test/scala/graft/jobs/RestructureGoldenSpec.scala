package graft.jobs

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** End-to-end golden test replicating the reference's
  * RestructureS3IntegrationTest (src/integrationTest/java/.../
  * RestructureS3IntegrationTest.kt:143-182) on local FS: same three Avro
  * fixture files, same per-topic path override, asserting the byte-exact
  * CSV content and the exact output file set.
  */
class RestructureGoldenSpec extends SparkSpec {

  private val fixtures = Paths.get("/root/reference/src/integrationTest/resources")
  private val fixtureFiles = Seq(
    "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro",
    "application_server_status/partition=1/application_server_status+1+0000000021.avro",
    "android_phone_acceleration/partition=0/android_phone_acceleration+0+0003018784.avro")

  private def setup(): (Path, Path) = {
    val work = Files.createTempDirectory("graft-golden")
    val in = work.resolve("in")
    val out = work.resolve("out/output") // reference writes under an `output/` prefix
    fixtureFiles.foreach { f =>
      val dst = in.resolve(f)
      Files.createDirectories(dst.getParent)
      Files.copy(fixtures.resolve(f), dst, StandardCopyOption.REPLACE_EXISTING)
    }
    (in, out)
  }

  private def cfg(in: Path, out: Path) = RestructureJobConfig(
    inputRoot = in.toString,
    outputRoot = out.toString,
    topics = Map("application_server_status" -> TopicJobConfig(
      pathTemplate = Some("${projectId}/${userId}/${topic}/${value:serverStatus}/${filename}"))))

  private def listFiles(out: Path): Set[String] =
    if (!Files.isDirectory(out)) Set.empty
    else Files.walk(out).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => out.relativize(p).toString)
      .filterNot(_.startsWith("_ledger"))
      .filterNot(p => p.split('/').last.startsWith(".")) // hadoop .crc artifacts
      .toSet

  private val firstOut =
    "STAGING_PROJECT/1543bc93-3c17-4381-89a5-c5d6272b827c/application_server_status/CONNECTED"
  private val secondOut =
    "radar-test-root/4ab9b985-6eec-4e51-9a29-f4c571c89f99/android_phone_acceleration"

  test("golden: exact file set and byte-exact CSV vs reference integration test") {
    val (in, out) = setup()
    val result = Restructure.run(spark, cfg(in, out))

    assert(listFiles(out) == Set(
      s"$firstOut/20200128_1300.csv",
      s"$firstOut/20200128_1400.csv",
      s"$firstOut/schema-application_server_status.json",
      s"$secondOut/20200528_1000.csv",
      s"$secondOut/schema-android_phone_acceleration.json"))

    val golden =
      """key.projectId,key.userId,key.sourceId,value.time,value.serverStatus,value.ipAddress
        |STAGING_PROJECT,1543bc93-3c17-4381-89a5-c5d6272b827c,99caf236-bbe6-4eed-9c63-fba77349821d,1.58021982003E9,CONNECTED,
        |STAGING_PROJECT,1543bc93-3c17-4381-89a5-c5d6272b827c,99caf236-bbe6-4eed-9c63-fba77349821d,1.58021982003E9,CONNECTED,
        |""".stripMargin
    val got = new String(Files.readAllBytes(out.resolve(s"$firstOut/20200128_1300.csv")), "UTF-8")
    assert(got == golden)

    // ledger covers all three files' offsets
    assert(result.ledger.contains("application_server_status", 1, 18, 20,
      java.time.Instant.EPOCH))
    assert(result.ledger.contains("application_server_status", 1, 21, 21,
      java.time.Instant.EPOCH))

    // sidecar is the pretty-printed Avro schema
    val sidecar = new String(Files.readAllBytes(
      out.resolve(s"$firstOut/schema-application_server_status.json")), "UTF-8")
    assert(sidecar.contains("\"ApplicationServerStatus\""))
  }

  test("incremental: second run over same input is a no-op") {
    val (in, out) = setup()
    Restructure.run(spark, cfg(in, out))
    val before = listFiles(out).map(f => f -> Files.getLastModifiedTime(out.resolve(f))).toMap
    val second = Restructure.run(spark, cfg(in, out))
    assert(second.processedTopics.isEmpty)
    val after = listFiles(out).map(f => f -> Files.getLastModifiedTime(out.resolve(f))).toMap
    assert(before == after)
  }

  test("append: new file into an existing bin merges with prior content") {
    val (in, out) = setup()
    val c = cfg(in, out)
    // first run with only the first server-status file
    val in1 = Files.createTempDirectory("graft-in1")
    val f0 = fixtureFiles(0)
    Files.createDirectories(in1.resolve(f0).getParent)
    Files.copy(fixtures.resolve(f0), in1.resolve(f0))
    Restructure.run(spark, c.copy(inputRoot = in1.toString))
    val bin = out.resolve(s"$firstOut/20200128_1300.csv")
    val lines1 = new String(Files.readAllBytes(bin), "UTF-8").split("\n").length
    // second run with the open-ended file (offsets 21+) — lands in same bins
    val in2 = Files.createTempDirectory("graft-in2")
    val f1 = fixtureFiles(1)
    Files.createDirectories(in2.resolve(f1).getParent)
    Files.copy(fixtures.resolve(f1), in2.resolve(f1))
    Restructure.run(spark, c.copy(inputRoot = in2.toString))
    val content2 = new String(Files.readAllBytes(bin), "UTF-8")
    val lines2 = content2.split("\n").length
    assert(lines2 >= lines1, s"append lost rows: $lines1 -> $lines2")
    assert(content2.startsWith("key.projectId,"))
    assert(content2.split("\n").count(_.startsWith("key.projectId")) == 1, "duplicated header")
  }
}
