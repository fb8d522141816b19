package graft.jobs

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SparkSpec

/** Legacy `offsets/<topic>.csv` → JSON-ledger migration on first run
  * (reference AccountantImpl.readDeprecatedOffsets): an upgrading
  * deployment keeps its extraction history — covered files are skipped,
  * the CSV is deleted, and the merged ledger is flushed.
  */
class LegacyOffsetsMigrationSpec extends SparkSpec {

  private val fixtures = Paths.get("/root/reference/src/integrationTest/resources")
  private val closedFile =
    "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro"

  private def setup(): (Path, Path) = {
    val work = Files.createTempDirectory("graft-migrate")
    val in = work.resolve("in")
    Files.createDirectories(in.resolve(closedFile).getParent)
    Files.copy(fixtures.resolve(closedFile), in.resolve(closedFile),
      StandardCopyOption.REPLACE_EXISTING)
    (in, work.resolve("out"))
  }

  test("covered file skipped after CSV import; CSV deleted; ledger flushed merged") {
    val (in, out) = setup()
    val csv = out.resolve("offsets/application_server_status.csv")
    Files.createDirectories(csv.getParent)
    // reference writer format; lastModified newer than the input file so
    // the coverage check treats the extraction as fresh
    Files.write(csv,
      "offsetFrom,offsetTo,partition,topic,lastModified\n18,20,1,application_server_status,2030-01-01T00:00:00Z\n"
        .getBytes("UTF-8"))
    val r = Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString))
    // the only input file is fully covered by the migrated range → skipped
    assert(r.processedTopics.isEmpty || r.processedTopics.forall(_.records == 0),
      s"migrated coverage ignored: ${r.processedTopics}")
    assert(!Files.exists(out.resolve(
      "STAGING_PROJECT/1543bc93-3c17-4381-89a5-c5d6272b827c/application_server_status/20200128_1300.csv")),
      "bin written despite migrated coverage")
    assert(!Files.exists(csv), "legacy CSV not deleted after import")
    // merged ledger persisted
    val ledgerJson = new String(Files.readAllBytes(out.resolve("_ledger.json")), "UTF-8")
    assert(ledgerJson.contains("\"topic\":\"application_server_status\""))
    assert(ledgerJson.contains("\"from\":18") && ledgerJson.contains("\"to\":20"))

    // second run: nothing re-imports, nothing re-extracts
    val r2 = Restructure.run(spark, RestructureJobConfig(
      inputRoot = in.toString, outputRoot = out.toString))
    assert(r2.processedTopics.isEmpty || r2.processedTopics.forall(_.records == 0))
  }
}
