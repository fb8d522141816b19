package graft.sources

import java.io.File
import java.nio.file.Files
import java.time.Instant

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec
import graft.ledger.OffsetIntervals

/** Record-level offset skip (P10 at record granularity): the V2 source
  * omits positions listed in the skip map — whole Avro blocks without
  * decoding, partial blocks by decode-and-discard — and the ledger's
  * `covered` produces those position ranges from interval state.
  */
class SkipReadSpec extends SparkSpec {

  private val schema = new Schema.Parser().parse(
    """{"type":"record","name":"R","fields":[
      |{"name":"id","type":"long"}]}""".stripMargin)

  /** One file of ids 0..n-1 with small sync interval → many Avro blocks. */
  private def writeFile(dir: java.nio.file.Path, name: String, n: Int): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(64) // tiny blocks: forces multi-block files
    w.create(schema, new File(dir.toFile, name))
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      w.append(r)
    }
    w.close()
  }

  test("skip ranges omit exactly the listed positions; __pos stays the original file position") {
    val dir = Files.createTempDirectory("graft-skip")
    writeFile(dir, "t+0+0000000000.avro", 500)
    val path = dir.resolve("t+0+0000000000.avro").toString
    val skip = Map("t+0+0000000000.avro" -> Seq((10L, 199L), (300L, 300L), (450L, 499L)))
    val rows = AvroRead.read(spark, Seq(path), None, skip)
      .select("id", AvroRead.PosCol).orderBy("id").collect()
    val expected = (0L until 500L).filterNot(i =>
      (i >= 10 && i <= 199) || i == 300 || (i >= 450 && i <= 499))
    assert(rows.map(_.getLong(0)).toSeq == expected)
    // provenance positions are the true file positions, not re-numbered
    assert(rows.map(_.getLong(1)).toSeq == expected)
  }

  test("skip map applies per file; unlisted files read in full") {
    val dir = Files.createTempDirectory("graft-skip2")
    writeFile(dir, "t+0+0000000000.avro", 100)
    writeFile(dir, "t+1+0000000000.avro", 100)
    val files = Seq("t+0+0000000000.avro", "t+1+0000000000.avro").map(dir.resolve(_).toString)
    val skip = Map("t+0+0000000000.avro" -> Seq((0L, 99L)))
    val byFile = AvroRead.read(spark, files, None, skip)
      .groupBy(AvroRead.FileCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byFile.contains("t+0+0000000000.avro")) // fully skipped
    assert(byFile("t+1+0000000000.avro") == 100L)
  }

  test("OffsetIntervals.covered clamps, honours the lastModified guard, and skips stale intervals") {
    val iv = new OffsetIntervals
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    val t2 = Instant.parse("2026-03-01T00:00:00Z")
    iv.add(0, 49, t2)
    iv.add(100, 149, t0) // stale: processed before the file's re-upload
    iv.add(200, 249, t2)
    // file range [25, 220], modified at t1 (between t0 and t2)
    val t1 = Instant.parse("2026-02-01T00:00:00Z")
    assert(iv.covered(25, 220, t1) == Seq((25L, 49L), (200L, 220L)))
    assert(iv.covered(300, 400, t1).isEmpty)
    assert(iv.covered(0, 300, Instant.parse("2027-01-01T00:00:00Z")).isEmpty)
  }
}
