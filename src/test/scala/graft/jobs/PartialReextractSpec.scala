package graft.jobs

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec

/** Cleaner-rollback / partial-ledger-coverage flow: a file whose offset
  * range is only partly in the ledger re-extracts ONLY the uncovered span
  * (record-level P10 via the V2 source's position skip), not the whole
  * file.
  */
class PartialReextractSpec extends SparkSpec {

  private val schema = new Schema.Parser().parse(
    """{"type":"record","name":"E","fields":[
      |{"name":"key","type":{"type":"record","name":"K","fields":[
      |  {"name":"projectId","type":["null","string"],"default":null},
      |  {"name":"userId","type":"string"},{"name":"sourceId","type":"string"}]}},
      |{"name":"value","type":{"type":"record","name":"V","fields":[
      |  {"name":"time","type":"double"},{"name":"seq","type":"long"}]}}]}""".stripMargin)

  test("rollback span re-extracts only the removed offsets") {
    val work = Files.createTempDirectory("graft-partial")
    val dir = work.resolve("in/t/partition=0")
    Files.createDirectories(dir)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(64) // multi-block file → block-skip path engages
    w.create(schema, new File(dir.toFile, "t+0+0000000000+0000000099.avro"))
    (0 until 100).foreach { i =>
      val k = new GenericData.Record(schema.getField("key").schema)
      k.put("projectId", "p"); k.put("userId", "u"); k.put("sourceId", "s")
      val v = new GenericData.Record(schema.getField("value").schema)
      // all records in one UTC day → exactly one output bin
      v.put("time", 1.7e9 + i); v.put("seq", i.toLong)
      val r = new GenericData.Record(schema)
      r.put("key", k); r.put("value", v)
      w.append(r)
    }
    w.close()

    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString,
      outputRoot = work.resolve("out").toString,
      timeBinFormat = "yyyyMMdd")
    val r1 = Restructure.run(spark, cfg)
    assert(r1.processedTopics.map(_.records).sum == 100)
    val bins = listCsv(work.resolve("out"))
    assert(bins.size == 1)
    assert(lineCount(bins.head) == 101) // header + 100 rows

    // cleaner rollback: offsets [30,59] failed verification → removed from
    // the ledger, and the (corrupt) bin is gone
    val fs = new HPath("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledger = Restructure.loadLedger(fs, cfg.ledger)
    ledger.remove("t", 0, 30, 59)
    Restructure.saveLedger(fs, cfg.ledger, ledger)
    Files.delete(bins.head)

    val r2 = Restructure.run(spark, cfg)
    // ONLY the rolled-back span was extracted
    assert(r2.processedTopics.map(_.records).sum == 30)
    val bins2 = listCsv(work.resolve("out"))
    assert(bins2.size == 1)
    val lines = new String(Files.readAllBytes(bins2.head), "UTF-8").trim.split("\n").toSeq
    assert(lines.size == 31) // header + exactly the 30 re-extracted rows
    val seqs = lines.tail.map(_.split(",").last.toLong).sorted
    assert(seqs == (30L to 59L))

    // ledger is whole again: a third run is a no-op
    val r3 = Restructure.run(spark, cfg)
    assert(r3.processedTopics.isEmpty)
  }

  private def listCsv(out: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(out).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".csv"))
      .toSeq
  }

  private def lineCount(p: java.nio.file.Path): Int =
    new String(Files.readAllBytes(p), "UTF-8").trim.split("\n").length
}
