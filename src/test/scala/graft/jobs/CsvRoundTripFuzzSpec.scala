package graft.jobs

import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Round-trip fuzz of the CSV bin contract: ANY string content written
  * through the full restructure path (manual minimal quoting inside
  * codegen + streaming bin writer) must parse back EXACTLY with the same
  * reader options the append-merge path uses (multiLine + escape) — both
  * after the cold write and after an append-merge rewrote the bin. A
  * quoting divergence between our writer and that reader would corrupt
  * every appended bin, so this property IS the K2 safety net.
  *
  * Known, deliberate exception encoded here: CSV cannot distinguish null
  * from the empty string (P6 renders both as ``), so values compare after
  * null→"" normalization.
  */
class CsvRoundTripFuzzSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"R","fields":[
      |{"name":"key","type":{"type":"record","name":"K","fields":[
      |  {"name":"userId","type":"string"}]}},
      |{"name":"value","type":{"type":"record","name":"V","fields":[
      |  {"name":"time","type":"double"},
      |  {"name":"note","type":"string"}]}}]}""".stripMargin

  private val nastyChar: Gen[Char] = Gen.frequency(
    4 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(',', '"', '\n', '\r', '\t', ' ', '\'', '|', '\\', ';'),
    1 -> Gen.oneOf('é', '中', '☃'))
  private val field: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, nastyChar).map(_.mkString))

  test("property: adversarial CSV content survives cold write AND append-merge byte-for-value") {
    val schema = new Schema.Parser().parse(schemaJson)
    def writeAvro(dir: java.nio.file.Path, name: String, notes: Seq[String], startOffset: Long): Unit = {
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
    val gen = for {
      n1 <- Gen.chooseNum(1, 6)
      n2 <- Gen.chooseNum(1, 6)
      b1 <- Gen.listOfN(n1, field)
      b2 <- Gen.listOfN(n2, field)
      chunked <- Gen.oneOf(true, false)
    } yield (b1, b2, chunked)
    val prop = Prop.forAll(gen) { case (batch1, batch2, chunked) =>
      val work = Files.createTempDirectory("graft-csvfuzz")
      val dir = work.resolve("in/notes/partition=0")
      Files.createDirectories(dir)
      // half the cases force the chunked merge path (chunk size 1), so
      // adversarial content also round-trips through the per-chunk readers
      val cfg = RestructureJobConfig(
        inputRoot = work.resolve("in").toString, outputRoot = work.resolve("out").toString,
        mergeChunkBins = if (chunked) 1 else 100000)
      writeAvro(dir, f"notes+0+${0}%010d+${batch1.size - 1}%010d.avro", batch1, 0)
      Restructure.run(spark, cfg)
      def readBack(): Seq[String] = {
        val bin = spark.read
          .option("header", "true").option("inferSchema", "false")
          .option("multiLine", "true").option("escape", "\"")
          .csv(work.resolve("out").toString + "/*/u1/notes/*.csv")
        bin.select(org.apache.spark.sql.functions.coalesce(
            bin.col("`value.note`"), org.apache.spark.sql.functions.lit("")))
          .collect().map(_.getString(0)).toSeq.sorted
      }
      val cold = readBack()
      val coldOk = cold == batch1.sorted
      // append: second slice merges into the existing bin (rewrite path)
      writeAvro(dir, f"notes+0+${batch1.size}%010d+${batch1.size + batch2.size - 1}%010d.avro",
        batch2, batch1.size.toLong)
      Restructure.run(spark, cfg)
      val merged = readBack()
      val mergedOk = merged == (batch1 ++ batch2).sorted
      if (!coldOk || !mergedOk)
        Console.err.println(s"[csvfuzz] b1=${batch1.map(_.getBytes.toSeq)} " +
          s"b2=${batch2.map(_.getBytes.toSeq)} cold=$cold merged=$merged")
      coldOk && mergedOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withInitialSeed(Seed(4180L)),
      prop)
    assert(res.passed, s"csv round-trip fuzz failed: ${res.status}")
  }
}
