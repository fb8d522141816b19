package graft.jobs

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec

/** The reference's all-types converter golden (`full.avsc` + `full.json`,
  * CsvAvroConverterTest.kt:54-135) driven through OUR full pipeline: every
  * Avro type the CSV converter supports, `excludeFields = {a, i.other}`
  * (including the map-key-level flattened name), dynamic map/array
  * expansion, unpadded base64, JVM double/float rendering, 3-branch-union
  * array elements — asserted byte-exact against the reference's expected
  * header and row.
  */
class FullTypesGoldenSpec extends SparkSpec {

  private val fullSchema = new Schema.Parser().parse(
    """{"type":"record","name":"full","fields":[
      |{"name":"a","type":"string"},
      |{"name":"b","type":"bytes"},
      |{"name":"c","type":{"type":"fixed","size":1,"name":"md5"}},
      |{"name":"d","type":"long"},
      |{"name":"e","type":"double"},
      |{"name":"f","type":"float"},
      |{"name":"g","type":"int"},
      |{"name":"h","type":"null"},
      |{"name":"i","type":{"type":"map","values":"int"}},
      |{"name":"j","type":{"type":"array","items":["null","string","full"]}},
      |{"name":"k","type":{"name":"KEnum","type":"enum","symbols":["S","Y","M"]}},
      |{"name":"l","type":{"name":"LRecord","type":"record",
      |  "fields":[{"name":"la","type":["null","string"]}]}},
      |{"name":"m","type":"boolean"}]}""".stripMargin)

  test("full.avsc datum renders the reference's exact CSV header and row") {
    val root = Files.createTempDirectory("graft-fulltypes")
    val inDir = root.resolve("in/full/partition=0")
    Files.createDirectories(inDir)

    val rec = new GenericData.Record(fullSchema)
    rec.put("a", "a")
    rec.put("b", java.nio.ByteBuffer.wrap(Array(0xFF.toByte)))
    rec.put("c", new GenericData.Fixed(fullSchema.getField("c").schema, Array(0xFF.toByte)))
    rec.put("d", 1000000000000000000L)
    rec.put("e", 1.21322421e-15)
    rec.put("f", 0.1213231f)
    rec.put("g", 132101)
    rec.put("h", null)
    val m = new java.util.LinkedHashMap[String, Integer]()
    m.put("some", 1); m.put("other", -1)
    rec.put("i", m)
    rec.put("j", java.util.Arrays.asList(null, "some"))
    rec.put("k", new GenericData.EnumSymbol(fullSchema.getField("k").schema, "Y"))
    val l = new GenericData.Record(fullSchema.getField("l").schema)
    l.put("la", null)
    rec.put("l", l)
    rec.put("m", false)

    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](fullSchema))
    w.create(fullSchema, new File(inDir.toFile, "full+0+0000000000.avro"))
    w.append(rec); w.close()

    val cfg = RestructureJobConfig(
      inputRoot = root.resolve("in").toString,
      outputRoot = root.resolve("out").toString,
      excludeFields = Set("a", "i.other"))
    Restructure.run(spark, cfg)

    // no time field anywhere → unknown-time bin under the default template
    val out = root.resolve("out/unknown-project/unknown-user/full/unknown-time.csv")
    val lines = new String(Files.readAllBytes(out), "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    assert(lines.size == 2, s"expected header+row, got:\n${lines.mkString("\n")}")
    // CsvAvroConverterTest golden: i.other excluded at the flattened
    // map-key level, i's remaining key expanded, per-element array columns
    assert(lines(0) == "b,c,d,e,f,g,h,i.some,j.0,j.1,k,l.la,m")
    // unpadded base64 0xFF = "/w"; nulls render empty; JVM number rendering
    assert(lines(1) == "/w,/w,1000000000000000000,1.21322421E-15,0.1213231,132101,,1,,some,Y,,false")

    // the same datum through the JSON writer (JsonAvroConverter analog):
    // nested structure preserved (no flatten), explicit nulls, top-level
    // excludeFields dropped, exact numeric rendering
    val jroot = Files.createTempDirectory("graft-fulltypes-json")
    val jin = jroot.resolve("in/full/partition=0")
    Files.createDirectories(jin)
    Files.copy(inDir.resolve("full+0+0000000000.avro"),
      jin.resolve("full+0+0000000000.avro"))
    Restructure.run(spark, RestructureJobConfig(
      inputRoot = jroot.resolve("in").toString,
      outputRoot = jroot.resolve("out").toString,
      format = "json", excludeFields = Set("a")))
    val jout = jroot.resolve("out/unknown-project/unknown-user/full/unknown-time.json")
    val jlines = new String(Files.readAllBytes(jout), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
    assert(jlines.size == 1, s"expected one JSON record, got:\n${jlines.mkString("\n")}")
    val rec0 = jlines.head
    assert(!rec0.contains("\"a\""), s"excluded field leaked: $rec0")
    assert(rec0.contains("\"d\":1000000000000000000"))
    assert(rec0.contains("\"e\":1.21322421E-15"))
    assert(rec0.contains("\"h\":null"), s"explicit null dropped: $rec0")
    assert(rec0.contains("\"i\":{\"some\":1,\"other\":-1}"), s"map not preserved: $rec0")
    assert(rec0.contains("\"l\":{\"la\":null}"), s"nested record not preserved: $rec0")
    assert(rec0.contains("\"m\":false"))
  }
}
