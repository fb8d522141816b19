package graft.jobs

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Row-for-row parity of [[Restructure.readJsonBinFiles]] (the bespoke
  * whole-file JSON-lines read of existing bins) against `spark.read.json`
  * with the same explicit schema — the exact call the merge path used
  * before. The bespoke reader exists purely to shed the ~28 ms/file
  * DataFrame-source setup (the round-17 documented residual), and its
  * typed parsing IS Catalyst's Jackson parser via `from_json`, so any
  * divergence is in the file/line plumbing: line splitting, blank-line
  * skipping, malformed-record PERMISSIVE rows, gzip, empty files.
  */
class JsonReadParitySpec extends SparkSpec {

  private val sch = StructType(Seq(
    StructField("key", StructType(Seq(
      StructField("projectId", StringType),
      StructField("userId", StringType)))),
    StructField("value", StructType(Seq(
      StructField("time", DoubleType),
      StructField("count", LongType),
      StructField("ok", BooleanType),
      StructField("tags", ArrayType(StringType)),
      StructField("name", StringType))))))

  private def sparkRead(paths: Seq[String]): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    paths.flatMap { p =>
      spark.read.schema(sch).json(p).collectAsList().asScala.map(r => (p, r.toString))
    }
  }

  private def bespokeRead(root: Path, rels: Seq[String]): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val df = Restructure.readJsonBinFiles(spark, root.toString, "", rels, sch)
    df.collectAsList().asScala.toSeq.map { r =>
      val rel = r.getString(r.length - 1)
      // drop the trailing __path for comparison against spark.read.json
      val bare = org.apache.spark.sql.Row.fromSeq((0 until r.length - 1).map(r.get))
      (s"$root/$rel", bare.toString)
    }
  }

  test("bespoke json bin reader matches spark.read.json on adversarial content") {
    val root = Files.createTempDirectory("graft-json-parity")
    val full = """{"key":{"projectId":"p1","userId":"u1"},"value":{"time":1.58021982003E9,"count":7,"ok":true,"tags":["a","b"],"name":"n"}}"""
    val cases: Seq[(String, String)] = Seq(
      "simple.json" -> s"$full\n$full\n",
      "missing_fields.json" ->
        """{"key":{"projectId":"p2"},"value":{"count":1}}
          |{"value":{"ok":false}}
          |{}
          |""".stripMargin,
      "explicit_nulls.json" ->
        """{"key":null,"value":{"time":null,"count":null,"ok":null,"tags":null,"name":null}}
          |""".stripMargin,
      "extra_fields.json" ->
        """{"key":{"projectId":"p3","EXTRA":"x"},"value":{"count":2},"UNKNOWN":[1,2]}
          |""".stripMargin,
      "unicode_escapes.json" ->
        ("""{"key":{"projectId":"é中🎉","userId":"line1\nline2\ttab\"q\""},"value":{"name":"é"}}""" + "\n"),
      "numbers.json" ->
        """{"value":{"time":-0.0,"count":9223372036854775807}}
          |{"value":{"time":1e-3,"count":-1}}
          |""".stripMargin,
      "empty_array.json" -> ("""{"value":{"tags":[]}}""" + "\n"),
      "malformed.json" ->
        """{"key":{"projectId":"good"}}
          |{not json at all
          |{"key":{"projectId":"after"}}
          |""".stripMargin,
      "type_mismatch.json" ->
        """{"value":{"time":"not-a-number","count":3}}
          |""".stripMargin,
      "blank_lines.json" -> s"$full\n\n   \n\t\n$full\n",
      "no_trailing_newline.json" -> full,
      "crlf.json" -> s"$full\r\n$full\r\n",
      "only_blank.json" -> "\n  \n")
    cases.foreach { case (name, content) =>
      Files.write(root.resolve(name), content.getBytes("UTF-8"))
    }
    // gzip variant of the nastiest mix
    val gz = root.resolve("gzipped.json.gz")
    val go = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    go.write(s"$full\n{bad\n\n$full\n".getBytes("UTF-8")); go.close()

    val rels = cases.map(_._1) :+ "gzipped.json.gz"
    val expected = sparkRead(rels.map(r => s"$root/$r")).sorted
    val got = bespokeRead(root, rels).sorted
    assert(got.size == expected.size,
      s"row counts differ: bespoke ${got.size} vs spark ${expected.size}\n" +
        s"bespoke: $got\nspark: $expected")
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"row mismatch:\n bespoke: $g\n spark:   $e")
    }
  }

  test("bespoke json bin reader round-trips real writeJsonBins output (fuzz corpus)") {
    // strings the JSON WRITER actually produces: render nasty cells through
    // Jackson's generator (escaped quotes/newlines/unicode), then compare
    // both readers on the resulting files
    val root = Files.createTempDirectory("graft-json-parity-fuzz")
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "ab,\"\\\n\r\t é中 %+._-{}[]:"
    def cell(): String =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (0 until 8).foreach { f =>
      val rows = (0 until 20).map { _ =>
        val node = mapper.createObjectNode()
        val key = node.putObject("key")
        key.put("projectId", cell()); key.put("userId", cell())
        val value = node.putObject("value")
        value.put("time", rnd.nextDouble() * 2e9)
        value.put("count", rnd.nextLong())
        value.put("ok", rnd.nextBoolean())
        val tags = value.putArray("tags")
        (0 until rnd.nextInt(3)).foreach(_ => tags.add(cell()))
        value.put("name", cell())
        mapper.writeValueAsString(node)
      }
      Files.write(root.resolve(s"fuzz$f.json"),
        rows.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val rels = (0 until 8).map(f => s"fuzz$f.json")
    val expected = sparkRead(rels.map(r => s"$root/$r")).sorted
    val got = bespokeRead(root, rels).sorted
    assert(got == expected,
      s"fuzz divergence:\n bespoke: ${got.take(5)}\n spark: ${expected.take(5)}")
  }
}
