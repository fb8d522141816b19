package graft.jobs

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Row-for-row parity of [[Restructure.readCsvBinFiles]] (the bespoke
  * whole-file Univocity read of existing bins) against `spark.read.csv`
  * with the exact options the merge path used before (header,
  * inferSchema=false, multiLine, escape='"'): the bespoke reader exists
  * purely for the ~28 ms/file DataFrame-source setup cost, so ANY
  * semantic divergence is a bug. Adversarial content: quoted commas,
  * doubled quotes, embedded newlines (LF and CRLF), empty vs quoted-empty
  * vs missing fields, unicode, whitespace preservation, ragged short/long
  * rows, gzip.
  */
class CsvReadParitySpec extends SparkSpec {

  private val header = "k.a,k.b,v.c"

  private def sparkRead(paths: Seq[String]): Seq[(String, Seq[String])] = {
    import scala.jdk.CollectionConverters._
    paths.flatMap { p =>
      spark.read.option("header", "true").option("inferSchema", "false")
        .option("multiLine", "true").option("escape", "\"").csv(p)
        .collectAsList().asScala
        .map(r => (p, (0 until r.length).map(i => String.valueOf(r.get(i)))))
    }
  }

  private def bespokeRead(root: Path, rels: Seq[String]): Seq[(String, Seq[String])] = {
    import scala.jdk.CollectionConverters._
    val df = Restructure.readCsvBinFiles(spark, root.toString, "", rels, header)
    df.collectAsList().asScala.toSeq.map { r =>
      val rel = r.getString(r.length - 1)
      (s"$root/$rel", (0 until r.length - 1).map(i => String.valueOf(r.get(i))))
    }
  }

  test("bespoke bin reader matches spark.read.csv on adversarial content") {
    val root = Files.createTempDirectory("graft-csv-parity")
    val cases: Seq[(String, String)] = Seq(
      "simple.csv" -> s"$header\n1,2,3\n4,5,6\n",
      "quoted_comma.csv" -> s"$header\n\"x,y\",2,3\n",
      "doubled_quote.csv" -> s"$header\n\"he said \"\"hi\"\"\",2,3\n",
      "embedded_newline.csv" -> s"$header\n\"line1\nline2\",2,3\n\"a\n\nb\",5,6\n",
      "crlf.csv" -> s"$header\r\n1,2,3\r\n\"x\r\ny\",5,6\r\n",
      "empties.csv" -> s"$header\n,,\n\"\",\"\",\"\"\n1,,3\n",
      "unicode.csv" -> s"$header\né,中,🎉\n",
      "whitespace.csv" -> s"$header\n a , b , c \n\" q \",2,3\n",
      "trailing_delim.csv" -> s"$header\n1,2,\n",
      "ragged_short.csv" -> s"$header\n1,2\n9\n",
      "ragged_long.csv" -> s"$header\n1,2,3,4,5\n",
      "only_header.csv" -> s"$header\n",
      "blank_lines.csv" -> s"$header\n1,2,3\n\n4,5,6\n")
    cases.foreach { case (name, content) =>
      Files.write(root.resolve(name), content.getBytes("UTF-8"))
    }
    // gzip variant of the nastiest case
    val gz = root.resolve("gzipped.csv.gz")
    val go = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    go.write(s"$header\n\"line1\nline2\",\"\",3\n".getBytes("UTF-8")); go.close()

    val rels = cases.map(_._1) :+ "gzipped.csv.gz"
    val expected = sparkRead(rels.map(r => s"$root/$r")).sortBy(_.toString)
    val got = bespokeRead(root, rels).sortBy(_.toString)
    assert(got.size == expected.size,
      s"row counts differ: bespoke ${got.size} vs spark ${expected.size}\n" +
        s"bespoke: $got\nspark: $expected")
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"row mismatch:\n bespoke: $g\n spark:   $e")
    }
  }

  test("duplicate / case-colliding / empty header names get spark.read.csv's safe renames") {
    // a bin whose flattened Avro header repeats a name must NOT yield a
    // duplicate-column DataFrame (mergeChunk's unionByName would fail with
    // an ambiguous-column error); spark.read.csv dedupes via makeSafeHeader
    // (append the column index; case-INsensitive by default; empty → _c<i>)
    // and the bespoke reader must match it exactly
    val root = Files.createTempDirectory("graft-csv-dupheader")
    val dupHeader = "a,B,a,b,,x"
    val content = s"$dupHeader\n1,2,3,4,5,6\n"
    Files.write(root.resolve("dup.csv"), content.getBytes("UTF-8"))
    val sparkDf = spark.read.option("header", "true").option("inferSchema", "false")
      .option("multiLine", "true").option("escape", "\"")
      .csv(s"$root/dup.csv")
    val bespokeDf = Restructure.readCsvBinFiles(spark, root.toString, "",
      Seq("dup.csv"), dupHeader)
    assert(bespokeDf.columns.dropRight(1).toSeq == sparkDf.columns.toSeq,
      s"header renames diverge: bespoke ${bespokeDf.columns.toSeq} vs " +
        s"spark ${sparkDf.columns.toSeq}")
    // and the frame is actually union-able (the failure mode the rename
    // prevents)
    val u = bespokeDf.drop("__path").unionByName(sparkDf, allowMissingColumns = true)
    assert(u.count() == 2)
  }

  test("option-surface parity: >2048 columns and a multi-MB field accept like spark.read.csv") {
    // the two option-surface edges that could drift silently: maxColumns
    // (bespoke pins 20480 = Spark's CSV default) and maxCharsPerColumn
    // (bespoke -1 = Spark's default, unlimited). A DynamicShape-flattened
    // map/array store can genuinely produce such headers/fields.
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-csv-edges")
    val n = 3000 // > univocity's 512 default and > the 2048 the verdict names
    val wideHeader = (0 until n).map(i => s"c$i").mkString(",")
    val wideRows = (0 until 2).map(r => (0 until n).map(c => s"$r-$c").mkString(","))
    Files.write(root.resolve("wide.csv"),
      (wideHeader +: wideRows).mkString("", "\n", "\n").getBytes("UTF-8"))
    val big = "x" * (3 << 20) // 3 MiB single field
    Files.write(root.resolve("bigfield.csv"),
      s"$header\n\"$big\",2,3\n1,\"$big\",3\n".getBytes("UTF-8"))

    for ((rel, h) <- Seq(("wide.csv", wideHeader), ("bigfield.csv", header))) {
      val exp = spark.read.option("header", "true").option("inferSchema", "false")
        .option("multiLine", "true").option("escape", "\"").csv(s"$root/$rel")
        .collectAsList().asScala
        .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
        .sortBy(_.toString)
      val got = Restructure.readCsvBinFiles(spark, root.toString, "", Seq(rel), h)
        .drop("__path").collectAsList().asScala
        .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
        .sortBy(_.toString)
      assert(got.size == exp.size, s"$rel: ${got.size} vs ${exp.size}")
      got.zip(exp).foreach { case (g, e) =>
        assert(g == e, s"$rel row mismatch: ${g.toString.take(120)} vs ${e.toString.take(120)}")
      }
    }
  }

  test("bespoke bin reader round-trips real restructure bins byte-for-byte (fuzz corpus)") {
    // the fuzz dimension the hand cases can't cover: strings the CSV
    // WRITER actually produces. Render a nasty frame through the real
    // write path (csv lines with quoting), then compare both readers.
    val root = Files.createTempDirectory("graft-csv-parity-fuzz")
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "ab,\"\n\r\t é中 %+._-"
    def cell(): String = {
      val len = rnd.nextInt(12)
      if (len == 0 && rnd.nextBoolean()) "" // empty cell
      else (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    def quote(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    (0 until 8).foreach { f =>
      val rows = (0 until 20).map(_ => Seq(cell(), cell(), cell()).map(quote).mkString(","))
      Files.write(root.resolve(s"fuzz$f.csv"),
        (header +: rows).mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val rels = (0 until 8).map(f => s"fuzz$f.csv")
    val expected = sparkRead(rels.map(r => s"$root/$r")).sortBy(_.toString)
    val got = bespokeRead(root, rels).sortBy(_.toString)
    assert(got == expected,
      s"fuzz divergence:\n bespoke: ${got.take(5)}\n spark: ${expected.take(5)}")
  }
}
