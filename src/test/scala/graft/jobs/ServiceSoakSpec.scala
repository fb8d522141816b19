package graft.jobs

import java.io.File
import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec

/** Batch service-mode soak: 50 iterations of the conflated
  * restructure+cleaner loop over a tree that receives one new source
  * slice per iteration, with every iteration appending into the SAME
  * output bins (the merge-rewrite path, the service's steady state).
  * Asserts the three long-run invariants short-iteration specs cannot:
  * ledger coverage grows monotonically, no dot-temp/unzip-temp residue
  * ever survives an iteration, and per-iteration wall time stays flat
  * (no superlinear re-scan of the growing store).
  */
class ServiceSoakSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"R","fields":[
      |{"name":"key","type":{"type":"record","name":"K","fields":[
      |  {"name":"userId","type":"string"}]}},
      |{"name":"value","type":{"type":"record","name":"V","fields":[
      |  {"name":"time","type":"double"},
      |  {"name":"v","type":"string"}]}}]}""".stripMargin

  test("50-iteration service loop: ledger monotone, zero temp residue, flat wall") {
    val schema = new Schema.Parser().parse(schemaJson)
    val work = Files.createTempDirectory("graft-soak")
    val dir = work.resolve("in/soak_topic/partition=0")
    Files.createDirectories(dir)
    val out = work.resolve("out")
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString, outputRoot = out.toString,
      dedup = true)
    val fs = new org.apache.hadoop.fs.Path(out.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t = 1.6095816e9

    def appendSlice(i: Int): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new File(dir.toFile, f"soak_topic+0+${2 * i}%010d+${2 * i + 1}%010d.avro"))
      Seq("u1", "u2").zipWithIndex.foreach { case (u, j) =>
        val k = new GenericData.Record(schema.getField("key").schema)
        k.put("userId", u)
        val v = new GenericData.Record(schema.getField("value").schema)
        v.put("time", t); v.put("v", s"it$i-$j")
        val r = new GenericData.Record(schema)
        r.put("key", k); r.put("value", v)
        w.append(r)
      }
      w.close()
    }

    def tempResidue(): Seq[String] =
      if (!Files.exists(out)) Nil
      else Files.walk(out).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          (n.startsWith(".") && n.contains(".tmp-")) || n.contains("graft-unzip")
        }
        .map(out.relativize(_).toString).toSeq

    val iterations = 50
    val walls = new Array[Double](iterations)
    for (i <- 0 until iterations) {
      appendSlice(i)
      val t0 = System.nanoTime()
      // one conflated iteration: restructure then cleaner (age 0 → verified
      // sources delete immediately, so the input tree stays small while the
      // OUTPUT bins grow by one merge-rewrite per iteration)
      Service.runLoop(spark, cfg, Service.ServiceConfig(
        intervalMs = 1, cleanerEnabled = true, cleanerAgeMs = 0L,
        maxIterations = Some(1)))
      walls(i) = (System.nanoTime() - t0) / 1e9
      // ledger monotonicity: everything committed so far stays covered
      val ledger = Restructure.loadLedger(fs, cfg.ledger)
      assert(ledger.contains("soak_topic", 0, 0, 2L * i + 1, java.time.Instant.EPOCH),
        s"iteration $i: ledger lost coverage of offsets [0, ${2 * i + 1}]")
      // verified sources are deleted by the cleaner — nothing accumulates
      val residue = tempResidue()
      assert(residue.isEmpty, s"iteration $i left temp residue: $residue")
    }

    // every iteration's rows survived all 50 merge-rewrites
    val binDirs = Seq("u1", "u2").map(u => out.resolve(s"unknown-project/$u/soak_topic"))
    binDirs.foreach { d =>
      val files = Files.list(d).iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("schema-")).toSeq
      assert(files == Seq("20210102_1000.csv"), s"bin set diverged: $files")
      val lines = Files.readAllLines(d.resolve("20210102_1000.csv")).asScala
      assert(lines.size == 1 + iterations,
        s"expected header + $iterations rows, got ${lines.size}")
    }
    // cleaner removed every verified slice EXCEPT the newest: the
    // next-offset guard (C1) deletes a file only once the ledger covers
    // past its end, so the final iteration's slice must survive
    val leftover = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(leftover == Seq(f"soak_topic+0+${2 * (iterations - 1)}%010d+${2 * iterations - 1}%010d.avro"),
      s"cleaner should leave exactly the newest slice, left: $leftover")

    // flat wall: the store grows by one bin-rewrite per iteration, so late
    // iterations must cost the same order as early ones. Medians over
    // 10-iteration windows, with generous headroom for host noise bursts.
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(walls.slice(5, 15).toSeq)
    val late = median(walls.slice(iterations - 10, iterations).toSeq)
    assert(late <= early * 3.0 + 0.5,
      f"per-iteration wall grew: early median $early%.2f s → late median $late%.2f s " +
        s"(walls: ${walls.map(w => f"$w%.2f").mkString(",")})")
  }
}
