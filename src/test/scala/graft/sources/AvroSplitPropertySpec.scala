package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check of the V2 byte-range split reader
  * ([[graft.sources.v2.GraftAvroSource]]): for ANY combination of record
  * sizes, writer sync interval and split threshold, the union of the
  * file's slices must yield every record exactly once, with exact
  * file-global `__pos` — including when a split edge lands exactly on an
  * Avro sync boundary (the classic off-by-one surface of the Hadoop split
  * contract "a block belongs to the slice its sync falls in").
  */
class AvroSplitPropertySpec extends SparkSpec {

  private val schema = new Schema.Parser().parse(
    """{"type":"record","name":"R","fields":[{"name":"x","type":"string"}]}""")

  /** Write one container file with the given per-record payload sizes. */
  private def writeFile(sizes: Seq[Int], syncInterval: Int): File = {
    val dir = Files.createTempDirectory("graft-splitprop").resolve("t/partition=0")
    Files.createDirectories(dir)
    val f = new File(dir.toFile, "t+0+0000000000.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(syncInterval)
    w.create(schema, f)
    sizes.zipWithIndex.foreach { case (sz, i) =>
      val r = new GenericData.Record(schema)
      r.put("x", s"$i:" + ("a" * sz))
      w.append(r)
    }
    w.close()
    f
  }

  /** (record index parsed back from x, __pos) sorted by __pos. */
  private def readPairs(f: File, splitBytes: Long): Seq[(Long, Long)] =
    AvroRead.read(spark, Seq(f.getPath), splitBytes = splitBytes)
      .select("x", AvroRead.PosCol).collect()
      .map(r => (r.getString(0).takeWhile(_ != ':').toLong, r.getLong(1)))
      .sortBy(_._2).toSeq

  private def expected(n: Int): Seq[(Long, Long)] =
    (0L until n.toLong).map(i => (i, i))

  test("property: split read ≡ whole for random record sizes / sync intervals / splitBytes") {
    val gen = for {
      n <- Gen.choose(1, 250)
      sync <- Gen.choose(32, 1024) // writer clamps below 32
      split <- Gen.choose(128L, 4096L)
      sizes <- Gen.listOfN(n, Gen.choose(0, 180))
    } yield (sizes, sync, split)
    val prop = Prop.forAll(gen) { case (sizes, sync, split) =>
      val f = writeFile(sizes, sync)
      try {
        val got = readPairs(f, split)
        val want = expected(sizes.length)
        if (got == want) true
        else {
          Console.err.println(s"[splitprop] n=${sizes.length} sync=$sync split=$split: " +
            s"got ${got.size} rows, first diff at ${got.zip(want).indexWhere(p => p._1 != p._2)}")
          false
        }
      } finally {
        f.delete(); ()
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(25)
        .withInitialSeed(Seed(20260814L)),
      prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("split edges exactly on / adjacent to every sync boundary read whole") {
    // fixed adversarial layout: small sync interval -> many block boundaries
    val n = 400
    val f = writeFile(Seq.fill(n)(40), 64)
    // enumerate the actual block-start boundaries from the container itself
    val in = new org.apache.avro.mapred.FsInput(
      new org.apache.hadoop.fs.Path(f.getPath), new org.apache.hadoop.conf.Configuration())
    val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      .asInstanceOf[DataFileReader[GenericRecord]]
    val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (r.hasNext) { starts += r.previousSync(); r.nextBlock() }
    val fileLen = f.length()
    r.close()
    assert(starts.size > 3, s"expected many blocks, got ${starts.size}")
    val want = expected(n)
    // every boundary (and its +-1 neighbors) as the split edge, plus the
    // degenerate thresholds around the file length
    val edges = (starts.take(3) ++ Seq(starts(starts.size / 2), starts.last))
      .flatMap(b => Seq(b - 1, b, b + 1)) ++ Seq(fileLen - 1, fileLen, 16L)
    edges.filter(_ > 0).distinct.foreach { split =>
      assert(readPairs(f, split) == want, s"split edge at $split diverged (file len $fileLen)")
    }
    f.delete(); ()
  }
}
