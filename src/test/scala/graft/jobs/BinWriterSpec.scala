package graft.jobs

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage of the executor-side bin writer (golden e2e covers
  * it end-to-end; these pin the contract in isolation).
  */
class BinWriterSpec extends AnyFunSuite {

  test("writePartition: one exactly-named file per path, header once, rows in order") {
    val root = Files.createTempDirectory("graft-bw").toString
    val rows = Iterator(
      ("a/one.csv", "r1"), ("a/one.csv", "r2"), ("b/two.csv", "r3"))
    val written = BinWriter.writePartition(
      rows, root, Map.empty, Some("h1,h2"), gzip = false, zip = false).toSeq
    assert(written.sorted == Seq("a/one.csv", "b/two.csv"))
    assert(Files.readAllLines(java.nio.file.Paths.get(root, "a/one.csv")).asScala ==
      Seq("h1,h2", "r1", "r2"))
    assert(Files.readAllLines(java.nio.file.Paths.get(root, "b/two.csv")).asScala ==
      Seq("h1,h2", "r3"))
    // no temp leftovers
    val stray = Files.list(java.nio.file.Paths.get(root, "a")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(".")).toSeq
    assert(stray.isEmpty, s"stray temps: $stray")
  }

  test("writePartition: atomically replaces an existing target") {
    val root = Files.createTempDirectory("graft-bw2").toString
    Files.createDirectories(java.nio.file.Paths.get(root, "a"))
    Files.writeString(java.nio.file.Paths.get(root, "a/one.csv"), "old\n")
    BinWriter.writePartition(Iterator(("a/one.csv", "new")), root, Map.empty,
      None, gzip = false, zip = false).toSeq
    assert(Files.readAllLines(java.nio.file.Paths.get(root, "a/one.csv")).asScala == Seq("new"))
  }

  test("writePartition: empty iterator writes nothing") {
    val root = Files.createTempDirectory("graft-bw3").toString
    assert(BinWriter.writePartition(Iterator.empty, root, Map.empty,
      None, gzip = false, zip = false).isEmpty)
  }

  test("writePartition: zip bin is a single level-compressed entry") {
    val root = Files.createTempDirectory("graft-bw4").toString
    BinWriter.writePartition(Iterator(("a/one.csv.zip", "x,y")), root, Map.empty,
      Some("h"), gzip = false, zip = true).toSeq
    val zin = new java.util.zip.ZipInputStream(
      Files.newInputStream(java.nio.file.Paths.get(root, "a/one.csv.zip")))
    val entry = zin.getNextEntry
    assert(entry.getName == "one.csv")
    val content = new String(zin.readAllBytes(), "UTF-8")
    assert(content == "h\nx,y\n")
    assert(zin.getNextEntry == null)
    zin.close()
  }
}
