package graft.jobs

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage of the executor-side bin writer (golden e2e covers
  * it end-to-end; these pin the contract in isolation).
  */
class BinWriterSpec extends AnyFunSuite {

  private def rows3(rs: (String, String)*): Iterator[(String, String, String)] =
    rs.iterator.map { case (p, l) => (p, "", l) }

  test("writePartition: sidecar created once per directory, existing content kept, stale temps swept") {
    val root = Files.createTempDirectory("graft-bw-sc")
    // pre-existing sidecar in dir a: must NOT be overwritten
    Files.createDirectories(root.resolve("a"))
    Files.write(root.resolve("a/schema-t.json"), "old".getBytes)
    // stale dot-temp from a crashed writer (>1 h old) and a fresh one
    val stale = root.resolve("a/.x.csv.tmp-dead")
    Files.write(stale, "x".getBytes)
    stale.toFile.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L)
    val fresh = root.resolve("a/.y.csv.tmp-live")
    Files.write(fresh, "y".getBytes)
    BinWriter.writePartition(
      rows3(("a/one.csv", "r1"), ("b/two.csv", "r2")), root.toString, Map.empty,
      None, gzip = false, zip = false,
      sidecar = Some(("schema-t.json", "new".getBytes))).toSeq
    assert(new String(Files.readAllBytes(root.resolve("a/schema-t.json"))) == "old",
      "existing sidecar overwritten")
    assert(new String(Files.readAllBytes(root.resolve("b/schema-t.json"))) == "new",
      "sidecar missing from fresh directory")
    assert(!Files.exists(stale), "stale temp not swept")
    assert(Files.exists(fresh), "fresh temp must survive the sweep")
  }

  test("writePartition: sweep spares a stale temp carrying the current runId (live sibling)") {
    val root = Files.createTempDirectory("graft-bw-rid")
    Files.createDirectories(root.resolve("a"))
    // a sibling task of THIS run opened its temp >1h ago and is still
    // writing (mtime set at create on HDFS) — must NOT be swept; a temp
    // from a dead run (different id) of the same age must be
    val live = root.resolve("a/.big.csv.tmp-run42-x")
    val dead = root.resolve("a/.old.csv.tmp-run77-y")
    Seq(live, dead).foreach { p =>
      Files.write(p, "x".getBytes)
      p.toFile.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L)
    }
    BinWriter.writePartition(
      rows3(("a/one.csv", "r1")), root.toString, Map.empty,
      None, gzip = false, zip = false,
      sidecar = Some(("schema-t.json", "s".getBytes)), runId = "run42").toSeq
    assert(Files.exists(live), "live sibling's temp swept by runId-blind sweep")
    assert(!Files.exists(dead), "dead run's stale temp must still be swept")
  }

  test("writePartition: one exactly-named file per path, header once, rows in order") {
    val root = Files.createTempDirectory("graft-bw").toString
    val rows = rows3(
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

  test("writePartition: hot bin — 200k rows stream through ONE file without buffering (dedup off/keep-first)") {
    // the filename contract serializes each bin through one writer task
    // (one bin = one exactly-named file); a producer flooding null-time
    // records concentrates half a batch in `unknown-time`. With dedup off
    // or keep-first the writer STREAMS: memory is O(keys-seen) hashes for
    // keep-first and O(1) for off, never the rendered lines. (Keep-last is
    // the documented exception: it buffers one bin's SURVIVING lines —
    // the reference's own per-file memory shape, FileCache holds the file
    // content too. PLANS.md "Hot-bin serialization bound".)
    val root = Files.createTempDirectory("graft-bw-hot").toString
    val n = 200000
    val rows = (0 until n).iterator.map(i => ("hot/one.csv", s"k${i % 1000}", s"row$i"))
    val written = BinWriter.writePartition(
      rows, root, Map.empty, Some("h"), gzip = false, zip = false,
      dedup = BinWriter.DedupKeepFirst).toSeq
    assert(written == Seq("hot/one.csv"))
    val lines = Files.readAllLines(java.nio.file.Paths.get(root, "hot/one.csv")).asScala
    // keep-first over 1000 distinct keys: exactly the first occurrence each
    assert(lines.size == 1 + 1000)
    assert(lines(1) == "row0" && lines(1000) == "row999")
    // and keep-last on the same stream buffers only the 1000 survivors
    val root2 = Files.createTempDirectory("graft-bw-hot2").toString
    val rows2 = (0 until n).iterator.map(i => ("hot/one.csv", s"k${i % 1000}", s"row$i"))
    BinWriter.writePartition(rows2, root2, Map.empty, Some("h"), gzip = false, zip = false,
      dedup = BinWriter.DedupKeepLast).toSeq
    val lines2 = Files.readAllLines(java.nio.file.Paths.get(root2, "hot/one.csv")).asScala
    assert(lines2.size == 1 + 1000)
    assert(lines2.last == s"row${n - 1}")
  }

  test("writePartition: local uid/gid applied to committed files and created dirs") {
    val root = Files.createTempDirectory("graft-bw-own")
    // setting the CURRENT uid/gid needs no privilege; asserts the attribute
    // plumbing without requiring root (reference LocalTargetStorage.kt:94-101)
    val uid = Files.getAttribute(root, "unix:uid").asInstanceOf[Int]
    val gid = Files.getAttribute(root, "unix:gid").asInstanceOf[Int]
    BinWriter.writePartition(rows3(("a/one.csv", "r1")), root.toString,
      Map.empty, None, gzip = false, zip = false, BinWriter.DedupOff, uid, gid).toSeq
    val f = root.resolve("a/one.csv")
    assert(Files.getAttribute(f, "unix:uid") == uid)
    assert(Files.getAttribute(f, "unix:gid") == gid)
    assert(Files.getAttribute(root.resolve("a"), "unix:uid") == uid)
    // config surface: target.local.{userId,groupId}
    val l = ConfigLoader.load(
      s"""target:
         |  type: local
         |  local:
         |    userId: $uid
         |    groupId: $gid
         |""".stripMargin)
    assert(l.job.localUid == uid && l.job.localGid == gid)
    assert(ConfigLoader.load("{}").job.localUid == -1)
  }

  test("writePartition: atomically replaces an existing target") {
    val root = Files.createTempDirectory("graft-bw2").toString
    Files.createDirectories(java.nio.file.Paths.get(root, "a"))
    Files.writeString(java.nio.file.Paths.get(root, "a/one.csv"), "old\n")
    BinWriter.writePartition(rows3(("a/one.csv", "new")), root, Map.empty,
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
    BinWriter.writePartition(rows3(("a/one.csv.zip", "x,y")), root, Map.empty,
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

  test("keep-last dedup: later occurrence wins, output in last-occurrence order, per bin") {
    val root = Files.createTempDirectory("graft-bw5").toString
    val rows = Iterator(
      ("a/one.csv", "k1", "v1-old"),
      ("a/one.csv", "k2", "v2"),
      ("a/one.csv", "k1", "v1-new"), // k1 re-occurs → moves after k2
      ("b/two.csv", "k1", "other-bin"))
    BinWriter.writePartition(rows, root, Map.empty, Some("h"),
      gzip = false, zip = false, dedup = BinWriter.DedupKeepLast).toSeq
    assert(Files.readAllLines(java.nio.file.Paths.get(root, "a/one.csv")).asScala ==
      Seq("h", "v2", "v1-new"))
    // dedup state is per bin: same key writes independently in another bin
    assert(Files.readAllLines(java.nio.file.Paths.get(root, "b/two.csv")).asScala ==
      Seq("h", "other-bin"))
  }

  test("renameOver fallback: false-reporting rename accepted only when target matches the temp's length") {
    // a scheme with no FileContext binding exercises the delete+rename
    // fallback; the mock reports FALSE from rename while (a) actually
    // committing, (b) committing a truncated/foreign target, (c) doing
    // nothing — only (a) may be accepted as this task's commit
    import org.apache.hadoop.fs.{Path => HPath}
    class FlakyFs(mode: String) extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "flaky"
      override def getUri: java.net.URI = java.net.URI.create("flaky:///")
      override def rename(src: HPath, dst: HPath): Boolean = {
        mode match {
          // moved, reports false (retry with src gone: plain false, as a
          // real store would — RawLocalFileSystem's copy path would throw)
          case "transient" => if (exists(src)) super.rename(src, dst)
          case "corrupt" => // foreign/partial target appears, temp lost
            val out = create(dst, true); out.write("xx".getBytes); out.close()
            delete(src, false)
          case _ => // no-op: rename genuinely failed, temp stays
        }
        false
      }
    }
    val conf = new org.apache.hadoop.conf.Configuration()
    def run(mode: String): (java.nio.file.Path, () => Unit) = {
      val dir = Files.createTempDirectory(s"graft-bw-flaky-$mode")
      val src = dir.resolve("src.tmp"); Files.writeString(src, "payload\n")
      val fs = new FlakyFs(mode); fs.initialize(fs.getUri, conf)
      val target = dir.resolve("target.csv")
      (target, () => BinWriter.renameOver(fs, conf,
        new HPath(src.toString), new HPath(target.toString)))
    }
    // (a) transient: move happened, lengths match -> accepted quietly
    val (t1, go1) = run("transient")
    go1()
    assert(Files.readString(t1) == "payload\n")
    // (b) corrupt: src gone but target length differs -> must FAIL the task
    val (_, go2) = run("corrupt")
    intercept[java.io.IOException](go2())
    // (c) no-op: temp still present, nothing committed -> must FAIL
    val (_, go3) = run("noop")
    intercept[java.io.IOException](go3())
    // (d) src gone BEFORE the first rename with a committed target (e.g. a
    // speculative twin already committed): length acceptance is impossible
    // (srcLen = -1) -> fall back to existence acceptance, pass quietly
    val (t4, go4) = run("noop")
    val d4 = t4.getParent
    Files.writeString(t4, "twin-committed\n")
    Files.delete(d4.resolve("src.tmp"))
    go4()
    assert(Files.readString(t4) == "twin-committed\n")
    // (e) src gone before the first rename and NO target -> fail, with the
    // srcLen-specific message, not the length-mismatch one
    val (t5, go5) = run("noop")
    Files.delete(t5.getParent.resolve("src.tmp"))
    val e5 = intercept[java.io.IOException](go5())
    assert(e5.getMessage.contains("temp already absent"), e5.getMessage)
  }

  test("FingerprintStream: head/tail/length match the written bytes across chunkings") {
    val rnd = new java.util.Random(7)
    for (len <- Seq(0, 1, 10, 8191, 8192, 8193, 16384, 16385, 50000)) {
      val data = new Array[Byte](len); rnd.nextBytes(data)
      val sink = new java.io.ByteArrayOutputStream()
      val fps = new BinWriter.FingerprintStream(sink)
      // mixed single-byte and ragged bulk writes to exercise the ring math
      var off = 0
      while (off < len) {
        if (off % 13 == 0 && off + 1 <= len) { fps.write(data(off)); off += 1 }
        else {
          val n = math.min(1 + rnd.nextInt(9000), len - off)
          fps.write(data, off, n); off += n
        }
      }
      fps.close()
      assert(java.util.Arrays.equals(sink.toByteArray, data), s"len=$len passthrough")
      val fp = fps.fingerprint
      val headLen = math.min(BinWriter.FpBlock, len)
      val tailLen = math.min(BinWriter.FpBlock, len - headLen)
      assert(fp.len == len)
      assert(java.util.Arrays.equals(fp.head, java.util.Arrays.copyOfRange(data, 0, headLen)),
        s"len=$len head")
      assert(java.util.Arrays.equals(fp.tail,
        java.util.Arrays.copyOfRange(data, len - tailLen, len)), s"len=$len tail")
    }
  }

  test("renameOver fallback: write-time fingerprint validates without re-reading; a vanished temp adopts, not FNFEs") {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = new org.apache.hadoop.conf.Configuration()
    // (a) caller-provided fingerprint: a transient false-reporting rename
    // that really committed is accepted with NO open() of the temp — the
    // fs counts opens of the temp path to prove the zero-re-read claim
    class CountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "flaky"
      override def getUri: java.net.URI = java.net.URI.create("flaky:///")
      var srcOpens = 0
      var srcName: String = ""
      override def open(f: HPath, b: Int): org.apache.hadoop.fs.FSDataInputStream = {
        if (f.getName == srcName) srcOpens += 1
        super.open(f, b)
      }
      override def rename(src: HPath, dst: HPath): Boolean = {
        if (exists(src)) super.rename(src, dst); false
      }
    }
    def fpOf(bytes: Array[Byte]): BinWriter.Fingerprint = {
      val s = new BinWriter.FingerprintStream(java.io.OutputStream.nullOutputStream())
      s.write(bytes); s.close(); s.fingerprint
    }
    val dir1 = Files.createTempDirectory("graft-bw-fp1")
    val payload = "fingerprinted-payload\n".getBytes
    Files.write(dir1.resolve("src.tmp"), payload)
    val fs1 = new CountingFs; fs1.initialize(fs1.getUri, conf); fs1.srcName = "src.tmp"
    BinWriter.renameOver(fs1, conf, new HPath(dir1.resolve("src.tmp").toString),
      new HPath(dir1.resolve("t.csv").toString), Some(fpOf(payload)))
    assert(Files.readAllBytes(dir1.resolve("t.csv")).sameElements(payload))
    assert(fs1.srcOpens == 0, "fingerprinted commit must not re-read the temp")
    // (b) caller fingerprint rejects an equal-length foreign target
    class ForeignFs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "flaky"
      override def getUri: java.net.URI = java.net.URI.create("flaky:///")
      override def rename(src: HPath, dst: HPath): Boolean = {
        if (exists(src)) {
          val len = getFileStatus(src).getLen.toInt
          val out = create(dst, true); out.write(new Array[Byte](len)); out.close()
          delete(src, false)
        }
        false
      }
    }
    val dir2 = Files.createTempDirectory("graft-bw-fp2")
    Files.write(dir2.resolve("src.tmp"), payload)
    val fs2 = new ForeignFs; fs2.initialize(fs2.getUri, conf)
    intercept[java.io.IOException] {
      BinWriter.renameOver(fs2, conf, new HPath(dir2.resolve("src.tmp").toString),
        new HPath(dir2.resolve("t.csv").toString), Some(fpOf(payload)))
    }
    // (c) NO caller fingerprint and the temp vanishes between its length
    // stat and the fingerprint read (external dot-temp cleanup): with a
    // committed target of the temp's stat'd LENGTH present this must land
    // in the adoption path, not throw a raw FileNotFoundException — the
    // length is the strongest evidence still available
    class VanishFs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "flaky"
      override def getUri: java.net.URI = java.net.URI.create("flaky:///")
      var vanishOnOpen: String = ""
      override def open(f: HPath, b: Int): org.apache.hadoop.fs.FSDataInputStream =
        if (f.getName == vanishOnOpen) {
          delete(f, false)
          throw new java.io.FileNotFoundException(f.toString)
        } else super.open(f, b)
      override def rename(src: HPath, dst: HPath): Boolean = false
    }
    val twinBytes = "twin-wrote-same-length\n".getBytes
    assert(twinBytes.length != payload.length) // (c2) below relies on the mismatch
    val dir3 = Files.createTempDirectory("graft-bw-fp3")
    Files.write(dir3.resolve("src.tmp"), payload)
    Files.write(dir3.resolve("t.csv"), new Array[Byte](payload.length)) // equal length
    val fs3 = new VanishFs; fs3.initialize(fs3.getUri, conf); fs3.vanishOnOpen = "src.tmp"
    BinWriter.renameOver(fs3, conf, new HPath(dir3.resolve("src.tmp").toString),
      new HPath(dir3.resolve("t.csv").toString))
    assert(Files.readAllBytes(dir3.resolve("t.csv")).length == payload.length)
    // (c2) same vanish, target length DIFFERS from the temp's stat'd
    // length: a foreign writer's file — must fail the task so the
    // idempotent retry rewrites the bin, not adopt it
    val dir3b = Files.createTempDirectory("graft-bw-fp3b")
    Files.write(dir3b.resolve("src.tmp"), payload)
    Files.write(dir3b.resolve("t.csv"), twinBytes)
    val fs3b = new VanishFs; fs3b.initialize(fs3b.getUri, conf); fs3b.vanishOnOpen = "src.tmp"
    val e3b = intercept[java.io.IOException] {
      BinWriter.renameOver(fs3b, conf, new HPath(dir3b.resolve("src.tmp").toString),
        new HPath(dir3b.resolve("t.csv").toString))
    }
    assert(e3b.getMessage.contains("matching the temp's length"), e3b.getMessage)
    // evidence preserved: the foreign file is not deleted by the refusal
    assert(java.util.Arrays.equals(Files.readAllBytes(dir3b.resolve("t.csv")), twinBytes))
    val inverted = payload.map(b => (~b).toByte)
    // (c') same vanish with no committed target: a real failure, with the
    // vanish-specific message rather than a raw FNFE
    val dir4 = Files.createTempDirectory("graft-bw-fp4")
    Files.write(dir4.resolve("src.tmp"), payload)
    val fs4 = new VanishFs; fs4.initialize(fs4.getUri, conf); fs4.vanishOnOpen = "src.tmp"
    val e = intercept[java.io.IOException] {
      BinWriter.renameOver(fs4, conf, new HPath(dir4.resolve("src.tmp").toString),
        new HPath(dir4.resolve("t.csv").toString))
    }
    assert(e.getMessage.contains("vanished between"), e.getMessage)
    // (d) temp absent BEFORE the first stat (srcLen unknown) WITH the
    // write-time fingerprint: a foreign target is refused, the twin's
    // identical bytes are adopted
    val dir5 = Files.createTempDirectory("graft-bw-fp5")
    Files.write(dir5.resolve("t.csv"), inverted)
    val fs5 = new VanishFs; fs5.initialize(fs5.getUri, conf)
    val e5 = intercept[java.io.IOException] {
      BinWriter.renameOver(fs5, conf, new HPath(dir5.resolve("src.tmp").toString),
        new HPath(dir5.resolve("t.csv").toString), Some(fpOf(payload)))
    }
    assert(e5.getMessage.contains("write-time fingerprint"), e5.getMessage)
    Files.write(dir5.resolve("t.csv"), payload)
    BinWriter.renameOver(fs5, conf, new HPath(dir5.resolve("src.tmp").toString),
      new HPath(dir5.resolve("t.csv").toString), Some(fpOf(payload)))
    assert(Files.readAllBytes(dir5.resolve("t.csv")).sameElements(payload))
  }

  test("keep-first dedup: first occurrence wins, streaming order") {
    val root = Files.createTempDirectory("graft-bw6").toString
    val rows = Iterator(
      ("a/one.json", "k1", "first"),
      ("a/one.json", "k2", "second"),
      ("a/one.json", "k1", "dupe-dropped"))
    BinWriter.writePartition(rows, root, Map.empty, None,
      gzip = false, zip = false, dedup = BinWriter.DedupKeepFirst).toSeq
    assert(Files.readAllLines(java.nio.file.Paths.get(root, "a/one.json")).asScala ==
      Seq("first", "second"))
  }
}
