package graft.jobs

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Options, Path => HPath}

/** Executor-side single-writer-per-bin commit (used by
  * `Restructure.commitBins`): rows arrive sorted by bin path; each bin
  * streams to a dot-prefixed temp file next to its target (invisible to
  * Spark readers) and is atomically swapped in on close. Gzip/zip wrap the
  * stream directly — no committer temp tree, no post-pass repack, and
  * renames parallelize across tasks instead of a driver pool.
  */
private[jobs] object BinWriter {

  private val fileContexts =
    new java.util.concurrent.ConcurrentHashMap[URI, Option[org.apache.hadoop.fs.FileContext]]()

  /** K8 atomic replace (reference parity: `Files.move(ATOMIC_MOVE,
    * REPLACE_EXISTING)`, target/LocalTargetStorage.kt:100-122). Local FS is
    * one nio syscall (FileContext would fork an `ls` per target stat);
    * other filesystems use a cached FileContext with `Rename.OVERWRITE`;
    * those with no FileContext binding (s3a — where rename is a copy and
    * nothing is atomic anyway) fall back to delete+rename.
    */
  def renameOver(fs: FileSystem, conf: Configuration, src: HPath, target: HPath): Unit =
    if (fs.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(src.toUri.getPath),
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val fcOpt = fileContexts.computeIfAbsent(fs.getUri, uri =>
        try Some(org.apache.hadoop.fs.FileContext.getFileContext(uri, conf))
        catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None })
      fcOpt match {
        case Some(fc) =>
          fc.rename(fs.makeQualified(src), fs.makeQualified(target), Options.Rename.OVERWRITE)
        case None =>
          if (fs.exists(target)) fs.delete(target, false)
          fs.rename(src, target)
      }
    }

  /** Stream one task's `(relPath, line)` rows — sorted by path — into
    * exactly one file per distinct path. Returns the written relative
    * paths. A failing task deletes its in-flight temp so retries start
    * clean; already-committed bins are idempotently re-replaced on retry.
    */
  def writePartition(
      it: Iterator[(String, String)], outputRoot: String,
      confEntries: Map[String, String], header: Option[String],
      gzip: Boolean, zip: Boolean): Iterator[String] = {
    if (!it.hasNext) return Iterator.empty
    val conf = new Configuration()
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val fs = new HPath(outputRoot).getFileSystem(conf)
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    val written = scala.collection.mutable.ArrayBuffer.empty[String]
    var current: String = null
    var tmp: HPath = null
    var target: HPath = null
    var out: java.io.BufferedWriter = null

    def close(): Unit = if (out != null) {
      out.close() // cascades: flush chars → finish gzip/zip → close stream
      renameOver(fs, conf, tmp, target)
      written += current
      out = null
    }
    def open(rel: String): Unit = {
      target = new HPath(s"$outputRoot/$rel")
      fs.mkdirs(target.getParent)
      tmp = new HPath(target.getParent, s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
      val raw = fs.create(tmp, true)
      val stream: java.io.OutputStream =
        if (zip) {
          // K6: single entry named after the file, level 7
          // (compression/ZipCompression.kt:10-25)
          val z = new java.util.zip.ZipOutputStream(raw)
          z.setLevel(7)
          z.putNextEntry(new java.util.zip.ZipEntry(target.getName.stripSuffix(".zip")))
          z
        } else if (gzip) new java.util.zip.GZIPOutputStream(raw, 65536)
        else raw
      out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(stream, java.nio.charset.StandardCharsets.UTF_8), 65536)
      header.foreach { h => out.write(h); out.write('\n') }
    }

    try {
      it.foreach { case (rel, line) =>
        if (rel != current) { close(); current = rel; open(rel) }
        out.write(line)
        out.write('\n')
      }
      close()
      written.iterator
    } catch {
      case e: Throwable =>
        if (out != null) {
          try out.close() catch { case _: Exception => }
          try fs.delete(tmp, false) catch { case _: Exception => }
        }
        throw e
    }
  }
}
