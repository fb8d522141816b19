package graft.sources

/** S9: per-file end-offset tag lookup. The reference closes open-ended file
  * ranges (`topic+partition+start.avro` — no end offset in the name) from
  * S3 object tags (`source/S3SourceStorage.kt:65-85`, config
  * `endOffsetFromTags`) or Azure blob metadata
  * (`source/AzureSourceStorage.kt:48-64`, `endOffsetFromMetadata`), writing
  * the tagged `endOffset` into the range exactly as if the filename had
  * carried it. A tagged file therefore needs NO record-counting scan to
  * commit its ledger range — at 100 TB that is the difference between a
  * metadata request and decoding the whole file once more.
  *
  * Missing tags and lookup failures return None (the reference swallows
  * exceptions the same way) — the counting fallback stays correct.
  */
trait EndOffsetSource extends Serializable {
  /** The `endOffset` tag for the file at `path` (full URI or path), if any. */
  def endOffset(path: String): Option[Long]
}

object EndOffsetSource {

  /** Hadoop extended-attribute lookup — the Spark-native way to reach the
    * same per-object metadata the reference reads with a bespoke client:
    * on S3A, object metadata headers surface as `header.x-amz-meta-*`
    * xattrs; on HDFS they are real `user.*` xattrs; ABFS maps blob
    * metadata likewise. Every name in `names` is tried in order; filesystems
    * without XAttr support (e.g. the local test FS) simply yield None.
    */
  final class HadoopXAttr(
      @transient private val conf: org.apache.hadoop.conf.Configuration,
      names: Seq[String] = Seq("user.endOffset", "header.x-amz-meta-endoffset", "endOffset"))
      extends EndOffsetSource {
    def endOffset(path: String): Option[Long] = {
      val p = new org.apache.hadoop.fs.Path(path)
      try {
        val fs = p.getFileSystem(if (conf == null) new org.apache.hadoop.conf.Configuration() else conf)
        names.iterator.map { n =>
          try Option(fs.getXAttr(p, n)).map(b => new String(b, "UTF-8"))
          catch { case _: Exception => None }
        }.collectFirst { case Some(v) if v.trim.nonEmpty => v.trim }
          .flatMap(_.toLongOption)
      } catch { case _: Exception => None }
    }
  }

  /** Fixed tag table (tests; also file-backed exports of object tags):
    * lookup by full path first, then by bare file name.
    */
  final class Static(tags: Map[String, Long]) extends EndOffsetSource {
    def endOffset(path: String): Option[Long] =
      tags.get(path).orElse(tags.get(new org.apache.hadoop.fs.Path(path).getName))
  }
}
