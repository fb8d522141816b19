package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Kafka-connector file-layout semantics: topic discovery and
  * `topic+partition+startOffset[+endOffset].avro` filename parsing
  * (reference: util/AvroTopicLister.kt:19-30,
  * accounting/TopicPartitionOffsetRange.kt:61-76).
  *
  * Both a driver-side form (for work-list planning against the ledger) and a
  * Column form (for deriving offsets inside a distributed scan via
  * `input_file_name()`).
  */
object TopicFiles {

  /** Parsed `topic+partition+from[+to]` filename. */
  final case class OffsetRange(topic: String, partition: Int, from: Long, to: Option[Long])

  private val fileRe = "^(.+?)\\+(\\d+)\\+(\\d+)(?:\\+(\\d+))?\\.avro$".r

  /** Driver-side parse of one file name (no directory components). */
  def parseFilename(name: String): Option[OffsetRange] = name match {
    case fileRe(topic, part, from, to) =>
      Some(OffsetRange(topic, part.toInt, from.toLong,
        Option(to).map(_.toLong)))
    case _ => None
  }

  val filenamePattern = "^(.+?)\\+(\\d+)\\+(\\d+)(?:\\+(\\d+))?\\.avro$"

  /** Column-side parse over a filename column (e.g.
    * `element_at(split(input_file_name(), "/"), -1)`).
    */
  def topicCol(fname: Column): Column = regexp_extract(fname, filenamePattern, 1)
  // no-match extraction yields "" — under ANSI mode a plain cast of ""
  // THROWS, so one stray non-conforming file in a frame would kill the
  // whole query; null is the no-match signal (as toOffsetCol always did)
  def partitionCol(fname: Column): Column = {
    val g = regexp_extract(fname, filenamePattern, 2)
    when(g === "", lit(null).cast(IntegerType)).otherwise(g.cast(IntegerType))
  }
  def fromOffsetCol(fname: Column): Column = {
    val g = regexp_extract(fname, filenamePattern, 3)
    when(g === "", lit(null).cast(LongType)).otherwise(g.cast(LongType))
  }
  def toOffsetCol(fname: Column): Column = {
    val g = regexp_extract(fname, filenamePattern, 4)
    when(g === "", lit(null).cast(LongType)).otherwise(g.cast(LongType))
  }

  /** Topic discovery over any Hadoop filesystem (local/HDFS/S3A/ABFS): a
    * `*.avro` file marks `parent.parent` as its topic; `+tmp` dirs skipped
    * (util/AvroTopicLister.kt:11-31). Driver-side planning step; one
    * recursive listing call (S3A turns this into paged LIST requests — the
    * S2/S3 operators of SURVEY.md §2.1).
    */
  /** Topic listings merged across several input roots (reference
    * paths.inputs is a list — each root holds the same topic/partition
    * layout, e.g. per-cluster or per-era trees; files for a topic present
    * in several roots concatenate, sorted per root).
    *
    * Contract for SAME-NAMED files across roots: a file's name encodes
    * its identity (`topic+partition+from[+to]`), so two roots holding
    * `events+0+100.avro` are REPLICAS of the same Kafka offsets — the
    * ledger marks the range once and provenance/skip state keys on the
    * name, exactly as the reference's offset accounting treats them.
    * Distinct CONTENT under one name across roots is a producer-contract
    * violation neither engine can detect.
    */
  def listTopicsAll(spark: org.apache.spark.sql.SparkSession, roots: Seq[String])
      : Map[String, Seq[org.apache.hadoop.fs.FileStatus]] =
    roots.map { root =>
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      listTopics(fs, root)
    }.reduce { (a, b) =>
      (a.keySet ++ b.keySet).iterator.map { t =>
        t -> (a.getOrElse(t, Nil) ++ b.getOrElse(t, Nil))
      }.toMap
    }

  def listTopics(fs: org.apache.hadoop.fs.FileSystem, root: String)
      : Map[String, Seq[org.apache.hadoop.fs.FileStatus]] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return Map.empty
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      if (p.getName.endsWith(".avro") && !p.toString.contains("+tmp")) buf += st
    }
    buf.toSeq
      .groupBy(st => st.getPath.getParent.getParent.getName)
      .map { case (t, fss) => t -> fss.sortBy(_.getPath.toString) }
  }
}
