package graft.ledger

import java.time.Instant
import scala.collection.mutable

/** Per-(topic, partition) ledger of extracted offset ranges, with the
  * Redis-compatible JSON persistence schema of the reference
  * (accounting/OffsetRedisPersistence.kt:95-103):
  * `{"partitions":[{"topic":t,"partition":p,"ranges":[{"from":f,"to":t,"lastProcessed":iso}]}]}`.
  *
  * Driver-side state — the Structured-Streaming-commit-log analog. Size is
  * O(gaps), independent of data volume.
  */
final class OffsetRangeSet {
  private val map = mutable.LinkedHashMap.empty[(String, Int), OffsetIntervals]

  def apply(topic: String, partition: Int): OffsetIntervals = synchronized {
    map.getOrElseUpdate((topic, partition), new OffsetIntervals)
  }

  def add(topic: String, partition: Int, from: Long, to: Long, processed: Instant): Unit =
    synchronized { apply(topic, partition).add(from, to, processed) }

  def contains(topic: String, partition: Int, from: Long, to: Long, lastModified: Instant): Boolean =
    synchronized { map.get((topic, partition)).exists(_.contains(from, to, lastModified)) }

  def remove(topic: String, partition: Int, from: Long, to: Long): Unit =
    synchronized { map.get((topic, partition)).foreach(_.remove(from, to)) }

  def covered(topic: String, partition: Int, from: Long, to: Long,
      lastModified: Instant): Seq[(Long, Long)] =
    synchronized {
      map.get((topic, partition)).fold(Seq.empty[(Long, Long)])(
        _.covered(from, to, lastModified))
    }

  def topicPartitions: Seq[(String, Int)] = synchronized { map.keys.toSeq.sortBy(identity) }

  /** Union every interval of `other` into this set (multi-instance ledger
    * refresh: another replica's commits merge in under the topic lock).
    * `other` must not be concurrently mutated during the merge.
    */
  def mergeFrom(other: OffsetRangeSet): Unit =
    other.topicPartitions.foreach { case (t, p) =>
      other(t, p).intervals.foreach { case (f, to, lp) => add(t, p, f, to, lp) }
    }

  def toJson: String = synchronized {
    val sb = new StringBuilder("{\"partitions\":[")
    var first = true
    for (((topic, partition), ivs) <- map.toSeq.sortBy(_._1)) {
      if (!first) sb.append(',')
      first = false
      sb.append("{\"topic\":").append(LedgerJson.quote(topic))
        .append(",\"partition\":").append(partition)
        .append(",\"ranges\":[")
      sb.append(ivs.intervals.map { case (f, t, lp) =>
        s"""{"from":$f,"to":$t,"lastProcessed":"${lp.toString}"}"""
      }.mkString(","))
      sb.append("]}")
    }
    sb.append("]}")
    sb.toString
  }
}

object OffsetRangeSet {

  /** Merge reference-format legacy CSV offset lines into `into` — the
    * pre-JSON `offsets/<topic>.csv` format
    * (accounting/OffsetFilePersistence.kt:70-93, header
    * `offsetFrom,offsetTo,partition,topic[,lastModified]`): header dropped,
    * topic column unquoted, a missing lastModified column defaults to now,
    * exactly like the reference's parseLine. Blank lines are skipped.
    */
  def addLegacyCsv(lines: Iterator[String], into: OffsetRangeSet): Unit =
    lines.drop(1).map(_.trim).filter(_.nonEmpty).foreach { line =>
      val cols = line.split(",")
      val topic = cols(3).replaceAll("^\"+", "").replaceAll("\"+$", "")
      val lastModified =
        if (cols.length >= 5) Instant.parse(cols(4)) else Instant.now()
      into.add(topic, cols(2).toInt, cols(0).toLong, cols(1).toLong, lastModified)
    }

  def fromJson(json: String): OffsetRangeSet = {
    val set = new OffsetRangeSet
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val parts = root.get("partitions")
    if (parts != null && parts.isArray) {
      parts.forEach { p =>
        val topic = p.get("topic").asText()
        val partition = p.get("partition").asInt()
        val ranges = p.get("ranges")
        if (ranges != null && ranges.isArray) {
          ranges.forEach { r =>
            set.add(topic, partition, r.get("from").asLong(), r.get("to").asLong(),
              Instant.parse(r.get("lastProcessed").asText()))
          }
        }
      }
    }
    set
  }
}

private[ledger] object LedgerJson {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
