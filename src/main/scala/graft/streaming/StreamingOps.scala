package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators on event streams: watermarked event-time
  * window aggregation and custom keyed state — the Structured-Streaming
  * counterparts of the engine's batch time-binning (G9) and statistics
  * (A8/A9) operators.
  */
object StreamingOps {

  /** Tumbling event-time window counts with a watermark (bounded state).
    * Used for monitoring-style aggregates where dropping very-late rows is
    * acceptable — the restructure path itself never drops (see
    * [[StreamingRestructure]]).
    */
  def windowedBinCounts(
      events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", win: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), win), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Event-time session windows (>gap splits a session) with a watermark —
    * the streaming counterpart of the batch `q_sessionize` operator, via
    * Spark's native `session_window` (merging-window state, bounded by the
    * watermark; no custom state function needed).
    */
  def sessionCounts(
      events: DataFrame, tsCol: String = "ts", keyCol: String = "user_id",
      watermark: String = "10 minutes", gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  final case class EventRow(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class UserState(n: Long, sum: Double, maxEventId: Long)
  final case class UserUpdate(user_id: Long, n: Long, sum: Double, max_event_id: Long)

  final case class Doc(doc_id: Long, fp: String, text: String, ts: java.sql.Timestamp)

  /** Cross-batch exact deduplication: emit a document only the FIRST time
    * its content fingerprint is seen, with per-fingerprint state expiring
    * `ttlMs` of EVENT time after the last sighting — the streaming
    * counterpart of the batch `q_dedup_exact` hash-groupBy, with the
    * retention policy first-class (Spark's `dropDuplicates` on a stream
    * keeps state forever without a watermark).
    *
    * Event-time expiry (watermark + `EventTimeTimeout`) keeps the state
    * bound deterministic AND lets drain runs (`Trigger.AvailableNow`)
    * terminate — processing-time timeouts force the engine to keep
    * scheduling timeout-check batches, so a drain would never settle.
    */
  def streamingExactDedup(
      docs: Dataset[Doc], watermarkDelay: String = "7 days",
      ttlMs: Long = 7L * 24 * 3600 * 1000)(
      implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Long, Doc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Doc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq
            val maxTs = batch.map(_.ts.getTime).maxOption.getOrElse(0L)
            val out =
              if (state.exists || batch.isEmpty) Iterator.empty
              else { state.update(batch.head.doc_id); Iterator.single(batch.head) }
            if (batch.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** Per-user running statistics via explicit keyed state
    * (`flatMapGroupsWithState`) — the custom-state extension point
    * (KeyValueGroupedDataset) the reference's accountant role maps to.
    * Emits the updated running totals for each user seen in a micro-batch.
    */
  def userStats(events: Dataset[EventRow])(implicit spark: SparkSession): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, -1L))
          var n = prev.n; var sum = prev.sum; var maxId = prev.maxEventId
          rows.foreach { r =>
            n += 1; sum += r.value; if (r.event_id > maxId) maxId = r.event_id
          }
          state.update(UserState(n, sum, maxId))
          Iterator(UserUpdate(userId, n, sum, maxId))
      }
  }
}
