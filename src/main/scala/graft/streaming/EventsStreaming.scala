package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirrors of the batch event analytics
  * (SURVEY.md §7.6): the same logical transforms run over `readStream`
  * sources with watermarked event-time state. The reference has no
  * streaming at all (§2.10); this is the Spark-native extension a
  * 100 TB pipeline needs for continuous ingest.
  */
object EventsStreaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

  /** Tumbling 1-day windowed counts/sums with a 1-day watermark — the
    * streaming form of q_events_window. Works on any streaming OR batch
    * DataFrame with (ts, event_type, value). */
  def windowedAgg(events: DataFrame, window_ : String = "1 day",
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Stream-stream event correlation: each left event (e.g. a click)
    * joins the right events (e.g. views) of the SAME user that landed
    * within `gapMinutes` AFTER it. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark keeps only
    * `watermark + gap` of state per side — the buffered-join shape that
    * stays O(window), not O(stream). Works on two `readStream` frames
    * with the Event schema. */
  def correlate(left: DataFrame, right: DataFrame,
      gapMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
      s"""l.user_id = r.user_id AND
          r.ts >= l.ts AND
          r.ts <= l.ts + INTERVAL $gapMinutes MINUTES"""))
      .select(col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col("l.user_id").as("user_id"))
  }

  /** Native session windows: Spark's `session_window` merges events
    * into gap-bounded sessions inside the engine's window state — the
    * built-in complement to the explicit flatMapGroupsWithState
    * sessionize below (use this one when per-session aggregates are
    * enough; the custom state when you need cross-session logic). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("user_id"), col("n_events"))

  /** Stream-STATIC enrichment: join the live stream against a batch
    * dimension table (user → segment, document metadata, …). The static
    * side is planned per micro-batch as an ordinary broadcast hash join
    * — no streaming state at all, and the dimension picks up storage
    * updates between batches. This is THE join shape for enriching a
    * 100 TB-scale event stream with curated metadata; stream-stream
    * (correlate, above) is only needed when BOTH sides move. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Per-user sessionization with explicit state: a session closes after
    * `gapSeconds` of inactivity. flatMapGroupsWithState keeps one small
    * state record per user (last-seen ts + running counts) — constant
    * memory per key, the scalable streaming form of the batch lag-window
    * in q_sessionize. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[(Long, Long, Long)]) =>
          // state = (lastTsMicros, nSessions, nEvents)
          var (lastUs, nSess, nEv) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          // process in event-time order within the batch for determinism
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val us = e.ts.getTime * 1000L
            if (lastUs == Long.MinValue || us - lastUs > gapSeconds * 1000000L) nSess += 1
            nEv += 1
            lastUs = us
          }
          state.update((lastUs, nSess, nEv))
          Iterator.single(SessionSummary(userId, nSess, nEv))
      }
  }
}
