package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the streaming face of the batch
  * sessionization query (q25): events of one key group into sessions
  * that close after `gap` of event-time silence (§2c extension; the
  * reference is batch-only).
  *
  * Built on Spark's native `session_window` aggregation: the state
  * store keeps one growing window per OPEN session (merged as events
  * arrive, including out-of-order ones inside the watermark), and the
  * event-time watermark both bounds that state and finalizes sessions
  * — a session is emitted exactly once, when the watermark passes its
  * close (append mode). This is the semantics gap a batch window query
  * cannot give a live stream: results that are final when emitted.
  *
  * Scale shape: the shuffle key is the session key; state is
  * O(open sessions), not O(events) — each in-flight session holds only
  * its (start, end, aggregates), and closed sessions leave the store.
  * A hot key costs one state-store partition its session list, never a
  * pair explosion.
  */
object StreamingSessions {

  /** Sessions per key: (key, session_start, session_end, n_events).
    * `session_end` is last-event-time + gap (the silence that closed
    * it). Run with append output mode; rows arrive once each, final.
    */
  def sessionize(df: DataFrame, keyCol: String = "user_id",
                 eventTimeCol: String = "ts", gap: String = "30 minutes",
                 delay: String = "1 hour"): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
