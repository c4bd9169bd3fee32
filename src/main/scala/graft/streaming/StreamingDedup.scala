package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming face of
  * [[graft.ext.Dedup.exact]] for continuously-arriving documents
  * (§2c extension; the reference is batch-only).
  *
  * Uses `dropDuplicatesWithinWatermark`: state is keyed by a 128-bit
  * text digest and EXPIRES with the event-time watermark, so the state
  * store holds only the digests seen within the lateness window —
  * O(recent docs), not O(stream history). The trade, documented: a
  * duplicate arriving AFTER its twin has aged out of the watermark
  * window is emitted again (batch dedup over the full corpus would
  * drop it); dedup-exactness is bounded by the watermark delay, which
  * is the only way unbounded streaming dedup can hold state bounded.
  *
  * Scale shape: the shuffle key is the 16-byte md5 digest, never the
  * document payload — same narrow-key contract as the batch operator.
  */
object StreamingDedup {

  /** Drop records whose `textCol` digest was already seen within the
    * watermark window. `eventTimeCol` must be a timestamp column; run
    * with append output mode.
    */
  def exactWithinWatermark(df: DataFrame, textCol: String = "text",
                           eventTimeCol: String = "ts",
                           delay: String = "10 minutes"): DataFrame =
    df.withColumn("__graft_fp", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__graft_fp")
      .drop("__graft_fp")
}
