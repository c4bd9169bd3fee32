package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TimeSeries

/** Streaming front-end for the rolling-anomaly monitor (§2c): daily
  * counts accumulate per micro-batch, the published report always
  * equals `TimeSeries.dailyAnomalies` over everything seen — the same
  * stream ≡ batch contract StreamingMerge keeps for the journal merge.
  *
  * Scale notes: what persists per batch is the batch's OWN (key, day)
  * partial counts — a few rows per active key, never raw events; the
  * report recompute reads partial counts only (days × keys rows), so
  * its cost tracks the series length, not the stream volume. The
  * append-only partials dir compacts like any lake table
  * (`Layout.compactParquet`).
  */
object StreamingAnomalies {

  /** Watermarked native streaming daily counts (update mode): one
    * tumbling 1-day window per key — the pure-streaming half, useful
    * alone when only live counts are needed.
    */
  def dailyCounts(events: DataFrame, keyCol: String, tsCol: String,
                  watermarkDelay: String = "1 day"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), window(col(tsCol), "1 day").as("__w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("__w.start").cast("date").as("day"),
        col("n_events"))

  /** Micro-batch bridge: append this batch's partial daily counts to
    * `countsDir`, then publish the full anomaly report over ALL
    * accumulated counts to `reportDir`. Use as
    * `stream.writeStream.foreachBatch(StreamingAnomalies.reportToDir(...))`.
    */
  def reportToDir(countsDir: String, reportDir: String,
                  keyCol: String, tsCol: String,
                  window: Int = 7, zThreshold: Double = 2.0)
                 (batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      batch
        .select(col(keyCol), col(tsCol).cast("date").as("day"))
        .groupBy(col(keyCol), col("day"))
        .agg(count(lit(1)).as("n_events"))
        .write.mode("append").parquet(countsDir)
      val all = batch.sparkSession.read.parquet(countsDir)
      TimeSeries.dailyAnomalies(
        TimeSeries.resampleFromDailyCounts(all, keyCol),
        keyCol, window = window, zThreshold = zThreshold)
        .write.mode("overwrite").parquet(reportDir)
    }
  }
}
