package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling operators — beyond-reference scope
  * (SURVEY.md §2c): the gap-fill step in front of rate dashboards,
  * ingestion monitors, and training-mix drift checks, where a day with
  * no data must read as 0 (or carry the last observation), not be
  * silently absent.
  */
object TimeSeries {

  /** Dense daily grid per key over each key's own [min, max] day, with
    * zero-filled event counts and a running cumulative.
    *
    * Scale shape: the span aggregate is one row per key and the grid
    * explodes to keys × days — bounded and data-derived, no global
    * min/max round-trips through the driver. The count aggregate is
    * map-side combined (one row per (key, day) per partition); the
    * grid←counts equi-join moves narrow rows only. The running total
    * windows over the DENSE grid (days, not events), so partitions are
    * small by construction even for hot keys.
    */
  def resampleDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // NULL key or timestamp RAISES: a null key would build a grid row
    // whose counts join never matches (NULL ≠ NULL in an equi-join),
    // reporting 0 events on days that HAD events — actively wrong, not
    // just incomplete; a null timestamp has no day to land on
    val guardedKey = when(col(keyCol).isNull, raise_error(lit(
      s"resampleDaily: null $keyCol — the grid join would zero out this key's real counts")))
      .otherwise(col(keyCol))
    val guardedDay = when(col(tsCol).isNull, raise_error(lit(
      s"resampleDaily: null $tsCol — a null timestamp has no day")))
      .otherwise(col(tsCol).cast("date"))
    val days = df.select(guardedKey.as(keyCol), guardedDay.as("day"))
    resampleFromDailyCounts(
      days.groupBy(col(keyCol), col("day")).agg(count(lit(1)).as("n_events")),
      keyCol)
  }

  /** [[resampleDaily]]'s second half, entered with ALREADY-AGGREGATED
    * (key, day, n_events) rows — the partial-aggregate path: streaming
    * micro-batches or distributed pre-counts append partials and this
    * re-sums them (duplicate (key, day) rows are summed, so partials
    * from any number of batches are welcome) before densifying.
    * Carries the same null RAISE as [[resampleDaily]] — a null key or
    * day in a partial would silently zero/orphan a series here too.
    */
  def resampleFromDailyCounts(dailyCounts: DataFrame, keyCol: String): DataFrame = {
    val guardedKey = when(col(keyCol).isNull, raise_error(lit(
      s"resampleFromDailyCounts: null $keyCol — the grid join would zero out this key's real counts")))
      .otherwise(col(keyCol))
    val guardedDay = when(col("day").isNull, raise_error(lit(
      "resampleFromDailyCounts: null day — a null day has no grid cell")))
      .otherwise(col("day"))
    val counts = dailyCounts
      .select(guardedKey.as(keyCol), guardedDay.as("day"), col("n_events"))
      .groupBy(col(keyCol), col("day"))
      .agg(sum(col("n_events")).as("__n"))
    val spans = counts.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(counts, Seq(keyCol, "day"), "left")
      .withColumn("n_events", coalesce(col("__n"), lit(0L)))
      .drop("__n")
      .withColumn("cum_events", sum(col("n_events")).over(w))
  }

  /** Rolling z-score anomaly flags over a dense per-key daily series
    * (compose with [[resampleDaily]] — gaps must already read as 0 or
    * a quiet day can't be anomalous). For each day: mean/variance of
    * `valueCol` over the trailing `window` days (the frame the row
    * actually has — shorter at series start), z = (x − mean)/stddev,
    * flagged when |z| > `zThreshold`. A zero-variance frame flags
    * nothing (z = 0): a constant series has no anomalies.
    *
    * Cross-engine exactness: the window aggregates are INTEGER sums
    * (sum, sum-of-squares, count) — order-independent — and the
    * mean/variance arithmetic is a fixed double expression tree
    * (s/n, s2/n − mean²) evaluated identically by any IEEE engine; no
    * libm beyond sqrt, which is correctly rounded. The variance guard
    * is RELATIVE (var ≤ (s2/n)·1e-12 → z = 0), not just ≤ 0: once the
    * window's sum of squares crosses 2^53 (daily counts beyond ~3·10⁷),
    * the long→double conversion rounds and a constant series can
    * produce a tiny spurious positive variance — without the relative
    * guard that inflates to a huge z and flags every flat day. The
    * guard expression is mirrored verbatim in the oracle, so exactness
    * holds on both sides of the branch.
    *
    * Scale shape: one per-key window over the dense grid (days, not
    * events) — partition size = series length, bounded; no extra
    * shuffle beyond the grid's own key partitioning.
    */
  def dailyAnomalies(dense: DataFrame, keyCol: String,
                     valueCol: String = "n_events",
                     window: Int = 7, zThreshold: Double = 2.0): DataFrame = {
    require(window > 1, "window must cover more than one day")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-(window - 1), 0)
    val v = col(valueCol)
    val n = count(lit(1)).over(w)
    val s = sum(v).over(w)
    val s2 = sum(v * v).over(w)
    val mean = s / n
    val variance = s2 / n - mean * mean
    val z = when(variance <= (s2 / n) * lit(1e-12), lit(0.0))
      .otherwise((v - mean) / sqrt(variance))
    dense.withColumn("zscore", z)
      .withColumn("is_anomaly", abs(col("zscore")) > zThreshold)
  }

  /** Forward fill: replace NULLs in `valueCols` with the last non-NULL
    * value in per-key `orderCol` order — resampling's companion for
    * sparse measurements (sensor readings, configuration snapshots).
    * All columns fill inside ONE window (single shuffle on the key).
    */
  def forwardFill(df: DataFrame, keyCol: String, orderCol: String,
                  valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (acc, v) =>
      acc.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }
}
