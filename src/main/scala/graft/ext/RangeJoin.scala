package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left points `p` to right intervals
  * `[lo, hi]` sharing equi-keys — another operator Spark plans poorly
  * by default (a key-equal join with a range predicate becomes
  * per-key |L|·|R| pairs filtered afterwards; with a hot key that is
  * quadratic).
  *
  * Scale shape: GRID BINNING. Points land in cell ⌊p/bin⌋; each
  * interval is exploded to the cells it overlaps (⌊lo/bin⌋..⌊hi/bin⌋ —
  * pick `bin` ≥ typical interval width so that's ≤ 2 cells). The join
  * is then EQUI on (keys, cell) — shuffle keys are fine-grained, pair
  * blow-up is bounded by per-cell occupancy — and the exact range
  * predicate filters the grid false-positives. Candidates are emitted
  * once per overlapping cell, deduplicated by joining each point only
  * to ITS cell (a point has exactly one cell, so no distinct needed).
  *
  * Skew: a hot (keys, cell) bucket is handled by AQE's skew-join split
  * — this is a plain sort-merge equi-join, exactly the shape AQE can
  * split at runtime (unlike per-key windows, which is why the as-of
  * join and the merge carry their own salting and this operator does
  * not). When a single cell's PAIR OUTPUT itself is quadratic-hot
  * (everything in one session bucket), shrink `binWidth` — cost is one
  * more exploded cell per interval against proportionally smaller
  * buckets.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val cells = intervals.withColumn("__cell",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    val binned = points.withColumn("__cell", floor(col(pointCol) / binWidth))
    binned.join(cells, keyCols :+ "__cell")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Co-occurrence self-join over an event table: pairs of rows with the
    * same keys whose times are within `(0, maxGap]` of each other
    * (strictly later second event — no self-pairs, each unordered pair
    * once). The archetypal sessioned-data range join.
    */
  def coOccurrence(events: DataFrame, keyCols: Seq[String], idCol: String,
                   tsCol: String, maxGap: Long): DataFrame = {
    val base = events.select((keyCols.map(col) :+ col(idCol) :+ col(tsCol)): _*)
    val intervals = base.select(
      (keyCols.map(col) :+ col(idCol).as("a_id") :+ col(tsCol).as("__lo") :+
        (col(tsCol) + maxGap).as("__hi")): _*)
    val points = base.select(
      (keyCols.map(col) :+ col(idCol).as("b_id") :+ col(tsCol).as("__p")): _*)
    pointInInterval(points, intervals, keyCols, "__p", "__lo", "__hi", binWidth = maxGap)
      .where(col("__p") > col("__lo")) // strict: drops self-pairs and ties-at-zero
      .select((keyCols.map(col) :+ col("a_id") :+ col("b_id") :+
        (col("__p") - col("__lo")).as("gap")): _*)
  }
}
