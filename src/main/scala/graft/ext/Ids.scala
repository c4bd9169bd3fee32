package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic id assignment (beyond-reference scope, SURVEY.md §2c)
  * — the dimension-load / corpus-indexing primitive.
  *
  * The naive spelling, `row_number() OVER (ORDER BY k)`, is the classic
  * scale trap: a global ORDER BY window plans every row into ONE
  * partition. [[orderedIds]] produces the identical numbering with a
  * range shuffle instead.
  */
object Ids {

  /** Dense 1-based ids in `orderCols` order, equal to the global
    * `row_number() OVER (ORDER BY orderCols)` — computed WITHOUT a
    * single-partition window. `orderCols` must be a total order
    * (unique); uniqueness is what makes the numbering independent of
    * where the sampled range boundaries happen to land.
    *
    * How: range-repartition + in-partition sort on the order key; the
    * in-partition position comes from the partition-local counter of
    * `monotonically_increasing_id` over the sorted rows, and the
    * partition's global offset from a per-partition count aggregate
    * (nPartitions rows, broadcast back — its cumulative-sum window is
    * over that tiny frame, not the data). Two passes over one range
    * shuffle (Spark reuses the exchange); no row ever leaves its
    * partition a second time.
    */
  def orderedIds(df: DataFrame, orderCols: Seq[String],
                 nPartitions: Int, idName: String = "row_id"): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(nPartitions > 0, "nPartitions must be positive")
    import org.apache.spark.sql.expressions.Window
    val order = orderCols.map(col)
    val parted = df.repartitionByRange(nPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mono", monotonically_increasing_id())
    // per-partition bases/counts: one row per partition. The constant
    // partitionBy keeps this a (deliberate) single-partition window
    // over nPartitions rows without tripping Spark's missing-partition
    // warning in every run log.
    val w = Window.partitionBy(lit(0)).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"), min("__mono").as("__base"))
      .withColumn("__offset", coalesce(sum("__cnt").over(w), lit(0L)))
      .select("__pid", "__base", "__offset")
    parted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idName, col("__mono") - col("__base") + col("__offset") + 1)
      .drop("__pid", "__mono", "__base", "__offset")
  }

  /** Hash surrogate key: a pure function of the natural key — stable
    * across runs, engines, and partitionings, no coordination at all.
    * 64-bit xxhash: collision expectation crosses 50% near 5e9 keys
    * (birthday bound) — fine for dimensions, audit before using as a
    * fact-table primary key at full corpus scale.
    */
  def hashKey(naturalKeyCols: Seq[String], idName: String = "hash_key")(
      df: DataFrame): DataFrame =
    df.withColumn(idName, xxhash64(naturalKeyCols.map(col): _*))
}
