package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates (beyond-reference scope, SURVEY.md §2c) — the
  * validation report an ETL framework runs before publishing a table:
  * scalar row rules in ONE scan, referential rules as anti-join
  * counts, everything as data (a violations DataFrame), not asserts.
  */
object Checks {

  /** A named row-level rule: the row VIOLATES it when `violationWhen`
    * evaluates true. A NULL predicate counts as non-violating — write
    * `isNull` explicitly when null itself is the defect.
    */
  final case class Rule(name: String, violationWhen: Column)

  /** Violation report for scalar rules: one output row per rule with
    * (rule, n_violations, n_rows, violation_frac). ALL rules evaluate
    * in a single pass — one scan, one single-row aggregate, zero
    * shuffles of the data; the per-rule rows come from exploding the
    * 1-row result, not from re-scanning. An EMPTY table reports clean
    * zeros (not NULL/NaN) — a gate comparing `n_violations > 0` must
    * see a number either way.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map { case (r, i) =>
      // sum over zero rows is NULL — fold to 0 so empty stays clean
      coalesce(sum(when(r.violationWhen, 1L).otherwise(0L)), lit(0L)).as(s"__v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__v_$i").as("n_violations"))
      }: _*)).as("__x"))
      .select(col("__x.rule").as("rule"),
        col("__x.n_violations").as("n_violations"),
        col("__n").as("n_rows"))
      .withColumn("violation_frac", fracOf(col("n_violations"), col("n_rows")))
  }

  /** Referential-integrity rule: child rows whose `childKey` has no
    * match in `parent.parentKey` (NULL keys are orphans too — they
    * reference nothing). ONE left join over the child produces both
    * the total and the orphan count (no second scan); the parent side
    * is reduced to its distinct key set first, so the join moves keys,
    * not rows. Output shape matches [[report]] for unioning into one
    * gate; an empty child reports clean zeros.
    */
  def orphans(child: DataFrame, parent: DataFrame, ruleName: String,
              childKey: String, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__matched", lit(1))
    child.join(keys, Seq(childKey), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("__matched").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_violations"), col("n_rows"))
      .withColumn("violation_frac", fracOf(col("n_violations"), col("n_rows")))
  }

  /** 0.0 on an empty table instead of NULL/NaN — gates need numbers. */
  private def fracOf(violations: Column, rows: Column): Column =
    when(rows === 0, lit(0.0)).otherwise(violations.cast("double") / rows)

  /** Column profile: per column, the null count and EXACT distinct
    * count, plus the table row count — the freshness/shape report next
    * to [[report]]'s rule gate. One logical pass; note that multiple
    * exact COUNT(DISTINCT)s make Catalyst expand the input |cols|×
    * before the aggregate — the honest price of exactness. At 100 TB
    * profile with `approx = true` (HyperLogLog sketches, one real
    * pass, no expand) and accept ±2% on n_distinct.
    */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(cols.distinct == cols,
      s"duplicate columns in profile request: ${cols.diff(cols.distinct).mkString(", ")}")
    def nd(c: String): Column =
      if (approx) approx_count_distinct(col(c)) else count_distinct(col(c))
    // positional aliases: immune to duplicate-prone or dotted names
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) => Seq(
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$i"),
      nd(c).as(s"__nd_$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("col_name"), col(s"__nn_$i").as("n_nulls"),
          col(s"__nd_$i").as("n_distinct"))
      }: _*)).as("__x"))
      .select(col("__x.col_name").as("col_name"), col("__x.n_nulls").as("n_nulls"),
        col("__x.n_distinct").as("n_distinct"), col("__n").as("n_rows"))
  }

  // --- shuffle-key skew diagnosis ---------------------------------------
  // The decision input for the repo's skew levers (Joins.salted,
  // JournalMerge.latestPerKeySalted, AQE skew splits): measure a
  // prospective shuffle key's distribution BEFORE the big job runs.
  // All three reports reduce to ONE map-side-combinable per-key count;
  // everything downstream is key-cardinality-scale, never row-scale.

  /** Per-key counts of a prospective shuffle key — the shared first
    * pass of the skew reports.
    */
  private def keyCounts(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
  }

  /** Log2 histogram of key frequencies: one row per occupied bucket
    * `floor(log2(cnt))` with the key count and the bucket's min/max
    * frequency. The bucket is computed as `length(bin(cnt)) - 1` —
    * integer bit-length arithmetic, no libm, so it is exact and
    * engine-portable. A healthy key reads as a tight low-bucket
    * cluster; a hot key shows up as a lone high bucket.
    */
  def skewHistogram(df: DataFrame, keyCols: Seq[String]): DataFrame =
    keyCounts(df, keyCols)
      .select((length(bin(col("cnt"))) - 1).cast("long").as("bucket"), col("cnt"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"),
        min(col("cnt")).as("min_count"),
        max(col("cnt")).as("max_count"))
      .orderBy("bucket")

  /** The `k` heaviest keys (count DESC, keys ASC — total order):
    * the candidates for an explicit salt or a skew-join hint.
    * TakeOrdered — k rows to the driver, never a full sort.
    */
  def skewTopKeys(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame =
    keyCounts(df, keyCols)
      .orderBy(col("cnt").desc +: keyCols.map(c => col(c).asc): _*)
      .limit(k)

  /** The combined report (q100): the [[skewHistogram]] rows, each
    * carrying the [[skewStats]] summary columns — in ONE pass over the
    * data. The summary is derived FROM the histogram (per-bucket sums
    * roll up to exact totals) via a global window over the ≤64-row
    * histogram frame, so the corpus is scanned and key-shuffled exactly
    * once — unlike a naive histogram⨯stats cross join, which would
    * recompute the per-key counts for each branch.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    keyCounts(df, keyCols)
      .select((length(bin(col("cnt"))) - 1).cast("long").as("bucket"), col("cnt"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"),
        min(col("cnt")).as("min_count"),
        max(col("cnt")).as("max_count"),
        sum(col("cnt")).as("__sum"))
      .withColumn("total_rows", sum(col("__sum")).over(w))
      .withColumn("total_keys", sum(col("n_keys")).over(w))
      .withColumn("__gmax", max(col("max_count")).over(w))
      .withColumn("mean_count", col("total_rows").cast("double") / col("total_keys"))
      .withColumn("skew_ratio",
        col("__gmax") / (col("total_rows").cast("double") / col("total_keys")))
      .withColumn("salt_buckets", greatest(lit(1L),
        expr("(__gmax * total_keys + total_rows - 1) div total_rows")))
      .drop("__sum", "__gmax")
      .orderBy("bucket")
  }

  /** One-row skew summary: row/key counts, the hottest key's share,
    * `skew_ratio` = max/mean key frequency, and `salt_buckets` =
    * ceil(max/mean) in exact integer arithmetic — the fan-out that
    * levels the hottest key to an average-sized partition, feedable
    * straight into [[Joins.salted]] / `graft.merge.saltBuckets`.
    * A table with no skew recommends 1 (no salting).
    */
  def skewStats(df: DataFrame, keyCols: Seq[String]): DataFrame =
    keyCounts(df, keyCols)
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_count"))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        (col("n_rows").cast("double") / col("n_keys")).as("mean_count"),
        (col("max_count") / (col("n_rows").cast("double") / col("n_keys")))
          .as("skew_ratio"),
        greatest(lit(1L),
          expr("(max_count * n_keys + n_rows - 1) div n_rows"))
          .as("salt_buckets"))
}
