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
    * 1-row result, not from re-scanning.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map { case (r, i) =>
      sum(when(r.violationWhen, 1L).otherwise(0L)).as(s"__v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__v_$i").as("n_violations"))
      }: _*)).as("__x"))
      .select(col("__x.rule").as("rule"),
        col("__x.n_violations").as("n_violations"),
        col("__n").as("n_rows"))
      .withColumn("violation_frac",
        col("n_violations").cast("double") / col("n_rows"))
  }

  /** Referential-integrity rule: child rows whose `childKey` has no
    * match in `parent.parentKey` (NULL keys are orphans too — they
    * reference nothing). One anti join on the key columns; at scale
    * the parent side is a semi-join-reduced key set, so the shuffle
    * carries keys, not rows. Output shape matches [[report]] for
    * unioning into one gate.
    */
  def orphans(child: DataFrame, parent: DataFrame, ruleName: String,
              childKey: String, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
    val bad = child.join(keys, Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    bad.crossJoin(total)
      .select(lit(ruleName).as("rule"), col("n_violations"), col("n_rows"))
      .withColumn("violation_frac",
        col("n_violations").cast("double") / col("n_rows"))
  }
}
