package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-run operational ledger — the audit/lineage record the reference
  * got for free from Airflow's task-instance metadata (task id, run
  * date, duration in the scheduler DB; airflow_etl.py delegates all of
  * it), landed here as plain parquet so it scales, survives engine
  * restarts, and queries like any other table.
  *
  * One row per completed task run: the task id, what was read (the
  * dependency aliases / source identifier and the watermark predicate
  * applied, if any), rows landed, where they landed, and wall time.
  * The row is appended AFTER the task's own writes succeed, so the
  * ledger reads as "what actually landed" — a failed run leaves no
  * row, and a re-run appends a fresh row (run history, not state).
  *
  * Location: `<dumpDir>/_graft_run_ledger` by default — the same
  * durable root as the step cache (the reference's `s3a://dump/etl`,
  * airflow_etl.py:226-228), so the pipeline's operational state lives
  * in one place; point `EtlContext.ledgerDir` anywhere else (e.g. the
  * lake root) to relocate it.
  *
  * Row counts come from `Dataset.observe` metrics collected DURING the
  * landing write itself — never from a second scan of the data, which
  * at 100 TB would double the extract cost.
  */
object RunLedger {

  /** Ledger directory name (underscore-prefixed like Spark's own
    * metadata files, so data-path listings skip it).
    */
  val DirName = "_graft_run_ledger"

  /** The context's resolved ledger directory. */
  def dirFor(ctx: EtlContext): String =
    ctx.ledgerDir.getOrElse(s"${ctx.dumpDir.stripSuffix("/")}/$DirName")

  final case class Entry(
      task_id: String,
      kind: String, // extract | transform
      inputs: Seq[String], // dependency aliases / source identifiers
      watermark: Option[String], // delta predicate or REPORT_DATE, if any
      rows_out: Long,
      landed_path: String,
      started_ms: Long,
      wall_ms: Long)

  /** Append one run row (a single-row local-relation write — one tiny
    * parquet file per run; [[compact]] folds the accretion on whatever
    * cadence the scheduler prefers).
    */
  def append(spark: SparkSession, dir: String, e: Entry): Unit = {
    import spark.implicits._
    Seq(e).toDF()
      .withColumn("started_at", timestamp_millis(col("started_ms")))
      .write.mode("append").parquet(dir)
  }

  /** The full run history, newest first. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).orderBy(col("started_ms").desc)

  /** Ledger maintenance: fold the one-tiny-file-per-run appends into
    * `ceil(bytes/targetBytes)` files (usually ONE for years of runs —
    * a ledger row is a few hundred bytes) via
    * [[graft.ext.Layout.compactParquet]], preserving every row. Call
    * on a cadence from whatever schedules the tasks — e.g. a nightly
    * [[EtlTask]] of its own — if a high-frequency scheduler accretes
    * enough appends for listing cost to show. The swap is
    * staging + rename (compactParquet's contract): don't run it
    * concurrently with an in-flight append. Returns the data-file
    * count after compaction.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): Int =
    graft.ext.Layout.compactParquet(spark, dir, targetBytes)

  /** Run `write` on the observed frame and return the rows it landed —
    * the count rides the write's own pass (no second scan).
    */
  private[exec] def countDuring(df: DataFrame)(write: DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    write(df.observe(obs, count(lit(1)).as("rows_out")))
    obs.get("rows_out").asInstanceOf[Long]
  }
}
