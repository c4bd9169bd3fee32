package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (§2c extension): per-document change status
  * between two snapshots of a corpus — the audit step after any
  * curation/normalization run ("what did this run add, drop, or
  * rewrite vs its input?") and the heart of incremental re-processing
  * (only `added`/`changed` docs need re-embedding, re-scoring, …).
  *
  * Statuses: `added` (id only in `newer`), `removed` (id only in
  * `older`), `changed` (both, content digest differs), `unchanged`.
  *
  * Scale shape: both sides reduce to (id, 16-byte md5) BEFORE the
  * join — full text never shuffles — and the full-outer join is a
  * plain equi-join on the id, so AQE/broadcast applies as usual. At
  * 100 TB this is one digest-only shuffle per side.
  */
object Diff {

  /** The diff: `(idCol, status, old_fp, new_fp)`, one row per id seen
    * in either snapshot. Digests are md5 hex of `contentCol` (null
    * for the side the id is absent from).
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame,
                   idCol: String = "doc_id",
                   contentCol: String = "text"): DataFrame = {
    val o = older.select(col(idCol).as("__oid"), md5(col(contentCol)).as("old_fp"))
    val n = newer.select(col(idCol).as("__nid"), md5(col(contentCol)).as("new_fp"))
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .select(
        coalesce(col("__oid"), col("__nid")).as(idCol),
        when(col("__oid").isNull, "added")
          .when(col("__nid").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged")
          .as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Roll-up of [[snapshotDiff]]: one row per status with counts —
    * the one-screen "what did this run do" report.
    */
  def diffSummary(older: DataFrame, newer: DataFrame,
                  idCol: String = "doc_id",
                  contentCol: String = "text"): DataFrame =
    snapshotDiff(older, newer, idCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}
