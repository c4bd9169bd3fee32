package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.streaming.GroupState
import graft.config.MergeMode
import graft.io.Warehouse
import graft.merge.JournalMerge

/** Structured-Streaming extension of the journal→master merge (the
  * reference is batch-only by design, SURVEY.md §2b; this is §2c
  * territory): a continuously-arriving journal is deduplicated to
  * latest-record-per-key with keyed state, or micro-batched straight
  * into a [[Warehouse]] via foreachBatch + the batch merge — so stream
  * and batch share ONE merge semantic (same tie-break chain
  * `__transform_dt DESC, __load_dt DESC, __seqno ASC`).
  *
  * Scale notes: `latestPerKey` keeps exactly one record per key in the
  * state store (RocksDB-backed in production), partitioned by key —
  * state size is O(distinct keys), not O(stream). `journalToWarehouse`
  * leans on the batch path, so the journal write stays append-only and
  * the flip stays a partition move.
  */
object StreamingMerge {

  /** A journal record with the technical-column contract flattened;
    * `key` is the (stringified) primary key, `payload` the row body.
    */
  final case class StreamRecord(key: String, payload: String,
                                transformDt: Timestamp, loadDt: Timestamp,
                                seqno: Long)

  /** The merge's version order (JournalMerge.latestPerKey parity:
    * transform DESC, load DESC, seqno ASC ⇒ "a beats b" below).
    */
  private def beats(a: StreamRecord, b: StreamRecord): Boolean = {
    val t = a.transformDt.compareTo(b.transformDt)
    if (t != 0) return t > 0
    val l = a.loadDt.compareTo(b.loadDt)
    if (l != 0) return l > 0
    a.seqno < b.seqno
  }

  /** Streaming latest-record-wins: one state entry per key, updated as
    * records arrive; emits the current winner on every change (run with
    * outputMode=update). Equivalent to running JournalMerge.full over
    * everything seen so far.
    */
  def latestPerKey(records: Dataset[StreamRecord]): Dataset[StreamRecord] = {
    import records.sparkSession.implicits._
    records.groupByKey(_.key)
      .mapGroupsWithState[StreamRecord, StreamRecord](GroupStateTimeout.NoTimeout) {
        (_: String, recs: Iterator[StreamRecord], state: GroupState[StreamRecord]) =>
          val winner = (state.getOption.iterator ++ recs)
            .reduceLeft((a, b) => if (beats(b, a)) b else a)
          state.update(winner)
          winner
      }
  }

  /** Micro-batch bridge: append each micro-batch to the warehouse
    * journal and run the batch delta merge — streaming ingestion with
    * identical results to batch runs of the same data. Use as
    * `stream.writeStream.foreachBatch(journalToWarehouse(wh, "dwh", "t"))`.
    */
  def journalToWarehouse(wh: Warehouse, schema: String, table: String)
                        (batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      wh.append(batch, schema, s"${table}__journal")
      JournalMerge.run(wh, schema, table, MergeMode.Delta)
    }
  }
}
