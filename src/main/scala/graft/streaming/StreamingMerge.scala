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

  /** Null-safe version comparison matching the batch window's
    * `desc_nulls_first`: in a DESC NULLS FIRST ordering a null version
    * column ranks FIRST, i.e. the null side WINS — the Postgres NULL
    * semantics the reference's merge SQL inherits. Without this the
    * stream path would NPE where the batch path has defined ordering.
    */
  private def cmpNullsWin(x: Timestamp, y: Timestamp): Int = (x, y) match {
    case (null, null) => 0
    case (null, _)    => 1
    case (_, null)    => -1
    case _            => x.compareTo(y)
  }

  /** The merge's version order (JournalMerge.latestPerKey parity:
    * transform DESC NULLS FIRST, load DESC NULLS FIRST, seqno ASC ⇒
    * "a beats b" below).
    */
  private def beats(a: StreamRecord, b: StreamRecord): Boolean = {
    val t = cmpNullsWin(a.transformDt, b.transformDt)
    if (t != 0) return t > 0
    val l = cmpNullsWin(a.loadDt, b.loadDt)
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

  /** [[latestPerKey]] with an event-time watermark and state expiry —
    * what an unbounded production stream needs: without a watermark the
    * state store grows with distinct keys FOREVER and late data is
    * indistinguishable from on-time data.
    *
    *  - Watermark on `loadDt` (the ingestion clock — monotone-ish by
    *    construction, unlike the business-time `transformDt` which the
    *    merge comparator ranks but upstreams may emit wildly out of
    *    order): rows whose loadDt lags the observed max by more than
    *    `watermarkDelay` are DROPPED by Spark before reaching the state
    *    logic. This is the documented divergence from the batch merge,
    *    which always considers every journal row no matter how late it
    *    was loaded; within the allowed lateness the two agree exactly
    *    (same [[beats]] comparator).
    *  - A key silent for `stateTtlMs` past the watermark expires: its
    *    state entry is emitted once more (the key's final version) and
    *    removed, bounding the store to RECENTLY ACTIVE keys instead of
    *    all keys ever seen.
    */
  def latestPerKeyWatermarked(records: Dataset[StreamRecord],
                              watermarkDelay: String = "10 minutes",
                              stateTtlMs: Long = 60L * 60 * 1000): Dataset[StreamRecord] = {
    import records.sparkSession.implicits._
    records.withWatermark("loadDt", watermarkDelay)
      .groupByKey(_.key)
      .mapGroupsWithState[StreamRecord, StreamRecord](GroupStateTimeout.EventTimeTimeout) {
        (_: String, recs: Iterator[StreamRecord], state: GroupState[StreamRecord]) =>
          if (state.hasTimedOut) {
            val lastWinner = state.get
            state.remove()
            lastWinner
          } else {
            val batch = recs.toList
            val winner = (state.getOption.iterator ++ batch.iterator)
              .reduceLeft((a, b) => if (beats(b, a)) b else a)
            state.update(winner)
            // anchor the TTL at the batch's own event time, not just the
            // watermark: on the FIRST micro-batch the watermark is still
            // 0 (epoch), and an epoch-anchored timeout would fire the
            // moment the watermark jumps to real time — expiring every
            // cold-start key after seconds of silence instead of the
            // promised TTL
            val maxLoadMs = batch.iterator
              .flatMap(r => Option(r.loadDt)).map(_.getTime)
              .foldLeft(0L)(math.max)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxLoadMs) + stateTtlMs)
            winner
          }
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
