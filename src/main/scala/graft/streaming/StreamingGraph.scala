package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.LinkGraph

/** Streaming face of the host link graph (the q137/q138/q140 family):
  * pages arrive continuously, the graph accretes per micro-batch, and
  * the centrality/prior consumers read the CURRENT fold whenever they
  * need it — the shape under a continuously-refreshed crawl where
  * "recompute the webgraph from the whole corpus" is never an option.
  *
  * Layout contract (the family's shared `__batch=` discipline):
  * each micro-batch lands its own [[LinkGraph.hostEdges]] frame under
  * `edgeRoot/__batch=<id>` as a per-batch partition OVERWRITE, so
  * redelivery is idempotent and [[StreamingDedup.compactIndex]]
  * maintains the root at the usual cadence (the fold below
  * re-aggregates, so compaction's row-level merge never changes it).
  *
  * Additivity: `n_links`/`n_pages` are per-batch counts over DISJOINT
  * page sets (each page lands in exactly one batch), so the accreted
  * graph is the per-pair SUM — no distinct-count state is carried
  * between batches. If the same URL is re-crawled in a later batch it
  * counts again, deliberately: the stream's unit is the FETCH; dedup
  * upstream (chain after [[StreamingCrawl.crawlIngestSink]]'s kept
  * pages) for one-vote-per-page semantics.
  */
object StreamingGraph {

  /** foreachBatch sink: reduce the micro-batch's pages
    * (`urlCol`/`htmlCol`/`idCol`, the [[LinkGraph.hostEdges]]
    * contract) to host edges and land them under
    * `edgeRoot/__batch=<id>`. The per-batch frame is already
    * host-pair-cardinality — the page payloads never land.
    */
  def linkGraphSink(edgeRoot: String, urlCol: String = "url",
                    htmlCol: String = "html", idCol: String = "doc_id")
                   (batch: DataFrame, batchId: Long): Unit =
    StreamingDedup.landBatchChecked(
      LinkGraph.hostEdges(batch, urlCol, htmlCol, idCol),
      s"$edgeRoot/__batch=$batchId")

  /** The accreted graph: per-pair sums over every landed batch — the
    * same schema [[LinkGraph.hostEdges]] produces, so
    * [[LinkGraph.hostDegrees]] / [[LinkGraph.hostRank]] /
    * [[LinkGraph.hostPriorKeep]] consume it directly. One map-side-
    * combinable aggregation over the (small) edge shards.
    */
  def currentEdges(spark: org.apache.spark.sql.SparkSession,
                   edgeRoot: String): DataFrame =
    spark.read.parquet(edgeRoot)
      .groupBy("src_host", "dst_host")
      .agg(sum(col("n_links")).as("n_links"),
        sum(col("n_pages")).as("n_pages"))

  /** MATERIALIZE the current fold: land [[currentEdges]] under
    * `snapshotDir` once and return the re-read frame. High-cadence
    * rank/prior consumers read the snapshot — a plain parquet scan —
    * instead of paying the per-read re-aggregation of every landed
    * batch; refresh at the [[StreamingDedup.compactIndex]] cadence
    * (the fold is host-pair-cardinality, so the write is cheap at any
    * batch count). The snapshot is [[graft.ext.LinkGraph.hostEdges]]'
    * schema, so it IS the edge input of
    * [[graft.ext.LinkGraph.writeRankSnapshot]] — accreted stream →
    * persisted rank in two cheap steps.
    */
  def snapshotEdges(spark: org.apache.spark.sql.SparkSession,
                    edgeRoot: String, snapshotDir: String): DataFrame = {
    currentEdges(spark, edgeRoot)
      .write.mode("overwrite").parquet(snapshotDir)
    spark.read.parquet(snapshotDir)
  }
}
