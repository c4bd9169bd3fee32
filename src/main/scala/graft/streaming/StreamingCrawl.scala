package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the crawl FRONT HALF (q131's chain): WARC shards
  * arrive as a `binaryFile` stream, each micro-batch parses, applies
  * the URL quality cut, URL-dedups against the whole stream history,
  * extracts text, and lands curated pages — the continuous-ingest
  * shape of RefinedWeb stage 0→2.
  *
  * Input contract: rows with `path` (string) and `content` (binary) —
  * exactly what `spark.readStream.format("binaryFile")
  * .load(crawlDir)` produces (cap per-trigger volume with
  * `maxFilesPerTrigger`; the binaryFile SOURCE materializes each shard
  * as one row, so this face suits shard-sized drops — the batch
  * [[graft.io.Warc.read]] face streams records and is the right tool
  * for a one-shot backfill).
  *
  * Per micro-batch, in the family's shared replay contract
  * (strictly-earlier index probe, per-batch partition overwrites —
  * redelivery is idempotent):
  *  1. parse every shard's `response` records
  *     ([[graft.io.Warc.parseBytes]] — per-record gzip, HTTP
  *     envelopes, charset);
  *  2. row-local URL quality cut
  *     ([[graft.ext.TextOps.urlQualityKeep]]);
  *  3. within-batch keep-first per canonical URL key, then drop
  *     survivors whose key the retained history holds
  *     ([[graft.ext.Dedup.urlDedupAgainstIndex]]); `doc_id` is the
  *     64-bit hash of (url, html) — deterministic under replay;
  *  4. extract text ([[graft.ext.Html.htmlToText]]) for the KEPT
  *     pages only (twins never pay the regex chain) and land
  *     (doc_id, url, ts, url_key, text) under `outRoot/__batch=<id>`;
  *  5. roll the key index forward with the kept rows
  *     ([[graft.ext.Dedup.urlKeyIndex]] layout —
  *     [[StreamingDedup.compactIndex]] applies).
  *
  * Downstream content stages consume `outRoot` (or chain this into
  * [[StreamingDedup.curationChainSink]]'s input).
  */
object StreamingCrawl {

  def crawlIngestSink(indexRoot: String, outRoot: String,
                      blockedHosts: Seq[String] = Nil,
                      bannedWords: Seq[String] = Nil,
                      maxUrlLen: Int = 2048)
                     (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val pages = batch.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => graft.io.Warc.parseBytes(p, bytes) }
      .toDF()
      .where(col("warc_type") === "response" &&
        col("url").isNotNull && col("url") =!= "")
      .where(graft.ext.TextOps.urlQualityKeep(col("url"),
        blockedHosts, bannedWords, maxUrlLen))
      .withColumn("doc_id", xxhash64(col("url"), col("html")))
      .select("doc_id", "url", "ts", "html")
    val idxPath = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // guard on a COMMITTED batch partition, not bare existence: an
    // operator-pre-created (or crashed-first-batch) empty root would
    // make the parquet read throw 'Unable to infer schema' and wedge
    // the stream until manual cleanup
    val hasIndex = fs.exists(idxPath) && fs.listStatus(idxPath)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("__batch="))
    val kept = (if (hasIndex)
      graft.ext.Dedup.urlDedupAgainstIndex(pages,
        spark.read.parquet(indexRoot).where(col("__batch") < batchId))
    else graft.ext.Dedup.urlDedup(pages)).cache()
    try {
      kept.select(col("doc_id"), col("url"), col("ts"), col("url_key"),
          graft.ext.Html.htmlToText(col("html")).as("text"))
        .write.mode("overwrite").parquet(s"$outRoot/__batch=$batchId")
      graft.ext.Dedup.urlKeyIndex(kept)
        .write.mode("overwrite").parquet(s"$indexRoot/__batch=$batchId")
    } finally kept.unpersist()
  }
}
