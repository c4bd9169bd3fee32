package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-corpus export (§2c extension): deterministic
  * hash-assignment of documents to a fixed number of output shards,
  * a per-shard MANIFEST (docs / tokens / bytes / content checksum),
  * and a physical parquet writer that lands exactly one file per
  * shard and returns the manifest recomputed FROM the landed files —
  * a witness that what's on disk is what was intended.
  *
  * Why not `df.randomSplit` / `spark.write` alone: a training-data
  * export must be (a) reproducible — the same corpus always lands in
  * the same shard layout regardless of partitioning or cluster size,
  * (b) auditable — a manifest any engine can recompute and compare
  * byte-for-byte, and (c) self-describing — shard counts and
  * checksums travel WITH the data. Shard assignment is a pure
  * function of the row id (md5, like [[Sampling]]'s split
  * assignment), the checksum is an order-insensitive XOR of a
  * 60-bit content hash — commutative, so it needs no global sort
  * and no single reducer.
  *
  * Scale shape: assignment is a narrow codegen'd projection (no
  * shuffle); the manifest is one partial-aggregated groupBy on a
  * small key domain (nShards rows out); the writer's only shuffle is
  * the repartition that co-locates each shard into one task. At
  * 100 TB you'd raise nShards to keep shards at file-system-friendly
  * sizes — the layout stays one-file-per-shard by construction.
  */
object Export {

  /** 60-bit integer view of an md5: first 15 hex chars as a long.
    * Cross-engine replayable — DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`.
    * 60 bits keeps the value comfortably positive in a signed 64-bit
    * long in every engine (no sign-bit edge cases).
    */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic shard of an id: `md5(id || salt)` folded to 60 bits,
    * mod nShards. Null ids RAISE ([[Sampling]]'s total-function rule:
    * silently routing null-id rows to one shard corrupts the export).
    * Modulo bias over a 60-bit base is ≤ nShards/2^60 — immaterial.
    */
  def shardOf(id: Column, nShards: Int, salt: String = "graft"): Column = {
    require(nShards > 0, "shardOf: nShards must be positive")
    when(id.isNull, raise_error(lit(
      "Export: null id — shard assignment must be a total function of the row")))
      .otherwise(md5Long60(concat(id.cast("string"), lit(salt))) % nShards)
  }

  /** Per-document 60-bit content hash: md5 of `id || ':' || content`.
    * Binding the id in makes the checksum detect id↔content swaps, not
    * just content-set changes.
    */
  def contentHash(id: Column, content: Column): Column =
    md5Long60(concat(id.cast("string"), lit(":"), content))

  /** The manifest: one row per shard —
    * `(shard, n_docs, n_tokens, n_bytes, checksum)`. Tokens are the
    * repo's whitespace tokens ([[TextOps.tokens]]) unless the caller
    * plugs a `tokenCount` expression (same seam as packing); bytes are
    * UTF-8 `octet_length`; checksum is `bit_xor` of [[contentHash]] —
    * order-insensitive and overflow-free, so two manifests are
    * comparable with plain equality.
    */
  def shardManifest(docs: DataFrame, nShards: Int,
                    idCol: String = "doc_id", textCol: String = "text",
                    salt: String = "graft",
                    tokenCount: Option[Column] = None): DataFrame =
    docs
      .select(
        shardOf(col(idCol), nShards, salt).as("shard"),
        tokenCount.getOrElse(size(TextOps.tokens(col(textCol)))).cast("long").as("__ntok"),
        octet_length(col(textCol)).cast("long").as("__nbytes"),
        contentHash(col(idCol), col(textCol)).as("__h"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nbytes")).as("n_bytes"),
        expr("bit_xor(__h)").as("checksum"))

  /** Deterministic SEEDED GLOBAL SHUFFLE for training order: every row
    * gets a `shard` and a dense within-shard position `seq`, both pure
    * functions of (seed, id) — the reshuffle-between-epochs /
    * reproduce-a-run primitive a training dataloader needs from the
    * corpus side. One 60-bit seeded hash ([[md5Long60]]) drives both:
    * `shard = ord % nShards` (uniform, so shards stay balanced) and
    * the within-shard order is `ord` ascending (uniformly random;
    * ties broken by id for a total order). Reading shard files in
    * `seq` order IS the global shuffle — no coordination at load
    * time, and a different `seed` is a fresh epoch-level permutation.
    *
    * Scale shape: NO global sort (the naive `orderBy(rand())` is a
    * full range-partitioned TeraSort) — one hash exchange on `shard`
    * plus an in-partition sort under the window; each shard lands in
    * one task, so pick `nShards` for target shard sizes exactly as
    * with [[exportShards]]. Null ids RAISE ([[shardOf]]'s total-
    * function rule). Exact-oracled: md5 + modulo + row_number replay
    * verbatim in DuckDB (q139).
    */
  def trainingOrder(docs: DataFrame, nShards: Int, seed: String = "graft",
                    idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "trainingOrder: nShards must be positive")
    // the three output columns must not silently clobber caller data
    val clash = Seq("__ord", "shard", "seq").filter(docs.columns.contains)
    require(clash.isEmpty,
      s"trainingOrder: input already carries ${clash.mkString(", ")} — " +
        "rename or drop before ordering (the operator OWNS these columns)")
    val ord = when(col(idCol).isNull, raise_error(lit(
      "Export: null id — training order must be a total function of the row")))
      .otherwise(md5Long60(concat(lit(seed + ":"), col(idCol).cast("string"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
    docs.withColumn("__ord", ord)
      .withColumn("shard", (col("__ord") % nShards).cast("long"))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .drop("__ord")
  }

  /** Physical EPOCH export: [[trainingOrder]] materialized — land
    * `docs` under `outDir/data` as `shard=<k>/part-*.parquet`, one
    * file per shard, with rows inside each file IN `seq` ORDER (a
    * parquet file preserves row order, so a loader that reads shard
    * files top-to-bottom replays the epoch's global shuffle with zero
    * load-time coordination). Returns the landed frame re-read from
    * disk; callers assert `seq` monotonicity per shard (ExportSpec
    * does) — a violated order means the writer reordered rows.
    *
    * Scale shape: [[trainingOrder]]'s window exchange is the ONLY
    * row-level shuffle; the writer repartitions on the (already
    * computed) shard column and sorts within partitions by seq — the
    * same one-task-per-shard layout as [[exportShards]], plus the
    * in-file order. A fresh `seed` per epoch re-lands a fresh
    * permutation of the same corpus.
    */
  def exportEpoch(spark: SparkSession, docs: DataFrame, outDir: String,
                  nShards: Int, seed: String = "graft",
                  idCol: String = "doc_id"): DataFrame = {
    val ordered = trainingOrder(docs, nShards, seed, idCol)
    ordered
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/data")
    spark.read.parquet(s"$outDir/data")
  }

  /** One 60-bit seeded hash per (id, epoch) SAMPLE — the multi-epoch
    * twin of [[trainingOrder]]'s per-id hash: `seed:id:epoch` drives
    * both the shard and the within-shard order, so every epoch is
    * automatically a FRESH permutation of the corpus (the epoch index
    * participates in the hash) without any per-epoch seed bookkeeping.
    * Null ids/epochs RAISE (the total-function rule).
    */
  private def epochOrd(id: Column, epoch: Column, seed: String): Column =
    when(id.isNull || epoch.isNull, raise_error(lit(
      "Export: null id/epoch — epoch order must be a total function of the sample")))
      .otherwise(md5Long60(concat(lit(seed + ":"), id.cast("string"),
        lit(":"), epoch.cast("string"))))

  /** The epoch-aware manifest: one row per `(epoch, shard)` —
    * `(epoch, shard, n_docs, n_tokens, n_bytes, checksum)` over a
    * frame carrying the `epoch` column ([[graft.ext.Sampling
    * .materializeEpochs]] attaches it). The checksum binds the EPOCH
    * into the content hash (`md5(id:epoch:text)`), so two epochs of
    * the identical doc set still land distinct checksums — a loader
    * that replays epoch 1's files against epoch 0's manifest fails
    * loudly. Shard assignment shares [[epochOrd]] with
    * [[exportEpochs]], so the manifest is comparable to the landing
    * with plain equality.
    */
  def epochShardManifest(docs: DataFrame, nShards: Int,
                         idCol: String = "doc_id", textCol: String = "text",
                         seed: String = "graft",
                         tokenCount: Option[Column] = None): DataFrame = {
    require(nShards > 0, "epochShardManifest: nShards must be positive")
    require(docs.columns.contains("epoch"),
      "epochShardManifest: input must carry the epoch column " +
        "(materializeEpochs attaches it)")
    docs
      .select(
        col("epoch").cast("long").as("epoch"),
        (epochOrd(col(idCol), col("epoch"), seed) % nShards).cast("long")
          .as("shard"),
        tokenCount.getOrElse(size(TextOps.tokens(col(textCol)))).cast("long")
          .as("__ntok"),
        octet_length(col(textCol)).cast("long").as("__nbytes"),
        contentHash(concat(col(idCol).cast("string"), lit(":"),
          col("epoch").cast("string")), col(textCol)).as("__h"))
      .groupBy("epoch", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nbytes")).as("n_bytes"),
        expr("bit_xor(__h)").as("checksum"))
  }

  /** Physical MULTI-EPOCH export — the training-side story's last
    * step: land a `(docs × epoch)` frame ([[graft.ext.Sampling
    * .materializeEpochs]]) under `outDir/data` as
    * `epoch=<e>/shard=<k>/part-*.parquet`, ONE file per (epoch,
    * shard), rows inside each file in `seq` order — so a dataloader
    * that walks one epoch's shard files top-to-bottom replays that
    * epoch's global shuffle with zero load-time coordination, and
    * each epoch is a fresh permutation ([[epochOrd]]). The intended
    * [[epochShardManifest]] lands at `outDir/_manifest`.
    *
    * The landing WITNESS has two postures. The default rides the
    * write itself with `Dataset.observe` totals (docs/tokens/bytes and
    * the global XOR checksum — XOR of the per-group XORs, so re-binned
    * or torn rows still flip it) compared against the landed
    * `_manifest`'s totals, and returns that manifest re-read from
    * disk — zero extra scans of the data at 100 TB (the
    * [[graft.exec.RunLedger]] discipline). `verifyLanded = true` is
    * the full audit: re-read the landed files and RECOMPUTE the
    * manifest from them (the [[exportShards]] witness — catches a
    * writer that lost, duplicated, or re-binned rows per (epoch,
    * shard)), at the cost of a second full scan + tokenization pass.
    * Either posture fails loudly on disagreement.
    *
    * Scale shape: one seeded-hash projection (no shuffle), ONE hash
    * exchange on (epoch, shard) — a key never splits across tasks, so
    * one-file-per-directory holds at any width — plus the window's
    * in-partition sort; the manifest aggregations are map-side
    * partial on a (epochs × nShards)-sized key domain. No global
    * sort anywhere; raise `nShards` to hold per-file sizes flat as
    * the corpus grows.
    */
  def exportEpochs(spark: SparkSession, epochDocs: DataFrame, outDir: String,
                   nShards: Int, seed: String = "graft",
                   idCol: String = "doc_id", textCol: String = "text",
                   tokenCount: Option[Column] = None,
                   verifyLanded: Boolean = false): DataFrame = {
    require(nShards > 0, "exportEpochs: nShards must be positive")
    require(epochDocs.columns.contains("epoch"),
      "exportEpochs: input must carry the epoch column " +
        "(materializeEpochs attaches it)")
    val clash = Seq("__ord", "shard", "seq").filter(epochDocs.columns.contains)
    require(clash.isEmpty,
      s"exportEpochs: input already carries ${clash.mkString(", ")} — " +
        "rename or drop before exporting (the operator OWNS these columns)")
    val intended = epochShardManifest(epochDocs, nShards, idCol, textCol,
      seed, tokenCount)
    // bounded 1-value action: epoch count caps at materializeEpochs'
    // maxEpochs; width = one task per (epoch, shard) directory
    val nEpochs = epochDocs.select(count_distinct(col("epoch")))
      .collect()(0).getLong(0)
    val width = math.max(1, (nEpochs * nShards).toInt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__ord"), col(idCol))
    // the explicit exchange comes BEFORE the window: HashPartitioning
    // on (epoch, shard) satisfies the window's ClusteredDistribution
    // requirement, so the full text payload shuffles exactly once —
    // repartitioning after row_number would pay a second hash exchange
    // on the same keys
    val ntokExpr = tokenCount.getOrElse(size(TextOps.tokens(col(textCol))))
      .cast("long")
    val hashExpr = contentHash(concat(col(idCol).cast("string"), lit(":"),
      col("epoch").cast("string")), col(textCol))
    val toWrite = epochDocs
      .withColumn("__ord", epochOrd(col(idCol), col("epoch"), seed))
      .withColumn("shard", (col("__ord") % nShards).cast("long"))
      .repartition(width, col("epoch"), col("shard"))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .drop("__ord")
      .sortWithinPartitions(col("epoch"), col("shard"), col("seq"))
    val obs = org.apache.spark.sql.Observation()
    toWrite
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(ntokExpr).as("n_tokens"),
        sum(octet_length(col(textCol)).cast("long")).as("n_bytes"),
        bit_xor(hashExpr).as("checksum"))
      .write.mode("overwrite").partitionBy("epoch", "shard")
      .parquet(s"$outDir/data")
    intended.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    // the cheap witness: the totals the WRITE itself observed vs the
    // landed manifest's totals — one group-cardinality agg, no re-scan
    val m = obs.get
    val t = manifest.agg(
      sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_bytes")).as("n_bytes"),
      expr("bit_xor(checksum)").as("checksum")).collect()(0) // 1 row
    require(m("n_docs") == t.getAs[Long]("n_docs") &&
      m("n_tokens") == t.getAs[Long]("n_tokens") &&
      m("n_bytes") == t.getAs[Long]("n_bytes") &&
      m("checksum") == t.getAs[Long]("checksum"),
      s"exportEpochs: the write observed (docs=${m("n_docs")}, " +
        s"tokens=${m("n_tokens")}, bytes=${m("n_bytes")}, " +
        s"xor=${m("checksum")}) but the manifest totals are " +
        s"(docs=${t.getAs[Long]("n_docs")}, " +
        s"tokens=${t.getAs[Long]("n_tokens")}, " +
        s"bytes=${t.getAs[Long]("n_bytes")}, " +
        s"xor=${t.getAs[Long]("checksum")}) — torn landing")
    if (!verifyLanded) manifest
    else spark.read.parquet(s"$outDir/data")
      .select(
        col("epoch").cast("long").as("epoch"),
        col("shard").cast("long").as("shard"),
        ntokExpr.as("__ntok"),
        octet_length(col(textCol)).cast("long").as("__nbytes"),
        hashExpr.as("__h"))
      .groupBy("epoch", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nbytes")).as("n_bytes"),
        expr("bit_xor(__h)").as("checksum"))
  }

  /** The packed multi-epoch dataloader artifact — the training-side
    * chain COMPOSED end to end: a `(docs × epoch)` frame
    * ([[graft.ext.Sampling.materializeEpochs]]) is first-fit packed at
    * `(epoch, keyCols..., lane)` bin grain ([[graft.ext.TextOps
    * .packSequencesText]] — each epoch's each key packs independently
    * across `subShards` deterministic lanes), and the packed BINS land
    * as `epoch=<e>/shard=<k>` files in `seq` order via
    * [[exportEpochs]] — so the dataloader walks capacity-bounded
    * training windows, not raw documents, and each epoch is still a
    * fresh permutation of its bins. The bin id (`keyCols:lane:bin_id`)
    * joins with the epoch to drive shard + order + checksum, and the
    * manifest's `n_tokens` rides the packer's exact per-bin
    * `sum_tokens` (no re-tokenization). Returns the epoch-aware
    * manifest under [[exportEpochs]]' witness contract
    * (`verifyLanded` picks the posture).
    *
    * Scale shape: the packer's one shuffle on (epoch, key, lane) +
    * the export's one hash exchange on (epoch, shard); both windows
    * are lane-bounded. Raise `subShards` (or size it with
    * [[graft.ext.TextOps.derivedPackLanes]]) to keep the packing
    * windows flat as any one key's corpus grows.
    */
  def exportPackedEpochs(spark: SparkSession, epochDocs: DataFrame,
                         outDir: String, capacity: Int, nShards: Int,
                         subShards: Int = 4, seed: String = "graft",
                         keyCols: Seq[String] = Seq("lang"),
                         idCol: String = "doc_id", textCol: String = "text",
                         tokenCount: Option[Column] = None,
                         verifyLanded: Boolean = false): DataFrame = {
    require(epochDocs.columns.contains("epoch"),
      "exportPackedEpochs: input must carry the epoch column " +
        "(materializeEpochs attaches it)")
    exportEpochs(spark,
      packedEpochBins(epochDocs, capacity, subShards, keyCols, idCol,
        textCol, tokenCount),
      outDir, nShards, seed, idCol = "bin_key", textCol = "packed_text",
      tokenCount = Some(col("sum_tokens")), verifyLanded = verifyLanded)
  }

  /** [[exportPackedEpochs]]' bin frame — the packed `(epoch, bin_key,
    * packed_text, n_docs, sum_tokens)` rows BEFORE the landing, with
    * `bin_key = keyCols:lane:bin_id` (unique within an epoch). Shared
    * so the manifest a query oracles and the frame the exporter lands
    * are one construction (q163 / ExportSpec pin them equal).
    */
  def packedEpochBins(epochDocs: DataFrame, capacity: Int,
                      subShards: Int = 4,
                      keyCols: Seq[String] = Seq("lang"),
                      idCol: String = "doc_id", textCol: String = "text",
                      tokenCount: Option[Column] = None): DataFrame = {
    require(!epochDocs.columns.contains("bin_key"),
      "packedEpochBins: input already carries bin_key — rename or " +
        "drop (the operator OWNS this column)")
    val packed = TextOps.packSequencesText(epochDocs, capacity,
      shardCols = "epoch" +: keyCols, idCol, textCol, " ", tokenCount,
      subShards)
    val keyParts = (keyCols.map(col) ++
      (if (subShards > 1) Seq(col("lane")) else Nil) :+ col("bin_id"))
      .map(_.cast("string"))
    packed.withColumn("bin_key", concat_ws(":", keyParts: _*))
  }

  /** Physical export: land `docs` under `outDir` as
    * `shard=<k>/part-*.parquet` with EXACTLY one data file per shard
    * (each shard is co-located into one task by the repartition on the
    * shard column, and `partitionBy` then splits tasks by directory),
    * write the source-side manifest to `outDir/_manifest`, and return
    * the manifest recomputed from the landed files. Callers assert
    * returned == intended (ExportSpec does) — a disagreement means
    * the write lost or duplicated rows.
    */
  def exportShards(spark: SparkSession, docs: DataFrame, outDir: String,
                   nShards: Int, idCol: String = "doc_id",
                   textCol: String = "text", salt: String = "graft",
                   tokenCount: Option[Column] = None): DataFrame = {
    val intended = shardManifest(docs, nShards, idCol, textCol, salt, tokenCount)
    docs
      .withColumn("shard", shardOf(col(idCol), nShards, salt))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/data")
    intended.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    val landed = spark.read.parquet(s"$outDir/data")
    // recompute from what actually landed; shard column is read back
    // from the directory layout, so a row in the wrong directory shows
    // up as a manifest mismatch, not silence
    landed
      .select(
        col("shard").cast("long").as("shard"),
        tokenCount.getOrElse(size(TextOps.tokens(col(textCol)))).cast("long").as("__ntok"),
        octet_length(col(textCol)).cast("long").as("__nbytes"),
        contentHash(col(idCol), col(textCol)).as("__h"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nbytes")).as("n_bytes"),
        expr("bit_xor(__h)").as("checksum"))
  }
}
