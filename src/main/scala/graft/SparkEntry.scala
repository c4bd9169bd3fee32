package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config._
import graft.exec.{EtlContext, PipelineRunner}
import graft.io.{FileWarehouse, Lake}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's EP2 transform lifecycle end-to-end
    * (deps → param-filled SQL step → journal write → full merge;
    * reference: airflow_etl.py:669-734) over sf0.001, against a
    * file-backed warehouse. Returns the merged master table.
    */
  def entry(spark: SparkSession): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_entry").toString
    val wh = new FileWarehouse(spark, s"$work/wh")
    wh.registerPrimaryKey("dwh", "pricing_summary", Seq("l_returnflag", "l_linestatus"))
    val ctx = EtlContext(
      spark = spark,
      lake = Lake("/root/testdata"),
      warehouse = wh,
      variables = Map("REPORT_DATE" -> "1998-09-01"),
      taskId = "task_transform_dwh_pricing_summary_full")
    val stepSql =
      s"""SELECT t.*,
         |  TIMESTAMP '2025-01-01 00:00:00' AS __transform_dt,
         |  TIMESTAMP '2025-01-01 00:00:00' AS __load_dt,
         |  CAST(0 AS BIGINT) AS __seqno,
         |  'A' AS __record_state
         |FROM (${Queries.q01Sql}) t""".stripMargin
    val cfg = TableConfig(
      dependencies = Seq(Dependency(
        source = "datalake", format = "parquet", alias = "lineitem",
        path = Some("sf0.001/lineitem.parquet"))),
      transform = Map(ReadMode.Full -> Seq(Step.Select(
        sql = SqlSource.Inline(stepSql),
        parameters = Seq(Param.ReportDate("report_date"))))),
      target = Some(Target("dwh", "pricing_summary")))
    PipelineRunner.runTable(ctx, cfg, ReadMode.Full, WriteMode.Overwrite, MergeMode.Full)
    wh.read("dwh", "pricing_summary")
  }

  /** One entry per implemented operator from SURVEY.md §2 (framework
    * queries q01-q06, LLM-pipeline extension ops q07+). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ graft.ext.ExtQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles ++ graft.ext.ExtQueries.oracles

  /** The registry keys with NO DuckDB oracle, each mapped to the spec
    * that gates it instead — machine-readable so correctness consumers
    * can distinguish "approximate/libm-bound, verified by a pinned
    * spec" from "broken". Every key in [[queries]] is in exactly one
    * of [[oracleSql]] or this map (SparkEntrySpec pins the invariant);
    * Verify dumps it next to oracle_sql.json as approx_verified.json.
    */
  def approxVerified: Map[String, String] = Map(
    "q16_similarity_ann" -> ("approximate (hyperplane-LSH candidates): ExtSpec "
      + "'ANN top-1 recall vs brute force pinned at fixed-seed measurement' recall floor "
      + "+ golden digest 'q16 output digest pinned'"),
    "q17_near_dup_simhash" -> ("Hamming-ball semantics DuckDB can't spell: PropertySpec "
      + "ScalaCheck differential vs exhaustive all-pairs Hamming model "
      + "+ ExtSpec planted-pair fixture"),
    "q26_similarity_ivf" -> ("approximate (IVF nProbe cells): ExtSpec "
      + "'IVF top-1 recall pinned at fixed-seed measurement' recall floor "
      + "+ golden digest"),
    "q73_lm_perplexity" -> ("libm-bound (ln/exp differ across engines past 1 ulp): ExtSpec "
      + "hand-computed StrictMath fixtures + fuzzed-model PropertySpec round-trip"),
    "q75_semantic_dedup" -> ("approximate (KMeans cells partition the space): ExtSpec "
      + "nClusters=1 ≡ brute-force bit-exact anchor + clustered-path recall spec"),
    "q80_lm_persisted_probe" -> ("libm-bound like q73, via the persisted model: ExtSpec "
      + "persisted-vs-direct equivalence + StrictMath fixtures"),
    "q144_kn_perplexity" -> ("libm-bound like q73/q80 (one log2 per composed KN "
      + "probability): ExtSpec hand-computed interpolated-KN fixture bit-for-bit, "
      + "persisted-model ≡ in-memory, continuation-vs-frequency ranking property, "
      + "unseen-word totality + golden digest"),
    "q81_ann_persisted_probe" -> ("approximate (hyperplane-LSH, persisted index): ExtSpec "
      + "'persisted ANN index: probing the corpus against its own index == annTopK' "
      + "bit-equality + cross-frame recall floor + golden digest"),
    "q82_image_near_dup" -> ("ImageIO decode + bilinear downsample DuckDB can't spell: "
      + "MultimodalSpec planted-pair dHash tests, brute-force pixel-distance "
      + "differential, and the pinned sf0.001 pair set"),
    "q83_image_dedup_incremental" -> ("non-SQL like q82, via the persisted signature "
      + "index: MultimodalSpec probe-vs-full cross-frame equivalence at sf0.001 "
      + "(the full pair set itself is q82's pinned family)"),
    "q86_quality_score" -> ("libm-bound (ln/exp in NB weights + sigmoid): ExtSpec "
      + "hand-computed StrictMath fixture, repartition determinism, planted-signal "
      + "ranking + golden digest"),
    "q87_quality_persisted_probe" -> ("libm-bound like q86, via the persisted model: "
      + "ExtSpec persisted-vs-direct bit-equality + golden digest"),
    "q134_lang_id_trained" -> ("libm-bound (ln in NB priors/likelihoods): ExtSpec "
      + "hand-computed StrictMath likelihood fixture + crafted-language separability "
      + "+ persisted-vs-direct bit-equality + golden digest"),
    "q136_ccnet_trained" -> ("libm-bound twice (NB likelihoods route into LM "
      + "surprisal): ExtSpec marker-vs-model CcNet face equality + abstention-cut "
      + "spec + golden digest"),
    "q158_ccnet_persisted_probe" -> ("libm-bound like q136, via the persisted "
      + "predictions artifact: ExtSpec 'persisted predictions: "
      + "curateWithPredictions == curateWithModel bit-for-bit' + the q136 gates "
      + "(the probe output IS q136's, scored once and landed)"),
    "q89_video_near_dup" -> ("GIF encode/decode + per-frame dHash DuckDB can't spell "
      + "(non-SQL like q82): MultimodalSpec planted twin-clip specs across the "
      + "GIF/MP4/GRFT frame paths + the pinned sf0.001 pair set"),
    "q90_bpe_packing" -> ("BPE segmentation is not SQL-expressible: ExtSpec "
      + "hand-computed fit, parquet round-trip, repartition determinism, "
      + "inline==precomputed packing equivalence + golden digest"),
    "q123_unigram_packing" -> ("unigram-LM Viterbi segmentation is not "
      + "SQL-expressible (the q90 argument for the other subword family): "
      + "ExtSpec hand-traced hard-EM fit, unknown-char fallback, parquet "
      + "round-trip, repartition determinism + golden digest"),
    "q94_distinct_sketch" -> ("approximate by contract (DataSketches HLL "
      + "estimates): SketchSpec 3-sigma error envelope vs exact distinct "
      + "counts, merge ≡ rebuild, parquet round-trip + golden digest"))
  // q96/q99/q102 left this map in r13: their registry configs sit below
  // the theta/Misra-Gries/quantile-compactor exactness capacities at
  // every tested SF, so each now carries a REAL DuckDB oracle; the
  // above-capacity approximation envelopes stay pinned in
  // ExportSpec/QuantileSpec with deliberately small sketch configs.
}
