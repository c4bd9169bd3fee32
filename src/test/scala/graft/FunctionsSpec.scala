package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** SQL exposure of the custom expressions: user transform steps run
  * through spark.sql, so every extension function must be callable from
  * SQL text.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("cosine_similarity callable from SQL with the exact fold semantics") {
    GraftFunctions.register(spark)
    val sim = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 2.0F, 0.0F), array(2.0F, 3.0F, 0.0F)) AS s")
      .as[Double].head()
    assert(sim === 0.9922778767136677)
  }

  test("shingle_hashes + sorted_intersect_count compose in SQL") {
    GraftFunctions.register(spark)
    val inter = spark.sql(
      """SELECT sorted_intersect_count(
        |  shingle_hashes('a b c d', 2), shingle_hashes('a b c x', 2)) AS c""".stripMargin)
      .as[Int].head()
    assert(inter === 2) // shared bigrams: "a b", "b c"
  }

  test("max_token_multiplicity and interleave_bits callable from SQL") {
    GraftFunctions.register(spark)
    val top = spark.sql("SELECT max_token_multiplicity('a b a c a') AS m")
      .as[Int].head()
    assert(top === 3)
    val z = spark.sql("SELECT interleave_bits(3, 5L, 3L) AS z").as[Long].head()
    assert(z === 39L) // x=101, y=011 -> 100111
  }

  test("a user SQL step can call the extension functions") {
    import graft.config._
    import graft.exec.{EtlContext, StepRunner}
    import graft.io.{FileWarehouse, Lake}
    val work = SparkTestBase.tmpDir("graft_fn_step")
    val ctx = EtlContext(spark, Lake(work), new FileWarehouse(spark, s"$work/wh"))
    Seq((1L, "the quick brown fox"), (2L, "the quick brown cat"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs")
    val out = StepRunner.runSelect(ctx, Step.Select(SqlSource.Inline(
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  sorted_intersect_count(shingle_hashes(a.text, 2),
        |                         shingle_hashes(b.text, 2)) AS shared
        |FROM docs a JOIN docs b ON a.doc_id < b.doc_id""".stripMargin)))
    assert(out.as[(Long, Long, Int)].collect().toSeq === Seq((1L, 2L, 2)))
  }

  test("exposure matrix: every SQL function and table-op fn step is pinned and documented") {
    // ROW-level expressions -> real SQL functions
    val sqlFns = GraftFunctions.functions.map(_._1.funcName).toSet
    assert(sqlFns === Set("cosine_similarity", "shingle_hashes", "simhash_chunks",
      "sorted_intersect_count", "max_token_multiplicity", "interleave_bits"))
    // TABLE-level operators -> named fn steps (F17); composed pipelines
    // keep their own stage registries
    assert(graft.ext.GraftFns.standard.keySet === Set("graft_init",
      "graft_exact_dedup", "graft_normalize_dedup", "graft_near_dup_dedup",
      "graft_decontaminate", "graft_strip_boilerplate",
      "graft_strip_exact_substrings", "graft_strip_dup_lines",
      "graft_dsir_select", "graft_gopher_filter"))
    assert(graft.ext.CurationChain.fns.keySet === Set("curation_init",
      "encoding_gate", "normalize_dedup", "near_dup_dedup", "decontaminate",
      "mixture_sample", "pack_sequences"))
    assert(graft.ext.CcNet.fns(graft.ext.ExtQueries.langProfiles).keySet ===
      Set("ccnet_init", "ccnet_lang_id", "ccnet_score", "ccnet_band", "ccnet_keep"))
    // README documents every exposed name — the matrix stays honest
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    (sqlFns ++ graft.ext.GraftFns.standard.keySet).foreach(name =>
      assert(readme.contains(name), s"README.md does not document '$name'"))
  }

  test("a YAML pipeline interleaves SQL steps with a table-op fn step end-to-end") {
    import graft.config._
    import graft.exec.{EtlContext, StepRunner, PipelineRunner}
    import graft.io.{FileWarehouse, Lake}
    val work = SparkTestBase.tmpDir("graft_tablefn")
    val ctx = EtlContext(spark, Lake(work), new FileWarehouse(spark, s"$work/wh"),
      variables = Map("GRAFT_FN_SOURCE" -> "raw_docs"),
      fns = graft.ext.GraftFns.standard)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents_src")
    // SQL step (projection) -> table-op fn step (exact dedup) -> SQL step
    val result = StepRunner.runSteps(ctx, Seq(
      Step.Select(SqlSource.Inline(
        "SELECT doc_id, text, lang FROM documents_src"),
        cache = Some(CacheSpec("raw_docs", None))),
      Step.Fn("graft_init"),
      Step.Fn("graft_exact_dedup"),
      Step.Select(SqlSource.Inline(
        "SELECT lang, COUNT(*) AS n FROM graft GROUP BY lang")))).get
    // oracle: the same chain composed directly
    val direct = graft.ext.Dedup.exact(
        docs.select("doc_id", "text", "lang"))
      .groupBy("lang").count().withColumnRenamed("count", "n")
    assert(result.orderBy("lang").collect().toSeq ===
      direct.orderBy("lang").collect().toSeq)
  }

  test("graft_strip_dup_lines fn step == direct stripDuplicateLines, GRAFT_MIN_CHARS honored") {
    import graft.config._
    import graft.exec.{EtlContext, StepRunner}
    import graft.io.{FileWarehouse, Lake}
    import spark.implicits._
    val work = SparkTestBase.tmpDir("graft_linefn")
    val ctx = EtlContext(spark, Lake(work), new FileWarehouse(spark, s"$work/wh"),
      variables = Map("GRAFT_FN_SOURCE" -> "line_docs", "GRAFT_MIN_CHARS" -> "2"),
      fns = graft.ext.GraftFns.standard)
    val docs = Seq(
      (1L, "aa bb\nZ\ncc"), (2L, "aa bb\nZ\ndd"), (3L, "fresh"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("line_docs")
    val result = StepRunner.runSteps(ctx, Seq(
      Step.Fn("graft_init"),
      Step.Fn("graft_strip_dup_lines"),
      Step.Select(SqlSource.Inline(
        "SELECT doc_id, text, n_cut_lines FROM graft")))).get
    val direct = graft.ext.Dedup.stripDuplicateLines(docs, minChars = 2)
      .select("doc_id", "text", "n_cut_lines")
    assert(result.orderBy("doc_id").collect().toSeq ===
      direct.orderBy("doc_id").collect().toSeq)
    assert(result.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "aa bb\nZ\ncc", 0L), (2L, "Z\ndd", 1L), (3L, "fresh", 0L)))
  }
}
