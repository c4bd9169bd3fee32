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
}
