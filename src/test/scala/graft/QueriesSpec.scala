package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the registry queries: correctness is
  * covered by the driver's DuckDB oracle; these tests pin the physical
  * properties that matter at scale.
  */
class QueriesSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("q01 pushes the shipdate filter into the parquet scan") {
    val plan = Queries.q01(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected shipdate pushdown in:\n$plan")
  }

  test("q02 prunes customers by region BEFORE joining the big tables") {
    // The written join order must be lineitem ⋈ (orders ⋈ (customer ⋈
    // nation ⋈ region)): in the optimized logical plan, the top join's
    // lineitem side must NOT contain orders/region — i.e. orders only
    // ever joins the already-pruned customer chain, so at scale the
    // big shuffles carry only surviving rows.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    val plan = Queries.q02(spark, sf).queryExecution.optimizedPlan
    val topJoin = plan.collectFirst { case j: Join => j }.get
    // identify each scan leaf by its column-name prefix (l_/o_/c_/n_/r_)
    val prefixToTable = Map("l" -> "lineitem", "o" -> "orders",
      "c" -> "customer", "n" -> "nation", "r" -> "region")
    def tables(p: LogicalPlan): Set[String] =
      p.collectLeaves().flatMap(_.output.map(_.name.takeWhile(_ != '_')))
        .flatMap(prefixToTable.get).toSet
    val left = tables(topJoin.left)
    val right = tables(topJoin.right)
    val (liSide, otherSide) =
      if (left.contains("lineitem")) (left, right) else (right, left)
    assert(liSide === Set("lineitem"), s"lineitem side also contains: ${liSide - "lineitem"}")
    assert(otherSide === Set("orders", "customer", "nation", "region"))
    // and the region literal prune survives into the optimized plan
    assert(plan.toString.contains("ASIA"))
  }

  test("q18 delta transform: two incremental runs == one full-history merge") {
    val viaDelta = Queries.q18(spark, sf).collect().map(_.toSeq)
    val viaFull = Queries.q05(spark, sf).collect().map(_.toSeq)
    assert(viaDelta.toSeq === viaFull.toSeq)
  }

  test("q03 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Queries.q03(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$plan")
  }
}
