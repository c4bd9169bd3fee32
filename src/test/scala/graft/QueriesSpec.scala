package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the registry queries: correctness is
  * covered by the driver's DuckDB oracle; these tests pin the physical
  * properties that matter at scale.
  */
class QueriesSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("registry invariant: every query has exactly one of a DuckDB oracle or an approxVerified gate") {
    val keys = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val approx = SparkEntry.approxVerified.keySet
    assert((oracled & approx).isEmpty,
      s"queries claiming both an oracle and approx gating: ${(oracled & approx).toSeq.sorted}")
    assert(oracled.subsetOf(keys) && approx.subsetOf(keys),
      s"stale non-registry keys: ${((oracled ++ approx) -- keys).toSeq.sorted}")
    val unverified = keys -- oracled -- approx
    assert(unverified.isEmpty,
      s"registry queries with neither oracle nor named gating spec: ${unverified.toSeq.sorted}")
  }

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

  test("q71 salted merge: plans the two-phase salt path, output == q05") {
    val df = Queries.q71(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("__graft_salt"),
      "q71 must route through the conf-dispatched salted window")
    // constructing q71 unsets the conf again: later merges stay plain
    assert(spark.conf.getOption(graft.merge.JournalMerge.SaltBucketsConf).isEmpty)
    assert(df.collect().map(_.toSeq).toSeq ===
      Queries.q05(spark, sf).collect().map(_.toSeq).toSeq)
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

  test("q38 explicit-value pivot is ONE aggregation pass, no value-discovery scan") {
    val qe = Queries.q38(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // one scan of orders (pivot value discovery would add a distinct scan)
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"expected a single orders scan in:\n$plan")
    // the scan reads only the three columns the pivot needs
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderpriority") && !readSchema.contains("o_orderdate"),
      s"pivot scan should prune to 3 columns: $readSchema")
  }

  test("q43 correlated subqueries plan as semi/anti/aggregate joins, no nested loops") {
    val plan = Queries.q43(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // EXISTS -> semi join, NOT EXISTS -> anti join (hash or broadcast
    // variants both fine; nested-loop execution of the correlation is not)
    assert(plan.contains("LeftSemi"), s"expected semi join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected anti join in:\n$plan")
  }

  test("q55 lateral join decorrelates to a ranked equi-join, no per-row re-execution") {
    val plan = Queries.q55(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral stayed a product join:\n${plan.take(2000)}")
    // the correlated LIMIT must become a per-key rank filter (window or
    // in-partition limit), executed once over orders — not once per customer
    assert(plan.contains("Window") || plan.contains("GroupLimit"),
      s"expected decorrelated rank in:\n${plan.take(2000)}")
  }

  test("q36/q42 redaction and char-class scans prune to the columns they use") {
    import graft.ext.ExtQueries
    val piiPlan = ExtQueries.q36(spark, sf).queryExecution.executedPlan.toString
    val piiSchema = piiPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(piiSchema.contains("c_custkey") && piiSchema.contains("c_name") &&
      !piiSchema.contains("c_acctbal"),
      s"pii scan should read only custkey+name: $piiSchema")
    val ccPlan = ExtQueries.q42(spark, sf).queryExecution.executedPlan.toString
    val ccSchema = ccPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!ccSchema.contains("p_retailprice") && !ccSchema.contains("p_size"),
      s"char-class scan should prune numeric part columns: $ccSchema")
  }

  test("q52/q56 scans prune to the columns the operators actually touch") {
    import graft.ext.ExtQueries
    // keyTerms: only (doc_id, text) should reach the documents scan
    val ktSchemas = ExtQueries.q52(spark, sf).queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(ktSchemas.nonEmpty && ktSchemas.forall(s =>
      !s.contains("lang") && !s.contains("n_chars")),
      s"keyTerms must not read lang/n_chars: $ktSchemas")
    // winsorize: the text column must never reach either scan
    val wSchemas = ExtQueries.q56(spark, sf).queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(wSchemas.nonEmpty && wSchemas.forall(!_.contains("text")),
      s"winsorize must not read the text column: $wSchemas")
  }
}
