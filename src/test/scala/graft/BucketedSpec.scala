package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.FileWarehouse

/** Bucketed co-located joins: tables bucketed identically on the join
  * key must join with ZERO shuffle exchanges — the plan property that
  * makes repeated merges affordable at scale.
  */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("join of two identically-bucketed tables plans no shuffle") {
    val root = SparkTestBase.tmpDir("graft_bucketed")
    val wh = new FileWarehouse(spark, root)
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    wh.replaceBucketed(left, "dwh", "bleft", Seq("id"), 8)
    wh.replaceBucketed(right, "dwh", "bright", Seq("id"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = wh.readTable("dwh", "bleft")
        .join(wh.readTable("dwh", "bright"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(joined.count() === 1000)
      // and aggregation on the bucket key is shuffle-free too
      val agg = wh.readTable("dwh", "bleft").groupBy("id").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed aggregation must not shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
