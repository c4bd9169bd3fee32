package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, materializing each result with a noop-format
  * write (a real end-to-end execution: every column is produced and
  * serialized, unlike `count()` which lets Spark elide column work).
  * Failures are loud: the error is printed to stderr and recorded
  * per-query in the JSON, and a failed query contributes a sentinel
  * -1 duration instead of silently benching as ~0 s.
  * Output contract: exactly ONE JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    /** The six headline queries recorded in BENCH_r01 — `value` stays
      * comparable round-over-round against that baseline; everything
      * else (the LLM-pipeline operators added later) is timed in
      * `ext_queries`/`ext_total` so new coverage never reads as a
      * slowdown of the baseline set.
      */
    val headline = Set("q01_pricing_summary", "q02_revenue_asia", "q03_top_orders",
      "q04_latest_order_per_customer", "q05_merge_full", "q06_merge_delta")
    // one untimed warm-up materialization: JVM/codegen/classloading
    // warm-up otherwise lands entirely on whichever query runs first
    // (r1 showed q01 at ~6 s vs ~1 s for identical scan volume)
    try SparkEntry.queries("q04_latest_order_per_customer")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e")
        Some(e.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
      }
      (name, if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
    }
    def fmt(rs: Seq[(String, Double, Option[String])]) =
      rs.map { case (k, v, _) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val (head, ext) = results.partition(r => headline.contains(r._1))
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    def total(rs: Seq[(String, Double, Option[String])]) =
      rs.collect { case (_, v, _) if v >= 0 => v }.sum
    val nFailed = results.count(_._3.isDefined)
    println(s"""{"metric":"total","value":${total(head)},"unit":"sec","queries":${fmt(head)},"ext_total":${total(ext)},"ext_queries":${fmt(ext)},"errors":$errs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
