package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, materializing each result with a noop-format
  * write (a real end-to-end execution: every column is produced and
  * serialized, unlike `count()` which lets Spark elide column work).
  *
  * Each query is timed over `SPARK_GRAFT_BENCH_RUNS` passes (default 3)
  * and reported as its per-query MINIMUM plus the raw samples: this
  * host's A/A measurements (BASELINE.md) show single samples swinging
  * 3-10x in both directions under shared-hypervisor noise, so a
  * single-sample artifact is unjudgeable — steady-state minima over >=3
  * runs are the repo's measurement contract. Passes iterate the full
  * registry round-robin (run 1 of every query, then run 2, ...) so one
  * query's repeats don't sit in a single noise window.
  *
  * Failures are loud: the error is printed to stderr and recorded
  * per-query in the JSON, and a query with no successful sample
  * contributes a sentinel -1 minimum instead of silently benching ~0 s.
  * Output contract: exactly ONE JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
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
    val registry = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (run <- 1 to runs; (name, fn) <- registry) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        samples(name) = samples.getOrElse(name, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name run $run FAILED: $e")
        errors.getOrElseUpdate(name, e.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
      }
    }
    def minOf(name: String): Double =
      samples.getOrElse(name, Vector.empty) match {
        case v if v.isEmpty => -1.0
        case v              => v.min
      }
    def fmtMins(names: Seq[String]) =
      names.map(k => s"\"" + k + "\":" + minOf(k)).mkString("{", ",", "}")
    val (head, ext) = registry.map(_._1).partition(headline.contains)
    def total(names: Seq[String]) = names.map(minOf).filter(_ >= 0).sum
    val samplesJson = registry.map { case (k, _) =>
      s"\"" + k + "\":" + samples.getOrElse(k, Vector.empty).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, e) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val nFailed = errors.size
    println(s"""{"metric":"total","value":${total(head)},"unit":"sec","runs":$runs,"queries":${fmtMins(head)},"ext_total":${total(ext)},"ext_queries":${fmtMins(ext)},"samples":$samplesJson,"errors":$errs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
