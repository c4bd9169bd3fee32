package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, materializing each result with a noop-format
  * write (a real end-to-end execution: every column is produced and
  * serialized, unlike `count()` which lets Spark elide column work).
  *
  * Each query is timed over `SPARK_GRAFT_BENCH_RUNS` passes (default 3)
  * and reported as its per-query MINIMUM: this host's A/A measurements
  * (BASELINE.md) show single samples swinging 3-10x in both directions
  * under shared-hypervisor noise, so a single-sample artifact is
  * unjudgeable — steady-state minima over >=3 runs are the repo's
  * measurement contract. Passes iterate the full registry round-robin
  * (run 1 of every query, then run 2, ...) so one query's repeats
  * don't sit in a single noise window.
  *
  * Output contract: exactly ONE JSON line on stdout, and the harness
  * that collects it keeps only the TAIL of stdout — so the line is
  * ordered least-critical-first (per-query raw samples live in a side
  * file, `bench_samples.json`, not on stdout at all) and the headline
  * `queries`/`value`/`failed` fields come LAST. Minima are rounded to
  * 0.1 ms to keep the tail small; raw full-precision samples are in
  * the side file. Because the tail cap can still clip early
  * `ext_queries` entries off a long registry, the identical minima
  * line is ALSO written whole to `bench_minima.json` — the
  * self-contained artifact no tail cap can touch.
  *
  * Failures are loud and unambiguous: the error is printed to stderr
  * and recorded per-query, and a query that failed on ANY pass
  * reports a sentinel -1 minimum (never a valid-looking number from
  * its surviving passes) — a minimum >= 0 therefore always means
  * "every pass succeeded". Per-query success counts and raw samples,
  * including those of partially-failed queries, are in the side file.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val samplesPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "bench_samples.json")
    val minimaPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_MINIMA", "bench_minima.json")
    // input-size-derived shuffle width (SCALE_r14: a pinned 32 spills
    // at ×100); floors at the driver contract's 32, so sf0.1 numbers
    // stay comparable; SPARK_GRAFT_SHUFFLE_PARTITIONS overrides
    val shufflePartitions = DerivedShuffle.forDir(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
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
    // 0.1 ms resolution keeps the tail-captured stdout line compact;
    // full-precision samples go to the side file.
    def round4(d: Double): Double = math.rint(d * 1e4) / 1e4
    def minOf(name: String): Double =
      if (errors.contains(name)) -1.0 // any-pass failure => sentinel, never a plausible number
      else samples.getOrElse(name, Vector.empty) match {
        case v if v.isEmpty => -1.0
        case v              => round4(v.min)
      }
    def fmtMins(names: Seq[String]) =
      names.map(k => s"\"" + k + "\":" + minOf(k)).mkString("{", ",", "}")
    val (head, ext) = registry.map(_._1).partition(headline.contains)
    def total(names: Seq[String]) = round4(names.map(minOf).filter(_ >= 0).sum)
    val samplesJson = registry.map { case (k, _) =>
      s"\"" + k + "\":" + samples.getOrElse(k, Vector.empty).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val okRuns = registry.map { case (k, _) =>
      s"\"" + k + "\":" + samples.getOrElse(k, Vector.empty).size
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, e) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val nFailed = errors.size
    val sideFile =
      s"""{"metric":"samples","runs":$runs,"sf":"$sfDir","samples":$samplesJson,"ok_runs":$okRuns,"errors":$errs,"failed":$nFailed}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(samplesPath),
      (sideFile + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] samples side-file write failed: $e") }
    // Tail-capture ordering: the harness keeps the END of stdout, so
    // headline value/queries/failed go last; droppable context first.
    val line =
      s"""{"metric":"total","unit":"sec","runs":$runs,"sf":"$sfDir","shuffle_partitions":$shufflePartitions,"samples_file":"$samplesPath","errors":$errs,"ext_queries":${fmtMins(ext)},"ext_total":${total(ext)},"queries":${fmtMins(head)},"value":${total(head)},"failed":$nFailed}"""
    // The stdout line is tail-capped by the collecting harness, which
    // can clip the FRONT (the ext_queries minima) off a long registry.
    // The same line therefore also lands whole in a side file next to
    // bench_samples.json: no consumer should depend on the tail cap.
    try java.nio.file.Files.write(java.nio.file.Paths.get(minimaPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] minima side-file write failed: $e") }
    println(line)
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
