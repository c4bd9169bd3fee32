package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide physical-plan fingerprint pinning.
  *
  * Every registry query's INITIAL physical plan (pre-AQE, before any
  * action) is reduced to a canonical fingerprint — shuffle/broadcast
  * exchange counts, parquet scan count, materialized-RDD scan count,
  * top-k, cartesian, and join-strategy counts — and compared against
  * the checked-in table `src/test/resources/plan_fingerprints.tsv`.
  * A plan regression (a filter that stops pushing down, a broadcast
  * that degrades to a shuffle join, an accidental cartesian product, a
  * new shuffle in a hot path) now fails a unit test deterministically
  * instead of waiting for a noisy benchmark run to notice a slowdown.
  *
  * The per-query plan AUDITS (QueriesSpec/ExtSpec) stay the place for
  * targeted, semantically-named assertions ("q01 pushes the shipdate
  * filter into the scan"); this spec is the uniform safety net across
  * all queries, including ones with no dedicated audit.
  *
  * REGENERATION (after an intentional plan change): re-pin with
  *
  *   SPARK_GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanPinSpec"
  *
  * which rewrites the tsv from the live plans; review the diff — every
  * changed line is a deliberate plan change you are signing off on.
  *
  * Stability notes: fingerprints are computed at sf0.001 with the
  * fixed test-session config (shuffle.partitions=4), count only node
  * KINDS (never partition counts, file sizes, or codegen stage ids),
  * and read the plan before execution — so they are a function of the
  * query code, the fixed fixture, and the Spark version alone.
  */
class PlanPinSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"
  private val tablePath = "src/test/resources/plan_fingerprints.tsv"

  private def fingerprint(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    def n(pat: String): Int = pat.r.findAllMatchIn(s).size
    // "Exchange hashpartitioning(...)" etc; BroadcastExchange is a
    // distinct node name, so the leading space anchors shuffles only
    val shuffle = n("Exchange (hash|range|SinglePartition|RoundRobin)")
    val bcast = n("BroadcastExchange")
    val scan = n("Scan parquet") + n("FileScan parquet")
    val rdd = n("Scan ExistingRDD")
    val topk = n("TakeOrderedAndProject")
    val cart = n("CartesianProduct")
    val smj = n("SortMergeJoin")
    val bhj = n("BroadcastHashJoin")
    s"shuffle=$shuffle bcast=$bcast scan=$scan rdd=$rdd topk=$topk cart=$cart smj=$smj bhj=$bhj"
  }

  test("all registry queries match their pinned plan fingerprints") {
    val got: Seq[(String, String)] = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (name, f) => name -> fingerprint(f(spark, sf)) }
    if (sys.env.contains("SPARK_GRAFT_REGEN_PLANS")) {
      val out = got.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(tablePath),
        out.getBytes("UTF-8"))
      info(s"regenerated $tablePath (${got.size} queries)")
    } else {
      val want: Map[String, String] =
        scala.io.Source.fromFile(tablePath).getLines()
          .filter(_.nonEmpty)
          .map { l => val Array(k, v) = l.split("\t", 2); k -> v }.toMap
      val regenHint = "intentional plan changes re-pin with " +
        "SPARK_GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanPinSpec'"
      got.foreach { case (k, v) =>
        assert(want.contains(k), s"$k has no pinned plan fingerprint — $regenHint")
        assert(want(k) === v, s"$k physical plan drifted — $regenHint")
      }
      assert(want.keySet === got.map(_._1).toSet,
        s"stale fingerprint rows for removed queries — $regenHint")
    }
  }
}
