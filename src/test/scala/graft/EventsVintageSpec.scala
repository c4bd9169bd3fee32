package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver fixture generations have shipped `events.ts` in different
  * parquet spellings — round 10's regeneration silently switched from
  * TIMESTAMP(NANOS) (readable only as raw long nanos) to a native
  * TIMESTAMP(MICROS)/NTZ column, breaking every events consumer that
  * assumed the long vintage (14 registry queries). [[Queries.events]]
  * now adapts on the OBSERVED read type; this spec pins that contract
  * by materializing the same instants in all three vintages and
  * asserting the helper converges them bit-identically.
  */
class EventsVintageSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  /** 200 rows of real driver events, ts normalized to TIMESTAMP. */
  private lazy val base: DataFrame =
    Queries.events(spark, "/root/testdata/sf0.001")
      .orderBy("event_id").limit(200).cache()

  private def writeVintage(suffix: String, ts: org.apache.spark.sql.Column): String = {
    val dir = SparkTestBase.tmpDir(s"graft_events_$suffix")
    base.withColumn("ts", ts)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nanosDir = writeVintage("nanos", expr("unix_micros(ts) * 1000"))
  private lazy val ntzDir   = writeVintage("ntz", col("ts").cast(TimestampNTZType))
  private lazy val ltzDir   = writeVintage("ltz", col("ts"))

  private def instants(dir: String): Seq[(Long, Long)] =
    Queries.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().toSeq.sorted

  test("vintage detection: raw-long nanos vs native timestamp") {
    assert(Queries.eventsTsIsRawNanos(spark, nanosDir))
    assert(!Queries.eventsTsIsRawNanos(spark, ntzDir))
    assert(!Queries.eventsTsIsRawNanos(spark, ltzDir))
  }

  test("events() reads every vintage as TIMESTAMP with identical instants") {
    val want = base.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().toSeq.sorted
    for (dir <- Seq(nanosDir, ntzDir, ltzDir)) {
      val df = Queries.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: ts read as ${df.schema("ts").dataType}")
      assert(instants(dir) == want, s"$dir: instants diverge from base")
    }
  }

  test("epoch extraction (the q25/q67 spelling) resolves on every vintage") {
    // unix_millis rejects TIMESTAMP_NTZ — the exact failure mode the
    // round-10 fixture switch exposed; must analyze on all vintages
    for (dir <- Seq(nanosDir, ntzDir, ltzDir)) {
      val n = Queries.events(spark, dir)
        .select(unix_millis(col("ts"))).distinct().count()
      assert(n > 0)
    }
  }

  test("the raw-nanos vintage really lands as a long column on disk") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$nanosDir/events.parquet")
    assert(raw.schema("ts").dataType == LongType)
  }
}
