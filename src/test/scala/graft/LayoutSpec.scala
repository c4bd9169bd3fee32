package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Layout

/** Z-order layout: Morton-code correctness (pinned hand-computed
  * values) and the property that matters at scale — per-partition
  * bounding boxes of a z-ordered write are dramatically tighter than a
  * single-column sort's, which is exactly what parquet min/max
  * skipping prunes on.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("interleaveBits: pinned Morton codes, clamping, null propagation") {
    val df = Seq(
      (1L, 5L, 3L),     // x=101, y=011 -> 100111 = 39
      (2L, 0L, 0L),     // -> 0
      (3L, 7L, 7L),     // -> 111111 = 63
      (4L, 99L, -4L)    // clamps to (7, 0) -> 101010 = 42
    ).toDF("id", "x", "y")
    val out = df.select($"id",
      Layout.zValue(Seq($"x", $"y"), bitsPerCol = 3).as("z"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 39L, 2L -> 0L, 3L -> 63L, 4L -> 42L))
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), 3).as("z"))
      .collect()(0)
    assert(withNull.isNullAt(0), "null input must yield null code")
  }

  test("interleaveBits rejects widths that overflow a long") {
    assertThrows[IllegalArgumentException](
      Layout.zValue(Seq($"x", $"y"), bitsPerCol = 32))
  }

  test("zOrderBy prunes on the SECOND dimension where a single-column sort cannot") {
    // 64x64 grid; a min/max-stats reader skips a partition when the
    // predicate range misses the partition's [min,max] — count the
    // partitions that SURVIVE a predicate on each dimension
    val grid = spark.range(64L * 64)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    def survivors(df: org.apache.spark.sql.DataFrame, dim: String): Long =
      df.withColumn("__p", spark_partition_id())
        .groupBy("__p").agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
        .where($"lo" < 8) // predicate: dim < 8 (the lowest eighth)
        .count()
    val sorted = grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
    val zed = Layout.zOrderBy(grid, Seq("x", "y"), nPartitions = 16)
    // on the sorted dimension both layouts prune hard
    assert(survivors(sorted, "x") <= 4)
    assert(survivors(zed, "x") <= 8)
    // on the OTHER dimension the x-sort retains every partition (each
    // spans all 64 y values); the z-curve keeps y-locality too
    assert(survivors(sorted, "y") === 16L,
      "single-column sort should be unprunable on y — fixture broken?")
    assert(survivors(zed, "y") <= 8,
      "z-order must keep y min/max ranges tight enough to prune")
    // and the rewrite loses no rows
    assert(zed.count() === 64L * 64)
  }

  test("zOrderBy accepts date and timestamp columns via their epoch form") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
    val out = Layout.zOrderBy(df, Seq("o_orderdate", "o_totalprice"), nPartitions = 4)
    assert(out.count() === df.count())
    // locality check: partitions must have bounded date ranges (a
    // crash here was the original bug — DATE cannot cast to DOUBLE)
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val spans = out.withColumn("__p", spark_partition_id())
      .groupBy("__p").agg((max(us($"o_orderdate")) -
        min(us($"o_orderdate"))).as("span"))
      .select(max($"span")).as[Long].collect()(0)
    val global = df.agg((max(us($"o_orderdate")) -
      min(us($"o_orderdate")))).as[Long].collect()(0)
    assert(spans < global, "z-ordered partitions must not each span the full date range")
  }

  test("zOrderBy handles constant and null-bearing columns") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "konst")
    // constant column scales out; must not divide by zero
    assert(Layout.zOrderBy(df, Seq("a", "konst"), 2).count() === 3)
  }

  test("compactParquet shrinks a many-small-files dir without changing its rows") {
    val dir = SparkTestBase.tmpDir("graft_compact") + "/t"
    val src = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    src.repartition(40).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files() === 40)
    // huge target -> everything folds into one file
    val n = Layout.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(n === 1 && files() === 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 5000)
    assert(back.agg(sum($"id")).as[Long].collect()(0) === 5000L * 5001 / 2)
    // no staging/backup leftovers
    val parent = new java.io.File(dir).getParentFile.listFiles.map(_.getName)
    assert(parent.toSeq === Seq("t"), s"leftovers: ${parent.mkString(",")}")
  }

  test("compactParquet is a no-op when the dir is already at the target count") {
    val dir = SparkTestBase.tmpDir("graft_compact_noop") + "/t"
    (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "p").coalesce(1).write.parquet(dir)
    def names() = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = names()
    assert(before.size === 1)
    // 1 file, huge target -> n == current count -> must NOT rewrite
    val n = Layout.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(n === 1)
    assert(names() === before, "a no-op compaction must not rewrite files")
  }

  test("compactParquet with sortCols range-clusters while rewriting") {
    val dir = SparkTestBase.tmpDir("graft_compact_sort") + "/t"
    (1 to 4000).map(i => ((i * 7919) % 4000L, i.toLong)).toDF("k", "v")
      .repartition(16).write.parquet(dir)
    // target small enough that the rewrite must produce several files
    val n = Layout.compactParquet(spark, dir, targetBytes = 4L << 10, sortCols = Seq("k"))
    assert(n > 1, s"fixture too small to exercise range clustering (n=$n)")
    // per-file k ranges must be disjoint-ish: max span ~ global/n, not global
    val back = spark.read.parquet(dir)
      .withColumn("__f", input_file_name())
    val spans = back.groupBy("__f").agg((max($"k") - min($"k")).as("span"))
      .agg(max($"span")).as[Long].collect()(0)
    assert(spans < 3999 / 2, s"sorted compaction must bound per-file ranges (span=$spans, n=$n)")
  }
}
