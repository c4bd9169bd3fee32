package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import graft.config.MergeMode
import graft.io.FileWarehouse
import graft.merge.JournalMerge

/** Partition-safe journal flip: the `'A'`→`'H'` epilogue must move the
  * active partition's files, never rewrite history — the journal is
  * append-only and at production scale a rewrite-per-merge is O(journal).
  */
class FlipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def journal(rows: (Int, String, String)*) =
    rows.toDF("id", "v", "__record_state")
      .withColumn("__transform_dt",
        org.apache.spark.sql.functions.to_timestamp($"v"))
      .withColumn("__load_dt", $"__transform_dt")
      .withColumn("__seqno", org.apache.spark.sql.functions.lit(1L))

  private def listFiles(dir: Path, wh: FileWarehouse): Map[String, Long] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).filter(_.isFile)
      .map(s => s.getPath.toString -> s.getModificationTime).toMap
  }

  test("journal is written partitioned by __record_state; flip moves, never rewrites") {
    val root = SparkTestBase.tmpDir("graft_flip")
    val wh = new FileWarehouse(spark, root)
    wh.registerPrimaryKey("dwh", "t", Seq("id"))
    val base = new Path(s"$root/dwh/t__journal")

    wh.append(journal((1, "2024-01-01 00:00:00", "A")), "dwh", "t__journal")
    assert(listFiles(new Path(base, "__record_state=A"), wh).nonEmpty,
      "journal must be laid out as __record_state partitions")

    JournalMerge.run(wh, "dwh", "t", MergeMode.Delta)
    val histAfterFirst = listFiles(new Path(base, "__record_state=H"), wh)
    assert(histAfterFirst.nonEmpty)
    assert(listFiles(new Path(base, "__record_state=A"), wh).isEmpty)

    // second merge round: history partition's files must be untouched
    // (same paths, same modification times)
    wh.append(journal((1, "2024-01-02 00:00:00", "A")), "dwh", "t__journal")
    JournalMerge.run(wh, "dwh", "t", MergeMode.Delta)
    val histAfterSecond = listFiles(new Path(base, "__record_state=H"), wh)
    histAfterFirst.foreach { case (path, mtime) =>
      assert(histAfterSecond.get(path).contains(mtime),
        s"historical file rewritten or moved: $path")
    }
    assert(histAfterSecond.size > histAfterFirst.size, "flipped files must join history")

    // journal content is intact and all historical
    val j = wh.read("dwh", "t__journal")
    assert(j.count() == 2)
    assert(j.where("__record_state = 'A'").count() == 0)
    // and the master holds the latest version
    assert(wh.read("dwh", "t").select("v").as[String].collect().toSeq ==
      Seq("2024-01-02 00:00:00"))
  }

  test("delta merge read of active rows prunes to the A partition") {
    val root = SparkTestBase.tmpDir("graft_flip_prune")
    val wh = new FileWarehouse(spark, root)
    wh.registerPrimaryKey("dwh", "p", Seq("id"))
    wh.append(journal((1, "2024-01-01 00:00:00", "H"), (2, "2024-01-02 00:00:00", "A")),
      "dwh", "p__journal")
    val active = wh.read("dwh", "p__journal").where("__record_state = 'A'")
    val scan = active.queryExecution.executedPlan.toString
    // partition filter must reach the scan (not a post-scan filter only)
    assert(scan.contains("__record_state") && scan.contains("PartitionFilters"),
      s"expected partition pruning in:\n$scan")
    assert(active.count() == 1)
  }

  test("warehouse-engine SQL over a partitioned journal sees every partition") {
    // regression: CREATE TABLE ... LOCATION does not recurse into
    // partition dirs — catalog SQL over a journal silently read 0 rows
    val root = SparkTestBase.tmpDir("graft_flip_sql")
    val wh = new FileWarehouse(spark, root)
    wh.append(journal((1, "2024-01-01 00:00:00", "A"), (2, "2024-01-02 00:00:00", "H")),
      "dwh", "q__journal")
    assert(wh.query("SELECT * FROM dwh.q__journal").count() == 2)
    assert(wh.query("SELECT * FROM dwh.q__journal WHERE __record_state='A'").count() == 1)
    // and stays fresh across a flip
    wh.flipRecordState("dwh", "q__journal")
    assert(wh.query("SELECT * FROM dwh.q__journal WHERE __record_state='A'").count() == 0)
    assert(wh.query("SELECT * FROM dwh.q__journal").count() == 2)
  }

  test("legacy unpartitioned journal still flips via rewrite fallback") {
    val root = SparkTestBase.tmpDir("graft_flip_legacy")
    val wh = new FileWarehouse(spark, root)
    // simulate a legacy layout: plain parquet with __record_state as data
    journal((1, "2024-01-01 00:00:00", "A")).write.parquet(s"$root/dwh/leg__journal")
    wh.flipRecordState("dwh", "leg__journal")
    assert(wh.read("dwh", "leg__journal")
      .where("__record_state = 'A'").count() == 0)
  }
}
