package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.config._
import graft.exec.{EtlContext, Tasks}
import graft.io.{FileWarehouse, Lake}

/** Scheduler-invocation surface: task-id parity with the reference's
  * Airflow factories and the RunTask CLI end-to-end (the DAG-node →
  * spark-submit mapping).
  */
class TasksSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def write(dir: String, name: String, text: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, name), text)
  }

  test("task ids reproduce the reference naming (lowercased; folder slashes -> underscores)") {
    // airflow_etl.py:505-514 / :759-761
    assert(Tasks.extractTaskId("Flexcube", "MAIN", "Accounts", ReadMode.Full)
      === "task_extract_flexcube_main_accounts_full")
    assert(Tasks.extractTaskId("pg", "prod", "t", ReadMode.Delta)
      === "task_extract_pg_prod_t_delta")
    assert(Tasks.transformTaskId("dwh/orders", ReadMode.Full)
      === "task_transform_dwh_orders_full")
    assert(Tasks.transformTaskId("dm/sales/daily", ReadMode.Manual)
      === "task_transform_dm_sales_daily_manual")
  }

  test("transform task factory fails at BUILD time without a config repository") {
    val ctx = EtlContext(spark, Lake("/nowhere"),
      new FileWarehouse(spark, SparkTestBase.tmpDir("graft_tasks_wh0")))
    val e = intercept[ConfigException](Tasks.transformDb(ctx, "dwh/orders"))
    assert(e.getMessage.contains("sqlRoot"))
  }

  test("RunTask transform: DAG-node invocation runs config.yaml to a merged master") {
    val work = SparkTestBase.tmpDir("graft_runtask")
    // config repository: <sqlRoot>/dwh/seg/config.yaml + step sql
    write(s"$work/repo/dwh/seg", "seg.sql",
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  TIMESTAMP '{report_date} 00:00:00' AS __transform_dt,
        |  TIMESTAMP '{report_date} 00:00:00' AS __load_dt,
        |  CAST(0 AS BIGINT) AS __seqno, 'A' AS __record_state
        |FROM cust GROUP BY c_mktsegment""".stripMargin)
    write(s"$work/repo/dwh/seg", "config.yaml",
      """- dependencies:
        |    - source: datalake
        |      format: parquet
        |      alias: cust
        |      path: sf0.001/customer.parquet
        |  transform:
        |    full:
        |      - type: select
        |        sql: seg.sql
        |        parameters:
        |          - name: report_date
        |            type: report_date
        |  target:
        |    target_schema: dwh
        |    target_table_name: seg_counts""".stripMargin)
    new FileWarehouse(spark, s"$work/wh")
      .registerPrimaryKey("dwh", "seg_counts", Seq("c_mktsegment"))
    val env = Map(
      "GRAFT_SQL_ROOT" -> s"$work/repo",
      "GRAFT_LAKE" -> "/root/testdata",
      "GRAFT_WAREHOUSE" -> s"$work/wh",
      "REPORT_DATE" -> "1998-09-01")
    val id = RunTask.run(spark, List("transform", "dwh/seg"), env)
    assert(id === "task_transform_dwh_seg_full")
    val master = new FileWarehouse(spark, s"$work/wh").read("dwh", "seg_counts")
    assert(master.count() > 0 && master.columns.contains("c_mktsegment"))
  }

  test("RunTask extract: JDBC source to lake path with reference write-mode defaulting") {
    val url = "jdbc:derby:memory:graftrtask;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("""CREATE TABLE APP.SRC ("id" INT NOT NULL PRIMARY KEY, "v" VARCHAR(8))""")
      st.execute("INSERT INTO APP.SRC VALUES (1,'a'), (2,'b'), (3,'c')")
      st.close()
    } finally c.close()
    val work = SparkTestBase.tmpDir("graft_runtask_ex")
    write(s"$work/repo", "src-full.sql", "SELECT * FROM APP.SRC")
    val env = Map(
      "GRAFT_SQL_ROOT" -> s"$work/repo",
      "GRAFT_LAKE" -> s"$work/lake",
      "GRAFT_WAREHOUSE" -> s"$work/wh",
      "MAIN_FLEX_CONN" -> "url: jdbc:derby:memory:graftrtask\ndialect: generic")
    val id = RunTask.run(spark,
      List("extract", "FLEX", "MAIN", "app", "SRC", "--query", "src-full.sql"), env)
    assert(id === "task_extract_flex_main_src_full")
    // lake path uses the lowercased convention (airflow_etl.py:433-439)
    val extracted = spark.read.parquet(s"$work/lake/datalake/flex/main/app/src")
    assert(extracted.count() === 3)
  }

  test("tracked delta extract: bootstrap, boundary dedup, late same-valued commit, durable marks") {
    val url = "jdbc:derby:memory:graftwm;create=true"
    def exec(sql: String*): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val st = c.createStatement(); sql.foreach(st.execute); st.close() }
      finally c.close()
    }
    // watermark column "ts" is deliberately NOT the PK: a late commit can
    // share the mark value with already-landed rows (same-second commits)
    exec("""CREATE TABLE APP.INC ("id" INT NOT NULL PRIMARY KEY, "ts" INT, "v" VARCHAR(8))""",
      "INSERT INTO APP.INC VALUES (1,1,'a'), (2,2,'b'), (3,3,'c')")
    val work = SparkTestBase.tmpDir("graft_wm")
    val ctx = EtlContext(spark, Lake(s"$work/lake"),
      new FileWarehouse(spark, s"$work/wh"),
      variables = Map("MAIN_FLEX_CONN" -> "url: jdbc:derby:memory:graftwm\ndialect: generic"))
    val task = Tasks.extractDbTracked(ctx, "FLEX", "MAIN", "app", "inc",
      "SELECT * FROM APP.INC", "ts")
    assert(task.id === "task_extract_flex_main_inc_delta")
    val wm = graft.io.Watermarks(s"$work/lake")
    val lakePath = s"$work/lake/datalake/flex/main/app/inc"
    def landedIds: Seq[Int] =
      spark.read.parquet(lakePath).select("id").as[Int].collect().sorted.toSeq

    task.run() // bootstrap: no mark -> full read, overwrite landing
    assert(landedIds === Seq(1, 2, 3))
    assert(wm.get(spark, "flex/main/app/inc") === Some("3"))

    exec("INSERT INTO APP.INC VALUES (4,4,'d'), (5,5,'e')")
    task.run() // delta ts >= 3: boundary row 3 re-extracted but dedup'd at landing
    assert(landedIds === Seq(1, 2, 3, 4, 5),
      "delta run lands every new row exactly once — the re-extracted boundary " +
        "row is anti-joined away")
    assert(wm.get(spark, "flex/main/app/inc") === Some("5"))

    task.run() // steady-state no-op: NOTHING lands, mark untouched
    assert(landedIds === Seq(1, 2, 3, 4, 5),
      "a no-op run must not grow the landing (the round-7 inclusive-boundary leak)")
    assert(wm.get(spark, "flex/main/app/inc") === Some("5"))

    // late commit AT the mark value (same-second timestamp): must land —
    // the at-least-once half of the inclusive-boundary contract
    exec("INSERT INTO APP.INC VALUES (6,5,'f')")
    task.run()
    assert(landedIds === Seq(1, 2, 3, 4, 5, 6),
      "a late commit sharing the mark value must not be silently lost")
    assert(wm.get(spark, "flex/main/app/inc") === Some("5"))

    exec("INSERT INTO APP.INC VALUES (7,6,'g')")
    task.run() // normal advance past the crowded boundary
    assert(landedIds === Seq(1, 2, 3, 4, 5, 6, 7))
    assert(wm.get(spark, "flex/main/app/inc") === Some("6"))
  }

  test("run ledger: every completed run appends ONE row with landed counts; RunTask echoes it") {
    import graft.exec.RunLedger
    val url = "jdbc:derby:memory:graftledger;create=true"
    def exec(sql: String*): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val st = c.createStatement(); sql.foreach(st.execute); st.close() }
      finally c.close()
    }
    exec("""CREATE TABLE APP.LED ("id" INT NOT NULL PRIMARY KEY, "ts" INT, "v" VARCHAR(8))""",
      "INSERT INTO APP.LED VALUES (1,1,'a'), (2,2,'b'), (3,3,'c')")
    val work = SparkTestBase.tmpDir("graft_ledger")
    val ctx = EtlContext(spark, Lake(s"$work/lake"),
      new FileWarehouse(spark, s"$work/wh"),
      variables = Map("MAIN_FLEX_CONN" -> "url: jdbc:derby:memory:graftledger\ndialect: generic"),
      dumpDir = s"$work/dump")
    val task = Tasks.extractDbTracked(ctx, "FLEX", "MAIN", "app", "led",
      "SELECT * FROM APP.LED", "ts")
    val dir = RunLedger.dirFor(ctx)

    task.run() // bootstrap: full read, 3 rows
    val l1 = RunLedger.read(spark, dir).collect()
    assert(l1.length === 1, "one completed run = exactly one ledger row")
    assert(l1(0).getAs[String]("task_id") === task.id)
    assert(l1(0).getAs[String]("kind") === "extract")
    assert(l1(0).getAs[Long]("rows_out") === 3L)
    assert(l1(0).getAs[String]("landed_path").endsWith("/lake/datalake/flex/main/app/led"))
    assert(l1(0).isNullAt(l1(0).fieldIndex("watermark")),
      "the bootstrap full read carries no watermark")
    assert(l1(0).getAs[Long]("wall_ms") >= 0L)

    exec("INSERT INTO APP.LED VALUES (4,4,'d'), (5,5,'e')")
    task.run() // delta ts >= 3: 2 genuinely new rows land (boundary dedup'd)
    val l2 = RunLedger.read(spark, dir).collect() // newest first
    assert(l2.length === 2, "a re-run appends, never overwrites (run history)")
    assert(l2(0).getAs[Long]("rows_out") === 2L,
      "rows_out is what actually landed after boundary dedup, not what was extracted")
    assert(l2(0).getAs[String]("watermark") === "ts >= 3")

    // the CLI echo renders the same newest row
    val line = RunTask.ledgerLine(ctx, task.id)
    assert(line.exists(s => s.contains(s"task_id=${task.id}") &&
      s.contains("rows_out=2") && s.contains("watermark=ts >= 3")),
      s"unexpected ledger echo: $line")
  }

  test("watermark advance reads only the newly-landed files (O(delta), not O(history))") {
    import graft.exec.PipelineRunner
    val work = SparkTestBase.tmpDir("graft_wm_files")
    // two separately-written files; the "old history" file holds the LARGER
    // ts — if maxOverFiles read anything beyond the given files, the result
    // would be 100, not 5
    Seq((1, 100)).toDF("id", "ts").coalesce(1).write.parquet(s"$work/t")
    val before = PipelineRunner.dataFiles(spark, s"$work/t")
    assert(before.size === 1)
    Seq((2, 5)).toDF("id", "ts").coalesce(1).write.mode("append").parquet(s"$work/t")
    val newFiles = (PipelineRunner.dataFiles(spark, s"$work/t") -- before).toSeq
    assert(newFiles.size === 1)
    assert(PipelineRunner.maxOverFiles(spark, newFiles, "ts") === Some("5"))
    assert(PipelineRunner.maxOverFiles(spark, Nil, "ts") === None)
  }

  test("watermarks: traversal keys rejected; swap-write survives a stale temp") {
    val work = SparkTestBase.tmpDir("graft_wm_safety")
    val wm = graft.io.Watermarks(s"$work/lake")
    intercept[IllegalArgumentException](wm.get(spark, "../../escape"))
    intercept[IllegalArgumentException](wm.set(spark, "/abs/key", "1"))
    intercept[IllegalArgumentException](wm.get(spark, "a//b"))
    // a temp left by a crashed writer must not break the next set; the
    // committed value is whole and the temp is gone afterwards
    wm.set(spark, "sys/tag/sch/t", "41")
    val dir = Paths.get(s"$work/lake/_watermarks/sys/tag/sch")
    Files.writeString(dir.resolve(".t.tmp"), "torn")
    wm.set(spark, "sys/tag/sch/t", "42")
    assert(wm.get(spark, "sys/tag/sch/t") === Some("42"))
    assert(!Files.exists(dir.resolve(".t.tmp")))
  }

  test("RunTask production defaults pin AQE coalescing + skew-join ON") {
    // cluster posture, asserted (not trusted to Spark-version defaults):
    // runtime re-plan is the pipeline path's skew/sizing answer, the
    // salted operators the deterministic alternative
    val d = RunTask.sessionDefaults.toMap
    assert(d("spark.sql.adaptive.enabled") === "true")
    assert(d("spark.sql.adaptive.coalescePartitions.enabled") === "true")
    assert(d("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(d.contains("spark.sql.shuffle.partitions") &&
      d("spark.sql.session.timeZone") === "UTC")
  }

  test("AQE under RunTask.sessionDefaults actually splits a skewed join (plan-level, not conf-level)") {
    // the conf test above pins the WIRING; this pins the BEHAVIOR: a
    // crafted hot-key join executed under the production defaults must
    // show skew=true in the final adaptive plan, so the conf can't rot
    // into a no-op (renamed key, AQE silently disabled upstream, ...)
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = RunTask.sessionDefaults.map(_._1) ++ Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      RunTask.sessionDefaults.foreach { case (k, v) => conf.set(k, v) }
      // shrink the skew thresholds to test scale: one ~6 MB hot
      // partition among KB-sized ones is "skewed" the same way one
      // 6 GB partition among MB-sized ones is in production
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      // the pad must SURVIVE column pruning (it's aggregated below) and
      // resist shuffle compression (hex digests), or the hot partition's
      // shuffle bytes fall under the skew threshold and nothing splits
      val left = spark.range(0, 100000).select(
        when(col("id") < 95000, 0L).otherwise(col("id") % 37 + 1).as("k"),
        sha2(col("id").cast("string"), 256).as("pad"))
      val right = spark.range(0, 40).toDF("k")
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"))
      // every left key (0 and 1..37) matches exactly one right row.
      // collect() on `joined` ITSELF: the skew split only exists in the
      // final adaptive plan of the executed QueryExecution
      assert(joined.collect()(0).getLong(0) === 100000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected the adaptive plan to take the skew-split path:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("RunTask rejects malformed invocations with actionable errors") {
    val env = Map("GRAFT_LAKE" -> "/x", "GRAFT_WAREHOUSE" -> "/x")
    val usage = intercept[ConfigException](RunTask.run(spark, List("frobnicate"), env))
    assert(usage.getMessage.contains("usage:"))
    val noEnv = intercept[ConfigException](
      RunTask.run(spark, List("transform", "t"), Map("GRAFT_LAKE" -> "/x")))
    assert(noEnv.getMessage.contains("GRAFT_WAREHOUSE"))
    val noQuery = intercept[ConfigException](
      RunTask.run(spark, List("extract", "s", "t", "sch", "tbl"), env))
    assert(noQuery.getMessage.contains("--query"))
    val dangling = intercept[ConfigException](
      RunTask.run(spark, List("transform", "t", "--read"), env))
    assert(dangling.getMessage.contains("--read"))
  }
}
