package graft

import org.apache.spark.sql.SparkSession
import graft.config._
import graft.exec.{EtlContext, PipelineRunner, Tasks}
import graft.io.{Connections, FileWarehouse, JdbcWarehouse, Lake}

/** Scheduler entrypoint — the deployment story the reference delegates
  * to Airflow (`AirflowETL` returning `PythonOperator`s,
  * airflow_etl.py:486-538/:736-774), re-expressed so ANY orchestrator
  * works: each DAG node shells out one
  *
  * {{{
  * spark-submit --class graft.RunTask app.jar \
  *   transform <tableFolder> [--read full|delta|manual] \
  *     [--write overwrite|append] [--merge full|delta]
  * spark-submit --class graft.RunTask app.jar \
  *   extract <system> <tag> <schema> <table> --query <sql-file> \
  *     [--read full|delta] [--write overwrite|append] \
  *     [--delta-column c --delta-last v]
  * }}}
  *
  * Environment (the reference's Airflow Variables become env vars,
  * which every scheduler can set per run):
  *   - GRAFT_SQL_ROOT    config/sql repository (reference etl folder)
  *   - GRAFT_LAKE        lake root path
  *   - GRAFT_WAREHOUSE   file-warehouse root, OR `jdbc:<SYS>:<TAG>` to
  *     resolve a JDBC warehouse from `<TAG>_<SYS>_CONN` like every
  *     other connection (connector.py:6-17)
  *   - REPORT_DATE, `<TAG>_<SYSTEM>_CONN`, ... — forwarded verbatim as
  *     pipeline variables.
  *
  * The task id (reference naming, e.g.
  * `task_transform_dwh_orders_full`) is printed on completion so
  * orchestrator logs line up with the old DAG node names.
  */
object RunTask {

  /** Production session conf for the pipeline path. AQE is pinned ON
    * (explicitly, not by Spark-version default): at cluster scale
    * runtime statistics beat static planning — post-shuffle partition
    * coalescing right-sizes reducers per stage so `shuffle.partitions`
    * only needs to be a sane ceiling, and the skew-join split absorbs
    * hot keys the static plan cannot see. The deterministic salted
    * operators (`ext.Joins.saltedJoin`, the salted journal merge)
    * remain the explicit alternative where reproducible partitioning
    * matters more than adaptivity. Bench/Verify deliberately do NOT
    * share this conf: their plans are measurement artifacts and stay
    * pinned static.
    */
  private[graft] val sessionDefaults: Seq[(String, String)] = Seq(
    // the static width is only AQE's ceiling here; an explicit
    // SPARK_GRAFT_SHUFFLE_PARTITIONS raises it for known-large runs
    "spark.sql.shuffle.partitions" ->
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")),
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")

  def main(args: Array[String]): Unit = {
    val spark = sessionDefaults
      .foldLeft(SparkSession.builder()) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    try run(spark, args.toList, sys.env)
    finally spark.stop()
  }

  /** Separated from main for tests: same args/env contract, caller's
    * session.
    */
  def run(spark: SparkSession, args: List[String], env: Map[String, String]): String = {
    val (positional, flags) = parseArgs(args)
    def envReq(k: String): String = env.getOrElse(k,
      throw new ConfigException(s"missing required environment variable $k"))
    val warehouse = envReq("GRAFT_WAREHOUSE") match {
      case jdbc if jdbc.startsWith("jdbc:") =>
        jdbc.stripPrefix("jdbc:").split(':') match {
          case Array(sysName, tag) =>
            new JdbcWarehouse(spark, Connections.get(env, sysName, tag))
          case _ => throw new ConfigException(
            s"GRAFT_WAREHOUSE jdbc form is jdbc:<SYSTEM>:<TAG>, got '$jdbc'")
        }
      case dir => new FileWarehouse(spark, dir)
    }
    val ctx = EtlContext(
      spark = spark,
      lake = Lake(envReq("GRAFT_LAKE")),
      warehouse = warehouse,
      variables = env,
      sqlRoot = env.get("GRAFT_SQL_ROOT"))
    val readMode = ReadMode.parse(flags.getOrElse("read", "full"))
    val task = positional match {
      case "transform" :: tableFolder :: Nil =>
        Tasks.transformDb(ctx, tableFolder, readMode,
          WriteMode.parse(flags.getOrElse("write", "overwrite")),
          MergeMode.parse(flags.getOrElse("merge", "full")))
      case "extract" :: sysName :: tag :: schema :: table :: Nil =>
        val queryFile = flags.getOrElse("query",
          throw new ConfigException("extract requires --query <sql-file under GRAFT_SQL_ROOT>"))
        val query = ctx.sqlText(SqlSource.File(queryFile))
        (flags.get("delta-column"), flags.get("delta-last")) match {
          // no explicit watermark -> the durable-watermark loop
          case (Some(column), None) =>
            Tasks.extractDbTracked(ctx, sysName, tag, schema, table, query, column)
          case (Some(column), Some(last)) =>
            Tasks.extractDb(ctx, sysName, tag, schema, table, query,
              readMode, flags.get("write").map(WriteMode.parse),
              Some(PipelineRunner.DeltaSpec(column, last)))
          case (None, Some(_)) =>
            throw new ConfigException("--delta-last requires --delta-column <col>")
          case (None, None) =>
            Tasks.extractDb(ctx, sysName, tag, schema, table, query,
              readMode, flags.get("write").map(WriteMode.parse), None)
        }
      case other => throw new ConfigException(
        s"usage: transform <tableFolder> | extract <system> <tag> <schema> <table>; got: ${other.mkString(" ")}")
    }
    task.run()
    // the one stdout line an orchestrator health-checks on
    println(s"graft task ${task.id} completed")
    // echo this run's ledger row (newest row for the task id) so the
    // orchestrator log carries the run manifest without a lake query
    ledgerLine(ctx, task.id).foreach(println)
    task.id
  }

  /** The latest [[graft.exec.RunLedger]] row for a task id, rendered
    * for an orchestrator log. None when the task kind writes no ledger
    * row (e.g. a transform with no target).
    */
  private[graft] def ledgerLine(ctx: EtlContext, taskId: String): Option[String] = {
    import org.apache.spark.sql.functions.col
    scala.util.Try {
      graft.exec.RunLedger.read(ctx.spark, graft.exec.RunLedger.dirFor(ctx))
        .where(col("task_id") === taskId).limit(1).collect().headOption
    }.toOption.flatten.map { r =>
      s"graft ledger task_id=${r.getAs[String]("task_id")} " +
        s"kind=${r.getAs[String]("kind")} " +
        s"inputs=${r.getAs[Seq[String]]("inputs").mkString(";")} " +
        s"watermark=${Option(r.getAs[String]("watermark")).getOrElse("-")} " +
        s"rows_out=${r.getAs[Long]("rows_out")} " +
        s"landed=${r.getAs[String]("landed_path")} " +
        s"wall_ms=${r.getAs[Long]("wall_ms")}"
    }
  }

  /** `cmd a b --k v --k2 v2` → (List(cmd, a, b), Map(k->v, k2->v2)). */
  private def parseArgs(args: List[String]): (List[String], Map[String, String]) = {
    def loop(rest: List[String], pos: List[String],
             flags: Map[String, String]): (List[String], Map[String, String]) =
      rest match {
        case Nil => (pos.reverse, flags)
        case flag :: value :: tail if flag.startsWith("--") =>
          loop(tail, pos, flags + (flag.stripPrefix("--") -> value))
        case flag :: Nil if flag.startsWith("--") =>
          throw new ConfigException(s"flag $flag needs a value")
        case p :: tail => loop(tail, p :: pos, flags)
      }
    loop(args, Nil, Map.empty)
  }
}
