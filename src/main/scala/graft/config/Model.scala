package graft.config

/** Typed configuration model for transform pipelines.
  *
  * Mirrors the reference's `config.yaml` schema
  * (reference: README.md:86-195, airflow_etl.py:680-685) as Scala case
  * classes, with all validation performed at parse time instead of run
  * time (reference validates lazily at airflow_etl.py:328-341, :417-418,
  * :752-757).
  */
sealed trait ReadMode { def name: String }
object ReadMode {
  case object Full extends ReadMode { val name = "full" }
  case object Delta extends ReadMode { val name = "delta" }
  case object Manual extends ReadMode { val name = "manual" }
  val all: Seq[ReadMode] = Seq(Full, Delta, Manual)
  def parse(s: String): ReadMode =
    all.find(_.name == s).getOrElse(throw new ConfigException(
      s"Invalid read_mode: '$s' (expected one of ${all.map(_.name).mkString("/")})"))
}

sealed trait WriteMode { def name: String }
object WriteMode {
  case object Append extends WriteMode { val name = "append" }
  case object Overwrite extends WriteMode { val name = "overwrite" }
  val all: Seq[WriteMode] = Seq(Append, Overwrite)
  def parse(s: String): WriteMode =
    all.find(_.name == s).getOrElse(throw new ConfigException(
      s"Invalid write_mode: '$s' (expected one of ${all.map(_.name).mkString("/")})"))
}

sealed trait MergeMode { def name: String }
object MergeMode {
  case object Full extends MergeMode { val name = "full" }
  case object Delta extends MergeMode { val name = "delta" }
  val all: Seq[MergeMode] = Seq(Full, Delta)
  def parse(s: String): MergeMode =
    all.find(_.name == s).getOrElse(throw new ConfigException(
      s"Invalid merge_mode: '$s' (expected one of ${all.map(_.name).mkString("/")})"))
}

/** Execution engine for a SQL step (reference: airflow_etl.py:249-262).
  * `Local` = the Spark session ("spark"); `Warehouse` = whole-query
  * pushdown to the warehouse DB ("greenplum" in the reference).
  */
sealed trait Engine { def name: String }
object Engine {
  case object Local extends Engine { val name = "spark" }
  case object Warehouse extends Engine { val name = "warehouse" }
  def parse(s: String): Engine = s match {
    case "spark"                   => Local
    case "warehouse" | "greenplum" => Warehouse // reference spelling accepted
    case other => throw new ConfigException(s"Invalid engine: '$other'")
  }
}

/** SQL parameter (reference: airflow_etl.py:378-399).
  * `ReportDate` resolves from the context variable REPORT_DATE;
  * `Constant` carries its value inline.
  */
sealed trait Param { def name: String }
object Param {
  final case class ReportDate(name: String) extends Param
  final case class Constant(name: String, value: String) extends Param
}

/** Step-result materialization config (reference: airflow_etl.py:263-269;
  * default dir airflow_etl.py:573-575). Cuts lineage and forces
  * once-only compute by writing ORC and re-reading.
  */
final case class CacheSpec(alias: String, cacheDir: Option[String] = None)

/** A transform step (reference step types at airflow_etl.py:645-660). */
sealed trait Step
object Step {
  /** `type: select` — SQL that returns data (airflow_etl.py:540-591). */
  final case class Select(
      sql: SqlSource,
      engine: Engine = Engine.Local,
      parameters: Seq[Param] = Nil,
      cache: Option[CacheSpec] = None)
    extends Step

  /** `type: sql script` — side-effect DDL/DML on the warehouse only
    * (airflow_etl.py:593-625; engine guard :604-605).
    */
  final case class SqlScript(
      sql: SqlSource,
      parameters: Seq[Param] = Nil)
    extends Step

  /** `type: python` in the reference (airflow_etl.py:627-641, arbitrary
    * `exec()`): rebuilt as a *registered named Scala function* so an
    * unknown name fails at parse time, not run time.
    */
  final case class Fn(name: String) extends Step
}

/** SQL text either inline or from a file under the pipeline folder. */
sealed trait SqlSource
object SqlSource {
  final case class Inline(text: String) extends SqlSource
  final case class File(relPath: String) extends SqlSource
}

/** A pipeline dependency (reference: airflow_etl.py:299-375;
  * README.md:100-130). Validation matches airflow_etl.py:328-341.
  */
final case class Dependency(
    source: String, // "datalake" | "warehouse" ("greenplum" accepted)
    format: String, // "hudi" | "csv" | "jdbc" | "parquet" | "orc" | "json" | "warc"
    alias: String,
    sourceSystemName: Option[String] = None,
    sourceSystemTag: Option[String] = None,
    schema: Option[String] = None,
    tableName: Option[String] = None,
    path: Option[String] = None) {

  def validated: Dependency = {
    val src = if (source == "greenplum") "warehouse" else source
    if (src != "datalake" && src != "warehouse")
      throw new ConfigException(s"Invalid source type: '$source'")
    val fmts = Set("jdbc", "hudi", "csv", "parquet", "orc", "json", "warc")
    if (!fmts.contains(format))
      throw new ConfigException(s"Invalid format: '$format'")
    if (format == "jdbc" && src != "warehouse")
      throw new ConfigException(
        "'jdbc' dependency format is only supported for source type 'warehouse'.")
    if (src == "warehouse" && format != "jdbc")
      throw new ConfigException(
        s"'$format' format is not supported for '$source' source type.")
    if (alias == null || alias.isEmpty)
      throw new ConfigException(s"Invalid alias: '$alias'")
    val hasPath = src == "datalake" && path.isDefined
    val hasAddr = sourceSystemName.exists(_.nonEmpty) &&
      sourceSystemTag.exists(_.nonEmpty) && schema.exists(_.nonEmpty) &&
      tableName.exists(_.nonEmpty)
    if (!hasPath && !hasAddr)
      throw new ConfigException("Path or source info has to be specified.")
    copy(source = src)
  }
}

/** Warehouse target table (reference: README.md:189-192). The journal
  * table is `<targetTableName>__journal` (airflow_etl.py:719-726).
  */
final case class Target(schema: String, table: String) {
  def journalTable: String = table + "__journal"
}

/** One table's transform pipeline (one list element of config.yaml). */
final case class TableConfig(
    dependencies: Seq[Dependency] = Nil,
    migration: Option[SqlSource] = None,
    transform: Map[ReadMode, Seq[Step]] = Map.empty,
    target: Option[Target] = None)

/** A whole config.yaml: list of table configs. */
final case class PipelineConfig(tables: Seq[TableConfig])

class ConfigException(msg: String) extends RuntimeException(msg)
