package graft.config

import org.yaml.snakeyaml.{LoaderOptions, Yaml => SnakeYaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** config.yaml parser (reference schema: README.md:86-195; parse site
  * airflow_etl.py:680-685). Uses SnakeYAML's SafeConstructor (no
  * arbitrary object instantiation) and converts to the typed model with
  * eager validation.
  */
object Yaml {

  def parsePipeline(yamlText: String): PipelineConfig = {
    val loader = new SnakeYaml(new SafeConstructor(new LoaderOptions))
    val root = loader.load[Any](yamlText)
    val tables = asList(root, "top level").map(t => parseTable(asMap(t, "table config")))
    PipelineConfig(tables)
  }

  def parsePipelineFile(path: String): PipelineConfig =
    parsePipeline(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  private def parseTable(m: Map[String, Any]): TableConfig = {
    val deps = m.get("dependencies").map(asList(_, "dependencies"))
      .getOrElse(Nil).map(d => parseDependency(asMap(d, "dependency")))
    val migration = m.get("migration").map(v => SqlSource.File(str(v)))
    val transform: Map[ReadMode, Seq[Step]] =
      m.get("transform").map(asMap(_, "transform")).getOrElse(Map.empty)
        .map { case (mode, steps) =>
          ReadMode.parse(mode) ->
            asList(steps, s"transform.$mode").map(s => parseStep(asMap(s, "step")))
        }
    val target = m.get("target").map(asMap(_, "target")).map { t =>
      Target(
        schema = reqStr(t, "target_schema", "target"),
        table = reqStr(t, "target_table_name", "target"))
    }
    TableConfig(deps, migration, transform, target)
  }

  private def parseDependency(m: Map[String, Any]): Dependency =
    Dependency(
      source = reqStr(m, "source", "dependency"),
      format = reqStr(m, "format", "dependency"),
      alias = reqStr(m, "alias", "dependency"),
      sourceSystemName = m.get("source_system_name").map(str),
      sourceSystemTag = m.get("source_system_tag").map(str),
      schema = m.get("schema").map(str),
      tableName = m.get("table_name").map(str),
      path = m.get("path").map(str)
    ).validated

  private def parseStep(m: Map[String, Any]): Step = {
    val params = m.get("parameters").map(asList(_, "parameters"))
      .getOrElse(Nil).map(p => parseParam(asMap(p, "parameter")))
    reqStr(m, "type", "step") match {
      case "select" =>
        Step.Select(
          sql = SqlSource.File(reqStr(m, "sql", "select step")),
          engine = m.get("engine").map(v => Engine.parse(str(v))).getOrElse(Engine.Local),
          parameters = params,
          cache = m.get("cache").map(asMap(_, "cache")).map { c =>
            CacheSpec(reqStr(c, "alias", "cache"), c.get("cache_dir").map(str))
          })
      case "sql script" =>
        // engine is warehouse-only for script steps (airflow_etl.py:604-605)
        m.get("engine").map(v => Engine.parse(str(v))).foreach { e =>
          if (e != Engine.Warehouse)
            throw new ConfigException(
              "'sql script' steps only support the warehouse engine")
        }
        Step.SqlScript(SqlSource.File(reqStr(m, "sql", "sql script step")), params)
      case "python" | "fn" =>
        // reference 'python' step (exec of a file) becomes a named fn step
        Step.Fn(m.get("fn").map(str)
          .orElse(m.get("python_file").map(str))
          .getOrElse(throw new ConfigException("fn step requires 'fn' (or 'python_file') name")))
      case other => throw new ConfigException(s"Invalid step type: '$other'")
    }
  }

  private def parseParam(m: Map[String, Any]): Param = {
    val name = reqStr(m, "name", "parameter")
    reqStr(m, "type", "parameter") match {
      case "report_date" => Param.ReportDate(name)
      case "constant" =>
        Param.Constant(name, str(m.getOrElse("value",
          throw new ConfigException(s"constant parameter '$name' requires 'value'"))))
      case other => throw new ConfigException(s"Invalid parameter type: '$other'")
    }
  }

  // ---- untyped-tree helpers -------------------------------------------
  private def asList(v: Any, where: String): Seq[Any] = v match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => throw new ConfigException(s"$where: expected a list, got null")
    case other => throw new ConfigException(
      s"$where: expected a list, got ${other.getClass.getSimpleName}")
  }
  private def asMap(v: Any, where: String): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> (vv: Any) }.toMap
    case null => throw new ConfigException(s"$where: expected a mapping, got null")
    case other => throw new ConfigException(
      s"$where: expected a mapping, got ${other.getClass.getSimpleName}")
  }
  private def str(v: Any): String = String.valueOf(v)
  private def reqStr(m: Map[String, Any], key: String, where: String): String =
    m.get(key).map(str).filter(_.nonEmpty).getOrElse(
      throw new ConfigException(s"$where: missing required key '$key'"))
}
