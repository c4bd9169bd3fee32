package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config._
import graft.exec.Params

class ConfigSpec extends AnyFunSuite {

  val yaml =
    """- dependencies:
      |    - source: datalake
      |      source_system_name: flexcube
      |      source_system_tag: main
      |      schema: ociuz
      |      table_name: gltb
      |      format: hudi
      |      alias: fc_saldo
      |    - source: datalake
      |      format: csv
      |      path: datalake/mapping/m.csv
      |      alias: mapping
      |  migration: migration.sql
      |  transform:
      |    full:
      |      - type: select
      |        sql: transform1.sql
      |        engine: spark
      |        parameters:
      |          - name: report_date
      |            type: report_date
      |          - name: lim
      |            type: constant
      |            value: "100"
      |        cache:
      |          alias: table_1
      |          cache_dir: /tmp/cache1
      |      - type: fn
      |        fn: enrich
      |  target:
      |    target_schema: dwh
      |    target_table_name: saldo
      |""".stripMargin

  test("parses full reference-shaped config") {
    val cfg = Yaml.parsePipeline(yaml)
    assert(cfg.tables.size == 1)
    val t = cfg.tables.head
    assert(t.dependencies.map(_.alias) == Seq("fc_saldo", "mapping"))
    assert(t.dependencies.head.format == "hudi")
    assert(t.dependencies(1).path.contains("datalake/mapping/m.csv"))
    assert(t.migration.contains(SqlSource.File("migration.sql")))
    val steps = t.transform(ReadMode.Full)
    assert(steps.size == 2)
    val sel = steps.head.asInstanceOf[Step.Select]
    assert(sel.engine == Engine.Local)
    assert(sel.parameters == Seq(Param.ReportDate("report_date"), Param.Constant("lim", "100")))
    assert(sel.cache.contains(CacheSpec("table_1", Some("/tmp/cache1"))))
    assert(steps(1) == Step.Fn("enrich"))
    assert(t.target.contains(Target("dwh", "saldo")))
    assert(t.target.get.journalTable == "saldo__journal")
  }

  test("rejects invalid source/format/alias combos (reference validation)") {
    // jdbc only from warehouse source
    assertThrows[ConfigException](
      Dependency("datalake", "jdbc", "x", path = Some("p")).validated)
    // warehouse source only jdbc format
    assertThrows[ConfigException](
      Dependency("greenplum", "hudi", "x",
        Some("s"), Some("t"), Some("sch"), Some("tbl")).validated)
    // missing alias
    assertThrows[ConfigException](
      Dependency("datalake", "csv", "", path = Some("p")).validated)
    // neither path nor full address
    assertThrows[ConfigException](
      Dependency("datalake", "hudi", "a", Some("sys"), None, None, None).validated)
    // bad format
    assertThrows[ConfigException](
      Dependency("datalake", "avro", "a", path = Some("p")).validated)
  }

  test("rejects invalid modes and step types") {
    assertThrows[ConfigException](ReadMode.parse("sometimes"))
    assertThrows[ConfigException](WriteMode.parse("merge"))
    assertThrows[ConfigException](MergeMode.parse("upsert"))
    assertThrows[ConfigException](Engine.parse("duckdb"))
    assertThrows[ConfigException](
      Yaml.parsePipeline("- transform:\n    full:\n      - type: shell\n        sql: x.sql"))
    // sql script steps cannot run on the local engine (airflow_etl.py:604-605)
    assertThrows[ConfigException](
      Yaml.parsePipeline(
        "- transform:\n    full:\n      - type: sql script\n        sql: x.sql\n        engine: spark"))
  }

  test("param substitution: python-format semantics") {
    val vars = Map("REPORT_DATE" -> "2024-06-30")
    val params = Seq(Param.ReportDate("report_date"), Param.Constant("lim", "10"))
    assert(Params.fill("WHERE d >= '{report_date}' LIMIT {lim}", params, vars) ==
      "WHERE d >= '2024-06-30' LIMIT 10")
    // literal braces escape
    assert(Params.fill("SELECT '{{json}}' AS j, {lim} AS l", params, vars) ==
      "SELECT '{json}' AS j, 10 AS l")
    // unknown placeholder fails
    assertThrows[Params.MissingParamException](
      Params.fill("SELECT {nope}", params, vars))
    // report_date without the variable fails
    assertThrows[IllegalStateException](
      Params.fill("{report_date}", Seq(Param.ReportDate("report_date")), Map.empty))
  }

  test("connection yaml `options:` map becomes extraOptions, applied to jdbc") {
    val c = graft.io.Connections.parse(
      """url: jdbc:oracle:thin:@h:1521/db
        |username: u
        |dialect: oracle
        |options:
        |  sessionInitStatement: ALTER SESSION SET NLS_DATE_FORMAT='YYYY-MM-DD'
        |  tcpKeepAlive: "true"""".stripMargin)
    assert(c.extraOptions === Map(
      "sessionInitStatement" -> "ALTER SESSION SET NLS_DATE_FORMAT='YYYY-MM-DD'",
      "tcpKeepAlive" -> "true"))
    // oracle dialect defaults DATE fidelity (reference connector.py:43-44)...
    assert(c.jdbcOptions("oracle.jdbc.mapDateToTimestamp") === "false")
    assert(c.jdbcOptions("tcpKeepAlive") === "true")
    // ...but an explicit user option wins over the dialect default
    val widened = c.copy(extraOptions = Map("oracle.jdbc.mapDateToTimestamp" -> "true"))
    assert(widened.jdbcOptions("oracle.jdbc.mapDateToTimestamp") === "true")
    // non-oracle dialects get no oracle knobs
    assert(!graft.io.Connections.parse("url: jdbc:postgresql://h/db")
      .jdbcOptions.contains("oracle.jdbc.mapDateToTimestamp"))
    // options must be a map
    assertThrows[IllegalArgumentException](
      graft.io.Connections.parse("url: x\noptions: notamap"))
    // a bare `options:` key (null value) means no extras, not an error
    assert(graft.io.Connections.parse("url: x\noptions:").extraOptions === Map.empty)
  }

  test("connection registry parses <TAG>_<SYSTEM>_CONN yaml") {
    val vars = Map(
      "MAIN_GP_CONN" -> "url: jdbc:postgresql://h:5432/db\nusername: u\npassword: p",
      "MAIN_SPARK_BATCH_SIZE" -> "5000")
    val c = graft.io.Connections.get(vars, "gp", "main")
    assert(c.url == "jdbc:postgresql://h:5432/db")
    assert(c.username == "u")
    assert(c.batchSize.contains(5000))
    assertThrows[IllegalArgumentException](graft.io.Connections.get(vars, "gp", "dev"))
  }
}
