package graft.io

import org.yaml.snakeyaml.{LoaderOptions, Yaml => SnakeYaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** JDBC connection info (reference: connector.py:6-17, README.md:69-84).
  * The reference stores one YAML blob per connection in a variable named
  * `<TAG>_<SYSTEM>_CONN`; the rebuild keeps that contract but reads from
  * a plain `variables: Map[String,String]` (env/config-backed).
  */
final case class ConnInfo(
    url: String,
    username: String = "",
    password: String = "",
    driver: Option[String] = None,
    batchSize: Option[Int] = None, // reference: connector.py:34, <TAG>_SPARK_BATCH_SIZE
    fetchSize: Option[Int] = None, // reference: connector.py:35, <TAG>_SPARK_FETCH_SIZE
    /** `postgres` (reference target: information_schema introspection +
      * in-warehouse merge SQL) or `generic` (introspect via JDBC
      * DatabaseMetaData; merge runs Spark-side). */
    dialect: String = "postgres",
    /** Parallel-scan spec: without it a JDBC read is ONE task pulling the
      * whole table through one connection — a non-starter at scale
      * (the reference shares this flaw, connector.py:27-46). All four
      * options are required together by Spark's JDBC source. */
    partitionColumn: Option[String] = None,
    numPartitions: Option[Int] = None,
    lowerBound: Option[String] = None,
    upperBound: Option[String] = None,
    /** Arbitrary extra JDBC options (yaml key `options:`), passed
      * verbatim to every Spark JDBC read AND write on this connection —
      * the generic passthrough for dialect/driver-specific knobs
      * (`sessionInitStatement`, `oracle.jdbc.*`, `tcpKeepAlive`, ...).
      */
    extraOptions: Map[String, String] = Map.empty) {
  require(partitionColumn.isEmpty ||
    (numPartitions.nonEmpty && lowerBound.nonEmpty && upperBound.nonEmpty),
    "partitionColumn requires numPartitions, lowerBound and upperBound")

  /** Dialect defaults + user extras, in that order (extras win).
    *
    * Oracle: `oracle.jdbc.mapDateToTimestamp=false` by default — the
    * reference's one explicit type-fidelity rule (connector.py:43-44):
    * Oracle's JDBC driver historically maps DATE to TIMESTAMP, which
    * silently widens every DATE column on extract; the flag restores
    * ANSI DATE semantics. Override via `options:` if the widening is
    * actually wanted.
    */
  def jdbcOptions: Map[String, String] = {
    val dialectDefaults =
      if (dialect == "oracle") Map("oracle.jdbc.mapDateToTimestamp" -> "false")
      else Map.empty[String, String]
    dialectDefaults ++ extraOptions
  }

  /** Apply the partitioned-scan options to a JDBC reader. */
  def applyPartitioning(r: org.apache.spark.sql.DataFrameReader): org.apache.spark.sql.DataFrameReader =
    partitionColumn match {
      case Some(pc) => r
        .option("partitionColumn", pc)
        .option("numPartitions", numPartitions.get.toString)
        .option("lowerBound", lowerBound.get)
        .option("upperBound", upperBound.get)
      case None => r
    }
}

object Connections {

  /** Variable name convention from connector.py:12-13. */
  def varName(systemName: String, systemTag: String): String =
    s"${systemTag.toUpperCase}_${systemName.toUpperCase}_CONN"

  def get(variables: Map[String, String], systemName: String, systemTag: String): ConnInfo = {
    val key = varName(systemName, systemTag)
    val yamlText = variables.getOrElse(key,
      throw new IllegalArgumentException(s"connection variable '$key' is not set"))
    parse(yamlText,
      batch = variables.get(s"${systemTag.toUpperCase}_SPARK_BATCH_SIZE").map(_.toInt),
      fetch = variables.get(s"${systemTag.toUpperCase}_SPARK_FETCH_SIZE").map(_.toInt))
  }

  /** Parse the YAML connection blob (reference: connector.py:15-17).
    * A nested `options:` map becomes [[ConnInfo.extraOptions]].
    */
  def parse(yamlText: String, batch: Option[Int] = None, fetch: Option[Int] = None): ConnInfo = {
    val raw = new SnakeYaml(new SafeConstructor(new LoaderOptions))
      .load[java.util.Map[String, Any]](yamlText)
      .asScala.toMap
    val extra = raw.get("options") match {
      case Some(om: java.util.Map[_, _]) =>
        om.asScala.map { case (k, v) => String.valueOf(k) -> String.valueOf(v) }.toMap
      case Some(null) | None => Map.empty[String, String] // bare `options:` ≡ absent
      case Some(other) => throw new IllegalArgumentException(
        s"connection yaml 'options' must be a map, got: $other")
    }
    val m = (raw - "options").map { case (k, v) => k -> String.valueOf(v) }
    ConnInfo(
      url = m.getOrElse("url",
        throw new IllegalArgumentException("connection yaml missing 'url'")),
      username = m.getOrElse("username", ""),
      password = m.getOrElse("password", ""),
      driver = m.get("driver"),
      batchSize = batch,
      fetchSize = fetch,
      dialect = m.getOrElse("dialect", "postgres"),
      partitionColumn = m.get("partition_column"),
      numPartitions = m.get("num_partitions").map(_.toInt),
      lowerBound = m.get("lower_bound"),
      upperBound = m.get("upper_bound"),
      extraOptions = extra)
  }
}
