package graft.testlake

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** A REAL ServiceLoader-registered Spark DataSource — the exact SPI
  * (`DataSourceRegister` via `META-INF/services`) that Hudi, Delta, and
  * Iceberg register through — used to prove [[graft.io.Lake]]'s format
  * passthrough end-to-end: `Lake.read/write(..., "demolake")` must
  * resolve THIS class by short name and round-trip data through it,
  * demonstrating "an existing connector-format lake is one jar away"
  * with an actual pluggable connector rather than only the missing-jar
  * error path. Test scope only: the public connector jars themselves
  * are not resolvable in this offline build (no new libraryDependencies
  * can resolve), so this connector stands in at the same seam.
  *
  * Storage delegates to parquet under `<path>/data`; a `_demolake`
  * marker file proves the connector — not a builtin branch — handled
  * the write.
  */
class DemoLakeSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "demolake"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters("path")
    val df = ctx.sparkSession.read.parquet(s"$path/data")
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = parameters("path")
    data.write.mode(mode).parquet(s"$path/data")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(ctx.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_demolake"), true)
    try out.write("demolake".getBytes("UTF-8")) finally out.close()
    createRelation(ctx, parameters)
  }
}
