package graft.io

import org.apache.spark.sql.SparkSession

/** Durable extract watermarks — the per-(system, tag, schema, table)
  * high-water mark that turns delta extract into an OPERATIONAL loop
  * instead of an argument each run must remember. The reference
  * declares delta extract and raises NotImplementedError
  * (airflow_etl.py:452-463); the state it would have needed lives
  * here, as one tiny text file per key under `<root>/_watermarks/`
  * (the same Hadoop-FS single-file pattern as the file warehouse's PK
  * registry — works on any FS the lake lives on, S3 included).
  *
  * Values are stored as strings and compared by the extract predicate
  * after Spark coerces the literal to the watermark column's type —
  * correct for numeric, date, and timestamp columns (the monotone
  * kinds a watermark is).
  */
final case class Watermarks(root: String) {

  private def path(key: String): org.apache.hadoop.fs.Path = {
    require(key.matches("[A-Za-z0-9_./-]+"), s"unsafe watermark key: '$key'")
    new org.apache.hadoop.fs.Path(s"$root/_watermarks/$key")
  }

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Last recorded mark, or None before the first tracked extract. */
  def get(spark: SparkSession, key: String): Option[String] = {
    val p = path(key)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Record a new mark (single-file overwrite). */
  def set(spark: SparkSession, key: String, value: String): Unit = {
    val p = path(key)
    val f = fs(spark, p)
    val out = f.create(p, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }
}
