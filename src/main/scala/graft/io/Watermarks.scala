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
  * Values are stored as strings; the extract predicate casts the
  * literal back to the watermark column's own type before comparing
  * (an implicit string-vs-bigint coercion would go through double and
  * lose precision past 2^53) — correct for numeric, date, and
  * timestamp columns (the monotone kinds a watermark is).
  */
final case class Watermarks(root: String) {

  private def path(key: String): org.apache.hadoop.fs.Path = {
    // keys come from CLI-supplied system/schema/table names: beyond the
    // character allowlist, reject '..' segments and absolute keys so a
    // hostile name can never escape <root>/_watermarks/
    require(key.matches("[A-Za-z0-9_./-]+"), s"unsafe watermark key: '$key'")
    require(!key.startsWith("/") && !key.split('/').contains("..") && !key.split('/').contains(""),
      s"watermark key must be a relative path without '..' or empty segments: '$key'")
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

  /** Record a new mark. Write-temp-then-rename (the same swap pattern as
    * the file warehouse): a crash mid-write leaves the previous mark
    * intact instead of a torn file — the reader never observes a partial
    * value. On filesystems where rename-over-existing is not atomic the
    * old file is deleted first; the worst crash outcome is then a MISSING
    * mark, which the tracked loop treats as "bootstrap again" — safe,
    * because the merge is the dedup boundary.
    */
  def set(spark: SparkSession, key: String, value: String): Unit = {
    val p = path(key)
    val f = fs(spark, p)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"watermark swap failed: $tmp -> $p")
  }
}
