package graft.exec

import graft.config._

/** A named, self-contained unit of scheduler work: the rebuild of the
  * reference's Airflow task (a `PythonOperator` wrapping one extract or
  * transform call, airflow_etl.py:515-525, :762-771) with the DAG layer
  * removed. `id` reproduces the reference's task-id naming exactly, so
  * an existing DAG's node names carry over; `run()` executes the unit.
  * Any orchestrator — Airflow (BashOperator/SparkSubmitOperator), cron,
  * dagster — maps one DAG node to one [[graft.RunTask]] invocation.
  */
final case class EtlTask(id: String, run: () => Unit)

/** Task factories (reference: `AirflowETL.extract_db`
  * airflow_etl.py:486-538, `AirflowETL.transform_db` :736-774). The
  * factories validate modes and fix naming/default rules at BUILD time
  * (like the reference, which resolves them in the scheduler process
  * before any worker runs), returning an [[EtlTask]] that does the work
  * when the orchestrator says so.
  */
object Tasks {

  /** Reference naming: lowercased parts joined as
    * `task_extract_<system>_<tag>_<table>_<read_mode>`
    * (airflow_etl.py:505-514).
    */
  def extractTaskId(systemName: String, systemTag: String, table: String,
                    readMode: ReadMode): String =
    s"task_extract_${systemName.toLowerCase}_${systemTag.toLowerCase}_" +
      s"${table.toLowerCase}_${readMode.name}"

  /** Reference naming: `task_transform_<folder with / -> _>_<read_mode>`
    * (airflow_etl.py:759-761).
    */
  def transformTaskId(tableFolder: String, readMode: ReadMode): String =
    s"task_transform_${tableFolder.replace('/', '_')}_${readMode.name}"

  /** Build the extract task (EP1). Write-mode defaulting happens here,
    * at build time, like the reference (full→overwrite, delta→append;
    * airflow_etl.py:497-503); a delta read without a watermark fails at
    * RUN time (the watermark value is per-run state, not task shape).
    */
  def extractDb(ctx: EtlContext, systemName: String, systemTag: String,
                schema: String, table: String, query: String,
                readMode: ReadMode = ReadMode.Full,
                writeMode: Option[WriteMode] = None,
                delta: Option[PipelineRunner.DeltaSpec] = None): EtlTask = {
    val id = extractTaskId(systemName, systemTag, table, readMode)
    EtlTask(id, () =>
      PipelineRunner.extractDb(ctx.copy(taskId = id),
        systemName.toLowerCase, systemTag.toLowerCase,
        schema.toLowerCase, table.toLowerCase, query,
        readMode, writeMode, delta))
  }

  /** Build the WATERMARK-TRACKED delta extract task: the delta loop
    * driven by the durable [[graft.io.Watermarks]] store
    * ([[PipelineRunner.extractDbDeltaTracked]]) — no per-run watermark
    * argument; the task is rerunnable as-is on any schedule.
    */
  def extractDbTracked(ctx: EtlContext, systemName: String, systemTag: String,
                       schema: String, table: String, query: String,
                       column: String): EtlTask = {
    val id = extractTaskId(systemName, systemTag, table, ReadMode.Delta)
    EtlTask(id, () =>
      PipelineRunner.extractDbDeltaTracked(ctx.copy(taskId = id),
        systemName.toLowerCase, systemTag.toLowerCase,
        schema.toLowerCase, table.toLowerCase, query, column))
  }

  /** Build the transform task (EP2): the table folder holds
    * `config.yaml` (+ sql files + optional `migration.sql`), resolved
    * under the context's sqlRoot like the reference resolves under its
    * etl folder (airflow_etl.py:676-685). Mode validation is the
    * factory's job (airflow_etl.py:752-757) — a bad mode must fail when
    * the DAG is BUILT, not at 2am when the task fires.
    */
  def transformDb(ctx: EtlContext, tableFolder: String,
                  readMode: ReadMode = ReadMode.Full,
                  writeMode: WriteMode = WriteMode.Overwrite,
                  mergeMode: MergeMode = MergeMode.Full): EtlTask = {
    val id = transformTaskId(tableFolder, readMode)
    val base = ctx.sqlRoot.getOrElse(
      throw new ConfigException("transformDb task requires sqlRoot (the config repository)"))
    val folder = java.nio.file.Paths.get(base, tableFolder).toString
    EtlTask(id, () => {
      val cfg = Yaml.parsePipelineFile(
        java.nio.file.Paths.get(folder, "config.yaml").toString)
      PipelineRunner.run(ctx.copy(sqlRoot = Some(folder), taskId = id),
        cfg, readMode, writeMode, mergeMode)
    })
  }
}
