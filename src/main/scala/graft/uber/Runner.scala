package graft.uber

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession

/** Orchestration layer (SURVEY §2.10): dependency-ordered materialization of
  * ingest → models, the Spark equivalent of the reference's Dagster
  * `all_assets` job (reference `Dagster_Files/definitions.py:11-21`) +
  * `dbt build` (reference `Dagster_Files/dbt.py:9`).
  *
  * The reference's four process boundaries (Dagster→Airbyte→Postgres→GCS→
  * BigQuery) collapse into one driver: ingest writes the source tables,
  * transform materializes each model as a parquet table (the reference
  * materializes `table`, rebuilt per run — `dbt_project.yml:36-37`).
  * Scheduling stays out-of-process (cron → spark-submit), as in the
  * reference (`@daily` ScheduleDefinition).
  */
object Runner {

  /** Which form executes a model: the SQL twin (Catalyst SQL path) or the
    * DataFrame twin. Both are semantically identical (differential-tested);
    * SQL is the default to mirror the reference's dbt execution.
    */
  sealed trait Form
  case object SqlForm extends Form
  case object FrameForm extends Form

  def runModel(spark: SparkSession, m: Models.Model, form: Form = SqlForm): DataFrame =
    form match {
      case SqlForm => spark.sql(m.sql)
      case FrameForm => m.frame(spark)
    }

  /** Full pipeline: ingest CSVs, then materialize all six models as parquet
    * tables under `outDir` (overwrite per run). Returns row counts per model
    * (the reference's manual `SELECT COUNT(*)` check, automated).
    */
  def runAll(
      spark: SparkSession,
      csvDir: String,
      warehouseDir: String,
      outDir: String,
      form: Form = SqlForm): Map[String, Long] = {
    Ingest.ingestAll(spark, csvDir, warehouseDir)
    Models.all.map { m =>
      val df = runModel(spark, m, form)
      df.write.mode("overwrite").parquet(s"$outDir/${m.name}")
      m.name -> spark.read.parquet(s"$outDir/${m.name}").count()
    }.toMap
  }

  /** The `dbt test` half of `dbt build`: source-contract checks after
    * ingest, before transform. Returns all results; callers decide whether
    * a failure aborts (the CLI below does).
    */
  def runChecks(spark: SparkSession): Seq[Checks.CheckResult] =
    Checks.sourceChecks(spark)

  /** One daily-delta run: land the increment's fact partitions (dynamic
    * overwrite) and absorb them into every model through the partials
    * layer — scan(delta) + fold(grain) instead of runAll's full rebuild.
    * Requires a prior full build of `outDir` (Incremental.fullBuild or a
    * first runIncrement after it). Returns the restated months.
    */
  def runIncrement(
      spark: SparkSession,
      incCsvPath: String,
      warehouseDir: String,
      outDir: String): Seq[Option[Int]] = {
    val inc = Ingest.readCsv(spark, incCsvPath, Schemas.rawDataJanjune15)
    val months = Incremental.affectedMonths(inc)
    Ingest.ingestFactIncrement(spark, incCsvPath, warehouseDir)
    Incremental.applyIncrement(spark, outDir, months)
    months
  }

  /** Drop-folder increment processing — the scheduler-facing shape of the
    * Airbyte-sync-then-rebuild loop: each tick, any NEW `*.csv` under
    * `incDir` (by name, lexicographic = arrival order for timestamped
    * drops) is applied via [[runIncrement]]; processed names persist in
    * `stateFile` so restarts do not replay. Returns the files applied
    * this call.
    */
  def processNewIncrements(
      spark: SparkSession,
      incDir: String,
      warehouseDir: String,
      outDir: String,
      stateFile: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val statePath = Paths.get(stateFile)
    val done: Set[String] =
      if (Files.exists(statePath))
        Files.readAllLines(statePath).asScala.map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val dir = Paths.get(incDir)
    val fresh =
      if (!Files.isDirectory(dir)) Seq.empty[String]
      else Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".csv") && !done.contains(n))
        .toSeq.sorted
    fresh.foreach { n =>
      runIncrement(spark, s"$incDir/$n", warehouseDir, outDir)
      // append AFTER the increment lands: a crash mid-file replays that
      // file next tick, and both halves are idempotent re-overwrites
      Files.writeString(statePath, n + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    fresh
  }

  /** CLI: Runner <csvDir> <warehouseDir> <outDir> */
  def main(args: Array[String]): Unit = {
    val Array(csvDir, warehouseDir, outDir) = args
    val spark = GraftSession.local("uber-pipeline")
    val counts = runAll(spark, csvDir, warehouseDir, outDir)
    val checks = runChecks(spark)
    checks.foreach(r => println(
      s"check ${r.table}.${r.column} ${r.check}: " +
        (if (r.passed) "PASS" else s"FAIL (${r.failures})")))
    counts.toSeq.sortBy(_._1).foreach { case (n, c) => println(s"$n: $c rows") }
    spark.stop()
    if (checks.exists(!_.passed)) sys.exit(1)
  }
}
