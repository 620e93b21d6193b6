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
