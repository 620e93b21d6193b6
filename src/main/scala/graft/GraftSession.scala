package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration for the engine.
  *
  * Design notes (100 TB posture):
  *  - `spark.sql.shuffle.partitions` defaults to 32 to match local[32]; on a
  *    real cluster AQE coalesces/re-splits post-shuffle partitions anyway
  *    (`spark.sql.adaptive.enabled=true`), so the static number only seeds the
  *    initial shuffle. Skew joins are handled by AQE's skew-join rewrite.
  *  - ANSI mode is OFF: the reference semantics (BigQuery models never divide
  *    by zero; DuckDB oracle returns NULL on x/0) are null-propagating, and a
  *    hard error mid-pipeline on 100 TB is operationally worse than a NULL
  *    that downstream quality checks catch.
  *  - Session time zone pinned to UTC: the reference fact column is
  *    `TIMESTAMP WITHOUT TIME ZONE` (see SURVEY.md §7.4); UTC everywhere makes
  *    `month()`/`to_date()` stable and matches the DuckDB oracle's naive
  *    timestamps.
  *  - Parquet timestamps written as TIMESTAMP_MICROS so any reader (DuckDB,
  *    Arrow, Hive) sees identical instants without INT96 legacy handling.
  */
object GraftSession {

  /** Apply engine defaults to an arbitrary builder (used by Verify/Bench/tests). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // the engine's custom surface (SQL functions + as-of join strategy) is
    // part of the session contract, not an opt-in: any getOrCreate through
    // here — tests, Verify, Bench — sees the same engine
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // Parquet TIMESTAMP(NANOS) (events.ts) is not a legal Spark type; read
    // as raw long and let Tables.load convert ns → microsecond timestamp.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  /** Shuffle partition count: defaults to the core count (right for the
    * driver's sf0.01/sf0.1 scales), overridable via
    * SPARK_GRAFT_SHUFFLE_PARTITIONS — partitions must scale with DATA,
    * not cores: at sf10 (100× sf0.1) 32 partitions puts ~2M lineitem
    * rows in every window sort (spill + GC variance); 256 restores
    * ~250k-row partitions, which is how a real cluster would size it.
    */
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

  /** Local session sized for this container; cores/shuffle come from env. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", shufflePartitions)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
