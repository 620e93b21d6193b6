package graft

import org.apache.spark.sql.{DataFrame, SparkSession, types}
import org.apache.spark.sql.functions.expr

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst's datasource V2 pushdown
  * (column pruning + predicate pushdown, visible as `PushedFilters`/
  * `ReadSchema` in `.explain("formatted")`) applies to every query built on
  * top. No caching here: each query declares exactly the columns it needs
  * and the scan prunes to those.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong (GraftSession)
    // it arrives as epoch-nanos LongType — normalize to a microsecond
    // timestamp (integer div: a double intermediate would lose precision at
    // 1e18 ns). Guarded on the observed type so already-sane inputs pass.
    // The engine contract is ts: TIMESTAMP (what timestamp_micros yields);
    // naive-µs inputs (e.g. ScaleUp-generated data, read as TIMESTAMP_NTZ)
    // normalize to it — same wall clock under the pinned UTC session.
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(types.LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(types.TimestampNTZType) =>
        df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => df
    }
  }

  /** Register every table as a temp view named after the table — the same
    * names the DuckDB oracle uses, so SQL text can be shared verbatim where
    * the dialects overlap.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
