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
    df.schema.find(f => f.name == "ts" && f.dataType == types.LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Register every table as a temp view named after the table — the same
    * names the DuckDB oracle uses, so SQL text can be shared verbatim where
    * the dialects overlap.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
