package graft

import org.apache.spark.sql.{DataFrame, SparkSession, types}
import org.apache.spark.sql.functions.expr

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst's datasource V2 pushdown
  * (column pruning + predicate pushdown, visible as `PushedFilters`/
  * `ReadSchema` in `.explain("formatted")`) applies to every query built on
  * top. No DATA caching: each query declares exactly the columns it needs
  * and the scan prunes to those.
  *
  * The PLAN (the analyzed logical relation: file listing + footer schema)
  * IS memoized per (session, dir, table): `spark.read.parquet` costs
  * ~100 ms of listing + schema inference per call, and a 131-query suite
  * over the same ten tables pays it hundreds of times for an identical
  * answer. On a cluster this is the same economics — catalog/file-index
  * lookups are driver-side latency, and a production engine caches its
  * FileIndex (Spark's own `InMemoryFileIndex` does within one relation;
  * this extends reuse across queries). The testdata dirs are immutable by
  * contract; anything that rewrites a parquet dir in place must call
  * [[invalidate]] (the in-repo writers — Maintenance, Export, Ingest —
  * all write to fresh target dirs, so none needs to).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // WeakHashMap on the session: a stopped session's cached plans must not
  // outlive it (16 ScalaTest suites each build sessions; strong keys would
  // pin every plan of every past suite for the JVM's lifetime).
  private val plans =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  /** Drop every memoized plan (all sessions). Call after rewriting a
    * parquet directory IN PLACE that a previous load in the same session
    * already read — otherwise the stale file list resurfaces.
    */
  def invalidate(): Unit = plans.synchronized { plans.clear() }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = plans.synchronized {
      var m = plans.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        plans.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name), _ => doLoad(spark, dir, name))
  }

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame = {
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
