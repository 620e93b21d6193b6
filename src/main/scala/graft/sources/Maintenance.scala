package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance: small-file compaction. Streaming appends, incremental
  * loads, and over-parallel writes all accrete files far below the
  * ~128 MB scan-efficient size; at 100 TB the file COUNT (driver listing,
  * task scheduling, row-group overhead) becomes its own bottleneck.
  * Compaction rewrites a parquet directory into ceil(bytes/target) files —
  * run it out-of-band, swap directories atomically at the orchestration
  * layer (a table format with transactional rewrite would subsume this).
  */
object Maintenance {

  /** Total byte size and file count of a parquet directory. */
  def dirStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.map(_.getLen).sum, files.length)
  }

  /** Rewrite `srcDir` into `dstDir` with ~`targetBytes`-sized files.
    * Returns the output file count. Data is bit-identical (no
    * re-encoding choices beyond parquet defaults); ordering within the
    * table is not preserved (parquet tables are unordered).
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val (bytes, _) = dirStats(spark, srcDir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(n)
      .write.mode("overwrite").parquet(dstDir)
    dirStats(spark, dstDir)._2
  }

  /** Z-order (Morton) key of two bucketed dimensions: interleaves the low
    * `bits` bits of x and y so rows close in BOTH dimensions get close
    * keys. Inputs must already be non-negative bucket ordinals below
    * 2^bits (rank/ntile/scale raw values first). Pure built-ins — the
    * bit-gather folds over a 16-element sequence inside codegen.
    */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", x.cast("long"), i).bitwiseAND(lit(1L)),
          i * 2))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", y.cast("long"), i).bitwiseAND(lit(1L)),
          i * 2 + 1)))
  }

  /** Rewrite a table Z-ORDER-clustered on two dimensions — the
    * multi-dimensional data-layout optimization (Delta's OPTIMIZE ZORDER
    * BY): range-partition + sort by the Morton key so every output file
    * covers a compact rectangle of (x, y) space instead of a full-width
    * stripe. Parquet min/max footer stats on BOTH columns then skip files
    * for predicates on EITHER dimension — a linear sort gives skipping on
    * its leading column only. At 100 TB layout is the difference between
    * scanning a table and scanning a tile; MaintenanceSpec quantifies the
    * skip fraction.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, dstDir: String, bits: Int = 16): Unit =
    df.withColumn("__z", zorderKey2(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dstDir)

  /** Write `df` as a bucketed + sorted table (hash-partitioned into
    * `nBuckets` files by `key`, sorted by it within each bucket). Two
    * tables bucketed the same way join with NO shuffle and NO sort —
    * Spark's bucketing is the persisted analog of co-partitioning, and
    * it is THE 100 TB answer for a fact⋈fact join that recurs across
    * jobs: pay the shuffle once at write time, then every downstream
    * join on the key is a streaming zip of pre-sorted buckets.
    * FormatsSpec asserts the joined plan is Exchange-free. (A residual
    * in-partition sort remains unless
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — since
    * Spark 3.0 the scan only advertises bucket ordering behind that
    * flag; the expensive part, the shuffle, is gone either way.)
    *
    * Requires a table name (bucketing metadata lives in the catalog, not
    * the parquet footers); the data itself lands at `path`.
    */
  def bucketWrite(df: DataFrame, key: String, nBuckets: Int,
      table: String, path: String): Unit =
    // repartition on the SAME hash the bucketing uses, so each write task
    // owns exactly one bucket → one file per bucket. With multiple files
    // per bucket Spark must discard the sortBy property (files would need
    // a merge) and reinstates a Sort under every join.
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
