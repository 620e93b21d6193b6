package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
}
