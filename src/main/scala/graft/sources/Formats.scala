package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced source/sink surface over Spark's columnar and text
  * formats. Parquet is the engine's native interchange (SURVEY §2.1 S5);
  * ORC is its columnar peer; JSON/CSV are the ingest-edge formats and get
  * explicit schemas (never inference — a schema drift at 100 TB must fail
  * the contract, not silently retype a column), microsecond-precision
  * timestamps, and PERMISSIVE corrupt-record capture so bad records land
  * in a quarantine column instead of killing the job.
  */
object Formats {

  /** Microsecond-precision wire format for text formats — matches the
    * engine's TIMESTAMP_MICROS parquet posture (GraftSession).
    */
  val TimestampFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val CorruptCol = "_corrupt_record"

  def write(df: DataFrame, path: String, format: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true") // csv only; ignored elsewhere
      .option("timestampFormat", TimestampFmt)
      .format(format).save(path)

  /** Schema-first read; for JSON/CSV, malformed records are captured in
    * `_corrupt_record` when the caller includes it in the schema.
    */
  def read(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TimestampFmt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .format(format).load(path)
}
