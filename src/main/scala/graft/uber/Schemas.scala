package graft.uber

import org.apache.spark.sql.types._

/** Declared schemas for the reference's three source tables
  * (DDL at reference `Diary of Making.md:64-68`) and the Airbyte-style
  * provenance columns its sync layer appends
  * (reference `Images/bq_raw_data_janjune_15.png`).
  *
  * Type mapping notes (SURVEY.md §1.2):
  *  - SMALLINT locationid → IntegerType (Spark reads small ints fine; Short
  *    buys nothing and complicates joins)
  *  - TIMESTAMP WITHOUT TIME ZONE pickup_date → TimestampNTZType, the exact
  *    semantic match (no session-zone shifting of EXTRACT/DATE results)
  *  - VARCHAR(6) base numbers → StringType (length enforced at ingest if
  *    desired, not by the engine)
  */
object Schemas {

  val taxiZoneLookup: StructType = StructType(Seq(
    StructField("locationid", IntegerType, nullable = false),
    StructField("borough", StringType),
    StructField("zone", StringType)))

  val baseNumAndName: StructType = StructType(Seq(
    StructField("base_num", StringType, nullable = false),
    StructField("base_name", StringType)))

  val rawDataJanjune15: StructType = StructType(Seq(
    StructField("dispatching_base_num", StringType),
    StructField("pickup_date", TimestampNTZType),
    StructField("affiliated_base_num", StringType),
    StructField("locationid", IntegerType)))

  /** Source-table name → schema, in ingest order. */
  val sources: Seq[(String, StructType)] = Seq(
    "taxi_zone_lookup" -> taxiZoneLookup,
    "base_num_and_name" -> baseNumAndName,
    "raw_data_janjune_15" -> rawDataJanjune15)

  /** Airbyte provenance column names (appended by Ingest, never read by the
    * models — ingest-layer lineage only).
    */
  val airbyteColumns: Seq[String] = Seq(
    "_airbyte_raw_id", "_airbyte_extracted_at", "_airbyte_meta",
    "_ab_cdc_lsn", "_ab_cdc_deleted_at", "_ab_cdc_updated_at")
}
