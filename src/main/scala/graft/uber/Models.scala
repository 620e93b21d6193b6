package graft.uber

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** dbt-style source registry (SURVEY §1.3): the models reference sources
  * abstractly; resolution to a catalog/view name happens here — the Spark
  * equivalent of `dbt_Models/sources.yml`.
  */
object SourceRegistry {
  def resolve(source: String, table: String): String = (source, table) match {
    case ("airbyte_uber_data", t) => t // views registered under bare names
    case (s, t) => s"${s}_$t"
  }
}

/** The six reference models (reference `dbt_Models/`), each in BOTH forms:
  *
  *  - `sql`: the model re-expressed in Spark SQL, preserving the reference's
  *    output column names VERBATIM (spaces, casing — e.g.
  *    `` `Dispatching Base Name` ``), its CASE-without-ELSE null semantics,
  *    its RANK() tie-with-gap semantics, its COUNT(col) null-skipping, and
  *    its correlated scalar subquery (exercising Catalyst decorrelation).
  *  - `frame`: the same semantics built with the DataFrame API the way a
  *    Spark-first engineer would write it (window sum instead of correlated
  *    subquery, explicit broadcast of the ~9-row dim).
  *
  * The two forms are differential-tested against each other (UberSpec), which
  * is free cross-checking the reference never had (it shipped zero tests —
  * SURVEY §5).
  *
  * Scale notes: every model is fact ⋈ broadcast(dim) + hash agg — the only
  * shuffle is on the (small) group keys; the May model prunes to one month
  * partition (see Ingest).
  */
object Models {

  final case class Model(
      name: String,
      sql: String,
      frame: SparkSession => DataFrame)

  private def src(t: String): String = SourceRegistry.resolve("airbyte_uber_data", t)

  private def raw(s: SparkSession) = s.table(src("raw_data_janjune_15"))
  private def base(s: SparkSession) = s.table(src("base_num_and_name"))
  private def zone(s: SparkSession) = s.table(src("taxi_zone_lookup"))

  /** Month-name CASE with NO else: months 7-12 → NULL, as the reference
    * (`dbt_Models/pickup_count_vs_average_per_base.sql:6-13`).
    */
  private def monthName(mo: Column): Column =
    when(mo === 1, "January").when(mo === 2, "February").when(mo === 3, "March")
      .when(mo === 4, "April").when(mo === 5, "May").when(mo === 6, "June")

  // -------------------------------------------- unter_grun_pickups_in_bronx
  /** Reference `dbt_Models/unter_grun_pickups_in_bronx.sql`: 3-way join on
    * the AFFILIATED base FK (J2+J3), IN + equality filters (F2/F4).
    */
  val unterGrunPickupsInBronx: Model = Model(
    name = "unter_grun_pickups_in_bronx",
    sql = s"""
      |SELECT raw.pickup_date AS `Pickup Date`,
      |       base.base_name AS `Base Name`,
      |       t_zone.borough AS `Borough`,
      |       t_zone.zone AS `Zone`
      |FROM ${src("raw_data_janjune_15")} AS raw
      |JOIN ${src("base_num_and_name")} AS base ON base.base_num = raw.affiliated_base_num
      |JOIN ${src("taxi_zone_lookup")} AS t_zone ON t_zone.locationid = raw.locationid
      |WHERE base.base_name IN ('Unter', 'Grun') AND t_zone.Borough = 'Bronx'
      |""".stripMargin,
    frame = s => raw(s)
      .join(broadcast(base(s)), col("base_num") === col("affiliated_base_num"))
      .join(broadcast(zone(s)), zone(s)("locationid") === raw(s)("locationid"))
      .filter(col("base_name").isin("Unter", "Grun") && col("borough") === "Bronx")
      .select(
        col("pickup_date").as("Pickup Date"),
        col("base_name").as("Base Name"),
        col("borough").as("Borough"),
        col("zone").as("Zone")))

  // ---------------------------------------------- total_pickups_in_may_by_base
  /** Reference `dbt_Models/total_pickups_in_may_by_base.sql`: May-only
    * grouped count (F1+A1). The month predicate hits the pickup_month
    * partition column → partition pruning (the reference full-scans here).
    */
  val totalPickupsInMayByBase: Model = Model(
    name = "total_pickups_in_may_by_base",
    sql = s"""
      |SELECT base.base_name AS `Dispatching Base Name`,
      |       COUNT(*) AS `Number of Pick Ups for Base`
      |FROM ${src("raw_data_janjune_15")} AS raw
      |JOIN ${src("base_num_and_name")} AS base ON base.base_num = raw.dispatching_base_num
      |WHERE EXTRACT(MONTH FROM raw.pickup_date) = 5
      |GROUP BY base.base_name
      |ORDER BY COUNT(*) DESC
      |""".stripMargin,
    frame = s => {
      val r = raw(s)
      // Prefer the ingest-derived partition column: month(pickup_date) = 5
      // cannot prune (Catalyst can't see through the derivation), while
      // pickup_month = 5 skips 5/6ths of the table at the file listing.
      // The SQL twin keeps the reference's literal EXTRACT filter.
      val mayFilter =
        if (r.columns.contains("pickup_month")) col("pickup_month") === 5
        else month(col("pickup_date")) === 5
      r.filter(mayFilter)
        .join(broadcast(base(s)), col("base_num") === col("dispatching_base_num"))
    }
      .groupBy(col("base_name"))
      .agg(count(lit(1)).as("Number of Pick Ups for Base"))
      .withColumnRenamed("base_name", "Dispatching Base Name")
      .orderBy(col("Number of Pick Ups for Base").desc))

  // ------------------------------------------ top_3_base_names_by_total_pickups
  /** Reference `dbt_Models/top_3_base_names_by_total_pickups.sql`: global
    * top-k on COUNT(pickup_date) — null pickup dates intentionally NOT
    * counted (A2+O1).
    */
  val top3BaseNamesByTotalPickups: Model = Model(
    name = "top_3_base_names_by_total_pickups",
    sql = s"""
      |SELECT base.base_num AS `Dispatching Base Number`,
      |       base.base_name AS `Base Name`,
      |       COUNT(raw.pickup_date) AS `Total Number of Pick Ups`
      |FROM ${src("raw_data_janjune_15")} AS raw
      |JOIN ${src("base_num_and_name")} AS base ON base.base_num = raw.dispatching_base_num
      |GROUP BY base.base_num, base.base_name
      |ORDER BY COUNT(raw.pickup_date) DESC
      |LIMIT 3
      |""".stripMargin,
    frame = s => raw(s)
      .join(broadcast(base(s)), col("base_num") === col("dispatching_base_num"))
      .groupBy(col("base_num"), col("base_name"))
      .agg(count(col("pickup_date")).as("Total Number of Pick Ups"))
      .select(
        col("base_num").as("Dispatching Base Number"),
        col("base_name").as("Base Name"),
        col("Total Number of Pick Ups"))
      .orderBy(col("Total Number of Pick Ups").desc)
      .limit(3))

  // -------------------------------------------- top_3_pickup_dates_per_base
  /** Reference `dbt_Models/top_3_pickup_dates_per_base.sql`: per-base top
    * dates by RANK() over an aggregate — MUST stay rank() (ties share rank,
    * gaps follow; per-base output may exceed 3 rows), filtered rank IN
    * (1,2,3) (W1+F3+O2+X2).
    */
  val top3PickupDatesPerBase: Model = Model(
    name = "top_3_pickup_dates_per_base",
    sql = s"""
      |WITH date_extract_cte AS (
      |    SELECT base.base_name AS base_name,
      |           raw.dispatching_base_num AS dispatching_base_num,
      |           DATE(raw.pickup_date) AS pick_up_date
      |    FROM ${src("raw_data_janjune_15")} AS raw
      |    JOIN ${src("base_num_and_name")} AS base ON base.base_num = raw.dispatching_base_num
      |),
      |ranked_cte AS (
      |    SELECT base_name AS `Base Name`,
      |           dispatching_base_num AS `Dispatching Base Number`,
      |           RANK() OVER(PARTITION BY dispatching_base_num ORDER BY COUNT(*) DESC) AS `Rank`,
      |           COUNT(*) AS `Count`,
      |           pick_up_date AS `Pick Up Date`
      |    FROM date_extract_cte
      |    GROUP BY base_name, dispatching_base_num, pick_up_date
      |)
      |SELECT *
      |FROM ranked_cte
      |WHERE ranked_cte.rank IN (1,2,3)
      |ORDER BY ranked_cte.`Base NAME` ASC, ranked_cte.rank ASC
      |""".stripMargin,
    frame = s => {
      val perDate = raw(s)
        .join(broadcast(base(s)), col("base_num") === col("dispatching_base_num"))
        .groupBy(col("base_name"), col("dispatching_base_num"),
          to_date(col("pickup_date")).as("pick_up_date"))
        .agg(count(lit(1)).as("Count"))
      val w = Window.partitionBy(col("dispatching_base_num"))
        .orderBy(col("Count").desc)
      perDate
        .withColumn("Rank", rank().over(w))
        .filter(col("Rank").isin(1, 2, 3))
        .select(
          col("base_name").as("Base Name"),
          col("dispatching_base_num").as("Dispatching Base Number"),
          col("Rank"), col("Count"),
          col("pick_up_date").as("Pick Up Date"))
        .orderBy(col("Base Name").asc, col("Rank").asc)
    })

  // ---------------------------------------- pickup_count_vs_average_per_base
  /** Reference `dbt_Models/pickup_count_vs_average_per_base.sql`: monthly
    * per-base counts vs the all-base monthly average — AVG(COUNT(*)) OVER
    * (PARTITION BY month) nested window-over-aggregate (A4+W2), no-ELSE
    * month-name CASE (X3), INT/FLOAT division arithmetic (X4), month_num
    * sort key EXCLUDED from the final projection (O3).
    */
  val pickupCountVsAveragePerBase: Model = Model(
    name = "pickup_count_vs_average_per_base",
    sql = s"""
      |WITH month_extract AS (
      |    SELECT base.base_name AS `Dispatching Base Name`,
      |           EXTRACT(MONTH FROM raw.pickup_date) AS Month_num,
      |           CASE
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 1 THEN 'January'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 2 THEN 'February'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 3 THEN 'March'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 4 THEN 'April'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 5 THEN 'May'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 6 THEN 'June'
      |            END AS Month
      |    FROM ${src("raw_data_janjune_15")} AS raw
      |    JOIN ${src("base_num_and_name")} AS base ON base.base_num = raw.dispatching_base_num
      |),
      |monthly_counts_and_avg AS (
      |    SELECT month_extract.`Dispatching Base Name` AS `Dispatching Base Name`,
      |           month_extract.month_num,
      |           month_extract.Month AS Month,
      |           COUNT(*) AS `Monthly Count`,
      |           AVG(COUNT(*)) OVER (PARTITION BY month_extract.month) AS `Average for Month`
      |    FROM month_extract
      |    GROUP BY month_extract.`Dispatching Base Name`, month_extract.Month, month_extract.month_num
      |)
      |SELECT monthly_counts_and_avg.`Dispatching Base Name` AS `Dispatching Base Name`,
      |       monthly_counts_and_avg.month,
      |       monthly_counts_and_avg.`Monthly Count`,
      |       monthly_counts_and_avg.`Average for Month`,
      |       ((monthly_counts_and_avg.`Monthly Count` / monthly_counts_and_avg.`Average for Month`) - 1) * 100 AS `Percentage Difference`
      |FROM monthly_counts_and_avg
      |ORDER BY monthly_counts_and_avg.month_num ASC, monthly_counts_and_avg.`Monthly Count` DESC
      |""".stripMargin,
    frame = s => {
      val me = raw(s)
        .join(broadcast(base(s)), col("base_num") === col("dispatching_base_num"))
        .select(
          col("base_name").as("Dispatching Base Name"),
          month(col("pickup_date")).as("month_num"),
          monthName(month(col("pickup_date"))).as("Month"))
      val counts = me.groupBy(col("Dispatching Base Name"), col("Month"), col("month_num"))
        .agg(count(lit(1)).as("Monthly Count"))
        .withColumn("Average for Month",
          avg(col("Monthly Count")).over(Window.partitionBy(col("Month"))))
      counts
        .orderBy(col("month_num").asc, col("Monthly Count").desc)
        .select(
          col("Dispatching Base Name"), col("Month").as("month"),
          col("Monthly Count"), col("Average for Month"),
          ((col("Monthly Count") / col("Average for Month") - 1) * 100)
            .as("Percentage Difference"))
    })

  // -------------------------------------- pickup_percentile_by_base_per_month
  /** Reference `dbt_Models/pickup_percentile_by_base_per_month.sql`:
    * share-of-month via a CORRELATED SCALAR SUBQUERY over a twice-referenced
    * CTE (A5+C3+X5) — kept literal in the SQL form (Catalyst decorrelates);
    * the frame form uses the equivalent window sum.
    */
  val pickupPercentileByBasePerMonth: Model = Model(
    name = "pickup_percentile_by_base_per_month",
    sql = s"""
      |WITH month_extract AS (
      |    SELECT base.base_name AS `Dispatching Base Name`,
      |           EXTRACT(MONTH FROM raw.pickup_date) AS Month_num,
      |           CASE
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 1 THEN 'January'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 2 THEN 'February'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 3 THEN 'March'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 4 THEN 'April'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 5 THEN 'May'
      |                WHEN EXTRACT(MONTH FROM raw.pickup_date) = 6 THEN 'June'
      |            END AS Month
      |    FROM ${src("raw_data_janjune_15")} AS raw
      |    JOIN ${src("base_num_and_name")} AS base ON base.base_num = raw.dispatching_base_num
      |),
      |counting_base AS (
      |    SELECT month_extract.`Dispatching Base Name` AS `Dispatching Base Name`,
      |           month_extract.month_num AS month_num,
      |           month_extract.month AS Month,
      |           COUNT(*) AS `Count per Base per Month`
      |    FROM month_extract
      |    GROUP BY month_extract.month, month_extract.`Dispatching Base Name`, month_extract.month_num
      |),
      |counting_cte AS (
      |    -- Spark disallows BigQuery's correlated scalar subquery inside a
      |    -- grouped SELECT (SCALAR_SUBQUERY_IS_IN_GROUP_BY_OR_AGGREGATE_FUNCTION);
      |    -- hoisting it one CTE up preserves the A5 semantics verbatim and
      |    -- Catalyst still decorrelates it to an aggregate + left outer join.
      |    SELECT counting_base.*,
      |           (SELECT COUNT(*) FROM month_extract AS sub WHERE sub.month = counting_base.month) AS `Count per Month`
      |    FROM counting_base
      |)
      |SELECT counting_cte.`Dispatching Base Name`,
      |       counting_cte.month,
      |       counting_cte.`Count per Base per Month`,
      |       (counting_cte.`Count per Base per Month` / counting_cte.`Count per Month`) * 100 AS `Percentile of Pick Ups`
      |FROM counting_cte
      |ORDER BY counting_cte.month_num ASC, counting_cte.`Count per Base per Month` DESC
      |""".stripMargin,
    frame = s => {
      val me = raw(s)
        .join(broadcast(base(s)), col("base_num") === col("dispatching_base_num"))
        .select(
          col("base_name").as("Dispatching Base Name"),
          month(col("pickup_date")).as("month_num"),
          monthName(month(col("pickup_date"))).as("Month"))
      val counts = me.groupBy(col("Month"), col("Dispatching Base Name"), col("month_num"))
        .agg(count(lit(1)).as("Count per Base per Month"))
        .withColumn("Count per Month",
          sum(col("Count per Base per Month")).over(Window.partitionBy(col("Month"))))
      counts
        .orderBy(col("month_num").asc, col("Count per Base per Month").desc)
        .select(
          col("Dispatching Base Name"), col("Month").as("month"),
          col("Count per Base per Month"),
          (col("Count per Base per Month") / col("Count per Month") * 100)
            .as("Percentile of Pick Ups"))
    })

  /** All six, in the reference's build order (they are independent siblings
    * over the same three sources — `dbt build` runs them sequentially,
    * SURVEY §2.10 G3).
    */
  val all: Seq[Model] = Seq(
    unterGrunPickupsInBronx,
    totalPickupsInMayByBase,
    top3BaseNamesByTotalPickups,
    top3PickupDatesPerBase,
    pickupCountVsAveragePerBase,
    pickupPercentileByBasePerMonth)
}
