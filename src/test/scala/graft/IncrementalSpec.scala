package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.uber.{Incremental, Ingest, Models, Runner}

/** Incremental model maintenance (uber/Incremental.scala): after a
  * partition restatement, partials+fold must equal a from-scratch full
  * rebuild for every model — and must not touch untouched months' files.
  */
class IncrementalSpec extends SparkSpec {

  // Fixture designed so top_3_base_names is tie-free before AND after the
  // increment (LIMIT 3 over tied counts is content-unstable, which would
  // make the differential comparison flaky for reasons that are not bugs).
  private lazy val dirs: (String, String, String) = {
    val root = Files.createTempDirectory("inc_fixture").toString
    val csv = s"$root/csv"; val wh = s"$root/wh"; val out = s"$root/out"
    Files.createDirectories(Paths.get(csv))
    def write(name: String, content: String): Unit =
      Files.writeString(Paths.get(s"$csv/$name"), content)
    write("base_num_and_name.csv",
      """base_num,base_name
        |B02512,Unter
        |B02598,Hinter
        |B02617,Weiter
        |B02765,Grun
        |""".stripMargin)
    write("taxi_zone_lookup.csv",
      """locationid,borough,zone
        |1,Bronx,Belmont
        |2,Bronx,Hunts Point
        |3,Manhattan,Chelsea
        |""".stripMargin)
    // per-base non-null-date totals: B02512=5, B02598=3, B02765=2, B02617=1
    write("raw_data_janjune_15.csv",
      """dispatching_base_num,pickup_date,affiliated_base_num,locationid
        |B02512,2015-01-05 08:00:00,B02512,1
        |B02512,2015-01-05 09:00:00,B02598,3
        |B02512,2015-01-06 10:00:00,B02512,2
        |B02598,2015-01-07 11:00:00,B02765,1
        |B02512,2015-02-10 11:00:00,B02512,1
        |B02598,2015-02-10 12:00:00,B02598,3
        |B02598,2015-02-11 13:00:00,B02765,2
        |B02765,2015-02-12 14:00:00,B02617,3
        |B02765,2015-05-20 11:00:00,B02765,1
        |B02512,2015-05-21 12:00:00,B02512,2
        |B02617,2015-07-04 11:00:00,B02617,3
        |B02617,,B02617,1
        |""".stripMargin)
    Ingest.ingestAll(spark, csv, wh)
    (csv, wh, out)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def assertAllModelsMatch(out: String, clue: String): Unit =
    Models.all.foreach { m =>
      val inc = rows(Incremental.readModel(spark, out, m.name))
      val full = rows(Runner.runModel(spark, m, Runner.FrameForm))
      assert(inc == full, s"$clue: ${m.name} incremental != full rebuild")
    }

  test("full build equals the full models; increment equals a full rebuild") {
    val (csv, wh, out) = dirs
    Incremental.fullBuild(spark, out)
    assertAllModelsMatch(out, "initial full build")

    // untouched-month evidence: January partials must not be rewritten
    val jan = Paths.get(
      Incremental.partialsPath(out, "top_3_base_names_by_total_pickups"),
      "month_num=1")
    val mtimesBefore = Files.list(jan).iterator().asScala
      .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap

    // restatement of months 2 and 5: February loses its Unter/Grun-Bronx
    // rows entirely (the month-2 partials of unter_grun must become EMPTY
    // — the case dynamic partition overwrite cannot express), May gains a
    // Grun-Bronx row. New totals: B02512=5, B02598=3, B02765=2, B02617=1
    // (still tie-free).
    val incCsv = Paths.get(csv, "inc.csv")
    Files.writeString(incCsv,
      """dispatching_base_num,pickup_date,affiliated_base_num,locationid
        |B02598,2015-02-10 12:00:00,B02598,3
        |B02598,2015-02-11 13:30:00,B02598,2
        |B02765,2015-02-12 14:00:00,B02617,3
        |B02765,2015-05-20 11:00:00,B02765,1
        |B02512,2015-05-21 12:00:00,B02512,2
        |B02512,2015-05-22 09:00:00,B02765,1
        |""".stripMargin)
    val incDf = Ingest.readCsv(spark, incCsv.toString, uber.Schemas.rawDataJanjune15)
    val months = Incremental.affectedMonths(incDf)
    assert(months.toSet == Set(Some(2), Some(5)))

    val applied = Runner.runIncrement(spark, incCsv.toString, wh, out)
    assert(applied.toSet == months.toSet)

    assertAllModelsMatch(out, "after increment")

    // the emptied-month case actually emptied: no February rows survive in
    // the incrementally-maintained unter_grun
    val ug = Incremental.readModel(spark, out, "unter_grun_pickups_in_bronx")
    assert(ug.filter(org.apache.spark.sql.functions.month(
      org.apache.spark.sql.functions.col("Pickup Date")) === 2).count() == 0,
      "restated February must have no surviving unter_grun rows")
    assert(ug.count() > 0)

    val mtimesAfter = Files.list(jan).iterator().asScala
      .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    assert(mtimesAfter == mtimesBefore,
      "January partials were rewritten by a February/May increment")

    // restore shared-view state for any test ordering after this one
    Ingest.ingestAll(spark, csv, wh)
  }

  test("drop-folder increments apply once, in name order, and survive restarts") {
    val (csv, wh, out) = dirs
    Ingest.ingestAll(spark, csv, wh)
    Incremental.fullBuild(spark, out)

    val incDir = Files.createTempDirectory("inc_drops").toString
    val state = s"$incDir/_state"
    // two drops: day1 restates February, day2 restates it AGAIN (later
    // file must win) and touches May
    Files.writeString(Paths.get(s"$incDir/2015-02-13_a.csv"),
      """dispatching_base_num,pickup_date,affiliated_base_num,locationid
        |B02598,2015-02-10 12:00:00,B02598,3
        |B02765,2015-02-12 14:00:00,B02617,3
        |""".stripMargin)
    Files.writeString(Paths.get(s"$incDir/2015-02-14_b.csv"),
      """dispatching_base_num,pickup_date,affiliated_base_num,locationid
        |B02598,2015-02-10 12:00:00,B02598,3
        |B02598,2015-02-11 13:30:00,B02765,1
        |B02765,2015-02-12 14:00:00,B02617,3
        |B02512,2015-05-21 12:00:00,B02512,2
        |B02765,2015-05-20 11:00:00,B02765,1
        |""".stripMargin)

    val applied = Runner.processNewIncrements(spark, incDir, wh, out, state)
    assert(applied == Seq("2015-02-13_a.csv", "2015-02-14_b.csv"))
    assertAllModelsMatch(out, "after drop-folder increments")
    // the later drop won: 13:30 Grun-Bronx row present
    val ug = rows(Incremental.readModel(spark, out, "unter_grun_pickups_in_bronx"))
    assert(ug.exists(_.contains("2015-02-11T13:30")), s"later drop must win: $ug")

    // restart: a fresh call (state file re-read) applies nothing
    assert(Runner.processNewIncrements(spark, incDir, wh, out, state).isEmpty)

    Ingest.ingestAll(spark, csv, wh)
  }

  test("q72_incremental_models: restated-partials fold == direct full model") {
    import org.apache.spark.sql.functions._
    // the driver-gate query runs the stale-build → restate {May, July} →
    // fold lifecycle; its output must equal the model computed directly
    val got = graft.operators.Relational
      .queries("q72_incremental_models")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val want = Tables.load(spark, sfDir, "orders")
      .filter(month(col("o_orderdate")) <= 6)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          / lit(100.0)).as("total_price"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"fold over restated partials diverged:\n$got\n$want")
  }
}
