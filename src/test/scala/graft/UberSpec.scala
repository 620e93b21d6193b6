package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.uber.{Ingest, Models, Runner}

/** Reference-parity tests for the uber module: fixture per FIXTURES.md
  * (months 1-6 + a July row + a NULL timestamp + rank ties + dispatching ≠
  * affiliated), goldens precomputed with DuckDB, SQL ≡ DataFrame
  * differential for all six models. The reference itself shipped zero tests
  * (SURVEY §5) — these are the tests it should have had.
  */
class UberSpec extends SparkSpec {

  private lazy val dirs: (String, String) = {
    val root = Files.createTempDirectory("uber_fixture").toString
    val csv = s"$root/csv"; val wh = s"$root/wh"
    Files.createDirectories(Paths.get(csv))
    def write(name: String, content: String): Unit =
      Files.writeString(Paths.get(s"$csv/$name"), content)
    write("base_num_and_name.csv",
      """base_num,base_name
        |B02512,Unter
        |B02598,Hinter
        |B02617,Weiter
        |B02682,Schmecken
        |B02764,Danach-NY
        |B02765,Grun
        |B02774,Alfred
        |B02835,Dreist
        |B02836,Drinnen
        |""".stripMargin)
    write("taxi_zone_lookup.csv",
      """locationid,borough,zone
        |1,Bronx,Belmont
        |2,Bronx,Hunts Point
        |3,Manhattan,Chelsea
        |4,Brooklyn,Williamsburg
        |5,Queens,Astoria
        |6,EWR,Newark Airport
        |""".stripMargin)
    write("raw_data_janjune_15.csv",
      """dispatching_base_num,pickup_date,affiliated_base_num,locationid
        |B02512,2015-01-05 08:00:00,B02512,1
        |B02512,2015-01-05 09:00:00,B02765,1
        |B02512,2015-01-06 10:00:00,B02512,2
        |B02512,2015-02-10 11:00:00,B02512,3
        |B02512,2015-02-10 12:00:00,B02765,2
        |B02512,2015-02-11 13:00:00,B02512,1
        |B02512,2015-02-12 14:00:00,B02512,4
        |B02765,2015-03-15 08:00:00,B02512,1
        |B02765,2015-03-15 09:00:00,B02765,2
        |B02765,2015-03-16 10:00:00,B02765,3
        |B02765,2015-05-20 11:00:00,B02512,1
        |B02765,2015-05-21 12:00:00,B02765,1
        |B02598,2015-05-01 07:00:00,B02598,3
        |B02598,2015-05-02 07:30:00,B02765,4
        |B02598,2015-06-03 08:00:00,B02598,5
        |B02598,2015-04-04 09:00:00,B02512,6
        |B02617,2015-04-05 10:00:00,B02617,3
        |B02617,2015-07-04 11:00:00,B02617,3
        |B02617,,B02617,1
        |B02836,2015-06-30 23:59:59,B02836,2
        |B02836,2015-06-15 12:00:00,B02512,5
        |""".stripMargin)
    Ingest.ingestAll(spark, csv, wh)
    (csv, wh)
  }

  private def ingested(): Unit = { dirs; () }

  private def model(name: String) = Models.all.find(_.name == name).get

  test("ingest: declared schema + airbyte provenance columns + month partitioning") {
    ingested()
    val raw = spark.table("raw_data_janjune_15")
    assert(raw.count() == 21)
    graft.uber.Schemas.airbyteColumns.foreach(c =>
      assert(raw.columns.contains(c), s"missing $c"))
    assert(raw.columns.contains("pickup_month"))
    // null timestamp row survives ingest with null month
    assert(raw.filter(col("pickup_date").isNull).count() == 1)
    // partition dirs exist on disk
    val partDirs = new java.io.File(s"${dirs._2}/raw_data_janjune_15")
      .listFiles().map(_.getName).filter(_.startsWith("pickup_month="))
    assert(partDirs.toSet.contains("pickup_month=5"))
  }

  test("typed _airbyte_meta: declared-schema parse + envelope check") {
    import spark.implicits._
    val stamped = Ingest.withAirbyteMeta(Seq(("B1", "x")).toDF("k", "v"))
    // the typed view exposes errors as a real array<string>
    val errs = Ingest.typedAirbyteMeta(stamped)
      .select($"_airbyte_meta_typed.errors").as[Seq[String]].head()
    assert(errs == Seq.empty)
    assert(graft.uber.Checks.metaEnvelopeClean(stamped, "t").passed)
    // a sync error, a malformed envelope, and a MISSING envelope are all
    // flagged, exactly once each
    val dirty = stamped.select($"k", $"v", $"_airbyte_meta")
      .withColumn("_airbyte_meta",
        when($"k" === "B1", lit("""{"errors":["dropped column"]}""")))
      .union(Seq(("B2", "y", "not json at all")).toDF("k", "v", "_airbyte_meta"))
      .union(Seq(("B3", "z", null.asInstanceOf[String])).toDF("k", "v", "_airbyte_meta"))
    val r = graft.uber.Checks.metaEnvelopeClean(dirty, "t")
    assert(!r.passed && r.failures == 3L)
  }

  test("SQL twin ≡ DataFrame twin for every model (reference-valid rows)") {
    ingested()
    Models.all.foreach { m =>
      val sqlOut = Runner.runModel(spark, m, Runner.SqlForm)
      val dfOut = Runner.runModel(spark, m, Runner.FrameForm)
      assert(sqlOut.columns.toSeq == dfOut.columns.toSeq,
        s"${m.name}: column mismatch ${sqlOut.columns.toSeq} vs ${dfOut.columns.toSeq}")
      // The one documented divergence: on NULL-month groups (impossible in
      // the reference's Jan-June data) the literal correlated subquery's
      // `sub.month = month` misses NULLs → NULL share (BigQuery would
      // divide-by-zero); the window-sum form treats NULL as a group. Compare
      // the reference-valid (non-null Month) rows for that model.
      def norm(df: DataFrame): Seq[Seq[Any]] = {
        val d = if (m.name == "pickup_percentile_by_base_per_month")
          df.filter(col("Month").isNotNull) else df
        d.collect().map(_.toSeq).toSeq
          .sortBy(_.map(v => if (v == null) "" else v.toString).mkString("|"))
      }
      assert(norm(sqlOut) == norm(dfOut), s"${m.name}: row mismatch")
    }
  }

  test("golden: top_3_base_names_by_total_pickups (null pickup_date skipped)") {
    ingested()
    val out = Runner.runModel(spark, model("top_3_base_names_by_total_pickups"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("B02512", "Unter", 7L), ("B02765", "Grun", 5L), ("B02598", "Hinter", 4L)))
  }

  test("golden: total_pickups_in_may_by_base") {
    ingested()
    val out = Runner.runModel(spark, model("total_pickups_in_may_by_base"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("Grun", 2L), ("Hinter", 2L)))
  }

  test("golden: unter_grun_pickups_in_bronx (affiliated-base join, 3-way)") {
    ingested()
    val out = Runner.runModel(spark, model("unter_grun_pickups_in_bronx"))
    assert(out.count() == 9)
    val byBase = out.groupBy(col("Base Name")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byBase == Map("Unter" -> 5L, "Grun" -> 4L))
    assert(out.select(col("Borough")).distinct().collect().map(_.getString(0)).toSeq == Seq("Bronx"))
  }

  test("golden: top_3_pickup_dates_per_base rank ties share rank with gaps") {
    ingested()
    val out = Runner.runModel(spark, model("top_3_pickup_dates_per_base"))
    val unter = out.filter(col("Dispatching Base Number") === "B02512")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("Pick Up Date").toString,
        r.getAs[Long]("Count"), r.getAs[Int]("Rank"))).toSet
    assert(unter == Set(
      ("2015-01-05", 2L, 1), ("2015-02-10", 2L, 1), // tie at rank 1
      ("2015-01-06", 1L, 3), ("2015-02-11", 1L, 3), ("2015-02-12", 1L, 3))) // gap to 3
    // Weiter: all counts tie at 1 → all rank 1, including the NULL-date group
    val weiter = out.filter(col("Dispatching Base Number") === "B02617")
    assert(weiter.count() == 3)
    assert(weiter.select(col("Rank")).distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(weiter.filter(col("Pick Up Date").isNull).count() == 1)
  }

  test("golden: pickup_count_vs_average_per_base (window avg + no-ELSE CASE)") {
    ingested()
    val out = Runner.runModel(spark, model("pickup_count_vs_average_per_base"))
    val june = out.filter(col("Month") === "June").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(june.map(t => (t._1, t._2, t._3)) ==
      Set(("Drinnen", 2L, 1.5), ("Hinter", 1L, 1.5)))
    val pct = june.map(t => t._1 -> t._4).toMap
    assert(math.abs(pct("Drinnen") - 33.33333333333333) < 1e-9)
    assert(math.abs(pct("Hinter") + 33.33333333333333) < 1e-9)
    // July + NULL-timestamp rows: Month is NULL (no ELSE), avg over the
    // NULL partition = 1.0
    val nullMonth = out.filter(col("Month").isNull).collect()
    assert(nullMonth.length == 2)
    assert(nullMonth.forall(_.getDouble(3) == 1.0))
  }

  test("golden: pickup_percentile_by_base_per_month (correlated subquery)") {
    ingested()
    val out = Runner.runModel(spark, model("pickup_percentile_by_base_per_month"))
    val june = out.filter(col("Month") === "June").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(june.map(t => (t._1, t._2)) == Set(("Drinnen", 2L), ("Hinter", 1L)))
    val shares = june.map(t => t._1 -> t._3).toMap
    assert(math.abs(shares("Drinnen") - 66.66666666666666) < 1e-9)
    assert(math.abs(shares("Hinter") - 33.33333333333333) < 1e-9)
    assert(out.filter(col("Month") === "January").collect()
      .map(_.getDouble(3)).toSeq == Seq(100.0))
  }

  test("May model prunes to the pickup_month=5 partition (beats reference full scan)") {
    ingested()
    val plan = Runner.runModel(spark, model("total_pickups_in_may_by_base"),
      Runner.FrameForm).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pickup_month"),
      s"no partition pruning in plan:\n$plan")
  }

  test("runner materializes all six models with expected row counts") {
    ingested()
    val out = Files.createTempDirectory("uber_out").toString
    val counts = Models.all.map { m =>
      val df = Runner.runModel(spark, m)
      df.write.mode("overwrite").parquet(s"$out/${m.name}")
      m.name -> spark.read.parquet(s"$out/${m.name}").count()
    }.toMap
    assert(counts("top_3_base_names_by_total_pickups") == 3)
    assert(counts("total_pickups_in_may_by_base") == 2)
    assert(counts("unter_grun_pickups_in_bronx") == 9)
    assert(counts("top_3_pickup_dates_per_base") == 18)
    assert(counts("pickup_count_vs_average_per_base") == 11)
    assert(counts("pickup_percentile_by_base_per_month") == 11)
  }

  test("source checks: fixture passes the DDL contract; violations are caught") {
    ingested()
    val results = graft.uber.Checks.sourceChecks(spark)
    assert(results.nonEmpty && results.forall(_.passed),
      s"unexpected failures: ${results.filterNot(_.passed)}")
    // a violated contract is detected: duplicate + null + dangling FK
    import spark.implicits._
    val badBase = Seq(("B1", "X"), ("B1", "Y"), (null, "Z"))
      .toDF("base_num", "base_name")
    assert(!graft.uber.Checks.unique(badBase, "t", "base_num").passed)
    assert(!graft.uber.Checks.notNull(badBase, "t", "base_num").passed)
    val child = Seq("B1", "B9").toDF("fk")
    val parent = Seq("B1").toDF("pk")
    val rel = graft.uber.Checks.relationship(child, "fk", parent, "pk", "t")
    assert(rel.failures == 1)
    assert(!graft.uber.Checks.acceptedValues(
      Seq("Bronx", "Atlantis").toDF("b"), "t", "b", Seq("Bronx", "Queens")).passed)
  }

  test("incremental ingest overwrites only the increment's partitions") {
    val (csv, wh) = dirs
    val before = spark.table("raw_data_janjune_15")
    val janBefore = before.filter(col("pickup_month") === 1).count()
    val mayBefore = before.filter(col("pickup_month") === 5).count()
    assert(janBefore > 0 && mayBefore > 0)
    // increment: a restated May with a SINGLE row
    val incPath = java.nio.file.Files.createTempDirectory("uber_inc")
      .resolve("inc.csv")
    java.nio.file.Files.writeString(incPath,
      """dispatching_base_num,pickup_date,affiliated_base_num,locationid
        |B02512,2015-05-30 09:00:00,B02512,1
        |""".stripMargin)
    graft.uber.Ingest.ingestFactIncrement(spark, incPath.toString, wh)
    val after = spark.table("raw_data_janjune_15")
    assert(after.filter(col("pickup_month") === 5).count() == 1,
      "May must be fully restated by the increment")
    assert(after.filter(col("pickup_month") === 1).count() == janBefore,
      "untouched months must keep their rows")
    // restore the fixture state for any test ordering after this one
    graft.uber.Ingest.ingestAll(spark, csv, wh)
  }

  test("jdbc ingest == csv ingest: identical tables through the same seam") {
    // The reference's real source is a live Postgres (logical replication,
    // slot airbyte_slot — Diary of Making.md:101-127); prove the
    // transport-agnostic seam by replaying the SAME fixture through an
    // embedded Derby and asserting table-for-table equality with the CSV
    // path (modulo the random provenance values).
    val (csv, wh) = dirs
    val url = "jdbc:derby:memory:uberjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // reference DDL (Diary of Making.md:64-68), Derby spelling
      st.executeUpdate("CREATE TABLE taxi_zone_lookup (" +
        "locationid SMALLINT PRIMARY KEY, borough VARCHAR(32), zone VARCHAR(64))")
      st.executeUpdate("CREATE TABLE base_num_and_name (" +
        "base_num VARCHAR(6) PRIMARY KEY, base_name VARCHAR(64))")
      st.executeUpdate("CREATE TABLE raw_data_janjune_15 (" +
        "dispatching_base_num VARCHAR(6), pickup_date TIMESTAMP, " +
        "affiliated_base_num VARCHAR(6), locationid SMALLINT)")
      import scala.jdk.CollectionConverters._
      def rows(name: String): Seq[Array[String]] =
        Files.readAllLines(Paths.get(s"$csv/$name.csv")).asScala.toSeq
          .drop(1).filter(_.nonEmpty).map(_.split(",", -1))
      val pz = conn.prepareStatement("INSERT INTO taxi_zone_lookup VALUES (?,?,?)")
      rows("taxi_zone_lookup").foreach { r =>
        pz.setInt(1, r(0).toInt); pz.setString(2, r(1)); pz.setString(3, r(2))
        pz.executeUpdate()
      }
      val pb = conn.prepareStatement("INSERT INTO base_num_and_name VALUES (?,?)")
      rows("base_num_and_name").foreach { r =>
        pb.setString(1, r(0)); pb.setString(2, r(1)); pb.executeUpdate()
      }
      val pf = conn.prepareStatement("INSERT INTO raw_data_janjune_15 VALUES (?,?,?,?)")
      rows("raw_data_janjune_15").foreach { r =>
        pf.setString(1, r(0))
        if (r(1).isEmpty) pf.setNull(2, java.sql.Types.TIMESTAMP)
        else pf.setTimestamp(2, java.sql.Timestamp.valueOf(r(1)))
        pf.setString(3, r(2)); pf.setInt(4, r(3).toInt)
        pf.executeUpdate()
      }
    } finally conn.close()
    val whJ = Files.createTempDirectory("uber_jdbc_wh").toString
    val base = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    graft.uber.Schemas.sources.foreach { case (name, _) =>
      val opts =
        if (name == "raw_data_janjune_15")
          // exercise the parallel range-scan path the 100 TB read uses
          base ++ Map("partitionColumn" -> "locationid",
            "lowerBound" -> "1", "upperBound" -> "7", "numPartitions" -> "3")
        else base
      graft.uber.Ingest.ingestTableJdbc(spark, name, url, whJ, opts)
    }
    graft.uber.Schemas.sources.foreach { case (name, schema) =>
      val cols = schema.fieldNames.toSeq ++
        (if (name == "raw_data_janjune_15") Seq("pickup_month") else Nil)
      val a = spark.read.parquet(s"$wh/$name").select(cols.map(col): _*)
      val b = spark.read.parquet(s"$whJ/$name").select(cols.map(col): _*)
      assert(a.schema == b.schema,
        s"$name schema drifted across transports: ${a.schema} vs ${b.schema}")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$name rows differ between jdbc and csv ingest")
    }
    // the jdbc fact landed month-partitioned like the csv path
    assert(new java.io.File(s"$whJ/raw_data_janjune_15").listFiles()
      .exists(_.getName.startsWith("pickup_month=")))
    // restore the CSV-backed views for any later test
    graft.uber.Ingest.ingestAll(spark, csv, wh)
  }
}
