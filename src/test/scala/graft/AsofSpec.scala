package graft

import org.apache.spark.sql.functions._
import graft.plans.Asof

class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def clicks = Tables.load(spark, sfDir, "events")
    .filter($"event_type" === "click")
    .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
  private def views = Tables.load(spark, sfDir, "events")
    .filter($"event_type" === "view")
    .select($"event_id".as("view_id"), $"user_id".as("v_user"), $"ts".as("view_ts"))

  test("asof custom plan == composed built-ins twin (self-join shape)") {
    val custom = Asof.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
      .select($"click_id", $"view_id").collect().map(_.toSeq).toSet
    val composed = Asof.joinComposed(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
      .select($"click_id", $"view_id").collect().map(_.toSeq).toSet
    assert(custom == composed)
    assert(custom.nonEmpty)
  }

  test("asof plans the custom exec with exchanges/sorts inserted by Spark") {
    val df = Asof.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
    // AdaptiveSparkPlanExec holds its input plan outside `children`, so
    // assert on the rendered tree rather than exists()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsofJoin"), s"expected AsofJoinExec in:\n$s")
    assert(s.contains("Exchange") && s.contains("Sort"),
      "EnsureRequirements should have inserted shuffle + sort")
  }

  test("asof semantics on a hand-built fixture: latest <=, ties, null-extend") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val l = Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 20L, ts(50)), (4L, 30L, ts(10)))
      .toDF("lid", "k", "lts")
    val r = Seq((101L, 10L, ts(100)), (102L, 10L, ts(150)), (103L, 20L, ts(60)))
      .toDF("rid", "rk", "rts")
    val out = Asof.join(l, r, "k", "rk", "lts", "rts")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(101L)) // tie at ts=100 matches (>= semantics)
    assert(out(2L).contains(102L)) // latest prior, not first
    assert(out(3L).isEmpty)        // right row is AFTER left ts -> no match
    assert(out(4L).isEmpty)        // key has no right rows at all
  }

  test("asof is invariant under shuffle-partition settings (AQE co-alignment)") {
    val expected = Asof.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
      .select($"click_id", $"view_id").collect().map(_.toSeq).toSet
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Seq("1", "17", "64").foreach { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        val got = Asof.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
          .select($"click_id", $"view_id").collect().map(_.toSeq).toSet
        assert(got == expected, s"diverged at shuffle.partitions=$n")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("asof left rows are all preserved (left-outer cardinality)") {
    val n = clicks.count()
    val joined = Asof.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
    assert(joined.count() == n)
  }
}
