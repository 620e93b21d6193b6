package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions, registered via
  * SparkSessionExtensions — a session built with the extension can call the
  * sketch functions from plain SQL.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
  ).getOrCreate()

  test("sketch functions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_sorted_intersect_size(array(1L,2L,3L), array(2L,3L,4L)) AS inter,
        |  size(graft_minhash_sig(array(11L,22L,33L))) AS sig_len,
        |  size(graft_minhash_band_keys(array(11L,22L,33L), 8, 2)) AS n_bands,
        |  graft_simhash(array(11L, 22L)) AS sh,
        |  size(graft_winnow('abcdefghijklmnop', 5, 4)) AS n_fps
        |""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 64)
    assert(r.getInt(2) == 8)
    assert(r.getInt(4) >= 1)
  }

  test("SQL and Column APIs agree on the same input") {
    import org.apache.spark.sql.functions._
    import graft.expressions.SetSketchExpressions
    val viaSql = spark.sql("SELECT graft_simhash(array(7L, 8L, 9L)) AS s").head().getLong(0)
    val viaCol = spark.range(1)
      .select(SetSketchExpressions.simhash64(typedlit(Seq(7L, 8L, 9L))).as("s"))
      .head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("portable hash + bloom functions are callable from SQL") {
    // graft_hash62 must return the frozen DuckDB-equivalent value
    assert(spark.sql("SELECT graft_hash62('abc')").head().getLong(0)
      == 3638874587954910934L)
    assert(spark.sql(
      "SELECT graft_hash62_array(array('abc', 'a', 'abc'), true)")
      .head().getSeq[Long](0)
      == Seq(2388727949023626033L, 3638874587954910934L))
    assert(spark.sql(
      "SELECT size(graft_minhash_band_keys_mod31(array(11L, 22L), 8, 2))")
      .head().getInt(0) == 8)
    // bloom: inserted keys hit, a fresh key misses (no false negative run)
    val r = spark.sql(
      """WITH b AS (SELECT graft_bloom_build(h) AS f
        |           FROM (SELECT graft_hash62(x) AS h
        |                 FROM VALUES ('k1'), ('k2') AS t(x)))
        |SELECT graft_bloom_hit(f, graft_hash62('k1')),
        |       graft_bloom_hit(f, graft_hash62('k2')),
        |       graft_bloom_hit(f, graft_hash62('never-inserted'))
        |FROM b""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
  }

  test("graft_kmv_distinct works from SQL and matches the Column form") {
    import spark.implicits._
    Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li_kmv")
    val sqlV = spark.sql(
      "SELECT graft_kmv_distinct(l_partkey, 256) FROM li_kmv")
      .as[Double].head()
    val colV = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .agg(graft.expressions.KmvSketch.kmvDistinct($"l_partkey", 256))
      .as[Double].head()
    assert(sqlV == colV && sqlV > 0)
  }

  test("graft_bitmap_distinct / graft_bitmap_words work from SQL, agree with exact") {
    import spark.implicits._
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_bm")
    val r = spark.sql(
      """SELECT graft_bitmap_distinct(user_id, 65536) AS ndv,
        |  aggregate(graft_bitmap_words(user_id, 65536), 0L,
        |    (acc, x) -> acc + bit_count(x)) AS ndv_words
        |FROM ev_bm""".stripMargin).as[(Long, Long)].head()
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM ev_bm")
      .as[Long].head()
    assert(r._1 == exact && r._2 == exact)
  }

  test("ApproxDistinctRewrite: opt-in flag swaps exact distinct for KMV") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    def q() = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n"))
    val exact = q().as[(String, Long)].collect().toMap
    try {
      spark.conf.set("spark.graft.approxCountDistinct.enabled", "true")
      val approx = q()
      assert(approx.queryExecution.optimizedPlan.toString
        .contains("graft_kmv_distinct"), "rule must fire when enabled")
      approx.as[(String, Long)].collect().foreach { case (flag, est) =>
        val ex = exact(flag)
        assert(math.abs(est.toDouble - ex) / ex < 0.15, s"$flag: $est vs $ex")
      }
    } finally spark.conf.set("spark.graft.approxCountDistinct.enabled", "false")
    // disabled again: byte-identical exact results
    assert(q().as[(String, Long)].collect().toMap == exact)
    assert(!q().queryExecution.optimizedPlan.toString.contains("graft_kmv_distinct"))
  }

  test("AC automaton counts == naive all-occurrence counts (incl. nested patterns)") {
    import graft.expressions.AcAutomaton
    // "can" ends inside every "scan" (collapsed output links), "art"
    // inside "part"; adjacent repeats exercise goto self-transitions
    val pats = IndexedSeq("scan", "can", "art", "merge batch", "ab")
    val auto = new AcAutomaton(pats)
    def naive(text: String, p: String): Int =
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length))
    val fixtures = Seq(
      "scan scan part can merge batch scanscan",
      "abababab",                    // "ab" x4, adjacent
      "",                            // empty text
      "no hits here",
      "canscancan art cart artart")
    fixtures.foreach { t =>
      val got = auto.counts(t)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == naive(t, p), s"pattern '$p' on '$t'")
      }
    }
    // non-ASCII text chars reset to root, never crash or false-match
    assert(auto.counts("scän scan").toSeq == Seq(1, 1, 0, 0, 0))
  }

  test("AC construction rejects bordered patterns (oracle contract)") {
    import graft.expressions.AcAutomaton
    assert(AcAutomaton.hasBorder("table t"))   // border "t"
    assert(AcAutomaton.hasBorder("abxab"))     // border "ab" (first!=last)
    assert(!AcAutomaton.hasBorder("scan"))
    intercept[IllegalArgumentException](new AcAutomaton(IndexedSeq("table t")))
  }

  test("blocklist_stats struct agrees with per-pattern counts and stays codegen") {
    import org.apache.spark.sql.functions._
    import graft.expressions.{AcAutomaton, BlocklistExpressions}
    import spark.implicits._
    val pats = graft.operators.TextAnalysis.blockPatterns
    val auto = new AcAutomaton(pats.toIndexedSeq)
    // parquet-backed input: a local Seq would be constant-folded into a
    // LocalTableScan and there'd be no stage left to assert codegen on
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"), BlocklistExpressions.blocklistStats(col("text"), pats).as("bs"))
      .select(col("text"), col("bs.n_hits").as("h"), col("bs.n_pats").as("p"))
    df.collect().foreach { r =>
      val cnt = auto.counts(r.getString(0))
      assert(r.getLong(1) == cnt.map(_.toLong).sum)
      assert(r.getInt(2) == cnt.count(_ > 0))
    }
    // the kernel must NOT drop the stage out of whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected WholeStageCodegen stage:\n$plan")
  }
}
