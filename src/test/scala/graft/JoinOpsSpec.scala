package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Plan-level guarantees for the cluster-scale join disciplines: salted
  * joins return identical results, bucketed tables join with no exchange.
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join (deterministic salt source)") {
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey").collect().map(_.toSeq).toSet
    val salted = JoinOps.saltedJoin(
      orders, customer, $"o_custkey", $"c_custkey", salts = 8,
      leftSaltSource = Some($"o_orderkey"))
      .select($"o_orderkey", $"c_custkey").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted join scatters a hot key across all salt partitions") {
    // skewed left: 10k rows of ONE key
    val left = spark.range(10000).select(lit(7L).as("k"), $"id")
    val right = Seq((7L, "x")).toDF("rk", "v")
    val out = JoinOps.saltedJoin(left, right, $"k", $"rk", salts = 8,
      leftSaltSource = Some($"id"))
    assert(out.count() == 10000)
    // the salt column actually took >1 distinct value pre-drop
    val salts = left
      .withColumn("__salt", pmod(xxhash64($"id"), lit(8)))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(salts == 8)
  }

  test("AQE splits a skewed join partition at runtime (the d2 hot-block story)") {
    val s2 = spark.newSession()
    // thresholds scaled down so the fixture-sized skew trips the rewrite
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import s2.implicits._
    // one pathological key carrying ~all rows vs a uniform right side
    val left = s2.range(40000)
      .select(when($"id" < 39000, lit(7L)).otherwise($"id").as("k"),
        concat(lit("payload-"), $"id").as("pad"))
    val right = s2.range(200).select($"id".as("k"), lit("dim").as("v"))
    val joined = left.join(right, "k")
    // collect() drives THIS DataFrame's QueryExecution so its adaptive
    // plan finalizes (count() would execute a different wrapping plan
    // and leave this one isFinalPlan=false)
    assert(joined.collect().length == 39000) // only the hot key resolves
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE skew-join rewrite did not engage:\n$plan")
  }

  test("bucketed tables sort-merge join with NO exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // write both sides bucketed by the join key: the shuffle happens once
    // at WRITE time; every later join on the key reads co-located buckets
    Tables.load(s2, sfDir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.load(s2, sfDir, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val joined = s2.table("orders_b")
      .join(s2.table("customer_b"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // and it still returns the right rows
    val expected = Tables.load(s2, sfDir, "orders")
      .join(Tables.load(s2, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .count()
    assert(joined.count() == expected)
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // The 100-TB story for selective dim joins that are too big to
    // broadcast: Catalyst's InjectRuntimeFilter builds a bloom filter
    // from the filtered dim side and semi-filters the fact scan BEFORE
    // the shuffle, so the exchange moves only rows that can match. The
    // size thresholds are tuned for clusters; forcing them here proves
    // the rewrite fires on our join shapes and stays result-exact.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    val orders = Tables.load(s2, sfDir, "orders")
    val cust = Tables.load(s2, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val j = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"runtime bloom filter did not inject:\n$optimized")
    // and the filter is only a pruning hint: results stay exact
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val plain = Tables.load(s3, sfDir, "orders")
      .join(Tables.load(s3, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
      .collect().map(_.toSeq).toSet
    assert(j.collect().map(_.toSeq).toSet == plain && plain.nonEmpty)
  }

  test("q24 bucketed range join == naive inequality join (independent path)") {
    // The DuckDB oracle twin now shares the bucket ACCESS PATH (the plain
    // IEJoin oracle was unusable at sf10); this differential keeps the
    // bucket idea independently checked: Spark's own naive inequality
    // join (broadcast nested loop — fine at spec scale, quadratic at
    // scale) must produce the identical pair set. sf0.01: the sf0.001
    // event stream is too sparse to yield any ±5s pair.
    val sf01 = "/root/testdata/sf0.01"
    val e = Tables.load(spark, sf01, "events")
    val errs = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("err_us"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    val naive = errs.join(purch,
        abs(col("err_us") - col("p_us")) <= lit(5000000L))
      .select(col("err_id"), col("p_id"),
        ((col("p_us") - col("err_us")) / lit(1000000.0)).as("dt_sec"))
      .collect().map(_.toSeq).toSet
    val bucketed = graft.operators.Relational.q24RangeJoin(spark, sf01)
      .collect().map(_.toSeq).toSet
    assert(naive.nonEmpty, "fixture must produce at least one ±5s pair")
    assert(bucketed == naive)
  }
}
