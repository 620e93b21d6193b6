package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("g1 pagerank: ranks positive, popularity-ordered, deterministic") {
    val out = Graph.g1Pagerank(spark, sfDir)
    val rows = out.as[(String, Double)].collect()
    assert(rows.length == 30)
    rows.foreach { case (n, r) => assert(r > 0.15, s"$n rank $r") }
    // output is rank-descending with node tiebreak
    val sorted = rows.sortBy { case (n, r) => (-r, n) }.toSeq
    assert(rows.toSeq == sorted)
    // a node's rank grows with its degree: the top node has at least the
    // median degree of the ranked nodes
    val ev = Tables.load(spark, sfDir, "events")
      .select(concat(lit("u"), $"user_id").as("src"),
        concat(lit("k"), get_json_object($"props", "$.k")).as("dst"))
      .where($"dst".isNotNull).distinct()
    val deg = ev.unionAll(ev.select($"dst".as("src"), $"src".as("dst")))
      .groupBy($"src").agg(count(lit(1)).as("deg"))
      .as[(String, Long)].collect().toMap
    val rankedDegs = rows.map { case (n, _) => deg(n) }
    assert(rankedDegs.head >= rankedDegs.sorted.apply(rankedDegs.length / 2),
      "top-ranked node should not be low-degree")
    // deterministic across runs (bitwise — sorted folds fix the sum order)
    val again = Graph.g1Pagerank(spark, sfDir).as[(String, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }
}
