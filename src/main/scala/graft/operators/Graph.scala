package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relationally-derived edge lists — the iterative
  * family alongside d5's connected components. The engine's stance: a graph
  * is an edge DataFrame; one iteration is one join + one aggregation. With
  * a FIXED iteration count the whole unrolled DAG plans as one job; a
  * data-dependent loop would cut lineage per round with localCheckpoint
  * (d5's shape — the round-2 plan-growth lesson).
  *
  * Scale shape: each PageRank round shuffles the edge list once on the
  * source key and once on the destination key — the same partitioning every
  * round, so a cluster run pre-partitions edges by src and the per-round
  * cost is one co-partitioned join + one agg. No driver-side graph state;
  * ranks live in a DataFrame keyed by node.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private def sround(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** Exact-order double summation: fold the values in sorted order so the
    * result is one specific association order both engines reproduce
    * (t8/t17's trick — list_sort + list_aggregate 'sum' in DuckDB).
    */
  private def sortedFoldSum(c: Column): Column =
    aggregate(array_sort(collect_list(c)), lit(0.0), (acc, x) => acc + x)

  // ------------------------------------------------------- g1_pagerank
  /** PageRank (3 damped iterations, d=0.85) over the bipartite
    * user-interacts-with-item graph mined from `events` (user_id ↔
    * props.k), walked UNDIRECTED (each edge contributes both ways) so no
    * dangling-mass correction is needed. Every iteration is:
    *
    *   contribs = edges ⋈ rank (on src) ⋈ outdeg  → (dst, rank/deg)
    *   rank'    = 0.15 + 0.85 * Σ contribs per dst (sorted fold)
    *
    * Float discipline: initial ranks are exact (1.0), degrees are exact
    * integers, and each per-node Σ folds in SORTED order — so the rank
    * doubles stay bitwise-identical across engines through all three
    * iterations, and the oracle (the same three rounds unrolled as CTEs)
    * hash-matches even the top-k cut.
    */
  val g1Pagerank: Q = (s, d) => {
    val base = Tables.load(s, d, "events")
      .select(concat(lit("u"), col("user_id")).as("src"),
        concat(lit("k"), get_json_object(col("props"), "$.k")).as("dst"))
      .where(col("dst").isNotNull)
      .distinct()
    // ONE eager materialization: edges carry (src, dst, deg-of-src) so the
    // per-iteration work is a single join + agg. nodes derive from the
    // checkpointed frame (tiny re-agg per use beats extra eager jobs).
    val edges = {
      val e = base.unionAll(base.select(col("dst").as("src"), col("src").as("dst")))
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
        .localCheckpoint(true)
    }
    val nodes = edges.select(col("src").as("node")).distinct()

    // FIXED 3 iterations: lineage depth is bounded, so no per-round
    // checkpoint — Catalyst plans the whole unrolled DAG in one job (a
    // data-dependent iteration count would checkpoint per round, d5-style).
    var rank = nodes.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to 3) {
      val contribs = edges
        .join(rank, edges("src") === rank("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
      rank = nodes
        .join(contribs.groupBy(col("node")).agg(sortedFoldSum(col("c")).as("csum")),
          Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) + lit(0.85) * coalesce(col("csum"), lit(0.0))).as("rank"))
    }
    rank.select(col("node"), sround(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(30)
  }

  /** DuckDB twin: the three iterations unrolled as chained CTEs, each with
    * the identical sorted-fold contribution sum.
    */
  val g1PagerankSql: String = {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.node, 0.15 + 0.85 * coalesce(s.csum, 0.0) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      list_aggregate(list_sort(list(r.rank / d.deg)), 'sum') AS csum
         |    FROM edges e JOIN $prev r ON e.src = r.node
         |      JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) s USING (node))""".stripMargin
    s"""WITH base AS (
       |  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
       |    'k' || json_extract_string(props, '$$.k') AS dst
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, 1.0 AS rank FROM nodes),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, floor(rank * 1000000.0 + 0.5) / 1000000.0 AS rank
       |FROM r3 ORDER BY 2 DESC, node LIMIT 30""".stripMargin
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "g1_pagerank" -> g1Pagerank)

  val oracles: Map[String, String] = Map(
    "g1_pagerank" -> g1PagerankSql)
}
