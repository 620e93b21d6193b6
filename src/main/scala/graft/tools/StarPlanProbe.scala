package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.Materialize._

/** One-off plan probe: does a starComponents round's `next` plan reuse the
  * `ls` exchange (two consumers shuffle ls by the same key), or compute the
  * subtree twice? r17 optimization removed the per-round ls checkpoint on
  * the reuse assumption — this prints the evidence.
  */
object StarPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("starplan")
    import spark.implicits._
    val parts = 8
    val edges = (1L to 1000L).map(i => (i + 1, i / 2 + 1)).toDF("u", "v")
      .filter(col("u") =!= col("v"))
      .repartition(parts, col("u")).dropDuplicates(Seq("u", "v"))
      .materialize()
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val lsm = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    val ls = sym.join(lsm, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
    val ssm = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
    val next = ls.join(ssm, "u").filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(ssm.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .repartition(parts, col("u")).dropDuplicates(Seq("u", "v"))
    next.write.format("noop").mode("overwrite").save()
    // executed plan AFTER AQE finalization: count Exchange vs ReusedExchange
    val plan = next.queryExecution.executedPlan.toString
    println("=== executed plan ===")
    println(plan)
    val nEx = "(?m)^\\s*[+:]*-* *Exchange ".r.findAllIn(plan).size
    println(s"Exchange nodes: $nEx; ReusedExchange/StageReuse mentions: " +
      ("ReusedExchange|reused".r.findAllIn(plan).size))
    // probe plan: full-outer marker join of two co-partitioned frames
    val nextM = next.materialize()
    val probe = nextM.select(col("u"), col("v"), lit(1).as("a"))
      .join(edges.select(col("u"), col("v"), lit(1).as("b")),
        Seq("u", "v"), "full_outer")
      .filter(col("a").isNull || col("b").isNull)
    println("=== probe isEmpty: " + probe.isEmpty + " ===")
    println(probe.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
