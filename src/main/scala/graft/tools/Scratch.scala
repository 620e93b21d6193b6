package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = GraftSession.local("scratch")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[scratch] $n%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s ($c)")
    }
    val docs = Tables.load(spark, d, "documents")
    time("warmup")(docs.count())
    val g = docs.select(col("doc_id"), col("source"),
      floor(col("n_chars") / lit(100.0)).cast("int").as("bucket"),
      graft.expressions.SetSketchExpressions
        .hashedSortedCharNgrams(col("text"), 3).as("grams"))
      .withColumn("n_grams", size(col("grams")))
    time("grams build")( { g.write.format("noop").mode("overwrite").save(); 0L } )
    time("grams again")( { g.write.format("noop").mode("overwrite").save(); 0L } )
    val a = g.select(col("doc_id").as("doc_a"), col("source"), col("bucket"),
      col("grams").as("grams_a"), col("n_grams").as("n_a"))
    val b = g.select(col("doc_id").as("doc_b"), col("source"), col("bucket"),
      col("grams").as("grams_b"), col("n_grams").as("n_b"))
    val joined = a.join(broadcast(b), Seq("source", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
    time("join count")(joined.select(col("doc_a")).count())
    val inter = graft.expressions.SetSketchExpressions
      .sortedIntersectSize(col("grams_a"), col("grams_b"))
    time("join+intersect")(joined.withColumn("inter", inter)
      .select(col("doc_a"), col("doc_b"), col("inter"))
      .filter(col("inter") >= 0).count())
    val full = joined.withColumn("inter", inter)
      .withColumn("jac", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jac") >= 0.5)
    time("full d2 shape")(full.count())
    spark.stop()
  }
}
