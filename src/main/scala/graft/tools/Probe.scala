package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.expressions.SetSketchExpressions

/** Dev profiling harness: times the internal stages of heavy operators. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.load(spark, d, "documents")
    time("docs.count")(docs.count())
    val base = docs
      .select(col("doc_id"), lowerTokens(col("text")).as("toks"))
      .select(col("doc_id"), wordNgrams(col("toks"), 3).as("ngrams"))
      .select(col("doc_id"),
        array_sort(transform(array_distinct(col("ngrams")), x => xxhash64(x))).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    time("shingles (noop)")( { base.write.format("noop").mode("overwrite").save(); base.count() } )
    val bands = base.select(col("doc_id"),
      explode(SetSketchExpressions.minhashBandKeys64(
        col("sh"), minhashPermA, minhashPermB, 32, 2)).as("bkey"))
    time("bands (noop)")( { bands.write.format("noop").mode("overwrite").save(); 0L } )
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("cand.count")(cand.count())
    val withSets = cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n_sh").as("n_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n_sh").as("n_b")), "doc_b")
    val inter = SetSketchExpressions.sortedIntersectSize(col("sh_a"), col("sh_b"))
    val out = withSets.withColumn("inter", inter)
      .withColumn("jac", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jac") >= 0.2)
    time("verify+filter")(out.count())
    spark.stop()
  }
}
