package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Dev scratchpad: stage-by-stage timing of the CURRENT d2 shape (round
  * 10: word-shingle MinHash band candidates + exact char-3gram verify) —
  * the triage harness for "which stage moved" questions.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("scratch")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[scratch] $n%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($c)")
    }
    val docs = Tables.load(spark, d, "documents")
    time("warmup")(docs.count())
    import graft.functions.TextFunctions._
    val sh = docs
      .select(col("doc_id"), lowerTokens(col("text")).as("toks"))
      .select(col("doc_id"), wordNgrams(col("toks"), 3).as("ngrams"))
      .select(col("doc_id"), graft.expressions.PortableHashExpressions
        .md5HashArray62(col("ngrams"), distinctSorted = true).as("sh"))
    time("shingle build")({ sh.write.format("noop").mode("overwrite").save(); 0L })
    val bands = sh.select(col("doc_id"),
      explode(graft.expressions.PortableHashExpressions.minhashBandKeysMod31(
        col("sh"), graft.functions.TextFunctions.minhashPermA31,
        graft.functions.TextFunctions.minhashPermB31, bands = 32, rows = 2)).as("bkey"))
    time("band keys")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(cand.count())
    time("full d2 shape")(graft.operators.Dedup.ngramPairs(docs).count())
    spark.stop()
  }
}
