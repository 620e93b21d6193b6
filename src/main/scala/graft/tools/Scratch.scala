package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Dev scratchpad: stage-by-stage timing of t38's per-doc array pipeline
  * (round 11: duplicated-5gram coverage measured 7.8 s at sf0.1 on 5000
  * ~54-token docs — something re-evaluates) — the triage harness for
  * "which stage is pathological" questions.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("scratch")
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $n%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.load(spark, d, "documents")
    time("warmup")(noop(docs))
    val l1 = docs.selectExpr("doc_id",
      "filter(split(lower(text), '\\\\s+'), w -> w != '') AS toks")
    time("l1 toks")(noop(l1))
    val l2 = l1.selectExpr("doc_id", "CAST(size(toks) AS BIGINT) AS n_tokens",
      """CASE WHEN size(toks) < 5 THEN array()
         ELSE transform(sequence(1, size(toks) - 4),
           i -> concat_ws(' ', slice(toks, i, 5))) END AS grams""")
    time("l2 grams")(noop(l2))
    val l3 = l2.selectExpr("doc_id", "n_tokens", "grams", "array_sort(grams) AS sg")
    time("l3 sort")(noop(l3))
    val l4 = l3.selectExpr("doc_id", "n_tokens", "grams",
      """CASE WHEN size(sg) < 2 THEN array()
         ELSE array_distinct(filter(
           transform(sequence(2, size(sg)), i ->
             IF(element_at(sg, i) = element_at(sg, i - 1),
                element_at(sg, i), NULL)),
           x -> x IS NOT NULL)) END AS dups""")
    time("l4 dups")(noop(l4))
    val l5 = l4.selectExpr("doc_id", "n_tokens",
      """CASE WHEN size(grams) = 0 THEN array()
         ELSE filter(sequence(1, size(grams)),
           i -> array_contains(dups, element_at(grams, i))) END AS starts""")
    time("l5 starts")(noop(l5))
    time("full t38")(noop(graft.operators.TextAnalysis.t38DupNgramChars(spark, d)))
    spark.stop()
  }
}
