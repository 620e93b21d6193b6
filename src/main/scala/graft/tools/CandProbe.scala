package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._

/** Round-11 measurement probe for the d2-family candidate pre-filters
  * (VERDICT r10 item 1). Two proposed cuts before the gram-array verify
  * join:
  *
  *   (a) gram-count ratio: least(n_a,n_b) >= minJac * greatest(n_a,n_b)
  *       — PROVABLY lossless for verify threshold minJac
  *       (jac <= min/max for sets), so d2/d13 output is unchanged;
  *   (b) >= 2 distinct band collisions per pair — lossy in principle
  *       (a true pair surfaced by exactly one band is dropped), so it
  *       must be measured against the verified output and the d12 truth
  *       before adoption.
  *
  * Prints, for a given sf dir: candidate counts under each cut and their
  * intersection, verified-pair counts from each candidate set (does the
  * cut change the OUTPUT?), and d12-style word-truth recall.
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = GraftSession.local("cand-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, d, "documents").localCheckpoint(true)
    println(s"[probe] dir=$d docs=${docs.count()}")

    // --- band collisions with per-pair counts (same join as ngramPairs,
    //     count instead of distinct: identical shuffle)
    val bands = docs
      .select(col("doc_id"), lowerTokens(col("text")).as("toks"))
      .select(col("doc_id"), wordNgrams(col("toks"), 3).as("ngrams"))
      .select(col("doc_id"), graft.expressions.PortableHashExpressions
        .md5HashArray62(col("ngrams"), distinctSorted = true).as("sh"))
      .select(col("doc_id"),
        explode(graft.expressions.PortableHashExpressions.minhashBandKeysMod31(
          col("sh"), minhashPermA31, minhashPermB31, bands = 32, rows = 2)).as("bkey"))
    val pairColl = bands.as("x").join(bands.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ncoll"))
      .localCheckpoint(true)

    val ng = docs.select(col("doc_id"),
        size(graft.expressions.SetSketchExpressions
          .hashedSortedCharNgrams(col("text"), 3)).as("n_grams"))
      .localCheckpoint(true)
    val withN = pairColl
      .join(ng.select(col("doc_id").as("doc_a"), col("n_grams").as("n_a")), "doc_a")
      .join(ng.select(col("doc_id").as("doc_b"), col("n_grams").as("n_b")), "doc_b")
      .withColumn("ratio",
        least(col("n_a"), col("n_b")) / greatest(col("n_a"), col("n_b")))
      .localCheckpoint(true)

    def cnt(name: String, dfc: Long): Unit = println(f"[probe] $name%-28s $dfc%9d")
    cnt("cand_all", withN.count())
    cnt("cand_coll>=2", withN.filter(col("ncoll") >= 2).count())
    cnt("cand_ratio>=0.5", withN.filter(col("ratio") >= 0.5).count())
    cnt("cand_ratio>=0.3", withN.filter(col("ratio") >= 0.3).count())
    cnt("cand_coll2_and_r05",
      withN.filter(col("ncoll") >= 2 && col("ratio") >= 0.5).count())
    cnt("cand_coll2_and_r03",
      withN.filter(col("ncoll") >= 2 && col("ratio") >= 0.3).count())

    // --- does coll>=2 change the d2 verified output? (ratio can't.)
    val verifiedAll = graft.operators.Dedup.ngramPairs(docs, 0.5)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val v1 = verifiedAll.count()
    val lost = verifiedAll.join(
      withN.filter(col("ncoll") >= 2).select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti").count()
    cnt("verified@0.5_all", v1)
    cnt("verified@0.5_lost_by_coll2", lost)
    val verified03 = graft.operators.Dedup.ngramPairs(docs, 0.3)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val v03 = verified03.count()
    val lost03 = verified03.join(
      withN.filter(col("ncoll") >= 2).select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti").count()
    cnt("verified@0.3_all", v03)
    cnt("verified@0.3_lost_by_coll2", lost03)

    // --- d3 / d12 side: word-shingle truth at 0.2 vs collision count,
    //     and the lossless n_sh ratio cut at 0.2
    val base = docs
      .select(col("doc_id"), lowerTokens(col("text")).as("toks"))
      .select(col("doc_id"), wordNgrams(col("toks"), 3).as("ngrams"))
      .select(col("doc_id"), graft.expressions.PortableHashExpressions
        .md5HashArray62(col("ngrams"), distinctSorted = true).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .localCheckpoint(true)
    val nsh = base.select(col("doc_id"), col("n_sh"))
    val withSh = withN
      .join(nsh.select(col("doc_id").as("doc_a"), col("n_sh").as("s_a")), "doc_a")
      .join(nsh.select(col("doc_id").as("doc_b"), col("n_sh").as("s_b")), "doc_b")
      .withColumn("sratio",
        least(col("s_a"), col("s_b")) / greatest(col("s_a"), col("s_b")))
      .localCheckpoint(true)
    cnt("cand_sratio>=0.2", withSh.filter(col("sratio") >= 0.2).count())
    val inv = base.select(col("doc_id"), explode(col("sh")).as("h"))
    val truth = inv.as("x").join(inv.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(nsh.select(col("doc_id").as("doc_a"), col("n_sh").as("s_a")), "doc_a")
      .join(nsh.select(col("doc_id").as("doc_b"), col("n_sh").as("s_b")), "doc_b")
      .filter(col("inter") / (col("s_a") + col("s_b") - col("inter")) >= 0.2)
      .select("doc_a", "doc_b").localCheckpoint(true)
    cnt("word_truth@0.2", truth.count())
    val truthColl = truth.join(withN.select("doc_a", "doc_b", "ncoll"),
      Seq("doc_a", "doc_b"), "left")
    cnt("truth_ncoll_null(missed)", truthColl.filter(col("ncoll").isNull).count())
    cnt("truth_ncoll==1", truthColl.filter(col("ncoll") === 1).count())
    cnt("truth_ncoll>=2", truthColl.filter(col("ncoll") >= 2).count())
    truthColl.filter(col("ncoll") === 1).show(10, false)
    spark.stop()
  }
}
