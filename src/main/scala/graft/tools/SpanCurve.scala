package graft.tools

import graft.GraftSession

/** Dev tool: the d8/d18 span-dedup cost curve vs span length n at the
  * given SF dir — min of GRAFT_DRIFT_N runs per point (DriftBench's
  * noise discipline). Records the evidence behind d18's claim that the
  * plan gets CHEAPER as the match grain grows toward Lee et al.'s
  * production ~50 tokens.
  */
object SpanCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_DRIFT_N", "3").toInt
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(3, 8, 16, 32, 64)
    val spark = GraftSession.local("spancurve")
    def once(n: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.spanDedupAt(spark, sfDir, n)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(ns.head) // warmup
    ns.foreach { n =>
      val ts = (1 to reps).map(_ => once(n)).sorted
      val agg = graft.operators.Dedup.spanDedupAt(spark, sfDir, n)
        .agg(org.apache.spark.sql.functions.sum("n_spans"),
          org.apache.spark.sql.functions.sum("n_dropped")).head()
      println(f"SPAN n=$n%-3d min=${ts.head}%.2f s  spans=${agg.getLong(0)}%,d  dropped=${agg.getLong(1)}%,d")
    }
    spark.stop()
  }
}
