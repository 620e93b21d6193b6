package graft.tools

import graft.GraftSession

/** Dev tool: d21's any-length ExactSubstr cost curve vs minimum match
  * length L at the given SF dir — min of GRAFT_DRIFT_N runs per point
  * (DriftBench's noise discipline). Companion evidence to SpanCurve:
  * stride-1 windows emit ~n_tokens rows at ANY L (window count barely
  * moves), so unlike d8/d18's chunks the scan cost is flat in L and the
  * knob only controls WHAT counts as a repeat — the removed mass falls
  * as L grows toward Lee et al.'s production ~50 tokens.
  */
object ExactSubstrCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_DRIFT_N", "3").toInt
    val ls = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 8, 16, 32)
    val spark = GraftSession.local("exactsubstrcurve")
    def once(l: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.exactSubstrAt(spark, sfDir, l)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(ls.head) // warmup
    ls.foreach { l =>
      val ts = (1 to reps).map(_ => once(l)).sorted
      val agg = graft.operators.Dedup.exactSubstrAt(spark, sfDir, l)
        .agg(org.apache.spark.sql.functions.sum("n_spans"),
          org.apache.spark.sql.functions.sum("n_removed")).head()
      println(f"XSUB L=$l%-3d min=${ts.head}%.2f s  spans=${agg.getLong(0)}%,d  removed=${agg.getLong(1)}%,d")
    }
    spark.stop()
  }
}
