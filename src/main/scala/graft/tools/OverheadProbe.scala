package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}

/** Decomposes the fixed per-query bench overhead at tiny SF: table load
  * (listing + footer schema), plan construction, analysis, execution, and
  * the noop sink — to tell which part of the ~0.6 s warmed floor is
  * addressable and which is Spark's per-job constant.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("overhead")
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $n%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm everything once
    SparkEntry.queries("q1_agg")(spark, d).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      println(s"--- iteration $i")
      val lo = time("Tables.load lineitem")(Tables.load(spark, d, "lineitem"))
      time("plan construct")(lo.groupBy("l_returnflag").agg(sum("l_quantity")))
      val q = time("full query build")(SparkEntry.queries("q1_agg")(spark, d))
      time("analyze (schema)")(q.schema)
      time("noop write")(q.write.format("noop").mode("overwrite").save())
      time("count instead")(q.count())
      val q2 = SparkEntry.queries("q1_agg")(spark, d)
      time("2nd noop write")(q2.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
