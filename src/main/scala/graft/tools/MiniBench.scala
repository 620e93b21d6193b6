package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    // warmup
    SparkEntry.queries(names.head)(spark, sfDir).write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"MINI $n ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
