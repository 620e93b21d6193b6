package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, GraftExtensions}
object ProbeExt {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[probe] ok: " + spark.sql(
      "SELECT graft_winnow('hello world of winnowing', 5, 4) AS fps").head().toString())
    try {
      spark.sql("SELECT graft_minhash_band_keys(array(1L), 1+1, 2)").head()
      println("[probe] non-literal bands: ACCEPTED (folded)")
    } catch { case e: Exception => println("[probe] non-literal bands error: " + e.getMessage.take(120)) }
    try {
      spark.sql("SELECT graft_simhash('not an array')").head()
    } catch { case e: Exception => println("[probe] wrong type error: " + e.getMessage.take(160)) }
    spark.stop()
  }
}
