package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Materialize: the cluster-survivable replacement for the repo-wide
  * localCheckpoint idiom (round-11 verdict item 2). Local mode keeps the
  * fast local path; these tests force the RELIABLE and PERSIST paths on
  * the same session and prove a multi-read iterative pipeline (d5's
  * pointer-jumping components — the heaviest materialize consumer)
  * computes identical results through each, and that the reliable path
  * really does write recoverable checkpoint files to the configured dir.
  */
class MaterializeSpec extends SparkSpec {

  private def clusters(): Array[(Long, Long)] = {
    import spark.implicits._
    graft.operators.Dedup.d5DedupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().sorted
  }

  test("reliable mode without any dir fails loudly") {
    // declared first: must run before any test sets an sc checkpoint dir
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set("spark.graft.materialize", "reliable")
    try {
      import spark.implicits._
      intercept[IllegalArgumentException] {
        Materialize(Seq(1, 2, 3).toDF("x"))
      }
    } finally spark.conf.set("spark.graft.materialize", "auto")
  }

  test("reliable mode: identical results + checkpoint files in the configured dir") {
    val baseline = clusters() // auto → local[4] → localCheckpoint path
    val dir = Files.createTempDirectory("graft_mat_reliable").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    spark.conf.set("spark.graft.materialize", "reliable")
    try {
      val got = clusters()
      assert(got.sameElements(baseline))
      // the reliable path must have materialized THROUGH the dir: Spark
      // writes one rdd-<id> subtree per eager checkpoint
      // getCheckpointDir is a (possibly scheme-qualified) UUID subdir of
      // the configured dir
      val raw = spark.sparkContext.getCheckpointDir.get
      val cpDir = if (raw.startsWith("file:")) new java.io.File(new java.net.URI(raw))
        else new java.io.File(raw)
      val persisted = cpDir.listFiles()
      assert(persisted != null && persisted.exists(_.getName.startsWith("rdd-")),
        s"no rdd-* checkpoint dirs under $dir")
    } finally {
      spark.conf.set("spark.graft.materialize", "auto")
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("persist mode (cluster with no checkpoint dir): identical results") {
    val baseline = clusters()
    spark.conf.set("spark.graft.materialize", "persist")
    try assert(clusters().sameElements(baseline))
    finally spark.conf.set("spark.graft.materialize", "auto")
  }

}
