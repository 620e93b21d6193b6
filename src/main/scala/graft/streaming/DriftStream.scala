package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming corpus-drift monitor — t30 on arrival: incoming documents
  * accumulate a gram-count profile micro-batch by micro-batch, and at any
  * point the drift table against a FROZEN reference profile is one call
  * away, computed by the exact t30 arithmetic. The operational question it
  * answers live: "is the crawl currently feeding us shifting away from the
  * corpus we trained the filters on?" — caught while the feed runs, not
  * after the month closes.
  *
  * State discipline: the accumulating profile is VOCAB-sized (one long per
  * distinct gram), far smaller than the corpus but too large and too
  * cross-key for executor state stores — so like NearDupStream it lives as
  * a parquet table, maintained by foreachBatch. Each batch writes the
  * merged profile to a NEW versioned subdir (`gen=<batchId>`): the write
  * is idempotent under crash-replay — a replayed batch either finds its
  * own generation already sealed (crash after seal, before checkpoint
  * commit) and no-ops, or recomputes the same merge from the max sealed
  * generation strictly below its id and overwrites its own generation
  * deterministically. Readers always take the highest complete
  * generation — the manifest-last idea in directory form.
  * At 100 TB the per-batch cost is delta-gram-sized: one narrow explode
  * of the batch + one vocab-keyed outer merge.
  */
object DriftStream {

  /** Gram counts of a doc frame: (w, c). */
  def gramCounts(docs: DataFrame): DataFrame = docs
    .select(explode(TextFunctions.lowerTokens(col("text"))).as("w"))
    .groupBy(col("w")).agg(count(lit(1)).as("c"))

  private def genDir(statePath: String, gen: Long) = s"$statePath/gen=$gen"

  /** All sealed generation ids at `statePath` (a generation counts only
    * once its `_SUCCESS` marker exists: a crash mid-write must leave the
    * previous generation authoritative).
    */
  def sealedGens(spark: SparkSession, statePath: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .filter(n => fs.exists(new org.apache.hadoop.fs.Path(p, s"$n/_SUCCESS")))
      .map(_.stripPrefix("gen=").toLong)
      .toSeq
  }

  /** Highest complete generation id at `statePath`, -1 if none. */
  def latestGen(spark: SparkSession, statePath: String): Long =
    sealedGens(spark, statePath).foldLeft(-1L)(math.max)

  private def profileAt(spark: SparkSession, statePath: String,
      gen: Long): DataFrame =
    if (gen < 0)
      gramCounts(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(CorpusStream.docSchema)))
    else spark.read.parquet(genDir(statePath, gen))

  /** The accumulated incoming profile (w, c); empty frame if none yet. */
  def profile(spark: SparkSession, statePath: String): DataFrame =
    profileAt(spark, statePath, latestGen(spark, statePath))

  /** One micro-batch: merge the batch's gram counts into the profile and
    * publish the next generation.
    *
    * Crash-replay discipline: the parent is the max sealed generation
    * STRICTLY BELOW `batchId` — never "the latest". If a sealed
    * `gen >= batchId` already exists, this batch was fully published
    * before the checkpoint crash and the replay is a no-op. Reading the
    * plain latest here would (a) merge a generation that already contains
    * this batch (double-count) and (b) lazily read the very `gen=batchId`
    * path the write below overwrites — which Spark's self-overwrite check
    * aborts, wedging the stream.
    */
  def processBatch(spark: SparkSession, statePath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val gens = sealedGens(spark, statePath)
    // Generation ids are COUPLED to one checkpoint lineage (gen ==
    // batchId). A fresh checkpoint (ids restarting at 0) pointed at an
    // existing statePath would silently no-op on every batch until its
    // ids passed the old max gen — fail loudly instead (ADVICE round 10).
    require(batchId > 0 || gens.isEmpty,
      s"DriftStream state at $statePath has sealed generations " +
        s"(max ${gens.max}) but this checkpoint is starting at batch 0 — " +
        "state and checkpoint belong to different lineages; point the fresh " +
        "checkpoint at a fresh statePath (or restore the old checkpoint)")
    if (gens.exists(_ >= batchId)) return // sealed before the crash: replay no-op
    val parent = gens.filter(_ < batchId).foldLeft(-1L)(math.max)
    val prev = profileAt(spark, statePath, parent)
    val merged = prev.withColumnRenamed("c", "c0")
      .join(gramCounts(batch).withColumnRenamed("c", "c1"), Seq("w"), "full_outer")
      .select(col("w"),
        (coalesce(col("c0"), lit(0L)) + coalesce(col("c1"), lit(0L))).as("c"))
    merged.write.mode("overwrite").parquet(genDir(statePath, batchId))
  }

  /** The live drift table: frozen reference profile (side A) vs the
    * accumulated incoming profile (side B), scored by t30's exact
    * arithmetic — grams absent from one side count zero there, exactly
    * as the batch operator sees them.
    */
  def driftAgainst(spark: SparkSession, reference: DataFrame,
      statePath: String): DataFrame = {
    val counts = reference.withColumnRenamed("c", "ca")
      .join(profile(spark, statePath).withColumnRenamed("c", "cb"),
        Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    graft.operators.TextAnalysis.driftTable(counts)
  }

  /** Wire the profile accumulator onto a file-source doc feed. */
  def start(
      spark: SparkSession,
      docsDir: String,
      statePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    CorpusStream.readDocStream(spark, docsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(processBatch(spark, statePath) _)
      .start()
}
