package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming near-duplicate suppression — the missing middle between
  * CorpusStream (streams EXACT dedup, leaves near-dup to batch) and
  * d10_incremental_dedup (batch delta-vs-corpus near dedup): each
  * micro-batch of incoming documents is verdicted against the standing
  * curated store with the SAME asymmetric d10 core (exact fingerprint,
  * then MinHash band collision verified at Jaccard >= 0.2), and only
  * `new` docs append to the store.
  *
  * Why foreachBatch and not a stateful operator: near-dup state is the
  * corpus's band index — far too large for executor state stores, and
  * shared across keys (a band key's bucket must see every historical
  * doc). The production shape IS micro-batch-vs-table (Delta/Hudi-style
  * merge): the store plays the standing index, and each batch costs one
  * delta-sized d10 pass. At 100 TB the store side's fingerprints and
  * band keys would be a maintained table rather than recomputed —
  * d10's documented contract; the stream wrapper adds nothing
  * corpus-sized per batch.
  *
  * Exactly-once: the store is a [[graft.sources.Snapshots]] table and
  * each micro-batch commits via `commitAppendEpoch(batchId)` — the epoch
  * stamped in the version manifest makes a crash between the sink commit
  * and the checkpoint advance replay as a NO-OP (StreamingSpec proves
  * this by re-running a committed batch id). The store thereby inherits
  * the whole snapshot discipline — time travel ("the corpus as of batch
  * N"), named tags, retention, compaction of micro-batch small files —
  * instead of bespoke parquet-dir handling. Replays are additionally
  * SELF-HEALING at the row level: a re-processed doc exact-matches its
  * own fingerprint in the store and is verdicted `exact`, so even an
  * epoch-less re-delivery cannot re-append.
  *
  * Within a batch, exact duplicates collapse to the smallest doc_id
  * before the store pass; near-dup pairs WITHIN one micro-batch are
  * intentionally both admitted (d10's asymmetric contract — incoming x
  * existing only) and become each other's `near` match only once a later
  * batch collides with the stored one. A latency-insensitive pipeline
  * runs the batch d2/d5 cluster pass over the store periodically for
  * those; the split mirrors CorpusStream's stream-the-narrow /
  * batch-the-global design.
  */
object NearDupStream {

  /** Verdict an incoming doc frame against the standing store (both
    * carrying CorpusStream.docSchema columns): d10's exact/near/new per
    * incoming doc, after collapsing within-batch exact duplicates to
    * their smallest doc_id.
    */
  def verdicts(store: DataFrame, incoming: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    // the fp column is KEPT through the collapse so incrementalDedup's
    // fp-reuse path skips a second normalize+hash pass per batch doc
    val slim = incoming
      .withColumn("fp", md5(TextFunctions.normText(col("text"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    Dedup.incrementalDedup(
      store.withColumn("fp", md5(TextFunctions.normText(col("text"))))
        .withColumn("incoming", lit(false))
        .unionByName(slim.withColumn("incoming", lit(true))))
  }

  /** One micro-batch: verdict against the snapshot store at `storePath`
    * (no committed version = empty corpus) and commit the `new`
    * survivors as an epoch-stamped append — a replayed `batchId` no-ops
    * before the verdict pass even runs.
    *
    * Store absence is decided by the snapshot version listing, never by
    * classifying read-error messages: a transient read failure of a real
    * store must fail the batch loudly (streaming retries it) rather than
    * silently verdict against an empty corpus and re-admit duplicates.
    * Every batch commits (even an all-duplicate one) so the epoch
    * watermark — and the table history — advances with the stream;
    * [[graft.sources.Snapshots.compact]] is the maintenance pass that
    * folds the resulting micro-batch files.
    */
  def processBatch(spark: SparkSession, storePath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.sources.Snapshots
    if (Snapshots.lastEpoch(spark, storePath).exists(_ >= batchId)) return
    val store =
      if (Snapshots.currentVersion(spark, storePath) > 0)
        Snapshots.readVersion(spark, storePath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(CorpusStream.docSchema))
    val keep = verdicts(store, batch).where(col("verdict") === "new")
    Snapshots.commitAppendEpoch(
      batch.join(keep.select(col("doc_id")), "doc_id"),
      storePath, batchId, "neardup batch")
  }

  /** Wire the suppressor onto a file-source doc feed. */
  def start(
      spark: SparkSession,
      docsDir: String,
      storePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    CorpusStream.readDocStream(spark, docsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(processBatch(spark, storePath) _)
      .start()
}
