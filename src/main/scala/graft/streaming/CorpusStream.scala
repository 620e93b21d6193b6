package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Continuous corpus curation — the streaming twin of CorpusPipeline's
  * front end: documents are quality-gated and exact-deduped ON ARRIVAL,
  * so the curated store never holds a low-quality or duplicate doc.
  * Near-dup cluster resolution stays a periodic batch job over the
  * curated store (it is whole-graph work by nature) — the standard split
  * for this workload: stream the narrow per-doc gates, batch the global
  * graph pass.
  *
  * Dedup state is one fingerprint per surviving document (the synthetic
  * documents carry no event time, so the state has no watermark horizon
  * here; a production feed would stamp ingest time and swap in
  * dropDuplicatesWithinWatermark exactly like EventsStream.dedupedEvents).
  * The quality score is the SAME t2 blend (TextAnalysis.qualityBlend)
  * the batch pipeline applies — StreamingSpec asserts the streamed
  * survivor set equals CorpusPipeline's quality+exact_dedup stages.
  */
object CorpusStream {

  val docSchema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Quality gate + exact dedup over a (streaming or batch) doc frame. */
  def curate(docs: DataFrame, qualityThreshold: Double = 0.5): DataFrame =
    docs
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
        length(col("text")).cast("long").as("len_c"),
        graft.expressions.SetSketchExpressions
          .tokenStats(col("text"), TextAnalysis.stopWords).as("ts"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("digit"))
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
        col("ts.n_tokens").as("n_tok"), col("ts.n_stop").as("stop"),
        col("len_c"), col("digit"))
      .withColumn("quality", TextAnalysis.qualityBlend)
      .filter(col("quality") >= qualityThreshold)
      .withColumn("fp", md5(TextFunctions.normText(col("text"))))
      .dropDuplicates("fp") // stream state: one entry per surviving fingerprint
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
        col("fp"), col("quality"))

  /** Wire the curation onto a file-source doc feed, appending survivors
    * into a parquet curated store (exactly-once via sink commit log).
    */
  def start(
      spark: SparkSession,
      docsDir: String,
      curatedPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    curate(readDocStream(spark, docsDir))
      .writeStream
      .format("parquet")
      .option("path", curatedPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
