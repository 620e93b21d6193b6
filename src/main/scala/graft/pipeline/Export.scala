package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-set EXPORT — the ship-it end of the p2 pipeline: the curated,
  * decontaminated, packed corpus written as a consumable dataset with a
  * manifest a trainer (or auditor) can trust without re-running the
  * pipeline.
  *
  * Layout:
  *   <out>/docs/pack_bucket=N/...parquet   doc rows (text + n_tok + pack_id),
  *                                         bucketed by pack_id mod nBuckets so
  *                                         a reader targets pack ranges
  *                                         without listing one dir per pack
  *   <out>/_manifest.json                  funnel, config, counts, signature
  *
  * The content signature is the SUM (wrapping 64-bit — commutative, so
  * partitioning-independent) of each surviving document's portable md5-62
  * text hash: any dropped, duplicated, or altered doc changes it, and any
  * engine that can md5 can recompute it (the same portability contract as
  * the sketch oracles). ExportSpec re-derives it from the written files.
  */
object Export {

  final case class Manifest(
      nDocs: Long, nPacks: Long, totalTokens: Long,
      signature: Long, funnel: Seq[(String, Long, Long)])

  def writeTrainingSet(
      s: SparkSession, d: String, outDir: String, nBuckets: Int = 16): Manifest = {
    val (funnel, decon, packedDocs) = CorpusPipeline.p2Frames(s, d)
    val docsOut = decon
      .join(packedDocs.select(col("doc_id"), col("n_tok"), col("pack_id")), "doc_id")
      .withColumn("pack_bucket", pmod(col("pack_id"), lit(nBuckets)).cast("int"))
    docsOut.write.mode("overwrite")
      .partitionBy("pack_bucket").parquet(s"$outDir/docs")

    // stats from the files actually written — the manifest certifies the
    // dataset on disk, not the plan that produced it. A fully-filtered
    // corpus writes no part files (schema inference would fail) and its
    // aggregates would be NULL; certify the empty dataset explicitly.
    val m = {
      val row = s.read.schema(docsOut.schema).parquet(s"$outDir/docs").agg(
        count(lit(1)),
        countDistinct(col("pack_id")),
        sum(col("n_tok")),
        sum(graft.expressions.PortableHashExpressions.md5Hash62(col("text")))).head()
      if (row.getLong(0) == 0L) Manifest(0L, 0L, 0L, 0L, funnel)
      else Manifest(row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), funnel)
    }

    def esc(x: String) = x.flatMap { case '"' => "\\\""; case c => c.toString }
    val funnelJson = m.funnel.map { case (st, in, out) =>
      s"""{"stage":"${esc(st)}","docs_in":$in,"docs_out":$out}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"n_docs":${m.nDocs},"n_packs":${m.nPacks},"total_tokens":${m.totalTokens},
         |"pack_budget":${CorpusPipeline.PackBudget},"pack_buckets":$nBuckets,
         |"signature":${m.signature},"funnel":$funnelJson}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/_manifest.json"), json)
    m
  }
}
