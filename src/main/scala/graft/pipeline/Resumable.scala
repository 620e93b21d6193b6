package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** Crash-resumable training prep — p2's funnel with one SNAPSHOT COMMIT
  * per stage. At 100 TB a five-stage prep run is hours of work per stage;
  * when stage 4 dies, stages 1–3 must NOT re-run. Each stage writes its
  * survivors to a versioned snapshot table (manifest note = stage name,
  * committed manifest-last so a crash mid-write never leaves a corrupt
  * version), and a re-run SKIPS every stage whose version already heads
  * the table, reading its output back from the immutable files.
  *
  * The stage chain is p2's exactly (shared stage functions in
  * [[CorpusPipeline]] — quality gate, exact dedup, holdout split,
  * decontamination, global packing), so the resumed pipeline's final
  * output is bit-identical to the single-shot run (PipelineSpec proves
  * it, and proves the skipped stages' files are untouched by mtime).
  */
object Resumable {

  val Stages: Seq[String] =
    Seq("quality", "exact_dedup", "holdout_split", "decontaminate", "packing")

  /** Run (or resume) the funnel against `table`. `stopAfter` limits how
    * many stages run this invocation (the crash simulation seam; default
    * runs all). Returns (stage, rows, resumedFromDisk) per stage touched.
    */
  def run(s: SparkSession, d: String, table: String,
      stopAfter: Int = Int.MaxValue): Seq[(String, Long, Boolean)] = {
    val doneNotes = (1 to Snapshots.currentVersion(s, table))
      .map(v => Snapshots.noteOf(s, table, v))
    require(doneNotes == Stages.take(doneNotes.length),
      s"table $table holds versions $doneNotes — not a prefix of $Stages; " +
        "refusing to resume onto a foreign table")

    def out(stageIdx: Int): DataFrame =
      Snapshots.readVersion(s, table, Some(stageIdx + 1))

    Stages.zipWithIndex.take(stopAfter).map { case (stage, i) =>
      if (i < doneNotes.length) {
        (stage, out(i).count(), true)
      } else {
        val produced: DataFrame = stage match {
          case "quality" =>
            CorpusPipeline.qualityStage(CorpusPipeline.rawDocs(s, d))
          case "exact_dedup" =>
            CorpusPipeline.exactDedupStage(out(0))
          case "holdout_split" =>
            out(1).filter(col("doc_id") % 20 =!= 0)
          case "decontaminate" =>
            CorpusPipeline.deconStage(out(2), CorpusPipeline.rawDocs(s, d))
          case "packing" =>
            graft.operators.TextAnalysis.globalPackingDocs(
              out(3).select(col("doc_id"),
                size(graft.functions.TextFunctions.lowerTokens(col("text")))
                  .cast("long").as("n_tok")),
              budget = CorpusPipeline.PackBudget)
        }
        val v = Snapshots.commitOverwrite(produced, table, stage)
        (stage, out(v - 1).count(), false)
      }
    }
  }
}
