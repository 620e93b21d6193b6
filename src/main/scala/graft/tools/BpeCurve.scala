package graft.tools

import graft.operators.TextAnalysis

/** Dev tool: driver-side cost curve of the BPE trainer vs merge count.
  *
  * The trainer consumes a (word, freq) table — the ONLY corpus-sized
  * work is the one distributed scan that builds it, capped at 64k rows
  * (t41's discipline), so the question at 100 TB is purely "what does
  * the driver-side merge loop cost as rounds grow toward a production
  * 32k vocab?". This measures both trainer shapes on a deterministic
  * 64k-word Zipf vocab:
  *
  *   - `indexed` — the shipped [[TextAnalysis.bpeTrainOnVocabIndexed]]:
  *     incremental pair-count maintenance, per-round cost proportional
  *     to the words containing the argmax pair (shrinks with rank);
  *   - `naive`   — the full-recount reference, per-round cost flat in
  *     total adjacencies (measured only at small round counts; the
  *     point of the tool is showing why it can't reach 32k).
  *
  * No SparkSession: the loop under test is driver-side by design.
  * Usage: run_main.sh graft.tools.BpeCurve [rounds...]
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val rounds =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(64, 128, 256, 512, 1024, 2048)
    val rng = new scala.util.Random(13)
    val vocab = Iterator
      .continually {
        val len = 3 + rng.nextInt(10)
        (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      }
      .distinct.take(TextAnalysis.BpeVocabCap).toArray
      .zipWithIndex
      .map { case (w, i) => (w, (10000000L / (i + 1)) + 1L) }
      .sortBy { case (w, f) => (-f, w) }
    println(s"vocab: ${vocab.length} words, " +
      s"${vocab.map(_._1.length - 1).sum} adjacencies")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // JIT warmup on both paths
    TextAnalysis.bpeTrainOnVocabIndexed(vocab, 64)
    TextAnalysis.bpeTrainOnVocab(vocab, 16)
    rounds.foreach { r =>
      val (mi, ti) = time(TextAnalysis.bpeTrainOnVocabIndexed(vocab, r))
      val naive =
        if (r <= 256) { val (mn, tn) = time(TextAnalysis.bpeTrainOnVocab(vocab, r))
          require(mn.toSeq == mi.toSeq, s"trainer divergence at $r rounds")
          f", naive=$tn%.2f s (differential ok)"
        } else ""
      println(f"BPE rounds=$r%-5d indexed=$ti%.2f s (${ti / r * 1000}%.1f ms/merge)$naive")
    }
  }
}
