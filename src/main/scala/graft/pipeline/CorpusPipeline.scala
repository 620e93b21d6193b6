package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** End-to-end training-corpus preparation — the composition the individual
  * operators exist FOR, as one orchestrated flow:
  *
  *   raw documents
  *     → quality filter      (t2's score >= 0.5 — drop low-signal docs)
  *     → exact dedup         (d1's canonical-md5 groups, keep min doc_id)
  *     → near-dup resolution (d2 pairs on the SURVIVORS → connected
  *                            components → keep each cluster's canonical)
  *     → chunking            (t7's 160/120 sliding windows → model-ready units)
  *
  * The driver-facing result is the per-stage funnel (docs in/out) — the
  * numbers a data-curation run reports — hash-checked against a DuckDB
  * oracle that replays the entire pipeline in SQL. Stage order matters and
  * is part of the contract: dedup after quality (don't waste pair
  * generation on discards), near-dup on exact-dedup survivors (exact
  * copies would saturate the pair graph).
  */
object CorpusPipeline {

  private val QualityThreshold = 0.5

  private def qualityScore: Column = {
    val nTok = col("ts.n_tokens")
    val stop = col("ts.n_stop")
    least(nTok / lit(100.0), lit(1.0)) * lit(0.5) +
      (stop / nullif(nTok, lit(0L))) * lit(0.3) +
      (lit(1.0) - col("digit") / nullif(col("len_c"), lit(0L))) * lit(0.2)
  }

  /** The survivor frame after each stage, keyed by stage name (insertion
    * order = pipeline order). Exposed for tests; each frame carries the
    * full document columns so any stage output is directly usable.
    */
  def stages(s: SparkSession, d: String): Seq[(String, DataFrame)] = {
    val raw = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))

    val scored = raw.select(col("doc_id"),
        length(col("text")).cast("long").as("len_c"),
        graft.expressions.SetSketchExpressions
          .tokenStats(col("text"), graft.operators.TextAnalysis.stopWords).as("ts"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("digit"))
      .select(col("doc_id"), qualityScore.as("q"))
    val quality = raw.join(scored.filter(col("q") >= QualityThreshold)
      .select(col("doc_id")), "doc_id")

    // each stage is consumed at least twice (its own count + the next
    // stage's input); checkpoint so the funnel computes every stage once
    val qualityM = quality.localCheckpoint(true)

    val keepers = qualityM
      .withColumn("fp", md5(graft.functions.TextFunctions.normText(col("text"))))
      .withColumn("keep",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep"))
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .localCheckpoint(true)

    val comps = Dedup.minLabelComponents(
      keepers.select(col("doc_id")), Dedup.ngramPairs(keepers))
    val canon = keepers.join(
      comps.filter(col("doc_id") === col("cluster_id")).select(col("doc_id")),
      "doc_id").localCheckpoint(true)

    Seq("raw" -> raw, "quality" -> qualityM, "exact_dedup" -> keepers,
      "neardup_dedup" -> canon)
  }

  /** Chunk the final survivors into 160/120 sliding windows. */
  def chunks(survivors: DataFrame): DataFrame =
    survivors.select(col("doc_id"),
      explode(sequence(lit(1),
        greatest(length(col("text")) - 159, lit(1)), lit(120))).as("start"),
      col("text"))
      .select(col("doc_id"), col("start"),
        md5(col("text").substr(col("start"), lit(160))).as("chunk_md5"))

  /** Driver query: the pipeline funnel — (stage, docs_in, docs_out). */
  def p1CorpusPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = stages(s, d)
    val counts = st.map { case (name, df) => name -> df.count() }
    val nChunks = chunks(st.last._2).count()
    val funnel = counts.sliding(2).collect {
      case Seq((_, in), (stage, out)) => (stage, in, out)
    }.toSeq :+ (("chunking", counts.last._2, nChunks))
    funnel.toDF("stage", "docs_in", "docs_out").orderBy("stage")
  }

  val p1CorpusPipelineSql: String =
    """WITH RECURSIVE
      |f AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS len_c,
      |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t != '')) AS BIGINT) AS n_tok,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit,
      |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      t -> t IN ('the','a','of','and','to','is','in','that','it','for'))) AS BIGINT) AS stop
      |  FROM documents),
      |q AS (
      |  SELECT d.doc_id, d.text, d.source, d.n_chars FROM documents d JOIN f USING (doc_id)
      |  WHERE least(n_tok / 100.0, 1.0) * 0.5 + (stop / nullif(n_tok, 0)) * 0.3
      |        + (1.0 - digit / nullif(len_c, 0)) * 0.2 >= 0.5),
      |fp AS (
      |  SELECT *, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint FROM q),
      |ex AS (
      |  SELECT doc_id, text, source, n_chars FROM fp
      |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY fingerprint)),
      |g AS (
      |  SELECT doc_id, source, CAST(floor(n_chars / 100.0) AS INTEGER) AS bucket,
      |    list_distinct(list_transform(range(1, length(text) - 1),
      |      i -> substring(text, CAST(i AS INTEGER), 3))) AS grams
      |  FROM ex),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM g a JOIN g b
      |    ON a.source = b.source AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.grams, b.grams))
      |      / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.5),
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION SELECT doc_b AS u, doc_a AS v FROM pairs),
      |reach AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |canon AS (
      |  SELECT e.doc_id, e.text FROM ex e LEFT JOIN reach r ON r.u = e.doc_id
      |  GROUP BY e.doc_id, e.text
      |  HAVING e.doc_id = least(e.doc_id, coalesce(min(r.v), e.doc_id))),
      |chk AS (
      |  SELECT count(*) AS n FROM (
      |    SELECT unnest(generate_series(1, greatest(length(text) - 159, 1), 120))
      |    FROM canon))
      |SELECT 'quality' AS stage,
      |  (SELECT count(*) FROM documents) AS docs_in,
      |  (SELECT count(*) FROM q) AS docs_out
      |UNION ALL SELECT 'exact_dedup',
      |  (SELECT count(*) FROM q), (SELECT count(*) FROM ex)
      |UNION ALL SELECT 'neardup_dedup',
      |  (SELECT count(*) FROM ex), (SELECT count(*) FROM canon)
      |UNION ALL SELECT 'chunking',
      |  (SELECT count(*) FROM canon), (SELECT n FROM chk)
      |ORDER BY stage""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("p1_corpus_pipeline" -> (p1CorpusPipeline _))
  val oracles: Map[String, String] =
    Map("p1_corpus_pipeline" -> p1CorpusPipelineSql)
}
