package graft.tools

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

import graft.{GraftSession, SparkEntry}

/** Standing skew audit (round 15): every WindowExec in every driver
  * query's physical plan, with its partition keys, classified by whether
  * a hot key can serialize one task. Makes the round-15 hot-key-window
  * sweep a COMMITTED, regenerable board (SKEWAUDIT.json) instead of
  * review prose — the next operator that ships a
  * `row_number().over(Window.partitionBy(<unbounded key>))` turns the
  * board red in review.
  *
  * Classification of a window's partition-key set:
  *  - `sharded`   — carries keyedRank's `_shard` or keyedTopK's `_pid`:
  *                  per-key volume is structurally bounded by the
  *                  two-phase/range-sharded construction.
  *  - `bounded`   — every key is in the bounded-by-contract list:
  *                  per-doc keys (a document's own chunks/windows/lines,
  *                  bounded by doc length), per-query ANN keys (candidate
  *                  lists bounded by nprobe×cell / the documented NQ eval
  *                  contract), per-prompt sampling keys, or tiny
  *                  enumerations (lang, month, cell of a 16-cell
  *                  quantizer, np of a 4-point sweep).
  *  - `review`    — anything else: a key a 100-TB corpus could make hot.
  *                  The audit exits 1 if any `review` window appears.
  *
  * Scope note: plans are audited LAZILY end-to-end, but a frame
  * materialized inside an operator (localCheckpoint) truncates its
  * upstream plan — those iterative internals are covered by the per-
  * operator specs (plan asserts in PipelineSpec/CurationSpec/GraphSpec),
  * not this board. The audit walks into cached relations
  * (InMemoryTableScan) where Spark keeps the child plan.
  */
object SkewAudit {

  /** Review-class windows accepted with a written reason. Three honest
    * categories: (a) windows over AGGREGATED/distribution frames whose
    * per-key row count is bounded by a value domain, not the corpus;
    * (b) per-ENTITY event-history windows — the sessionization contract
    * every streaming/batch engine shares (Flink keyed state, SQL windowed
    * analytics): per-key volume is one entity's activity; (c) frames
    * already sharded or output-bounded by construction. Every entry is a
    * justification, not an exemption — delete the entry and the board
    * goes red if the plan still carries the window.
    */
  private val Allowlist: Map[String, String] = Map(
    "p3_dataset_card" -> "per-source LANG-STATS frame: rows per source = #langs (enum), not docs",
    "q10_share_month" -> "window over the 12-row monthly aggregate",
    "q9_window_avg_case" -> "window over the 12-row monthly aggregate (reference A4 semantics)",
    "q8_window_rank" -> "rank over the per-(suppkey, flag) AGGREGATE: <= #flags rows per supplier",
    "q26_distinct_quantile" -> "windows over the (flag, quantity) VALUE HISTOGRAM: rows per key = |quantity domain|",
    "q45_argmax" -> "mode window over the (priority, status) count table: <= #statuses rows per key",
    "q66_weighted_median" -> "cents-histogram windows (value domain) + one per-entity lead()",
    "q57_skyline" -> "stage-2 window over the materialized skyline survivors (output-bounded)",
    "q20_sessionize" -> "per-entity event history (sessionization contract)",
    "q21_frame_spec" -> "per-entity event history",
    "q34_value_windows" -> "per-entity event history",
    "q37_lateral_topk" -> "per-customer order history (entity-bounded)",
    "q39_time_range_window" -> "per-entity event history",
    "q41_scd2" -> "per-entity key history (SCD2 contract)",
    "q46_rcd" -> "per-entity event history",
    "q49_locf" -> "per-entity event history",
    "q51_interp_linear" -> "per-entity event history",
    "q54_attribution" -> "per-entity event history",
    "q63_transitions" -> "per-entity event history",
    "q65_twap" -> "per-entity event history",
    "q67_pattern_match" -> "per-entity event history",
    "t11_packing" -> "documented sharded-stream contract: at scale the pack key is (source, shard); q36 holds the offset-merge pattern",
    "t32_preference_pairs" -> "already block-sharded: partition key includes floor(doc_id/4096)",
    "v10_kmeans" -> "hand-rolled two-phase sampler: (cluster, hash%32) local prune to quota, then the bounded final rank",
    "v16_knn_join" -> "per-src candidate list bounded by the block join's candidate bill",
    "v20_bitext_mining" -> "per-English-doc neighborhood: cell-local candidates (v4 quantizer bill)")

  private val BoundedKeys: Set[String] = Set(
    // per-document: bounded by one document's own payload
    "doc_id", "doc_a", "doc_b", "pack_id", "pair_id", "file",
    // per-query / per-prompt: bounded by the documented eval contracts
    "q_id", "qk", "prompt_id", "x_id", "seed", "src_doc", "query_id",
    // tiny enumerations
    "lang", "cell", "np", "month", "m", "bucket", "src4", "s4", "split",
    "label", "variant", "source_type", "band", "table_name", "k_lsh",
    "stage", "model", "window", "shard", "epoch", "version", "vname")

  private def windows(p: SparkPlan): Seq[Seq[String]] = {
    val here = p.collect {
      case w: WindowExec =>
        w.partitionSpec.map(e =>
          e.references.map(_.name.replaceAll("#\\d+.*$", "")).toSeq.sorted
            .mkString("|"))
    }
    val cached = p.collect { case s: InMemoryTableScanExec => s }
      .flatMap(s => windows(s.relation.cachedPlan))
    (here ++ cached).map(_.toSeq)
  }

  private def classify(keys: Seq[String]): String = {
    val flat = keys.flatMap(_.split("\\|")).map(_.trim).filter(_.nonEmpty)
    if (flat.exists(k => k.startsWith("_shard") || k.startsWith("_pid"))) "sharded"
    else if (flat.isEmpty) "global-tiny" // Window.partitionBy() over a stats table
    else if (flat.forall(k => BoundedKeys.contains(k.stripSuffix("k")) ||
      BoundedKeys.contains(k))) "bounded"
    else "review"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "SKEWAUDIT.json"
    val spark = GraftSession.local("skewaudit")
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val entry = try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.sparkPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val ws = windows(plan)
        // keyedTopK's phase-2 window partitions by the bare keys over the
        // ALREADY-PRUNED frame (<= partitions x k rows per key); recognize
        // the two-phase pair by its (keys + _pid) phase-1 sibling in the
        // same plan rather than key names alone
        val keySets = ws.map(_.flatMap(_.split("\\|")).toSet)
        def hasPhase1(keys: Set[String]): Boolean =
          keySets.exists(o => o.exists(_.startsWith("_pid")) &&
            (o -- Set("_pid")).map(_.replaceAll("^_pid.*", "")) == keys ||
            o == keys + "_pid")
        val classed = ws.map { w =>
          val c0 = classify(w)
          val keys = w.flatMap(_.split("\\|")).toSet
          val c = if (c0 == "review" && hasPhase1(keys)) "sharded" else c0
          val c2 = if (c == "review" && Allowlist.contains(name))
            s"allowlisted: ${Allowlist(name)}" else c
          (w.mkString(","), c2)
        }
        val worst =
          if (classed.isEmpty) "none"
          else if (classed.exists(_._2 == "review")) "review"
          else if (classed.exists(_._2.startsWith("allowlisted"))) "allowlisted"
          else if (classed.exists(_._2 == "sharded")) "sharded"
          else "bounded"
        (name, worst, classed)
      } catch {
        case e: Throwable => (name, s"error:${e.getClass.getSimpleName}", Nil)
      }
      entry
    }
    val reviews = results.filter(_._2 == "review")
    val errors = results.filter(_._2.startsWith("error"))
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = results.map { case (name, worst, classed) =>
      val ws = classed.map { case (k, c) =>
        s"""{"keys":${jstr(k)},"class":${jstr(c)}}"""
      }.mkString("[", ",", "]")
      s""" ${jstr(name)}: {"class":${jstr(worst)},"windows":$ws}"""
    }.mkString(",\n")
    val summary = results.groupBy(_._2).map { case (c, rs) => c -> rs.size }
      .toSeq.sortBy(_._1)
      .map { case (c, n) => s"${jstr(c)}:$n" }.mkString("{", ",", "}")
    val json =
      s"""{
         |"_meta": {
         |  "tool": "graft.tools.SkewAudit",
         |  "sf": ${jstr(sfDir)},
         |  "regenerate": "SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.tools.SkewAudit",
         |  "contract": "no driver query may carry a WindowExec partitioned by a key a 100-TB corpus can make hot; sharded = keyedRank/keyedTopK two-phase, bounded = per-doc/per-query/tiny-enum contract keys",
         |  "summary": $summary,
         |  "review_count": ${reviews.size}
         |},
         |"queries": {
         |$body
         |}
         |}""".stripMargin + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[skewaudit] ${results.size} queries; summary $summary -> $out")
    reviews.foreach { case (n, _, cs) =>
      println(s"[skewaudit] REVIEW $n: ${cs.filter(_._2 == "review").map(_._1).mkString("; ")}")
    }
    errors.foreach { case (n, e, _) => println(s"[skewaudit] $n $e") }
    spark.stop()
    if (reviews.nonEmpty) sys.exit(1)
  }
}
