package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Materialize._

/** Skew-safe per-key ranking primitives — the shared template VERDICT
  * r14 asked for so operators stop re-creating the hot-key
  * single-partition-window exposure one at a time.
  *
  * The problem both helpers remove: `row_number().over(Window
  * .partitionBy(key))` routes EVERY row of a key into one task and
  * sorts it there. Window functions have no map-side partial
  * aggregation, and WindowExec partitions cannot be AQE-skew-split, so
  * a hot key (a giant crawl domain, a stopword-bearing query, a
  * boilerplate span) is a straggler-or-OOM at 100-TB scale even though
  * the same plan is fast at test scale.
  *
  * Two shapes, for the two contracts operators actually need:
  *
  *  - [[keyedTopK]] — the output only needs each key's top k rows
  *    (ranks ≤ k). Two-phase: a per-(key, input-partition) local rank
  *    prunes to ≤ k rows per key per partition, then the global per-key
  *    rank runs over that bounded frame (≤ partitions × k rows per
  *    key). The q7 TakeOrderedAndProject idea, per key.
  *  - [[keyedRank]] — the output needs EVERY row's exact per-key rank
  *    (p13 emits a rank per document). Top-k truncation can't express
  *    that, so this is keyed RANGE sharding, the per-key analog of
  *    Spark's own RangePartitioner-backed global sort: a bounded
  *    proportional sample picks per-key boundary (ord, tie) pairs, each
  *    row's shard is the count of boundaries at-or-before it in the
  *    sort order, per-(key, shard) windows rank locally in parallel,
  *    and driver-collected per-(key, shard) counts become broadcast
  *    exclusive-prefix offsets (the [[graft.pipeline.CorpusPipeline
  *    .keyedPrefixBefore]] offset idiom). rank = local rank + offset.
  *    Boundary pairs are compared WITH the tie column, so equal-ord
  *    rows split deterministically and the result is exact for ANY
  *    data distribution — sampling quality affects only balance, never
  *    the ranks.
  *
  * Both are property-tested against the naive per-key window in
  * PropertySpec; callers must pass a TOTAL per-key order (include a
  * unique tiebreaker) or ranks are nondeterministic under either shape.
  */
object KeyedRank {

  /** Per-key top-k with the true global per-key rank in `rankCol`,
    * without ever sorting a whole key in one task. `order` must totally
    * order rows within each key (unique tiebreaker). Phase 1 prunes each
    * (key, partition) slice to k rows BEFORE the per-key shuffle, so
    * the phase-2 window sees ≤ partitions × k rows per key no matter
    * how hot the key is. Every global top-k row has local rank ≤ k in
    * whatever slice it lands in, so the two-phase cut is exact for any
    * partition assignment.
    *
    * PRECONDITION phase 1 needs: a hot key's rows must SPAN multiple
    * input partitions. A scan split or any shuffle on other columns
    * does this, but an input freshly hash-partitioned by exactly (a
    * subset of) the keys — a fresh groupBy/join ON the key — colocates
    * every key in one partition and phase 1 degenerates to the naive
    * single-task sort. [[spreadIfKeyAligned]] detects that shape from
    * the plan's output partitioning and re-spreads by (keys, salt)
    * first, where the salt is a deterministic hash of the row's
    * non-map columns (map type is not hashable); the extra shuffle is
    * paid only in the degenerate case.
    */
  def keyedTopK(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int, rankCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val (spread, _) = spreadIfKeyAligned(df, keys)
    val w1 = Window.partitionBy(keyCols :+ col("_pid"): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    spread.withColumn("_pid", spark_partition_id())
      .withColumn("_lr", row_number().over(w1))
      .where(col("_lr") <= k)
      .drop("_pid", "_lr")
      .withColumn(rankCol, row_number().over(w2))
      .where(col(rankCol) <= k)
  }

  /** Guard for [[keyedTopK]]'s input-spread precondition: when `df`'s
    * planned output partitioning is a hash partitioning whose
    * expressions are all bare references to `keys` columns (every key
    * colocated in one partition), repartition by (keys, salt) with a
    * deterministic row-content salt so hot keys spread again. Returns
    * the (possibly re-spread) frame and whether the guard fired —
    * exposed package-private so PropertySpec can assert both branches.
    */
  private[graft] def spreadIfKeyAligned(df: DataFrame,
      keys: Seq[String]): (DataFrame, Boolean) = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // resolve the key columns against df's analyzed output and match the
    // partitioning expressions by exprId (round-17 ADVICE fix): raw name
    // comparison false-fires on a same-named attribute from another
    // relation and false-misses under a case-insensitive session. Probe
    // the PREPARED plan (AQE's initialPlan when adaptive is on), not
    // sparkPlan: exchange insertion happens in the preparation rules, so
    // a fresh groupBy/join on the keys shows its HashPartitioning only
    // there. AQE re-planning after this probe can only coalesce or
    // skew-split that exchange — coalescing keeps each key whole in one
    // partition (the guard must still fire, and does: the decision is
    // made from the initial plan), never un-aligns a non-aligned plan.
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keyIds = keys.flatMap(k =>
      df.queryExecution.analyzed.output.filter(a => resolver(a.name, k))
        .map(_.exprId)).toSet
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val aligned = plan.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.nonEmpty && h.expressions.forall {
          case a: AttributeReference => keyIds.contains(a.exprId)
          case _ => false
        }
      case _ => false
    }
    if (!aligned) (df, false)
    else {
      def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = t match {
        case _: org.apache.spark.sql.types.MapType => true
        case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case _ => false
      }
      val saltSrc = df.schema.fields.filterNot(f => hasMap(f.dataType))
        .map(f => col(f.name)).toSeq
      val salt = if (saltSrc.nonEmpty) xxhash64(saltSrc: _*) else lit(0L)
      (df.repartition(keys.map(col) :+ salt: _*), true)
    }
  }

  /** Driver-side comparator for boundary selection — the collected
    * sample carries whatever external types the ord/tie columns have;
    * nulls are out of contract (document before ranking).
    */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Short, y: Short) => java.lang.Short.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case _ => sys.error(s"keyedRank: unsupported ordering type ${a.getClass}")
  }

  /** Full per-key rank: adds `rankCol` = row_number over
    * (`ord` desc-if-`descending`, `tie` asc) within each `key`, exactly
    * as the naive `Window.partitionBy(key)` would, but with no key ever
    * funneled through a single partition. `tie` must be unique per row
    * and both columns non-null. Driver-bounded metadata by
    * construction: one proportional sample of ≤ ~`sampleTarget` rows
    * picks the boundaries (keys with small slices get few or no
    * boundaries — they don't need them), and the per-(key, shard)
    * count table is ≤ |keys| × `shards` rows; like keyedPrefixBefore,
    * key cardinality must be driver-bounded (sources, languages,
    * shards — not documents).
    */
  def keyedRank(df: DataFrame, key: String, ord: String, tie: String,
      rankCol: String, descending: Boolean = true, shards: Int = 64,
      sampleTarget: Int = 8192): DataFrame = {
    import graft.expressions.PortableHashExpressions.md5Hash62
    val base = df.materialize() // feeds the sample pass AND the ranked pass
    val n = base.count()
    if (n == 0L) return base.withColumn(rankCol, lit(1))
    // (ord, tie) precedence in the requested sort order
    def precedes(o1: Any, t1: Any, o2: Any, t2: Any): Boolean = {
      val c = cmp(o1, o2)
      if (c != 0) { if (descending) c > 0 else c < 0 } else cmp(t1, t2) < 0
    }
    // proportional sample (RangePartitioner's trick, keyed): a uniform
    // 62-bit hash of the tie column under a global rate ~ sampleTarget/n
    // gives each key a sample proportional to its mass — hot keys get
    // many boundaries, cold keys few, which is exactly where balance
    // does and doesn't matter
    val thresh = math.min((1L << 62).toDouble,
      (1L << 62).toDouble * (sampleTarget.toDouble / n)).toLong
    val sample = base
      .where(md5Hash62(col(tie).cast("string")) < lit(thresh))
      .select(col(key), col(ord), col(tie))
      // driver-bound(sample-bounded): uniform hash rate ~ sampleTarget/n rows
      .collect()
    val bounds: Map[String, Seq[(Any, Any)]] = sample
      .groupBy(_.getString(0))
      .map { case (k0, rows) =>
        require(!k0.contains("#"),
          s"keyedRank: key value '$k0' contains '#' (reserved)")
        val sorted = rows.map(r => (r.get(1), r.get(2)))
          .sortWith { case ((o1, t1), (o2, t2)) => precedes(o1, t1, o2, t2) }
        val m = sorted.length
        val idx = (0 until (shards - 1)).map(j => ((j + 1).toLong * m
          / shards).toInt).filter(_ < m).distinct
        k0 -> idx.map(sorted)
      }
    // shard(row) = # boundaries at-or-before the row in sort order —
    // monotone along the order, deterministic on ties via the tie pair
    val bArrays = bounds.filter(_._2.nonEmpty)
    val ranked =
      if (bArrays.isEmpty) base.withColumn("_shard", lit(0))
      else {
        val bmap = map(bArrays.toSeq.sortBy(_._1).flatMap { case (k0, bs) =>
          Seq(lit(k0), array(bs.map { case (o, t) =>
            struct(lit(o).as("o"), lit(t).as("t")) }: _*))
        }: _*)
        val boundaryPrecedesOrEq =
          if (descending) (b: Column) =>
            b.getField("o") > col(ord) ||
              (b.getField("o") === col(ord) && b.getField("t") <= col(tie))
          else (b: Column) =>
            b.getField("o") < col(ord) ||
              (b.getField("o") === col(ord) && b.getField("t") <= col(tie))
        base.withColumn("_shard", coalesce(
          size(filter(element_at(bmap, col(key)), boundaryPrecedesOrEq)),
          lit(0)))
      }
    // Second materialize RE-CONFIRMED r17: the shard column's per-row
    // cost (element_at on the boundary map + a struct-array filter
    // allocation) is NOT cheap enough to recompute — dropping this
    // checkpoint and letting the offset agg and the final window each
    // re-derive _shard from base's blocks measured +0.3–0.4 s on the
    // mid-size keyedRank callers (q29/q31, interleaved n=5 minima),
    // with no offsetting win. One eager cut per phase stands.
    val sharded = ranked.materialize() // shard counts AND the final rank
    val offMap: Map[String, Long] = {
      // driver-bound(stat-frame): |keys| x shards count rows; key cardinality driver-bounded by contract
      val totals = sharded.groupBy(col(key), col("_shard"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      totals.foreach { case ((k0, _), _) =>
        require(!k0.contains("#"),
          s"keyedRank: key value '$k0' contains '#' (reserved)")
      }
      totals.groupBy(_._1._1).flatMap { case (k0, entries) =>
        val sorted = entries.sortBy(_._1._2)
        sorted.map(_._1._2).zip(
          sorted.map(_._2).scanLeft(0L)(_ + _).init)
          .map { case (sh, off) => s"$k0#$sh" -> off }
      }
    }
    val offCol = coalesce(
      element_at(
        map(offMap.toSeq.sortBy(_._1).flatMap { case (k0, v0) =>
          Seq(lit(k0), lit(v0)) }: _*),
        concat(col(key), lit("#"), col("_shard"))),
      lit(0L))
    val ordSort = if (descending) col(ord).desc else col(ord).asc
    val w = Window.partitionBy(col(key), col("_shard"))
      .orderBy(ordSort, col(tie).asc)
    sharded
      .withColumn(rankCol, (row_number().over(w) + offCol).cast("int"))
      .drop("_shard")
  }
}
