package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-scale join disciplines that don't change query RESULTS, only
  * plans — exposed as library helpers so pipelines can opt in where the
  * data demands it.
  *
  * - Bucketed co-located joins (see BucketingSpec): both sides written
  *   `bucketBy(n, key)` join WITHOUT an exchange — at 100 TB the shuffle
  *   is the join's dominant cost, and bucketing moves it to write time,
  *   amortized across every downstream join on that key.
  * - Salted joins (below): the manual skew treatment for the case AQE's
  *   runtime skew-split can't fix — a broadcast-ineligible dimension
  *   joined on a key where one value is a large fraction of the fact side.
  */
object JoinOps {

  /** Skew-safe equi-join: explode the (small) right side into `salts`
    * copies and scatter the left side's rows across them, so a hot key's
    * rows land on `salts` reducers instead of one.
    *
    * Result set is IDENTICAL to `left.join(right, leftKey === rightKey,
    * joinType)` (asserted in JoinOpsSpec); only the shuffle distribution
    * changes. Pass `leftSaltSource` (any column uniform-ish per row, e.g.
    * a row id) for a DETERMINISTIC salt — `pmod(xxhash64(src), salts)` is
    * stable under task retries, where `rand()` (the fallback) is not;
    * either is correct since every salt value joins, determinism only
    * pins which reducer does the work.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      salts: Int,
      leftSaltSource: Option[Column] = None,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltCol = leftSaltSource match {
      case Some(src) => pmod(xxhash64(src), lit(salts))
      case None => (rand() * salts).cast("long")
    }
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    l.join(r, leftKey === rightKey && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
