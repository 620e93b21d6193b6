package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CDC apply — the materialization half of the reference's Airbyte CDC
  * sync (reference `Diary of Making.md:101-127`: Postgres WAL → pgoutput →
  * `_ab_cdc_lsn` / `_ab_cdc_deleted_at` columns). The ingest side stamps
  * those columns (uber/Ingest); this module turns a CHANGE STREAM into
  * current table state with latest-LSN-wins upsert/delete semantics:
  *
  *   state(key) = the change with the greatest LSN for that key;
  *   a non-null deleted_at on the winner tombstones the key.
  *
  * Streaming path: flatMapGroupsWithState keyed by primary key — state is
  * ONE row per key (the current winner), late/stale changes (lower LSN
  * than the winner) are ignored, so replays and out-of-order delivery
  * converge to the same state. Batch twin: a window latest-per-key —
  * asserted equal in CdcSpec on the same change set.
  */
object CdcApply {

  /** One change record for a `base_num_and_name`-shaped table. LSNs are
    * unique per key (WAL positions are totally ordered per row).
    */
  final case class Change(
      base_num: String, base_name: String, lsn: Long,
      deleted_at: Option[java.sql.Timestamp])

  final case class Current(
      base_num: String, base_name: String, lsn: Long, deleted: Boolean)

  private def winner(key: String, c: Change): Current =
    Current(key, c.base_name, c.lsn, c.deleted_at.isDefined)

  /** Streaming apply: per-key current state, Update output mode. */
  def applyChanges(changes: Dataset[Change]): Dataset[Current] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.base_num)
      .flatMapGroupsWithState[Current, Current](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Current]) =>
          val newest = rows.maxBy(_.lsn)
          val next = state.getOption match {
            case Some(cur) if cur.lsn >= newest.lsn => cur // stale replay
            case _ => winner(key, newest)
          }
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Batch twin: latest change per key via window, identical semantics. */
  def currentStateBatch(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("base_num")).orderBy(col("lsn").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("base_num"), col("base_name"), col("lsn"),
        col("deleted_at").isNotNull.as("deleted"))
  }
}
