package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q62's kept-anchor debounce: per (user, event_type)
  * key, keep an event only if it clears the last KEPT event by the
  * cooldown — state is ONE long per key (the last kept timestamp), so
  * the state store stays O(keys) forever regardless of event volume.
  *
  * The recurrence is order-sensitive; the stream contract is per-key
  * in-order arrival ACROSS micro-batches (a time-partitioned feed — the
  * usual file/log source shape; within a batch the group's rows sort
  * before the walk). StreamingSpec replays the batch corpus as ordered
  * time slices and asserts the streamed kept set equals
  * `Relational.q62Debounce`'s accounting — the same differential
  * contract as CdcApply's batch twin.
  */
object Debounce {

  final case class Ev(user_id: Long, event_type: String, tus: Long, event_id: Long)

  val CooldownUs: Long = 300000000L

  /** Kept events under the kept-anchor cooldown (streaming or batch DS). */
  def debounce(evs: Dataset[Ev]): Dataset[Ev] = {
    import evs.sparkSession.implicits._
    evs
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, Ev](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val kept = rows.toSeq.sortBy(e => (e.tus, e.event_id)).filter { e =>
            val keep = lastKept == Long.MinValue || e.tus - lastKept >= CooldownUs
            if (keep) lastKept = e.tus
            keep
          }
          if (lastKept != Long.MinValue) state.update(lastKept)
          kept.iterator
      }
  }
}
