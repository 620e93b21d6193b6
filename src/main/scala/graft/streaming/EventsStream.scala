package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming seam — the reference's unbuilt Kafka TO-DO
  * (reference `Diary of Making.md:383-386`: near-real-time trip stream,
  * hourly batch trigger), designed so the batch and streaming paths share
  * transform logic.
  *
  * `hourlyRollup` is the SAME aggregation as the batch q15_events_hourly
  * (graft.operators.Relational): on a bounded input, streaming output ==
  * batch output — asserted in StreamingSpec. At scale, the watermark bounds
  * state (late events beyond 1 hour are dropped instead of growing state
  * forever), and each micro-batch shuffles only (window, event_type)
  * partials — the standard incremental-aggregation shape.
  *
  * `userRunningTotals` shows the custom-state seam
  * (mapGroupsWithState): per-user event counting with explicit timeout
  * handling, the pattern session windows / CDC upserts would extend.
  */
object EventsStream {

  /** Tumbling 1-hour rollup with a 1-hour watermark over a streaming
    * source of (ts, event_type, value) rows.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("win.start").as("hour_ts"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Read the events table layout as a file stream (one parquet file per
    * micro-batch in tests; a Kafka source drops in by swapping `readStream`
    * options — the transform above is source-agnostic).
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** Streaming exact dedup: drop repeated event_ids within the watermark
    * horizon — the streaming twin of Dedup.d1 (state: one entry per key,
    * expired by the watermark instead of growing forever).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserEvent(user_id: Long, event_type: String)
  final case class UserTotal(user_id: Long, events: Long)

  /** Arbitrary-stateful example: per-user running event counts with state
    * timeout. State is one long per user — bounded, partitioned by user_id.
    */
  def userRunningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserTotal](GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          UserTotal(uid, total)
      }
  }
}
