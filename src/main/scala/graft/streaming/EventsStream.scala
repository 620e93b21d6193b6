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

  /** Stream-stream interval join: clicks matched to the same user's views
    * from the preceding 10 minutes. Both sides carry watermarks and the
    * join condition bounds event-time distance, so the state store holds
    * only one watermark-window of each side per user — the required shape
    * for an unbounded join at scale (an unconstrained stream join would
    * buffer both streams forever). Inner matches emit as soon as both rows
    * arrive; on a bounded replay the result set equals the batch join
    * (asserted in StreamingSpec).
    */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    clicks.join(views,
      col("user_id") === col("v_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Session-window rollup: 30-minute-gap sessions per user — the
    * streaming twin of the batch q20 sessionization (lag + running-sum).
    * `session_window` merges events into gap-bounded sessions inside the
    * state store; the watermark closes and emits sessions whose gap has
    * definitively expired. The SAME call works in batch mode, where it
    * must produce exactly q20's session boundaries (asserted in
    * StreamingSpec — two independent implementations of the semantics).
    */
  def sessionRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))

  /** The write half of the streaming seam: append the event stream into a
    * date-partitioned parquet layout — the SAME layout the batch ingest
    * writes and batch queries partition-prune on (a date filter on the
    * output reads only its directories). Exactly-once via the file-sink
    * commit log + checkpoint.
    */
  def writeDatePartitioned(events: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .partitionBy("event_date")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()

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
