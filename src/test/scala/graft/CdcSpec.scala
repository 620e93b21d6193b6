package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CdcApply
import graft.streaming.CdcApply.{Change, Current}

/** CDC apply semantics: upserts, deletes, stale/out-of-order changes, and
  * streaming == batch on the same change set.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val allChanges = Seq(
    Change("B1", "Unter", 10L, None),
    Change("B1", "Unter GmbH", 30L, None), // later rename wins
    Change("B1", "Unter AG", 20L, None),   // out-of-order, must lose
    Change("B2", "Grun", 5L, None),
    Change("B2", "Grun", 15L, Some(ts("2015-06-01 00:00:00"))), // delete
    Change("B3", "Hinter", 7L, None))

  test("streaming CDC apply across micro-batches == batch latest-per-key") {
    val input = MemoryStream[Change](spark)
    val q = CdcApply.applyChanges(input.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cdc_state").start()
    try {
      // batch 1: initial inserts + one update
      input.addData(allChanges(0), allChanges(3), allChanges(5))
      q.processAllAvailable()
      // batch 2: rename at lsn 30 arrives BEFORE the stale lsn 20
      input.addData(allChanges(1), allChanges(4))
      q.processAllAvailable()
      // batch 3: late stale change must be ignored
      input.addData(allChanges(2))
      q.processAllAvailable()
    } finally q.stop()

    // last Update emission per key is the current state
    val streamed = spark.table("cdc_state").as[Current].collect()
      .groupBy(_.base_num).map { case (k, rows) => k -> rows.maxBy(_.lsn) }
    val batch = CdcApply.currentStateBatch(allChanges.toDF()).as[Current]
      .collect().map(c => c.base_num -> c).toMap
    assert(streamed == batch)
    assert(batch("B1").base_name == "Unter GmbH" && batch("B1").lsn == 30L)
    assert(batch("B2").deleted, "delete tombstone must win at the top LSN")
    assert(!batch("B3").deleted)
  }

  test("live view excludes tombstoned keys") {
    val live = CdcApply.currentStateBatch(allChanges.toDF())
      .filter(!$"deleted").select($"base_num").as[String].collect().toSet
    assert(live == Set("B1", "B3"))
  }
}
