package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream

/** The streaming seam driven synchronously: events parquet replayed as a
  * file stream through the same rollup the batch path uses.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly rollup == batch hourly rollup on bounded input") {
    // stage the (ns-normalized) events table as a clean micro-batch source
    val src = Files.createTempDirectory("events_stream").toString
    Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(src)

    val q = EventsStream.hourlyRollup(EventsStream.readEventsStream(spark, src))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    // Append mode only emits windows the watermark has closed; on a bounded
    // replay that's every window except those within 1h of the max ts.
    val streamed = spark.table("hourly_out")
      .select($"hour_ts", $"event_type", $"cnt")
    val maxTs = Tables.load(spark, sfDir, "events").agg(max($"ts")).head().getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .filter($"hour_ts" < date_trunc("hour", lit(cutoff)))

    val streamedSet = streamed.as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batchSet = batch.as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(batchSet.nonEmpty)
    assert(batchSet.subsetOf(streamedSet),
      s"missing windows: ${batchSet.diff(streamedSet).take(3)}")
  }

  test("streaming dedup emits each event_id once within the watermark") {
    val src = Files.createTempDirectory("events_dedup").toString
    val base = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    // write the same events TWICE (two files = duplicated input)
    base.write.mode("overwrite").parquet(src)
    base.write.mode("append").parquet(src)
    val q = EventsStream.dedupedEvents(EventsStream.readEventsStream(spark, src))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("dedup_out")
    assert(out.count() == base.count(), "duplicates must be dropped")
    assert(out.select($"event_id").distinct().count() == out.count())
  }

  test("stream-stream interval join == batch join on bounded input") {
    val src = Files.createTempDirectory("events_ssj").toString
    val base = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    base.write.mode("overwrite").parquet(src)
    val q = EventsStream.clickViewJoin(EventsStream.readEventsStream(spark, src))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj_out")
      .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
    val batch = EventsStream.clickViewJoin(base)
      .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch diff: ${streamed.diff(batch).take(3)} / ${batch.diff(streamed).take(3)}")
  }

  test("session_window == q20 lag/running-sum sessionization (batch), streaming emits closed subset") {
    val base = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    // batch: two independent implementations of 30-min-gap sessions agree
    val viaWindow = EventsStream.sessionRollup(base)
      .select($"user_id", $"session_start".cast("timestamp_ntz"), $"n_events")
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet
    val viaLag = graft.operators.Relational.q20Sessionize(spark, sfDir)
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet
    assert(viaWindow == viaLag && viaWindow.nonEmpty)
    // streaming: append emits only watermark-closed sessions; all must be
    // real sessions from the batch set
    val src = Files.createTempDirectory("events_sess").toString
    base.write.mode("overwrite").parquet(src)
    val q = EventsStream.sessionRollup(EventsStream.readEventsStream(spark, src))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_out")
      .select($"user_id", $"session_start".cast("timestamp_ntz"), $"n_events")
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed.subsetOf(viaWindow))
  }

  test("restart from checkpoint resumes state, emits each window exactly once") {
    val src = Files.createTempDirectory("events_ckpt_src").toString
    val out = Files.createTempDirectory("events_ckpt_out").toString
    val ckpt = Files.createTempDirectory("events_ckpt").toString
    val base = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    val mid = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    // time-ordered split: run-1 windows close with ALL their data present
    base.filter($"ts" < lit(mid)).write.mode("overwrite").parquet(src)

    def runOnce(): Unit = {
      val q = EventsStream.hourlyRollup(EventsStream.readEventsStream(spark, src))
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0)
    // second half arrives; a NEW query resumes from the same checkpoint
    base.filter($"ts" >= lit(mid)).write.mode("append").parquet(src)
    runOnce()

    val emitted = spark.read.parquet(out)
    // exactly-once: no (window, type) emitted twice across the restart
    assert(emitted.groupBy($"hour_ts", $"event_type").count()
      .filter($"count" > 1).count() == 0)
    // and closed windows carry the full-data counts (state survived)
    val maxTs = base.agg(max($"ts")).head().getTimestamp(0)
    val cutoff = date_trunc("hour",
      lit(new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)))
    val batch = base
      .groupBy(date_trunc("hour", $"ts").cast("timestamp_ntz").as("hour_ts"),
        $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .filter($"hour_ts" < cutoff)
      .as[(java.time.LocalDateTime, String, Long)].collect().toSet
    val got = emitted
      .select($"hour_ts".cast("timestamp_ntz"), $"event_type", $"cnt")
      .as[(java.time.LocalDateTime, String, Long)].collect().toSet
    assert(batch.subsetOf(got), s"missing after restart: ${batch.diff(got).take(3)}")
  }

  test("stateful per-user totals accumulate across micro-batches") {
    import EventsStream.{UserEvent, UserTotal}
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent](spark)
    val q = EventsStream.userRunningTotals(input.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("user_totals")
      .start()
    try {
      input.addData(UserEvent(1, "view"), UserEvent(1, "click"), UserEvent(2, "view"))
      q.processAllAvailable()
      input.addData(UserEvent(1, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("user_totals").as[UserTotal].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.events).max }
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("streaming writer lands a date-partitioned layout that batch prunes") {
    val src = Files.createTempDirectory("events_pw_src").toString
    val out = Files.createTempDirectory("events_pw_out").toString
    val ckpt = Files.createTempDirectory("events_pw_ckpt").toString
    val base = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    base.write.mode("overwrite").parquet(src)
    val q = EventsStream.writeDatePartitioned(
      EventsStream.readEventsStream(spark, src), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    // partition directories exist and the data is complete
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName)
    assert(dirs.length > 5, s"expected date partitions, got ${dirs.toSeq}")
    val back = spark.read.parquet(out)
    assert(back.count() == base.count())
    // a date filter on the layout prunes to its partitions
    val oneDay = back.filter($"event_date" === lit("2024-01-05"))
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_date"), s"no pruning in:\n$scan")
    assert(oneDay.count() ==
      base.filter(to_date($"ts") === lit("2024-01-05")).count())
  }

  test("streaming corpus curation == batch quality+exact-dedup stages") {
    import graft.streaming.CorpusStream
    val feed = Files.createTempDirectory("doc_feed").toString
    val curated = Files.createTempDirectory("doc_curated").toString + "/out"
    val ckpt = Files.createTempDirectory("doc_ckpt").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val splitAt = 250L
    docs.filter($"doc_id" < splitAt).coalesce(1)
      .write.mode("append").parquet(feed)
    val q = CorpusStream.start(spark, feed, curated, ckpt)
    try {
      q.processAllAvailable()
      // second sync lands more docs — including duplicates of batch-1 docs,
      // which the fingerprint state must reject
      docs.filter($"doc_id" >= splitAt).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(curated)
    // same survivors as the batch pipeline's quality + exact_dedup stages
    // (compared as fingerprint SETS: the stream keeps the first arrival
    // per fingerprint, the batch keeps the min doc_id — same clusters)
    val batchKeepers = graft.pipeline.CorpusPipeline.stages(spark, sfDir)
      .collect { case ("exact_dedup", df) => df }.head
      .select(md5(graft.functions.TextFunctions.normText($"text")).as("fp"))
    assert(streamed.count() == batchKeepers.count())
    assert(streamed.select($"fp").as[String].collect().toSet ==
      batchKeepers.as[String].collect().toSet)
    assert(streamed.filter($"quality" < 0.5).count() == 0)
  }

  test("streaming drift monitor: accumulated profile reproduces batch t30 exactly; replay is idempotent") {
    import graft.streaming.DriftStream
    val feed = Files.createTempDirectory("drift_feed").toString
    val state = Files.createTempDirectory("drift_state").toString + "/profile"
    val ckpt = Files.createTempDirectory("drift_ckpt").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    // frozen reference = crawl A (even ids); the stream feeds crawl B
    val reference = DriftStream.gramCounts(docs.filter($"doc_id" % 2 === 0))
      .localCheckpoint(true)
    val incoming = docs.filter($"doc_id" % 2 === 1)
    // three ordered drops
    incoming.filter($"doc_id" < 150).coalesce(1)
      .write.mode("append").parquet(feed)
    val q = DriftStream.start(spark, feed, state, ckpt)
    try {
      q.processAllAvailable()
      incoming.filter($"doc_id" >= 150 && $"doc_id" < 350).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      incoming.filter($"doc_id" >= 350).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()

    // the streamed drift table IS the batch t30 table, bit for bit
    val streamed = DriftStream.driftAgainst(spark, reference, state)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    val batch = graft.operators.TextAnalysis.t30CorpusDrift(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(streamed == batch)

    // RESTART: a new query on the same checkpoint + state continues the
    // batch-id sequence and keeps accumulating (no profile reset, no
    // double-count of already-processed drops)
    val profMid = DriftStream.profile(spark, state)
      .as[(String, Long)].collect().toMap
    incoming.filter($"doc_id" >= 349 && $"doc_id" < 351).coalesce(1)
      .write.mode("append").parquet(feed) // one more doc (id 349 is even-side-free: odd only)
    val q2 = DriftStream.start(spark, feed, state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val profPost = DriftStream.profile(spark, state)
      .as[(String, Long)].collect().toMap
    // every count is >= the pre-restart profile (monotone accumulation)
    profMid.foreach { case (w, c) =>
      assert(profPost.getOrElse(w, 0L) >= c, s"count regressed for $w")
    }
    // and the drift table still matches batch t30 EXTENDED by the same
    // extra doc — i.e. recompute the reference comparison directly
    val allIncoming = DriftStream.gramCounts(
      incoming.unionByName(incoming.filter($"doc_id" >= 349 && $"doc_id" < 351)))
      .as[(String, Long)].collect().toMap
    assert(profPost == allIncoming, "restart accumulation diverged")

    // crash-replay half 1 — crash AFTER the generation sealed but BEFORE
    // the checkpoint committed: gen=N is left IN PLACE and the batch is
    // re-delivered. The replay must be a pure no-op (profile bit-equal,
    // no double-count, and no self-overwrite abort from a plan that reads
    // the gen=N path it is rewriting).
    val genBefore = DriftStream.latestGen(spark, state)
    val profBefore = DriftStream.profile(spark, state)
      .as[(String, Long)].collect().toSet
    // rebuild the final batch's data (what the sink would replay) — after
    // the restart, the last generation is the post-restart drop
    val lastBatch = incoming.filter($"doc_id" >= 349 && $"doc_id" < 351)
    DriftStream.processBatch(spark, state)(lastBatch, genBefore)
    val profSealedReplay = DriftStream.profile(spark, state)
      .as[(String, Long)].collect().toSet
    assert(profSealedReplay == profBefore,
      "replay over a sealed generation must be a no-op")
    assert(DriftStream.latestGen(spark, state) == genBefore)

    // crash-replay half 2 — crash BEFORE the generation sealed: gen=N is
    // gone and the replay must rebuild it from the parent STRICTLY BELOW
    // the batch id, reproducing the identical profile
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/gen=$genBefore"), true)
    DriftStream.processBatch(spark, state)(lastBatch, genBefore)
    val profAfter = DriftStream.profile(spark, state)
      .as[(String, Long)].collect().toSet
    assert(profAfter == profBefore, "replayed generation must be identical")
    assert(DriftStream.latestGen(spark, state) == genBefore)
  }

  test("corpus curation survives a restart: dedup state restores from checkpoint") {
    import graft.streaming.CorpusStream
    import org.apache.spark.sql.streaming.Trigger
    val feed = Files.createTempDirectory("cur_feed").toString
    val curated = Files.createTempDirectory("cur_out").toString + "/out"
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    def drain(): Unit = {
      val q = CorpusStream.curate(CorpusStream.readDocStream(spark, feed))
        .writeStream.format("parquet")
        .option("path", curated).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    docs.filter($"doc_id" < 250).coalesce(1).write.mode("append").parquet(feed)
    drain() // process batch 1, then the process "dies"
    // batch 2 lands while down — INCLUDING exact copies of batch-1 docs,
    // which only the RESTORED fingerprint state can reject
    docs.filter($"doc_id" >= 250).coalesce(1).write.mode("append").parquet(feed)
    docs.filter($"doc_id" < 50).coalesce(1).write.mode("append").parquet(feed)
    drain() // fresh query, same checkpoint

    val streamed = spark.read.parquet(curated)
    assert(streamed.select($"fp").distinct().count() == streamed.count(),
      "restart re-admitted a duplicate fingerprint")
    val batchKeepers = graft.pipeline.CorpusPipeline.frontEnd(spark, sfDir)
      .collect { case ("exact_dedup", df) => df }.head
    assert(streamed.count() == batchKeepers.count())
  }

  test("live CDC feed → apply → model refresh == batch, across a restart") {
    import graft.streaming.{CdcApply, CdcPipeline}
    import graft.streaming.CdcApply.Change
    import org.apache.spark.sql.streaming.Trigger
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Files.createTempDirectory("cdc_feed").toString
    val table = Files.createTempDirectory("cdc_tbl").toString + "/state"
    val model = Files.createTempDirectory("cdc_mdl").toString + "/live"
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString

    def land(batch: Seq[Change]): Unit =
      batch.toDF().coalesce(1).write.mode("append").parquet(changes)
    def drain(): Unit = {
      val q = CdcPipeline.start(spark, changes, table, model, ckpt,
        trigger = Trigger.AvailableNow())
      try q.awaitTermination() finally q.stop()
    }
    // sync 1: inserts; sync 2: rename + delete — then the query STOPS
    land(Seq(Change("B1", "Unter", 10L, None), Change("B2", "Grun", 5L, None)))
    land(Seq(Change("B1", "Unter GmbH", 30L, None),
      Change("B2", "Grun", 15L, Some(ts("2015-06-01 00:00:00")))))
    drain()
    // while "down": a stale out-of-order change and a fresh insert land
    land(Seq(Change("B1", "Unter AG", 20L, None), Change("B3", "Hinter", 7L, None)))
    drain() // restart from the checkpoint: replays nothing, applies the rest

    val allChanges = Seq(
      Change("B1", "Unter", 10L, None), Change("B2", "Grun", 5L, None),
      Change("B1", "Unter GmbH", 30L, None),
      Change("B2", "Grun", 15L, Some(ts("2015-06-01 00:00:00"))),
      Change("B1", "Unter AG", 20L, None), Change("B3", "Hinter", 7L, None))
    val expect = CdcApply.currentStateBatch(allChanges.toDF())
      .as[(String, String, Long, Boolean)].collect().toSet
    val got = spark.read.parquet(table)
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(got == expect, s"stream state $got != batch $expect")
    // the refreshed downstream model excludes the tombstoned key
    val live = spark.read.parquet(model)
      .select($"base_num", $"base_name").as[(String, String)].collect().toSet
    assert(live == Set("B1" -> "Unter GmbH", "B3" -> "Hinter"))
  }

  test("CDC merge fails loudly on state-table schema drift (no silent clobber)") {
    import graft.streaming.CdcApply.Current
    import graft.streaming.CdcPipeline
    val table = Files.createTempDirectory("cdc_drift").toString + "/state"
    val model = Files.createTempDirectory("cdc_drift_m").toString + "/live"
    // a stored state table whose schema does NOT match Current
    Seq(("B1", 1L)).toDF("base_num", "other_col").write.parquet(table)
    val updates = Seq(Current("B2", "Neu", 3L, deleted = false)).toDS()
    intercept[org.apache.spark.sql.AnalysisException] {
      CdcPipeline.mergeBatch(updates, table, model)
    }
    // the drifted table survives untouched — the first-batch fallback must
    // not treat a union failure as "table absent" and overwrite it
    assert(spark.read.parquet(table).columns.toSeq == Seq("base_num", "other_col"))
  }

  test("streaming debounce == q62 batch accounting across ordered micro-batches") {
    import graft.streaming.Debounce
    // stage the events as THREE consecutive time slices so every key's
    // rows arrive in order across micro-batches (the stream contract)
    val evs = Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("tus"), $"event_id")
      .as[Debounce.Ev].collect().sortBy(e => (e.tus, e.event_id))
    val src = Files.createTempDirectory("debounce_stream").toString
    val slice = (evs.length + 2) / 3
    val t0 = System.currentTimeMillis()
    evs.grouped(slice).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toSeq.toDS().repartition(1).write.parquet(s"$src/slice_$i")
      // FileStreamSource drains in modification-time order; slices written
      // within one mtime tick would tie and could be picked up out of
      // order, flaking the order-sensitive kept-anchor assertion — stamp
      // strictly increasing mtimes explicitly.
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(s"$src/slice_$i")).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 2000L)))
    }
    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING, tus LONG, event_id LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/slice_*")
      .as[Debounce.Ev]
    val q = Debounce.debounce(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("debounce_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamedKept = spark.table("debounce_out")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_kept"))
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // q62 reports only keys with drops; keys absent there kept everything
    val batchTotals = evs.groupBy(e => (e.user_id, e.event_type)).view
      .mapValues(_.size.toLong).toMap
    val batchKept = graft.operators.Relational.q62Debounce(spark, sfDir)
      .select($"user_id", $"event_type", $"n_kept")
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = batchTotals.map { case (k, total) =>
      k -> batchKept.getOrElse(k, total)
    }
    assert(streamedKept == expect)
  }

  test("hourly rollup over a RATE source (non-file): closed windows match the twin") {
    // The reference's Kafka TO-DO (Diary of Making.md:383-386) needs the
    // transform to be source-agnostic; every other spec here replays files.
    // Prove the seam on a genuinely unbounded, non-file source: the rate
    // source with DETERMINISTIC event time derived from the row counter
    // (one synthetic event per minute of event time), so each closed
    // hour window has an exactly computable twin — no engine change, the
    // same EventsStream.hourlyRollup.
    val base = 472223L * 3600L // hour-aligned epoch seconds
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "2000").load()
    val evs = rate.select(
      timestamp_seconds(lit(base) + col("value") * 60).as("ts"),
      concat(lit("t"), col("value") % 3).as("event_type"),
      (col("value") % 100).cast("double").as("value"))
    val q = EventsStream.hourlyRollup(evs)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("rate_out").start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("rate_out").isEmpty &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
      }
    } finally q.stop()
    val out = spark.table("rate_out")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    assert(out.nonEmpty, "rate source produced no closed windows in 120s")
    // one event per minute, types cycling with period 3, windows hour-
    // aligned from an hour-aligned epoch → every closed hour holds exactly
    // 20 events per type
    out.foreach { case (hs, tpe, cnt, _) =>
      assert((hs.getTime / 1000 - base) % 3600 == 0,
        s"window start misaligned: $hs")
      assert(cnt == 20L, s"closed window ($hs, $tpe) cnt=$cnt != 20")
    }
    assert(out.map(_._1).distinct.length * 3 == out.length,
      "every closed hour must emit all three event types")
  }

  test("JDBC CDC poll: poll-fed merge == batch state across two increments, a restart, and a crash-replay") {
    import graft.streaming.{CdcApply, CdcPollSource}
    import graft.streaming.CdcApply.Change
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // embedded Derby stands in for the reference's live Postgres; the poll
    // contract (rows keyed by a monotone lsn) is transport-portable
    val url = "jdbc:derby:memory:cdcpoll;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE changes (base_num VARCHAR(16), base_name VARCHAR(64), " +
        "lsn BIGINT, deleted_at TIMESTAMP)")
    def ins(c: Change): Unit = {
      val ps = conn.prepareStatement("INSERT INTO changes VALUES (?,?,?,?)")
      ps.setString(1, c.base_num); ps.setString(2, c.base_name)
      ps.setLong(3, c.lsn)
      c.deleted_at match {
        case Some(t) => ps.setTimestamp(4, t)
        case None => ps.setNull(4, java.sql.Types.TIMESTAMP)
      }
      ps.executeUpdate(); ps.close()
    }
    val dir = Files.createTempDirectory("cdc_poll").toString
    val (table, model, wm) = (s"$dir/state", s"$dir/live", s"$dir/watermark")
    def poll() =
      CdcPollSource.pollOnce(spark, url, "changes", table, model, wm, opts)
    def state() = spark.read.parquet(table)
      .as[(String, String, Long, Boolean)].collect().toSet
    def expect(cs: Seq[Change]) = CdcApply.currentStateBatch(cs.toDF())
      .as[(String, String, Long, Boolean)].collect().toSet

    // increment 1: two inserts
    val inc1 = Seq(Change("B1", "Unter", 10L, None),
      Change("B2", "Grun", 5L, None))
    inc1.foreach(ins)
    assert(poll() == 2L)
    assert(state() == expect(inc1))

    // increment 2 lands while "down" — every pollOnce call IS a restart
    // (all continuity lives in the durable watermark + state paths):
    // rename, tombstone, fresh insert
    val inc2 = Seq(Change("B1", "Unter GmbH", 30L, None),
      Change("B2", "Grun", 15L, Some(ts("2015-06-01 00:00:00"))),
      Change("B3", "Hinter", 17L, None))
    inc2.foreach(ins)
    assert(poll() == 3L)
    val all = inc1 ++ inc2
    assert(state() == expect(all), "poll-fed merge != batch state")
    // downstream live model excludes the tombstoned key
    val live = spark.read.parquet(model)
      .select($"base_num", $"base_name").as[(String, String)].collect().toSet
    assert(live == Set("B1" -> "Unter GmbH", "B3" -> "Hinter"))

    // idle poll: nothing new → no rows absorbed, state untouched
    assert(poll() == 0L)
    assert(state() == expect(all))

    // crash-replay: reset the watermark to its post-inc1 value, simulating
    // a crash BETWEEN merge and watermark write — the replayed increment
    // must be a no-op (latest-LSN-wins applied twice)
    CdcPollSource.writeWatermark(wm, 10L)
    assert(poll() == 3L) // inc2 re-fetched (B2's lsn 15 > 10, etc.)
    assert(state() == expect(all), "crash-replay changed converged state")
    assert(CdcPollSource.readWatermark(wm) == 30L)
    conn.close()
  }

  test("streaming near-dup suppression: store admits only d10-new docs; replay is self-healing") {
    import graft.streaming.NearDupStream
    val src = Files.createTempDirectory("neardup_src").toString
    val store = Files.createTempDirectory("neardup_store").toString + "/docs"
    val ckpt = Files.createTempDirectory("neardup_ckpt").toString

    def doc(id: Long, text: String) =
      (id, text, "en", "drop", text.length.toLong)
    def mkDf(rows: Seq[(Long, String, String, String, Long)]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val baseText = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val otherText = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val drop1 = Seq(doc(1, baseText), doc(2, otherText),
      doc(3, baseText)) // 3 is a within-batch exact dup of 1
    // drop2: exact dup of stored 1, near dup of stored 2 (one word
    // changed), and a genuinely new doc
    val drop2 = Seq(doc(10, baseText),
      doc(11, otherText.replace("eighteen", "nineteen")),
      doc(12, "red blue green yellow purple orange brown black white grey " +
        "cyan magenta teal maroon olive navy silver gold bronze pink"))

    def run(): Unit = {
      val q = NearDupStream.start(spark, src, store, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    import graft.sources.Snapshots
    def stored() = Snapshots.readVersion(spark, store)
      .select($"doc_id").as[Long].collect().toSet

    mkDf(drop1).coalesce(1).write.mode("append").parquet(src)
    run()
    // within-batch exact dup collapses to the smallest doc_id
    assert(stored() == Set(1L, 2L))

    mkDf(drop2).coalesce(1).write.mode("append").parquet(src)
    run() // restart from checkpoint: drop1 must not be reprocessed
    assert(stored() == Set(1L, 2L, 12L),
      "exact(10) and near(11) must be suppressed, new(12) admitted")

    // the stream verdicts equal the batch d10 core applied to the same split
    val v = NearDupStream.verdicts(mkDf(drop1.take(2)), mkDf(drop2))
      .as[(Long, String, Option[Long])].collect()
      .map { case (i, ver, m) => i -> ((ver, m)) }.toMap
    assert(v(10L) == ("exact", Some(1L)) && v(11L) == ("near", Some(2L)) &&
      v(12L) == ("new", None), s"verdicts: $v")

    // exactly-once: each batch committed an epoch-stamped store version.
    // Crash between epoch commit and checkpoint advance = foreachBatch
    // re-runs with the SAME batch id — must be a no-op, not a re-apply
    val lastE = Snapshots.lastEpoch(spark, store)
    assert(lastE.nonEmpty, "batches must stamp their epoch")
    val vBefore = Snapshots.currentVersion(spark, store)
    NearDupStream.processBatch(spark, store)(mkDf(drop2), lastE.get)
    assert(Snapshots.currentVersion(spark, store) == vBefore,
      "replayed epoch committed a new version")
    assert(stored() == Set(1L, 2L, 12L), "replayed epoch changed the store")

    // self-healing replay: re-delivering already-stored docs as a NEW
    // epoch is row-level suppressed (they exact-match their own
    // fingerprints); the store is a snapshot table, so the pre-replay
    // corpus states stay time-travelable
    mkDf(drop1).coalesce(1).write.mode("append").parquet(src)
    run()
    assert(stored() == Set(1L, 2L, 12L), "replay must not re-append")
    assert(Snapshots.readVersion(spark, store, Some(1))
      .select($"doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "batch-0 store state lost to time travel")
  }
}
