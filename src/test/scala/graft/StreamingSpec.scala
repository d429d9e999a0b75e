package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming semantics: the same transforms run in batch
  * and streaming, watermarks admit late-but-in-window data, and the
  * stateful sessionizer closes sessions on event-time gaps.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumblingStats streaming run equals the batch run") {
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(10), 2, "view", 3.0))
    val batch = EventStreams.tumblingStats(
      events.toDF(), windowLen = "10 minutes")
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingStats(input.toDF(), "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("append-mode windows drop data later than the watermark") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingStats(input.toDF(),
        windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark so the
      // [10:00, 10:10) window finalizes and emits
      input.addData(Event(2, ts(40), 1, "click", 1.0))
      q.processAllAvailable()
      val afterClose = spark.table("late_out")
        .collect().map(_.getTimestamp(0)).toSet
      assert(afterClose.contains(ts(0)))
      // this event belongs to the already-finalized window and is
      // older than the watermark -> must be dropped, not re-emitted
      input.addData(Event(3, ts(2), 1, "click", 100.0))
      q.processAllAvailable()
      val rows = spark.table("late_out")
        .filter($"window_start" === ts(0)).collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("n") == 1) // late row did not count
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids across batches") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.dedupEvents(input.toDF(), watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0),
                    Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      // same ids re-delivered in a later batch (at-least-once source)
      input.addData(Event(1, ts(0), 1, "click", 1.0),
                    Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select($"event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L)) // 1 delivered once
    } finally q.stop()
  }

  test("funnelStages advances incrementally and matches batch staging") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.funnelStages(input.toDS())
      .toDF("user_id", "stage")
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    try {
      // user 1 views in batch 1 -> stage 1
      input.addData(Event(1, ts(0), 1, "view", 1.0))
      q.processAllAvailable()
      val after1 = spark.table("funnel_out")
        .filter($"user_id" === 1).select($"stage").as[Int].collect()
      assert(after1.toSeq == Seq(1))
      // click then purchase arrive later (out of order within the
      // batch is fine — only the per-type minima matter) -> stage 3;
      // user 2's purchase-before-view stays stage 1
      input.addData(
        Event(2, ts(10), 1, "purchase", 5.0),
        Event(3, ts(5), 1, "click", 0.0),
        Event(4, ts(3), 2, "purchase", 9.0),
        Event(5, ts(7), 2, "view", 1.0))
      q.processAllAvailable()
      val last = spark.table("funnel_out").collect()
        .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.last.getInt(1) }
      assert(last(1L) == 3)
      assert(last(2L) == 1)
    } finally q.stop()
  }

  test("sessionize closes sessions after the gap, keeps state per user") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two events 5 min apart (one session), then 30 min
      // silence, then another event -> first session closes
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(35), 1, "view", 5.0))
      q.processAllAvailable()
      // advance event time far enough that the watermark passes the
      // second session's timeout too
      input.addData(Event(9, ts(59), 2, "view", 0.5))
      q.processAllAvailable()
      input.addData(Event(10, Timestamp.valueOf("2024-01-01 12:00:00"),
        2, "view", 0.5))
      q.processAllAvailable()

      val sessions = spark.table("sessions_out").as[EventStreams.Session]
        .collect().filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(sessions.length >= 1)
      val first = sessions.head
      assert(first.session_start == ts(0))
      assert(first.session_end == ts(5))
      assert(first.n_events == 2)
      assert(first.sum_value == 3.0)
    } finally q.stop()
  }

  test("built-in session_window finalizes sessions in streaming append mode") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionWindowStats(input.toDF(),
        gap = "30 minutes", watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sw_out").start()
    try {
      // two events 10 min apart: one session [10:00, 10:40)
      input.addData(Event(1, ts(0), 1, "click", 1.5),
                    Event(2, ts(10), 1, "view", 2.5))
      q.processAllAvailable()
      // nothing can finalize until the watermark passes the session end
      assert(spark.table("sw_out").isEmpty)
      // an event 3 h later pushes the watermark past 10:40 -> emit
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 13:00:00"),
        1, "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("sw_out").collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert(r.getAs[Long]("user_id") == 1L
        && r.getAs[Timestamp]("session_start") == ts(0)
        && r.getAs[Timestamp]("session_end") ==
           Timestamp.valueOf("2024-01-01 10:40:00")
        && r.getAs[Long]("n_events") == 2L
        && r.getAs[Double]("sum_value") == 4.0)
      // the 13:00 session stays open (no later watermark) -> not emitted
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases within the click window") {
    val clicks = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    def shape(df: org.apache.spark.sql.DataFrame,
              ts: String, id: String) =
      df.selectExpr("user_id", s"ts AS $ts", s"event_id AS $id")
    val q = EventStreams.intervalJoin(
        shape(clicks.toDF(), "c_ts", "c_id"),
        shape(purchases.toDF(), "p_ts", "p_id"),
        "c_ts", "p_ts", "c_id", "p_id",
        withinMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      clicks.addData(Event(1, ts(0), 1, "click", 0))
      purchases.addData(
        Event(10, ts(20), 1, "purchase", 0),  // inside [10:00, 10:30]
        Event(11, ts(45), 1, "purchase", 0),  // outside the window
        Event(12, ts(20), 2, "purchase", 0))  // wrong user
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select($"c_id", $"p_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally q.stop()
  }

  test("rollingDedup matches the batch lag semantics across stream batches") {
    // previous-OCCURRENCE chain (the q118 semantics): t0 kept, t0+5m
    // dropped, t0+11m ALSO dropped — only 6 min after the previous
    // (dropped) event, even though it is >10 min after the last KEPT
    // one (kept-anchor semantics would keep it: the exact distinction
    // the operator docs pin). t0+25m is kept (14 min after previous).
    val e = Seq(
      Event(1, ts(0), 1, "click", 0),
      Event(2, ts(5), 1, "click", 0),   // 5 min after prev -> dropped
      Event(3, ts(11), 1, "click", 0),  // 6 min after prev -> dropped
      Event(6, ts(25), 1, "click", 0),  // 14 min after prev -> kept
      Event(4, ts(0), 1, "view", 0),    // different type -> own chain
      Event(5, ts(30), 2, "click", 0))  // different user
    // batch mode first: flatMapGroupsWithState sees each key once
    val batchKept = EventStreams.rollingDedup(e.toDS(), withinMinutes = 10)
      .collect().map(_.event_id).toSet
    assert(batchKept == Set(1L, 6L, 4L, 5L))
    // streaming, events split across batches in event-time order
    val src = MemoryStream[Event](spark)
    val q = EventStreams.rollingDedup(src.toDS(), withinMinutes = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("rd_out").start()
    try {
      src.addData(e(0), e(4)); q.processAllAvailable()
      src.addData(e(1)); q.processAllAvailable()
      src.addData(e(2)); q.processAllAvailable()
      src.addData(e(3), e(5)); q.processAllAvailable()
      val got = spark.table("rd_out").as[Event].collect()
        .map(_.event_id).toSet
      assert(got == batchKept, s"stream != batch: $got")
    } finally q.stop()
  }

  test("rollingDedupOrdered matches batch under cross-batch event-time disorder") {
    // the exact shape the fast path's documented bound excludes: a
    // key's events arrive ACROSS micro-batches out of event-time
    // order (late but inside the watermark). Ordered mode buffers
    // until the watermark, so the flush replays batch order.
    val e = Seq(
      Event(1, ts(0), 1, "click", 0),   // kept
      Event(2, ts(5), 1, "click", 0),   // 5 min after prev -> dropped
      Event(3, ts(11), 1, "click", 0),  // 6 min after prev -> dropped
      Event(6, ts(25), 1, "click", 0),  // 14 min after prev -> kept
      Event(5, Timestamp.valueOf("2024-01-01 11:30:00"), 2, "click", 0),
      Event(9, Timestamp.valueOf("2024-01-01 12:30:00"), 99, "click", 0))
    // batch runs of both variants agree (everything final, one flush)
    val batchKept = EventStreams.rollingDedup(e.toDS(), withinMinutes = 10)
      .collect().map(_.event_id).toSet
    val orderedBatch = EventStreams.rollingDedupOrdered(e.toDS(), 10)
      .collect().map(_.event_id).toSet
    assert(batchKept == Set(1L, 6L, 5L, 9L))
    assert(orderedBatch == batchKept)

    // streaming with DISORDER: id3 (10:11) arrives before id2 (10:05).
    // The fast path would mis-decide id2/id3 here; ordered mode must
    // not. id5 (11:30) pushes the watermark to 11:00, flushing user
    // 1's chain; id9 (12:30) pushes it to 12:00, flushing id5. id9
    // itself stays buffered at the end (wm never passes 12:30).
    val src = MemoryStream[Event](spark)
    val q = EventStreams.rollingDedupOrdered(
        src.toDS(), withinMinutes = 10, watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("rdo_out").start()
    try {
      src.addData(e(0)); q.processAllAvailable()
      src.addData(e(2)); q.processAllAvailable() // id3 first…
      src.addData(e(1)); q.processAllAvailable() // …then earlier id2
      src.addData(e(3)); q.processAllAvailable()
      src.addData(e(4)); q.processAllAvailable() // wm -> 11:00
      src.addData(e(5)); q.processAllAvailable() // wm -> 12:00
      val got = spark.table("rdo_out").as[Event].collect()
        .map(_.event_id).toSet
      val finalWm = Timestamp.valueOf("2024-01-01 12:00:00")
      val expected = EventStreams.rollingDedup(e.toDS(), 10)
        .filter($"ts" <= lit(finalWm)).collect().map(_.event_id).toSet
      assert(got == expected, s"stream != batch prefix: $got vs $expected")
      assert(got == Set(1L, 6L, 5L))
    } finally q.stop()
  }

  test("rollingDedupOrdered fails loudly when a key exceeds maxBuffered") {
    // a hot key whose events all sit inside the watermark horizon:
    // nothing can flush, so the buffer reaches the bound — the guard
    // must name itself instead of letting state grow toward an OOM.
    val src = MemoryStream[Event](spark)
    val q = EventStreams.rollingDedupOrdered(
        src.toDS(), withinMinutes = 10, watermark = "30 minutes",
        maxBuffered = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("rdo_guard").start()
    try {
      src.addData((0 to 4).map(i => Event(100L + i, ts(i), 1, "click", 0)): _*)
      val ex = intercept[Exception](q.processAllAvailable())
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("maxBuffered")),
        s"expected the named maxBuffered guard, got: ${ex.getMessage}")
    } finally q.stop()
  }

  test("outer interval join null-pads unmatched clicks after the watermark") {
    val clicks = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    def shape(df: org.apache.spark.sql.DataFrame,
              ts: String, id: String) =
      df.selectExpr("user_id", s"ts AS $ts", s"event_id AS $id")
    val q = EventStreams.intervalJoinOuter(
        shape(clicks.toDF(), "c_ts", "c_id"),
        shape(purchases.toDF(), "p_ts", "p_id"),
        "c_ts", "p_ts", "c_id", "p_id",
        withinMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ijo_out").start()
    try {
      // click 1 matches; click 2 never will
      clicks.addData(Event(1, ts(0), 1, "click", 0),
                     Event(2, ts(0), 2, "click", 0))
      purchases.addData(Event(10, ts(20), 1, "purchase", 0))
      q.processAllAvailable()
      val early = spark.table("ijo_out")
        .select($"c_id", $"p_id").as[(Long, Option[Long])].collect().toSet
      // the unmatched click must NOT have emitted speculatively: its
      // join window [10:00, 10:30] is not yet past both watermarks
      assert(early == Set((1L, Some(10L))))
      // advance both watermarks far past the window end -> the outer
      // row becomes final and emits exactly once, null-padded
      clicks.addData(Event(3, ts(120), 9, "click", 0))
      purchases.addData(Event(11, ts(120), 9, "purchase", 0))
      q.processAllAvailable()
      val late = spark.table("ijo_out")
        .select($"c_id", $"p_id").as[(Long, Option[Long])].collect()
      assert(late.count(_ == ((2L, None))) == 1, late.toSeq)
      assert(late.count(_._1 == 1L) == 1) // no duplicate for the match
    } finally q.stop()
  }

  test("interval join resolves when both sides split one parent frame") {
    // the q101 shape: clicks and purchases are filters of the SAME
    // scan, so an unaliased l("user_id") === r("user_id") would be a
    // trivially-true self-compare. Run with the strict analyzer flag
    // to prove the aliased join resolves each side unambiguously.
    withSQLConf("spark.sql.analyzer.failAmbiguousSelfJoin" -> "true") {
      val ev = Seq(
        Event(1, ts(0), 1, "click", 0),
        Event(10, ts(20), 1, "purchase", 0),  // inside [10:00, 10:30]
        Event(11, ts(45), 1, "purchase", 0),  // outside
        Event(12, ts(20), 2, "purchase", 0)   // wrong user
      ).toDF()
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"), $"event_id".as("c_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
      val got = EventStreams.intervalJoin(clicks, purchases,
          "c_ts", "p_ts", "c_id", "p_id", withinMinutes = 30)
        .select($"c_id", $"p_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    }
  }

  test("outer interval join recovers join state across kill/restart " +
      "and matches the batch plan") {
    // r14 verdict task #7: the q118 treatment for the stream-stream
    // OUTER interval join. A file-checkpointed two-source query is
    // stopped cold while a left row sits UNMATCHED in the join state
    // (its window not yet past the watermark), then a NEW query
    // resumes: (i) a right event arriving after the restart must
    // still match that buffered left row — proves join-state
    // recovery, not just offsets; (ii) a forever-unmatched left must
    // null-pad exactly once, after restart; (iii) the final output
    // equals the SAME plan run in batch, truncated to rows the final
    // watermark made final.
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_ijo_recovery")
    val clickDir = root.resolve("clicks"); Files.createDirectories(clickDir)
    val purchDir = root.resolve("purchases"); Files.createDirectories(purchDir)
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val sch = "event_id LONG, ts STRING, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    def addFile(dir: java.nio.file.Path, name: String,
                rows: Seq[(Long, String, Long)]): Unit = {
      val lines = rows.map { case (id, t, u) =>
        s"""{"event_id":$id,"ts":"2024-01-01 $t:00","user_id":$u,""" +
          s""""event_type":"x","value":1.0}"""
      }.mkString("\n")
      Files.write(dir.resolve(name), lines.getBytes("UTF-8"))
    }
    def shape(df: org.apache.spark.sql.DataFrame, ts: String, id: String) =
      df.selectExpr("user_id", s"ts AS $ts", s"event_id AS $id")
    def joined(clicks: org.apache.spark.sql.DataFrame,
               purchases: org.apache.spark.sql.DataFrame) =
      EventStreams.intervalJoinOuter(
        shape(clicks, "c_ts", "c_id"), shape(purchases, "p_ts", "p_id"),
        "c_ts", "p_ts", "c_id", "p_id",
        withinMinutes = 30, watermark = "10 minutes")
    def startQuery() = joined(
        spark.readStream.schema(sch).json(clickDir.toString),
        spark.readStream.schema(sch).json(purchDir.toString))
      .writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).start()

    // phase 1: c1 matches immediately; c2 stays BUFFERED (no
    // watermark advance, so its window is still open at kill time)
    addFile(clickDir, "c1.json", Seq((1L, "10:00", 1L), (2L, "10:05", 2L)))
    addFile(purchDir, "p1.json", Seq((10L, "10:20", 1L)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // cold stop with c2 unmatched in the join state

    // phase 2 (new query object): pr11 lands inside c2's window —
    // must match the RESTORED left state; c3 never matches; advancer
    // rows on BOTH sides push the global watermark past every
    // real window so c3 null-pads and everything finalizes
    addFile(clickDir, "c2.json",
      Seq((3L, "10:07", 3L), (98L, "13:00", 98L)))
    addFile(purchDir, "p2.json",
      Seq((11L, "10:15", 2L), (99L, "13:00", 99L)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val streamed = spark.read.parquet(outDir)
        .select($"c_id", $"p_id").as[(Long, Option[Long])]
        .collect().toSeq
      // exactly-once: no row emitted twice across the kill
      assert(streamed.size == streamed.distinct.size,
        s"duplicates across restart: $streamed")
      // the buffered-at-kill left matched a post-restart right
      assert(streamed.contains((2L, Some(11L))), streamed.toString)
      // batch oracle: same plan, static inputs, truncated to rows the
      // final watermark (12:50) finalized — the 13:00 advancer click
      // is the only left not yet final
      val clicksB = spark.read.schema(sch).json(clickDir.toString)
      val purchB = spark.read.schema(sch).json(purchDir.toString)
      val batch = joined(clicksB, purchB)
        .filter($"c_ts" <= lit("2024-01-01 12:50:00").cast("timestamp"))
        .select($"c_id", $"p_id").as[(Long, Option[Long])]
        .collect().toSet
      assert(streamed.toSet == batch,
        s"streamed=${streamed.toSet}\nbatch=$batch")
      // and the never-matched click null-padded exactly once
      assert(streamed.count(_ == ((3L, None))) == 1)
    } finally {
      q2.stop()
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("checkpointed query recovers exactly-once after a kill/restart") {
    // The production-ingest property the other cases don't cover: a
    // file-checkpointed query is stopped cold mid-stream and a NEW
    // query object resumes from the checkpoint — committed batches
    // must not re-emit (no duplicates), nothing is lost, and the
    // session STATE survives: user 1 has an open session at kill time
    // that an event after the restart must MERGE into, so a pass
    // proves state-store recovery, not just source-offset recovery.
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_ckpt_recovery")
    val inDir = root.resolve("in"); Files.createDirectories(inDir)
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val sch = "event_id LONG, ts STRING, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    def addFile(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val lines = rows.map { case (id, t, u) =>
        s"""{"event_id":$id,"ts":"2024-01-01 $t:00","user_id":$u,""" +
          s""""event_type":"click","value":1.0}"""
      }.mkString("\n")
      Files.write(inDir.resolve(name), lines.getBytes("UTF-8"))
    }
    def startQuery() = EventStreams.sessionWindowStats(
        spark.readStream.schema(sch).json(inDir.toString),
        gap = "10 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).start()

    // phase 1: two closed sessions (u1, u2), one still-open session
    // (u1 @ 11:55), and a watermark-advancing row (u99 @ 12:00)
    addFile("p1.json", Seq(
      (1L, "10:00", 1L), (2L, "10:05", 1L), (3L, "10:02", 2L),
      (4L, "11:55", 1L), (5L, "12:00", 99L)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // cold stop: no graceful drain beyond the last commit

    // phase 2: u1 @ 12:02 lands INSIDE the session left open before
    // the kill; u3 is a fresh session; u99 @ 14:00 pushes the
    // watermark to 13:50 so everything earlier finalizes
    addFile("p2.json", Seq(
      (6L, "12:02", 1L), (7L, "12:30", 3L), (8L, "14:00", 99L)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val streamed = spark.read.parquet(outDir)
        .collect().map(_.toSeq).toSet
      // oracle: the SAME plan over the whole input as one batch,
      // truncated to sessions the final watermark (13:50) finalized
      val batch = EventStreams.sessionWindowStats(
          spark.read.schema(sch).json(inDir.toString), gap = "10 minutes")
        .filter($"session_end" <= lit("2024-01-01 13:50:00").cast("timestamp"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
      // the open-at-kill u1 session merged with the post-restart event
      assert(streamed.exists(r => r(0) == 1L &&
        r(1) == java.sql.Timestamp.valueOf("2024-01-01 11:55:00") &&
        r(3) == 2L), s"u1 session did not merge across restart: $streamed")
      // exactly-once: committed phase-1 output did not re-emit
      val all = spark.read.parquet(outDir).collect().map(_.toSeq).toSeq
      assert(all.size == all.distinct.size, s"duplicate rows: $all")
    } finally {
      q2.stop()
      // best-effort temp cleanup
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
