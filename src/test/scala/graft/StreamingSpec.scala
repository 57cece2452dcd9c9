package graft

import java.sql.Timestamp

import graft.streaming.{AsOfEvent, AsOfMatch, Event, EventStreams, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming behavior: the streaming forms of the event-time
  * operators agree with their batch forms ([[operators.EventTime]]) on the
  * same data, and streaming-only semantics (watermark dedup state, event-time
  * session timeouts) behave as documented.
  */
class StreamingSpec extends SparkSuiteBase {

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$second%02d")

  private def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("windowedTypeCounts: streaming (complete mode) equals the batch run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Seq(
      Event(1, tsH(0, 5), 10, "click", 1.0),
      Event(2, tsH(0, 15), 11, "click", 1.0),
      Event(3, tsH(0, 45), 10, "buy", 2.0),
      Event(4, tsH(1, 5), 12, "click", 1.0),
      Event(5, tsH(2, 30), 10, "click", 1.0))

    val stream = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      stream.addData(events.take(3))
      q.processAllAvailable()
      stream.addData(events.drop(3))
      q.processAllAvailable()

      val streamed = spark.table("win_counts")
        .select(unix_micros(col("window.start")).as("ws"), col("event_type"),
          col("n_events"), col("approx_users"))
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.windowedTypeCounts(events.toDF())
        .select(unix_micros(col("window.start")).as("ws"), col("event_type"),
          col("n_events"), col("approx_users"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.size == 4) // (h0 click), (h0 buy), (h1 click), (h2 click)
    } finally q.stop()
  }

  test("windowedValueSketch: incremental state-store sketch equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Seq(
      Event(1, tsH(0, 5), 10, "click", 1.25),
      Event(2, tsH(0, 15), 11, "click", 37.5),
      Event(3, tsH(0, 45), 10, "buy", 250.0),
      Event(4, tsH(0, 50), 12, "click", 0.75),
      Event(5, tsH(1, 5), 12, "click", 9000.0),
      Event(6, tsH(1, 30), 10, "click", 9999.99))

    val stream = MemoryStream[Event]
    val q = EventStreams.windowedValueSketch(stream.toDF())
      .writeStream.format("memory").queryName("win_sketch")
      .outputMode("complete").start()
    try {
      // split across three micro-batches: the final sketch per window is
      // built by state-store merges, not one batch-local aggregation
      stream.addData(events.take(2))
      q.processAllAvailable()
      stream.addData(events.slice(2, 4))
      q.processAllAvailable()
      stream.addData(events.drop(4))
      q.processAllAvailable()

      def norm(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = df
        .select(unix_micros(col("window.start")).as("ws"),
          expr("transform(value_sketch, e -> struct(e.b, e.cnt))").as("sk"))
        .collect().map(_.toSeq).toSet
      val streamed = norm(spark.table("win_sketch"))
      val batch = norm(EventStreams.windowedValueSketch(events.toDF()))
      assert(streamed == batch)
      assert(streamed.size == 2) // h0 and h1 windows
    } finally q.stop()
  }

  test("windowedDistinctUsers: HLL registers built across micro-batches equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = (1 to 40).map(i =>
      Event(i, tsH(i % 2, i % 55), 100 + i % 7, "click", i.toDouble))

    val stream = MemoryStream[Event]
    val q = EventStreams.windowedDistinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("win_hll")
      .outputMode("complete").start()
    try {
      stream.addData(events.take(15))
      q.processAllAvailable()
      stream.addData(events.slice(15, 30))
      q.processAllAvailable()
      stream.addData(events.drop(30))
      q.processAllAvailable()

      def norm(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = df
        .select(unix_micros(col("window.start")).as("ws"),
          expr("transform(user_sketch, e -> struct(e.b, e.r))").as("sk"))
        .collect().map(_.toSeq).toSet
      val streamed = norm(spark.table("win_hll"))
      val batch = norm(EventStreams.windowedDistinctUsers(events.toDF()))
      assert(streamed == batch)
      assert(streamed.size == 2) // h0 and h1 windows
    } finally q.stop()
  }

  test("windowedFreqSketch: CMS cells built across micro-batches equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val types = Seq("click", "view", "purchase", "signup")
    val events = (1 to 40).map(i =>
      Event(i, tsH(i % 2, i % 55), 100 + i % 7, types(i % 4), i.toDouble))

    val stream = MemoryStream[Event]
    val q = EventStreams.windowedFreqSketch(stream.toDF())
      .writeStream.format("memory").queryName("win_cms")
      .outputMode("complete").start()
    try {
      stream.addData(events.take(13))
      q.processAllAvailable()
      stream.addData(events.drop(13))
      q.processAllAvailable()

      def norm(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = df
        .select(unix_micros(col("window.start")).as("ws"),
          expr("transform(freq_sketch, e -> struct(e.cell, e.cnt))").as("sk"))
        .collect().map(_.toSeq).toSet
      val streamed = norm(spark.table("win_cms"))
      val batch = norm(EventStreams.windowedFreqSketch(events.toDF()))
      assert(streamed == batch)
      assert(streamed.size == 2)
      // the summary answers a point query: per window, est(click) >= true count
      val est = spark.table("win_cms")
        .select(unix_micros(col("window.start")).as("ws"), col("freq_sketch"))
        .withColumn("h", graft.functions.TextFunctions.md5Bits(lit("click"), 15))
        .withColumn("est", least((0 until graft.plans.CmsAggregate.D).map(i =>
          coalesce(expr(s"try_element_at(filter(freq_sketch, e -> e.cell = " +
            s"CAST(${i * 64} + (shiftright(h, ${15 * i}) & 63) AS INT)), 1).cnt"),
            lit(0L))): _*))
        .select(col("ws"), col("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val trueCounts = events.filter(_.event_type == "click")
        .groupBy(e => e.ts.getTime >= 3600000L)
        .view.mapValues(_.size.toLong).toMap
      est.values.foreach(v => assert(v >= 0L))
      assert(est.values.sum >= trueCounts.values.sum, "CMS never undercounts")
    } finally q.stop()
  }

  test("windowedTopValues: bounded top-k buffers across micro-batches equal the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = (1 to 40).map(i =>
      Event(i, tsH(i % 2, i % 55), 100 + i % 7, "t", (i * 37 % 101).toDouble))
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedTopValues(stream.toDF(), k = 3)
      .writeStream.format("memory").queryName("win_topk")
      .outputMode("complete").start()
    try {
      stream.addData(events.take(17))
      q.processAllAvailable()
      stream.addData(events.drop(17))
      q.processAllAvailable()

      def norm(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = df
        .select(unix_micros(col("window.start")).as("ws"),
          expr("transform(top_events, e -> struct(e.score, e.id))").as("top"))
        .collect().map(_.toSeq).toSet
      val streamed = norm(spark.table("win_topk"))
      val batch = norm(EventStreams.windowedTopValues(events.toDF(), k = 3))
      assert(streamed == batch)
      assert(streamed.size == 2)
      // per window the buffer is the TRUE top-3 by (cents DESC, id ASC) —
      // an independent sequential selection, not the aggregate's own path
      val got = spark.table("win_topk")
        .select(unix_micros(col("window.start")).as("ws"),
          expr("transform(top_events, e -> struct(e.score, e.id))").as("top"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(e => (e.getDouble(0), e.getLong(1))).toList).toMap
      events.groupBy(_.ts.getTime / 3600000L).foreach { case (h, evs) =>
        val expect = evs
          .map(e => (math.round(e.value * 100).toDouble, e.event_id))
          .sortBy { case (s, id) => (-s, id) }.take(3).toList
        assert(got(h * 3600000000L) == expect, s"window $h top-3")
      }
    } finally q.stop()
  }

  test("windowedTypeCounts append mode: a window emits only once the watermark passes it, then is final") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(stream.toDF(), windowLen = "15 minutes")
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("n_events"))
      .writeStream.format("memory").queryName("win_append")
      .outputMode("append").start()
    try {
      stream.addData(Seq(Event(1, ts(1), 10, "click", 1.0), Event(2, ts(5), 11, "click", 1.0)))
      q.processAllAvailable()
      // watermark still below 00:15 + 10min -> nothing final yet
      assert(spark.table("win_append").isEmpty)

      // event at 00:40 raises the watermark to 00:30 > [00:00,00:15) end
      stream.addData(Seq(Event(3, ts(40), 10, "click", 1.0)))
      q.processAllAvailable()
      stream.addData(Seq.empty[Event])
      q.processAllAvailable()
      val emitted = spark.table("win_append")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // the closed [00:00,00:15) window is emitted exactly once with its
      // final count; the 00:40 window stays open
      assert(emitted == Set((1704067200000000L, "click", 2L))) // 2024-01-01T00:00Z
    } finally q.stop()
  }

  test("dedupByEventId drops within-watermark duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[Event]
    val q = EventStreams.dedupByEventId(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        Event(1, ts(1), 10, "click", 1.0),
        Event(1, ts(1), 10, "click", 1.0), // same-batch duplicate
        Event(2, ts(2), 10, "click", 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(
        Event(2, ts(3), 10, "click", 1.0), // cross-batch duplicate, in watermark
        Event(3, ts(4), 10, "click", 1.0)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream join: clicks attribute to in-window impressions; streaming equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val imps = Seq((1L, ts(0)), (2L, ts(0)), (1L, tsH(2, 0)))
    val clicks = Seq(
      (1L, ts(10), 100L), // within 30 min of ad 1's first impression
      (1L, tsH(1, 0), 101L), // 60 min later: outside the window
      (2L, ts(29), 102L), // within
      (3L, ts(5), 103L)) // no impression for ad 3

    val iStream = MemoryStream[(Long, java.sql.Timestamp)]
    val cStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStreams.attributeClicks(
      iStream.toDF().toDF("ad_id", "i_ts"),
      cStream.toDF().toDF("c_ad_id", "c_ts", "click_id"))
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      iStream.addData(imps)
      cStream.addData(clicks)
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .select(col("ad_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val batch = EventStreams.attributeClicks(
        imps.toDF("ad_id", "i_ts"),
        clicks.toDF("c_ad_id", "c_ts", "click_id"))
        .select(col("ad_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(streamed == batch)
      assert(streamed == Set((1L, 100L), (2L, 102L)))
    } finally q.stop()
  }

  test("sessionize: gap splits + event-time timeout; agrees with the batch window-function form") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // user 10: events at 00:00..00:10 (one session), then 01:00 (new session
    // after a 50-min > 30-min gap). user 11: single event.
    val real = Seq(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(10), 10, "click", 1.0),
      Event(3, tsH(1, 0), 10, "click", 1.0),
      Event(4, ts(5), 11, "buy", 2.0))
    // Sentinel far in the future: advances the watermark past every real
    // session's end + gap so their event-time timeouts fire.
    val sentinel = Event(99, tsH(9, 0), 999, "click", 0.0)

    val stream = MemoryStream[Event]
    val q = EventStreams.sessionize(stream.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(real)
      q.processAllAvailable()
      stream.addData(Seq(sentinel)) // batch that raises the watermark
      q.processAllAvailable()
      stream.addData(Seq.empty[Event]) // extra trigger: timeouts fire after the raise
      q.processAllAvailable()

      val streamed = spark.table("sessions_out").as[UserSession]
        .collect().filter(_.user_id != 999)
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSet

      // Batch form over the same rows (sessions all closed by construction).
      val gapUs = 1800L * 1000000L
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val batch = real.toDF()
        .withColumn("ts_ms", col("ts").cast("long") * 1000)
        .withColumn("prev", lag(col("ts_ms"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev").isNull || (col("ts_ms") - col("prev")) * 1000 > gapUs, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(
          byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("sessionizeNative: streaming session_window equals the batch run of the same transform") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // user 10: one session 00:00-00:10, then a new one at 01:00; user 11:
    // single-event session.
    val real = Seq(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(10), 10, "click", 1.0),
      Event(3, tsH(1, 0), 10, "click", 1.0),
      Event(4, ts(5), 11, "buy", 2.0))
    val sentinel = Event(99, tsH(9, 0), 999, "click", 0.0)

    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeNative(stream.toDF())
      .writeStream.format("memory").queryName("native_sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(real)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      stream.addData(Seq.empty[Event])
      q.processAllAvailable()

      val streamed = spark.table("native_sessions_out")
        .collect().filter(_.getLong(0) != 999)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = EventStreams.sessionizeNative(real.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("sessionize: a late event more than a gap BEFORE the open session becomes its own session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // gap (60s) < lateness (600s): batch 2 delivers an in-watermark event
    // 300s BEFORE the open session's start — merging it would stretch the
    // session across a 5x-gap hole; it must close as a singleton instead.
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionize(stream.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("late_sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(Event(1, ts(16, 40), 10, "click", 1.0))) // t=1000s
      q.processAllAvailable()
      stream.addData(Seq(Event(2, ts(11, 40), 10, "click", 1.0))) // t=700s, late
      q.processAllAvailable()
      stream.addData(Seq(Event(99, tsH(9, 0), 999, "click", 0.0))) // sentinel
      q.processAllAvailable()
      stream.addData(Seq.empty[Event])
      q.processAllAvailable()

      val got = spark.table("late_sessions_out").as[UserSession]
        .collect().filter(_.user_id == 10)
        .map(s => (s.session_start.getTime / 1000, s.session_end.getTime / 1000, s.n_events))
        .toSet
      val base = ts(0).getTime / 1000
      assert(got == Set((base + 700, base + 700, 1L), (base + 1000, base + 1000, 1L)))
    } finally q.stop()
  }

  test("exact-gap boundary: session_window and the lag form BOTH extend the session") {
    import spark.implicits._
    // two events exactly 1800s apart: the boundary where the two
    // sessionization forms could diverge. Pinned empirically: Spark merges
    // session windows at the exact boundary (next event AT the previous
    // window's end extends it) — same `diff > gap starts new` convention as
    // the lag form, so both oracles use `>` (EventTime scaladoc).
    val rows = Seq(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(30), 10, "click", 1.0)) // 00:30:00 = start + exactly the gap

    val native = EventStreams.sessionizeNative(rows.toDF())
    assert(native.count() == 1)

    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagForm = rows.toDF()
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_us") - col("prev") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .agg(sum(col("new_sess")).as("n_sessions"))
    assert(lagForm.collect()(0).getLong(0) == 1L)

    // and one microsecond past the gap DOES split the native form
    val past = Seq(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, new java.sql.Timestamp(ts(30).getTime + 1), 10, "click", 1.0))
    assert(EventStreams.sessionizeNative(past.toDF()).count() == 2)
  }

  test("asofJoin: streaming latest-row-per-key matches the batch as-of join exec") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // user 10: snapshots at 00:00 (v1.0) and 00:30 (v2.0); probes at 00:05,
    // 00:20 (arrives late, in a later micro-batch), 00:45. user 11: probe
    // with no snapshot ever -> left-outer null match.
    val batch1 = Seq(
      AsOfEvent(10, ts(0), is_snapshot = true, 0L, 1.0),
      AsOfEvent(10, ts(30), is_snapshot = true, 0L, 2.0),
      AsOfEvent(10, ts(5), is_snapshot = false, 100L, 0.0),
      AsOfEvent(11, ts(10), is_snapshot = false, 102L, 0.0))
    val batch2 = Seq( // late-but-within-watermark probe, before batch1's max
      AsOfEvent(10, ts(25), is_snapshot = false, 101L, 0.0),
      AsOfEvent(10, ts(45), is_snapshot = false, 103L, 0.0))
    // Sentinel far in the future: advances the watermark past every probe.
    val sentinel = AsOfEvent(999, tsH(9, 0), is_snapshot = true, 0L, 0.0)

    val stream = MemoryStream[AsOfEvent]
    val q = EventStreams.asofJoin(stream.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      stream.addData(Seq.empty[AsOfEvent]) // extra trigger: timeouts fire
      q.processAllAvailable()

      val streamed = spark.table("asof_out").as[AsOfMatch]
        .collect().filter(_.user_id != 999)
        .map(m => (m.p_event_id, m.user_id, m.p_ts_us, m.s_ts_us, m.s_val))
        .toSet

      // batch form via the custom as-of exec on the same rows
      def us(t: java.sql.Timestamp): Long = t.getTime * 1000L
      val all = batch1 ++ batch2
      val probes = all.filter(!_.is_snapshot)
        .map(e => (e.event_id, e.user_id, us(e.ts)))
        .toDF("p_event_id", "p_user", "p_ts")
      val snaps = all.filter(_.is_snapshot)
        .map(e => (e.user_id, us(e.ts), e.value))
        .toDF("s_user", "s_ts", "s_val")
        .groupBy(col("s_user"), col("s_ts")).agg(min(col("s_val")).as("s_val"))
      val batch = graft.plans.AsOfJoin(
          probes, "p_user", "p_ts", snaps, "s_user", "s_ts", leftOuter = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))
        .toSet

      assert(streamed == batch)
      assert(streamed == Set(
        (100L, 10L, us(ts(5)), Some(us(ts(0))), Some(1.0)),
        (101L, 10L, us(ts(25)), Some(us(ts(0))), Some(1.0)),
        (103L, 10L, us(ts(45)), Some(us(ts(30))), Some(2.0)),
        (102L, 11L, us(ts(10)), None, None)))
    } finally q.stop()
  }

  test("asofJoin: a snapshot at EXACTLY the watermark is late — finalizing probes at <= wm loses nothing") {
    // Pins the empirical premise behind the p_ts <= watermark finalize
    // rule: Spark's flatMapGroupsWithState late-data filter drops input
    // rows with ts <= watermark, so a snapshot arriving at exactly the
    // watermark timestamp never reaches the state function — a probe at
    // that same timestamp correctly finalizes matchless. (A proposed
    // "strict <, the co-timestamped snapshot can still arrive" fix was
    // tried and refuted by this exact scenario — the snapshot in b3 below
    // is silently discarded. Don't "fix" this again without re-running.)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def us(t: java.sql.Timestamp): Long = t.getTime * 1000L
    val stream = MemoryStream[AsOfEvent]
    val q = EventStreams.asofJoin(stream.toDS())
      .writeStream.format("memory").queryName("asof_tie_out")
      .outputMode("append").start()
    try {
      // b1: the probe, plus a sentinel snapshot that advances the watermark
      // to EXACTLY the probe's timestamp (lateness = 10 min).
      stream.addData(Seq(
        AsOfEvent(10, ts(10), is_snapshot = false, 100L, 0.0),
        AsOfEvent(999, ts(20), is_snapshot = true, 0L, 0.0)))
      q.processAllAvailable()
      // b2: unrelated same-user traffic, processed at watermark == ts(10).
      // The <= rule would finalize probe 100 here, matchless.
      stream.addData(Seq(AsOfEvent(10, ts(12), is_snapshot = false, 101L, 0.0)))
      q.processAllAvailable()
      // b3: the co-timestamped snapshot — ts == watermark, NOT strictly
      // late, so Spark admits it.
      stream.addData(Seq(AsOfEvent(10, ts(10), is_snapshot = true, 0L, 7.0)))
      q.processAllAvailable()
      // advance the watermark far past everything, then an empty trigger so
      // event-time timeouts fire and the held probes finalize
      stream.addData(Seq(AsOfEvent(999, tsH(9, 0), is_snapshot = true, 0L, 0.0)))
      q.processAllAvailable()
      stream.addData(Seq.empty[AsOfEvent])
      q.processAllAvailable()

      val got = spark.table("asof_tie_out").as[AsOfMatch]
        .collect().filter(_.user_id == 10)
        .map(m => (m.p_event_id, m.s_ts_us, m.s_val)).toSet
      // the b3 snapshot (ts == watermark) was discarded by the late-data
      // filter: both probes correctly finalize matchless, exactly once
      assert(got == Set(
        (100L, None, None),
        (101L, None, None)))
    } finally q.stop()
  }

  test("latestByKey: streaming compaction state equals the batch evt_latest_by_key fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val b1 = Seq(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(5), 10, "click", 2.0),
      Event(3, ts(3), 11, "view", 3.0))
    val b2 = Seq(
      Event(4, ts(2), 10, "click", 9.0), // late AND stale: older than kept ts(5) -> no-op
      Event(5, ts(8), 11, "view", 4.0),
      Event(6, ts(8), 11, "view", 5.0), // same-ts tie: larger event_id wins
      Event(7, ts(4), 12, "buy", 6.0))

    val stream = MemoryStream[Event]
    val q = EventStreams.latestByKey(stream.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("update").start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()

      // Update-mode memory sink appends each batch's upserts; the LAST row
      // per key is the live compacted state
      val live = spark.table("latest_out")
        .collect().map(r => ((r.getLong(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getDouble(4))))
        .foldLeft(Map.empty[(Long, String), (Long, Long, Double)])(_ + _)

      // batch form: the typed LatestEvent aggregator over ALL rows at once
      val batch = (b1 ++ b2).toDS()
        .groupByKey(e => (e.user_id, e.event_type))
        .agg(graft.functions.LatestEvent.toColumn.name("r"))
        .collect().map { case (k, s) => k -> ((s.tsUs, s.eventId, s.value)) }
        .toMap

      assert(live == batch)
      // and the stale late row really was a no-op: user 10 kept event 2
      assert(live((10L, "click"))._2 == 2L)
      // same-timestamp tie broke toward the larger event_id
      assert(live((11L, "view"))._2 == 6L)
    } finally q.stop()
  }

  test("stream-static join: each micro-batch enriches against the static dimension") {
    // the production shape for dimension enrichment: the static side is
    // re-planned per micro-batch (broadcast at this size), no state store
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(("click", 1L), ("view", 2L), ("purchase", 10L))
      .toDF("d_type", "weight")
    val stream = MemoryStream[Event]
    val q = stream.toDF()
      .join(dim, col("event_type") === col("d_type"))
      .select(col("event_id"), col("weight"))
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      stream.addData(Seq(
        Event(1, tsH(0, 1), 10, "click", 0.0),
        Event(2, tsH(0, 2), 10, "error", 0.0),   // no dim row -> dropped
        Event(3, tsH(0, 3), 11, "purchase", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(Event(4, tsH(0, 4), 12, "view", 0.0)))
      q.processAllAvailable()
      val got = spark.table("enriched").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 1L), (3L, 10L), (4L, 2L)))
    } finally q.stop()
  }

  test("multiTouchCredits: watermark-finalized linear attribution across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)

    val stream = MemoryStream[Event]
    val q = EventStreams.multiTouchCredits(stream.toDS())
      .writeStream.format("memory").queryName("mt_credits")
      .outputMode("append").start()
    try {
      // batch 1: an out-of-window touch, two in-window touches, the
      // purchase itself (not yet finalizable), and a touchless purchase
      stream.addData(Seq(
        Event(100, t("2023-12-25 10:00:00"), 10, "view", 0.0),   // > 3d before p1
        Event(101, t("2024-01-01 10:00:00"), 10, "view", 0.0),
        Event(102, t("2024-01-02 10:00:00"), 10, "click", 0.0),
        Event(201, t("2024-01-03 09:00:00"), 10, "purchase", 3.0),
        Event(202, t("2024-01-03 09:00:00"), 11, "purchase", 9.99)))
      q.processAllAvailable()
      assert(spark.table("mt_credits").count() == 0,
        "purchase must not finalize before the watermark reaches it")

      // batch 2: a LATE-but-within-watermark touch still lands inside p1's
      // window (watermark after batch 1 is 08:50, this is 08:55)
      stream.addData(Seq(Event(103, t("2024-01-03 08:55:00"), 10, "click", 0.0)))
      q.processAllAvailable()

      // batch 3: unrelated future event advances the watermark past p1
      stream.addData(Seq(Event(999, t("2024-01-05 00:00:00"), 99, "view", 0.0)))
      q.processAllAvailable()

      val rows = spark.table("mt_credits").as[graft.streaming.CreditedTouch]
        .collect().sortBy(_.t_id)
      assert(rows.map(r => (r.p_id, r.t_id)).toSeq ==
        Seq((201L, 101L), (201L, 102L), (201L, 103L)),
        s"got: ${rows.toSeq}")
      // 300 cents over 3 touches: exact thirds, value fully conserved
      assert(rows.forall(_.credit6 == 100000000L))
      assert(rows.map(_.credit6).sum == 300L * 1000000L)
      // the touchless purchase (202) emitted nothing, the out-of-window
      // touch (100) got no credit — both already implied by the row set
      val channels = rows.map(_.channel).toSeq
      assert(channels == Seq("view", "click", "click"))
    } finally q.stop()
  }
}
