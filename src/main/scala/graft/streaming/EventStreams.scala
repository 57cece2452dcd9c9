package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row of the `events` fixture (FIXTURES.md), used as the typed
  * record for stateful streaming operators.
  */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Open-session state carried across micro-batches by [[EventStreams.sessionize]]. */
case class SessionState(
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

/** A closed user session emitted by [[EventStreams.sessionize]]. */
case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

/** One side-tagged input row for [[EventStreams.asofJoin]]: a snapshot
  * (`is_snapshot = true`, carrying `value`) or a probe event
  * (`is_snapshot = false`, carrying `event_id`).
  */
case class AsOfEvent(
    user_id: Long,
    ts: Timestamp,
    is_snapshot: Boolean,
    event_id: Long,
    value: Double)

/** Per-key state of [[EventStreams.asofJoin]]: the retained snapshot history
  * (ascending event-time micros → value) and the probe events awaiting
  * watermark finalization.
  */
case class AsOfJoinState(
    snapshots: Seq[(Long, Double)],
    pending: Seq[(Long, Long)])

/** A finalized as-of match: the probe event joined to the latest snapshot
  * at-or-before it (None when the key had no prior snapshot — left-outer
  * semantics, mirroring the batch `AsOfJoin(..., leftOuter = true)`).
  */
case class AsOfMatch(
    p_event_id: Long,
    user_id: Long,
    p_ts_us: Long,
    s_ts_us: Option[Long],
    s_val: Option[Double])

/** Per-user state of [[EventStreams.multiTouchCredits]]: the retained
  * touch history (ascending (ts_us, event_id, channel)) and purchases
  * awaiting watermark finalization ((p_ts_us, p_id, value_cents)).
  */
case class MultiTouchState(
    touches: Seq[(Long, Long, String)],
    pending: Seq[(Long, Long, Long)])

/** One credited touch emitted by [[EventStreams.multiTouchCredits]]:
  * `credit6` is the purchase value in 1e-8-dollar units after the exact
  * integer split value_cents·10⁶ DIV n_touches — identical to the batch
  * `evt_multi_touch` arithmetic, so per-channel rollups agree exactly.
  */
case class CreditedTouch(
    p_id: Long,
    t_id: Long,
    user_id: Long,
    channel: String,
    credit6: Long)

/** A compacted change-log row: the latest event per (user_id, event_type)
  * key, as emitted by [[EventStreams.latestByKey]] each micro-batch.
  */
case class KeyedLatest(
    user_id: Long,
    event_type: String,
    ts_us: Long,
    event_id: Long,
    value: Double)

/** Structured-Streaming operators over the event log.
  *
  * The reference is batch-only (SURVEY.md §2.9 — its "incremental" dimension
  * is a daily Airflow cron), so these are capability extensions: the same
  * event-log semantics expressed with Spark's unified batch/streaming API.
  * Every transform here accepts EITHER a batch DataFrame or a
  * `readStream`-sourced one — `withWatermark` is a no-op that the optimizer
  * eliminates on batch plans, so [[graft.operators.EventTime]] registers the
  * batch runs of these exact functions as oracle-checked queries.
  *
  * Scale design (events arriving at millions/sec):
  *  - windowed counts: streaming partial aggregation per micro-batch; state
  *    store holds one row per (window, event_type) — bounded by the watermark,
  *    which evicts windows older than the lateness bound.
  *  - sessionize: state is one small [[SessionState]] per ACTIVE user, not
  *    per event; event-time timeouts garbage-collect idle users, so state size
  *    tracks concurrent users. The shuffle key is user_id — sessions for
  *    different users never co-depend, so the operator scales linearly with
  *    partitions.
  *  - dedup: `dropDuplicatesWithinWatermark` keeps event_ids only until the
  *    watermark passes them (bounded state), vs. `dropDuplicates` on a stream
  *    which would grow state forever.
  */
object EventStreams {

  /** Tumbling-window counts per event type with a lateness bound.
    * Batch or streaming; on a stream use OutputMode.Append (watermark closes
    * windows) or Update.
    */
  def windowedTypeCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("approx_users"))

  /** Windowed value-distribution sketch: graft_qsketch (the mergeable
    * constant-state quantile sketch) per event-time window. The state
    * store holds ONE ~8 KB bucket array per open window — the incremental
    * form of the batch percentile report, and the shape a 100 TB stream
    * needs (per-key state independent of event count; merge on state-store
    * update is the same element-wise add as the batch partial aggregate).
    * StreamingSpec pins exact batch parity through the shared aggregate.
    */
  def windowedValueSketch(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(events.sparkSession)
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(call_function("graft_qsketch",
        expr("CAST(round(value * 100) AS BIGINT)")).as("value_sketch"))
  }

  /** Per-window distinct-user HLL: the streaming twin of q_hll_distinct.
    * One graft_hll register set (constant 256 B) per open window in the
    * state store — vs streaming COUNT(DISTINCT)'s per-key state that grows
    * with the number of distinct users inside the window. Register merge
    * is element-wise max (commutative, associative, idempotent), so the
    * micro-batch fold equals one batch aggregation bit-for-bit
    * (StreamingSpec pins the parity), and the emitted register sets roll
    * up further with graft_hll_merge downstream.
    */
  def windowedDistinctUsers(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(events.sparkSession)
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(call_function("graft_hll",
        graft.functions.TextFunctions.md5Bits(col("user_id").cast("string"), 15))
        .as("user_sketch"))
  }

  /** Per-window Count-Min frequency sketch: the streaming twin of
    * txt_cms_freq over the event-type stream. One 2 KB cell array per open
    * window in the state store — point-frequency estimates for ANY key
    * queried after the fact, where Misra–Gries (whose merge is not
    * arrival-order deterministic, so it has no streaming-parity form) only
    * answers "which keys are frequent". Cell merge is element-wise sum
    * (commutative, associative), so the micro-batch fold equals one batch
    * aggregation bit-for-bit (StreamingSpec pins the parity) and the
    * emitted summaries roll up further with graft_cms_merge downstream.
    */
  def windowedFreqSketch(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(events.sparkSession)
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(call_function("graft_cms",
        graft.functions.TextFunctions.md5Bits(col("event_type"), 15))
        .as("freq_sketch"))
  }

  /** Per-window top-k largest events (graft_topk over value cents, keyed
    * by event_id): the live "biggest transactions this hour" report. The
    * state store holds ONE bounded k-entry buffer per open window — never
    * per-event state — and the buffer merge is a pure selection by the
    * (score DESC, id) total order, so it is commutative/associative/
    * idempotent and the micro-batch fold equals one batch aggregation
    * bit-for-bit (StreamingSpec pins the parity). Integer-cent scores keep
    * the order exact.
    */
  def windowedTopValues(
      events: DataFrame,
      k: Int = 5,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(events.sparkSession)
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(call_function("graft_topk",
        expr("CAST(round(value * 100) AS BIGINT)").cast("double"),
        col("event_id"), lit(k)).as("top_events"))
  }

  /** Exactly-once-style dedup on event_id, state bounded by the watermark. */
  def dedupByEventId(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream join: attribute each click to impressions of the same ad
    * within `windowMinutes` before it. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark buffers each side
    * only inside the watermark+window horizon — state is bounded, rows
    * beyond the horizon are evicted. Expected schemas:
    * impressions(ad_id, i_ts), clicks(c_ad_id, c_ts, ...). Works in batch
    * too (watermarks eliminated, plain range join).
    */
  def attributeClicks(
      impressions: DataFrame,
      clicks: DataFrame,
      windowMinutes: Int = 30,
      lateness: String = "10 minutes"): DataFrame =
    impressions.withWatermark("i_ts", lateness)
      .join(
        clicks.withWatermark("c_ts", lateness),
        expr(s"ad_id = c_ad_id AND c_ts >= i_ts AND c_ts <= i_ts + interval $windowMinutes minutes"))

  /** Gap-based sessionization: consecutive events of a user belong to one
    * session while the gap stays below `gapSeconds`. Emits a [[UserSession]]
    * when a gap splits a session mid-batch, and via event-time timeout when
    * the watermark passes an idle session's end + gap.
    *
    * Batch-equivalent semantics (modulo the open tail session, which a batch
    * run considers closed): `graft.operators.EventTime`'s `evt_sessions`
    * window-function query — the StreamingSpec asserts the two agree.
    * Supported configuration: `gapSeconds` ≥ the 10-minute watermark
    * lateness — then a within-watermark late event is always within one gap
    * of the open session or final as a singleton; with a shorter gap,
    * cross-batch events older than start − gap are emitted as singleton
    * sessions rather than re-splitting history.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(
        userId: Long,
        it: Iterator[Event],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      if (it.isEmpty && state.hasTimedOut) {
        // Watermark passed session_end + gap: the open session is final.
        val s = state.get
        state.remove()
        Iterator.single(UserSession(userId, s.session_start, s.session_end, s.n_events))
      } else {
        val sorted = it.toArray.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Iterator.newBuilder[UserSession]
        sorted.foreach { e =>
          open match {
            case Some(s) if e.ts.getTime - s.session_end.getTime <= gapMs &&
                s.session_start.getTime - e.ts.getTime <= gapMs =>
              // Merge with min/max, not assignment: a late-but-within-watermark
              // event from a LATER micro-batch can precede the open session's
              // bounds — assigning e.ts to session_end would shrink the session
              // and mis-set the event-time timeout.
              val start =
                if (e.ts.getTime < s.session_start.getTime) e.ts else s.session_start
              val end =
                if (e.ts.getTime > s.session_end.getTime) e.ts else s.session_end
              open = Some(SessionState(start, end, s.n_events + 1))
            case Some(s) if s.session_start.getTime - e.ts.getTime > gapMs =>
              // Late event more than a gap BEFORE the open session: it can't
              // belong to it. Emit it as its own closed session immediately
              // (it is final: any even-later event this far back would itself
              // be beyond the watermark when gap >= lateness, the supported
              // configuration) and keep the open session untouched.
              closed += UserSession(userId, e.ts, e.ts, 1)
            case Some(s) =>
              closed += UserSession(userId, s.session_start, s.session_end, s.n_events)
              open = Some(SessionState(e.ts, e.ts, 1))
            case None =>
              open = Some(SessionState(e.ts, e.ts, 1))
          }
        }
        open match {
          case Some(s) =>
            state.update(s)
            // Close the session once the watermark passes its end + gap; a
            // timeout not strictly later than the watermark is rejected, so
            // clamp (covers sessions built entirely from late events).
            state.setTimeoutTimestamp(
              math.max(s.session_end.getTime + gapMs, state.getCurrentWatermarkMs() + 1))
          case None => ()
        }
        closed.result()
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Gap sessionization via the built-in `session_window` aggregation — the
    * zero-custom-state form: one groupBy that runs IDENTICALLY in batch and
    * streaming (append mode emits each session once the watermark passes its
    * close; state is managed by the session-window operator itself, merged
    * and evicted per watermark). Same output shape as the oracle-checked
    * batch query `evt_sessions_native`; boundary convention is
    * session_window's half-open [start, start+gap) (see
    * [[graft.operators.EventTime]] scaladoc).
    *
    * Use this when the per-session output is min/max/count-style aggregates;
    * [[sessionize]] (flatMapGroupsWithState) remains for custom state
    * transitions the aggregate form can't express.
    */
  def sessionizeNative(
      events: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))

  /** Full-microsecond epoch value of a Timestamp (getTime alone truncates
    * the sub-millisecond part the nanos field carries).
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000L

  /** Streaming CDC/upsert compaction: one [[graft.functions.LatestState]]
    * per (user_id, event_type) key in the state store; each micro-batch
    * emits the updated compacted row for every key it touched (Update
    * mode — the sink upserts by key). The streaming counterpart of the
    * batch `evt_latest_by_key` query; both fold rows through the SAME
    * [[graft.functions.LatestEvent.later]] tie rule (ts, then larger
    * event_id), so a late row older than the kept one is a no-op in either
    * engine and batch/stream parity is exact (StreamingSpec asserts it).
    *
    * State bound: one row per DISTINCT key — the size of the compacted
    * table itself, which is this operator's natural floor (a key's latest
    * row must stay addressable forever, so no watermark eviction; at scale
    * the state store shards by the same key hash the sink partitions on).
    */
  def latestByKey(events: Dataset[Event]): Dataset[KeyedLatest] = {
    import events.sparkSession.implicits._
    def fn(
        key: (Long, String),
        rows: Iterator[Event],
        state: GroupState[graft.functions.LatestState]): KeyedLatest = {
      var cur = state.getOption.getOrElse(
        graft.functions.LatestState(Long.MinValue, Long.MinValue, 0.0))
      rows.foreach { e =>
        cur = graft.functions.LatestEvent.later(cur,
          graft.functions.LatestState(graft.functions.LatestEvent.micros(e.ts), e.event_id, e.value))
      }
      state.update(cur)
      KeyedLatest(key._1, key._2, cur.tsUs, cur.eventId, cur.value)
    }
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[graft.functions.LatestState, KeyedLatest](
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming as-of (point-in-time) join: each probe event is matched to
    * its key's latest snapshot at-or-before the probe's event time — the
    * state-store latest-row-per-key form of [[graft.plans.AsOfJoin]]
    * (backward direction, left-outer emission; the StreamingSpec asserts
    * batch parity against the custom batch exec).
    *
    * Input is one union stream tagged by [[AsOfEvent.is_snapshot]] (a
    * feature-store deployment unions the slowly-changing dimension stream
    * with the event stream). Per key the state holds:
    *  - the snapshot history still relevant: everything newer than the
    *    watermark PLUS the single latest snapshot at-or-before it (any
    *    future probe has ts > watermark, so older snapshots can never win
    *    again — this is what keeps state bounded while still answering
    *    "latest row per key");
    *  - probe events buffered until the watermark passes their timestamp
    *    (only then can no earlier snapshot still arrive), emitted in
    *    (ts, event_id) order — deterministic.
    *
    * Snapshots sharing a timestamp keep the min value, matching the batch
    * query's `groupBy(user, ts).agg(min(value))` dedup. State for a key is
    * removed once it holds no pending probes and no snapshots; a key with
    * snapshot history is retained indefinitely by design (it IS the
    * feature store) — bound it upstream with a TTL filter if the key space
    * churns.
    */
  /** Streaming linear multi-touch attribution — the stream twin of the
    * batch `evt_multi_touch` query: each purchase's value splits equally
    * across the same user's view/click touches in the preceding
    * `windowUs` (default 3 days). A purchase finalizes once the watermark
    * reaches its timestamp (same `<=` rule as [[asofJoin]] — the late-data
    * filter drops rows with ts <= watermark, so no touch that could fall
    * inside a finalized purchase's window can be admitted afterwards).
    *
    * State per user is BOUNDED: touches older than watermark − windowUs
    * serve no admissible future purchase and are pruned each call;
    * finalized purchases leave state immediately; an idle user's residue
    * is garbage-collected by an event-time timeout. Credit arithmetic is
    * the exact integer split value_cents·10⁶ DIV n — partition- and
    * batch-boundary-independent, so stream == batch per-channel sums.
    */
  def multiTouchCredits(
      events: Dataset[Event],
      windowUs: Long = 259200000000L,
      lateness: String = "10 minutes"): Dataset[CreditedTouch] = {
    import events.sparkSession.implicits._

    def fn(
        userId: Long,
        it: Iterator[Event],
        state: GroupState[MultiTouchState]): Iterator[CreditedTouch] = {
      val prev = state.getOption.getOrElse(MultiTouchState(Nil, Nil))
      var touches = prev.touches
      var pending = prev.pending
      if (!(it.isEmpty && state.hasTimedOut)) {
        val batch = it.toArray
        val newT = batch
          .filter(e => e.event_type == "view" || e.event_type == "click")
          .map(e => (micros(e.ts), e.event_id, e.event_type))
        if (newT.nonEmpty)
          touches = (touches ++ newT).sortBy(t => (t._1, t._2))
        val newP = batch.filter(_.event_type == "purchase")
          .map(e => (micros(e.ts), e.event_id, math.round(e.value * 100)))
        if (newP.nonEmpty)
          pending = (pending ++ newP).sortBy(p => (p._1, p._2))
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (ready, still) = pending.partition(_._1 <= wmUs)
      val out = ready.flatMap { case (pts, pid, vCents) =>
        val win = touches.filter(t => t._1 < pts && t._1 >= pts - windowUs)
        val n = win.size.toLong
        win.map { case (_, tid, ch) =>
          CreditedTouch(pid, tid, userId, ch, vCents * 1000000L / n)
        }
      }
      // a touch older than wm − window can serve no future purchase:
      // un-finalized purchases all have p_ts > wm
      touches = touches.dropWhile(_._1 < wmUs - windowUs)
      if (still.isEmpty && touches.isEmpty) {
        if (state.exists) state.remove()
      } else {
        state.update(MultiTouchState(touches, still))
        val next =
          if (still.nonEmpty) still.map(_._1).min / 1000L + 1L
          // idle-user GC: once the watermark passes the last touch's
          // window, everything prunes and the state removes itself
          else touches.map(_._1).max / 1000L + windowUs / 1000L + 1L
        state.setTimeoutTimestamp(math.max(next, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MultiTouchState, CreditedTouch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  def asofJoin(
      inputs: Dataset[AsOfEvent],
      lateness: String = "10 minutes"): Dataset[AsOfMatch] = {
    import inputs.sparkSession.implicits._

    def fn(
        userId: Long,
        it: Iterator[AsOfEvent],
        state: GroupState[AsOfJoinState]): Iterator[AsOfMatch] = {
      val prev = state.getOption.getOrElse(AsOfJoinState(Nil, Nil))
      var snaps = prev.snapshots
      var pending = prev.pending
      if (!(it.isEmpty && state.hasTimedOut)) {
        val batch = it.toArray
        val newSnaps = batch.filter(_.is_snapshot).map(e => (micros(e.ts), e.value))
        if (newSnaps.nonEmpty)
          snaps = (snaps ++ newSnaps)
            .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).min) }
            .toSeq.sortBy(_._1)
        val newProbes = batch.filter(!_.is_snapshot).map(e => (micros(e.ts), e.event_id))
        if (newProbes.nonEmpty)
          pending = (pending ++ newProbes).sortBy(identity)
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // Finalize at p_ts <= watermark. The tempting "strict <, because a
      // snapshot at ts == watermark might still arrive" is empirically
      // wrong on this Spark: flatMapGroupsWithState's late-data filter
      // drops input rows with ts <= watermark (StreamingSpec pins this with
      // a co-timestamped snapshot at exactly the watermark — it never
      // reaches the state function), so once wm >= p_ts no snapshot that
      // could match the probe at <= p_ts can ever be admitted. <= therefore
      // loses nothing and emits one batch earlier than strict <.
      val (ready, still) = pending.partition(_._1 <= wmUs)
      val out = ready.map { case (pts, pid) =>
        val hit = snaps.takeWhile(_._1 <= pts).lastOption
        AsOfMatch(pid, userId, pts, hit.map(_._1), hit.map(_._2))
      }
      // prune: drop snapshots strictly older than the latest one <= watermark
      if (snaps.nonEmpty) {
        val cut = snaps.indexWhere(_._1 > wmUs) match {
          case -1 => snaps.size - 1
          case 0 => 0
          case i => i - 1
        }
        snaps = snaps.drop(cut)
      }
      if (still.isEmpty && snaps.isEmpty) {
        if (state.exists) state.remove()
      } else {
        state.update(AsOfJoinState(snaps, still))
        if (still.nonEmpty)
          // fire once the watermark passes the earliest buffered probe
          state.setTimeoutTimestamp(
            math.max(still.map(_._1).min / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    inputs
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfJoinState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
