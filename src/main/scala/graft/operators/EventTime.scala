package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators in their batch form: tumbling windows and gap
  * sessionization over the `events` table. The same semantics run on a
  * stream via [[graft.streaming.EventStreams]] (StreamingSpec asserts batch
  * and streaming agree); these entries are the DuckDB-oracle-checkable side.
  *
  * The reference has no streaming (SURVEY.md §2.9) — its event-time surface
  * is the daily-batch date filter — so this module is a capability extension.
  *
  * Determinism: timestamps leave the query as epoch-microsecond BIGINTs
  * (`unix_micros` / DuckDB `epoch_us` on the micro-exact fixture values);
  * every query ends in a total ORDER BY.
  *
  * Scale: the window agg is one shuffle on (window, event_type) with partial
  * aggregation; sessionization shuffles once on user_id (the window spec and
  * the final groupBy share that partitioning, so Catalyst plans a single
  * exchange for lag + running-sum + agg).
  */
object EventTime extends QueryModule {

  private val gapUs = 1800L * 1000000L // 30-min session gap

  /** Tumbling 1-hour windows via the same `window()` the streaming form uses. */
  private def hourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"), col("n_users"))
      .orderBy(col("win_start_us"), col("event_type"))

  /** Batch gap-sessionization: lag → new-session flag → running sum = session
    * id → per-session agg. Equivalent to [[graft.streaming.EventStreams
    * .sessionize]] once the stream's watermark has closed every session.
    */
  private def sessions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Typed-Dataset path: per-user argmax via [[graft.functions.ArgMaxEvent]]
    * (case-class Encoders + groupByKey + typed Aggregator) — constant state
    * per group, map-side combined, vs. the window form's partition sort.
    */
  private def argmaxTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event]
      .groupByKey(_.user_id)
      .agg(graft.functions.ArgMaxEvent.toColumn.name("top_event_id"))
      .toDF("user_id", "top_event_id")
      .orderBy(col("user_id"))
  }

  /** Point-in-time join via graft's custom as-of operator
    * ([[graft.plans.AsOfJoin]]): each purchase matched to the user's latest
    * signup snapshot at-or-before it. One co-partitioned merge pass —
    * checked against DuckDB's native ASOF JOIN.
    */
  private def asof(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("p_ts"))
    val snapshots = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user"), unix_micros(col("ts")).as("s_ts"))
      .agg(min(col("value")).as("s_val"))
    graft.plans.AsOfJoin(purchases, "p_user", "p_ts", snapshots, "s_user", "s_ts")
      .select(col("p_event_id"), col("p_user"), col("p_ts"), col("s_ts"), col("s_val"))
      .orderBy(col("p_event_id"))
  }

  /** Range join: each purchase matched to the signup-anchored interval(s)
    * [start, start + value·1e9 µs] of the same user it falls inside. The
    * scale shape: key equality drives a broadcast/shuffle hash join and the
    * range predicate rides along as the join condition — never a cartesian
    * pair space. (For interval×interval workloads with no key, bucketize
    * the range into overlap buckets first — same equi-join trick as
    * SCALE.md's IVF layout.)
    */
  private def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val intervals = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("i_user"), col("event_id").as("i_id"),
        unix_micros(col("ts")).as("start_us"),
        // floor() before the integer cast: Spark's double->bigint cast
        // truncates while DuckDB's rounds — floor makes both explicit
        (unix_micros(col("ts")) + floor(col("value") * 1e9).cast("bigint")).as("end_us"))
    val points = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_ts"))
    // No broadcast hint: `intervals` is derived from the event table itself
    // and grows with the data. The key-equality conjunct already makes this a
    // hash join (never a cartesian pair space); AQE may still choose broadcast
    // at small SF by measured size.
    points.join(intervals,
        col("p_user") === col("i_user") &&
          col("p_ts").between(col("start_us"), col("end_us")))
      .select(col("p_id"), col("i_id"), col("p_user"), col("p_ts"),
        col("start_us"), col("end_us"))
      .orderBy(col("p_id"), col("i_id"))
  }

  /** The built-in form of [[sessions]]: `session_window(ts, gap)` — one
    * groupBy, no window functions; also the form that runs unchanged on a
    * stream. Emits the same sessions (session_window's end = last event +
    * gap, so start/count identify the session; we re-derive end_us as
    * max event time to match the window-function form exactly).
    *
    * Boundary convention (pinned empirically — StreamingSpec's exact-gap
    * test): Spark merges session windows when the next event falls AT or
    * before the previous window's end, so an event arriving EXACTLY `gap`
    * after the previous one EXTENDS the session. That is the same
    * `diff > gap starts new` convention as the lag-based [[sessions]], so
    * the two forms agree on all inputs, exact-gap pairs included, and both
    * oracles use `>`.
    */
  private def sessionsNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
      .orderBy(col("user_id"), col("start_us"))

  /** Click attribution: the batch run of the STREAMING stream-stream join
    * ([[graft.streaming.EventStreams.attributeClicks]] — the same function,
    * watermarks optimized away on batch plans): each click joined to the
    * same user's view events within the preceding 30 minutes. This gives
    * the stream-stream join an oracle-checked batch form, like the other
    * streaming operators.
    */
  private def clickAttribution(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val imps = e.filter(col("event_type") === "view")
      .select(col("user_id").as("ad_id"), col("ts").as("i_ts"),
        col("event_id").as("imp_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_ad_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.streaming.EventStreams.attributeClicks(imps, clicks, windowMinutes = 30)
      .select(col("click_id"), col("imp_id"), col("ad_id").as("user_id"),
        unix_micros(col("c_ts")).as("c_ts_us"), unix_micros(col("i_ts")).as("i_ts_us"))
      .orderBy(col("click_id"), col("imp_id"))
  }

  /** Per-user (r_days, f, m_cents) — the RFM base both segmentation
    * forms share: one partial-agg'd shuffle to per-user aggregates, the
    * 1-row corpus watermark broadcast back.
    */
  private def rfmBase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
    val ref = ev.agg(max(to_date(col("ts"))).as("ref_day"))
    ev.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("f"),
        sum(round(col("value") * 100).cast("bigint")).as("m_cents"))
      .crossJoin(broadcast(ref))
      .withColumn("r_days", datediff(col("ref_day"), col("last_day")).cast("bigint"))
      .select(col("user_id"), col("r_days"), col("f"), col("m_cents"))
  }

  /** Score → segment → per-segment report over an RFM base, given each
    * metric's (t1, t2) cut frame — shared by the exact-histogram and
    * sketch-cut segmentations so the two can only differ in WHERE the
    * cuts come from.
    */
  private def rfmSegmentReport(rfm: DataFrame,
      bounds: String => DataFrame): DataFrame = {
    def score(metric: String, higherIsBetter: Boolean) = {
      val (t1, t2) = (col(s"${metric}_t1"), col(s"${metric}_t2"))
      val asc = when(col(metric) <= t1, 1L).when(col(metric) <= t2, 2L).otherwise(3L)
      if (higherIsBetter) asc else lit(4L) - asc
    }
    rfm.crossJoin(broadcast(bounds("r_days")))
      .crossJoin(broadcast(bounds("f")))
      .crossJoin(broadcast(bounds("m_cents")))
      .withColumn("segment",
        score("r_days", higherIsBetter = false) * 100L
          + score("f", higherIsBetter = true) * 10L
          + score("m_cents", higherIsBetter = true))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
        expr("sum(r_days) DIV count(1)").as("avg_r_days"),
        expr("sum(f) DIV count(1)").as("avg_f"),
        expr("sum(m_cents) DIV count(1)").as("avg_m_cents"))
      .orderBy(col("segment"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- conversion funnel (view → click → purchase): per-user sequential
    // fold over the time-ordered event codes — depth 1 after a view, 2
    // after a click that FOLLOWS a view, 3 after a purchase that follows
    // such a click; then users counted per depth reached. ONE
    // groupBy(user) shuffle; per-user state is the event history, bounded
    // in practice by the retention window (for unbounded histories chain
    // three conditional-min aggregations on the same user key instead —
    // same answer, no array). The fold is the identical left-to-right HOF
    // on both engines (Spark `aggregate` ↔ DuckDB `list_reduce` with a
    // prepended init, the fingerprint pattern). ----
    "evt_funnel" -> ((s, d) => {
      val code = when(col("event_type") === "view", 1L)
        .when(col("event_type") === "click", 2L)
        .when(col("event_type") === "purchase", 3L)
      Tables.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), code.as("code"))
        .groupBy(col("user_id"))
        .agg(expr("sort_array(collect_list(struct(ts_us, event_id, code)))").as("evs"))
        .withColumn("depth", expr(
          """aggregate(transform(evs, e -> e.code), 0L, (acc, c) ->
            |  CASE WHEN c = 1 THEN greatest(acc, 1L)
            |       WHEN c = 2 AND acc >= 1 THEN greatest(acc, 2L)
            |       WHEN c = 3 AND acc >= 2 THEN 3L
            |       ELSE acc END)""".stripMargin))
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("depth"))
    }),
    // ---- CDC/upsert compaction: the latest row per (user_id, event_type)
    // via the [[graft.functions.LatestEvent]] typed Aggregator — CONSTANT
    // per-group state, map-side combine, planned as ObjectHashAggregate.
    // The two rejected forms, and why: row_number()=1 window shuffles the
    // FULL change-log and sorts it by (key, ts); max(struct(ts,id,value))
    // is bounded-state but struct buffers aren't hash-mutable, so Spark
    // plans SortAggregate and still sorts every partition's raw rows by
    // key. At 100 TB of change-log the no-sort hash form is the one that
    // survives. (ts_us, event_id) is unique, so `value` never decides the
    // max; timestamp ties break toward the larger event_id. ----
    "evt_latest_by_key" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Event]
        .groupByKey(e => (e.user_id, e.event_type))
        .agg(graft.functions.LatestEvent.toColumn.name("r"))
        .toDF("key", "r")
        .select(col("key._1").as("user_id"), col("key._2").as("event_type"),
          col("r.tsUs").as("ts_us"), col("r.eventId").as("event_id"),
          col("r.value").as("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),
    // ---- D1-D7 cohort retention: cohort = each user's first active day;
    // retained = any activity on days +1..+7. Two shuffles total — one
    // distinct on (user, day), one agg on user — then a user-keyed join
    // that AQE broadcasts when cohorts are small; the per-cohort rollup is
    // a partial-agg count. The (user, day) distinct is the scale lever: it
    // collapses the event volume to at most users × retention-window rows
    // before anything else runs. ----
    "evt_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val came = ev.join(first, "user_id")
        .filter(datediff(col("day"), col("cohort_day")).between(1, 7))
        .select(col("user_id")).distinct().withColumn("retained", lit(1L))
      first.join(came, Seq("user_id"), "left")
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"))
        .agg(count(lit(1)).as("n_users"),
          sum(coalesce(col("retained"), lit(0L))).as("n_retained"))
        .withColumn("retention_7d",
          round(col("n_retained").cast("double") / col("n_users").cast("double"), 6))
        .orderBy(col("cohort_day"))
    }),
    // ---- time-series gap-fill: daily big-purchase counts re-sampled onto
    // a dense day spine. The spine is GENERATED on-executor
    // (sequence(min,max,1 day) + explode from a 1-row bound aggregate) —
    // never a driver-side loop — then left-joined and zero-filled. At
    // 100 TB the daily aggregate is the only data-sized shuffle; the spine
    // is days-sized and broadcasts. Sums carried as exact integer cents. ----
    "evt_daily_gapfill" -> ((s, d) => {
      val big = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value") > 100.0)
        .select(to_date(col("ts")).as("day"), col("value"))
      val daily = big.groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("bigint")).as("sum_cents"))
      val spine = big.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
        .orderBy(col("day"))
    }),
    // ---- SCD-2 derivation: turn the change log into validity intervals —
    // each (user, type) row is valid from its own ts until the next change
    // (NULL valid_to = current row). ONE shuffle on the key; the lead()
    // window is the canonical form and its partition sort is over one
    // key's history, which is exactly the data a validity chain needs in
    // order anyway. The warehouse-side complement of evt_latest_by_key
    // (which keeps only the current row). ----
    "evt_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
        .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
        .withColumn("is_current",
          when(col("valid_to_us").isNull, 1L).otherwise(0L))
        .orderBy(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
    }),
    // ---- conversion lag: per user, time from first view to first purchase
    // AFTER that view. Conditional-min aggregation (one shuffle, constant
    // state) — no self-join, no window. Lags summed as exact integer
    // micros so the mean is order-independent; the median interpolates the
    // same way on both engines (q_percentiles pattern). ----
    "evt_time_to_convert" -> ((s, d) => {
      val per = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts")))).as("v0"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p0"))
      per.agg(
        count(lit(1)).as("n_users"),
        count(when(col("p0") > col("v0"), lit(1))).as("n_converted"),
        round((sum(when(col("p0") > col("v0"), col("p0") - col("v0")))
          .cast("double") / count(when(col("p0") > col("v0"), lit(1))).cast("double"))
          / 1000000.0, 6).as("avg_lag_sec"),
        round(expr("percentile(IF(p0 > v0, p0 - v0, NULL), 0.5)") / 1000000.0, 6)
          .as("p50_lag_sec"))
    }),
    // ---- Markov transition matrix: consecutive event-type pairs per user
    // (lead over the user timeline), counted globally with the per-source
    // transition probability. One shuffle on user_id for the window; the
    // pair count is a partial agg over at most |types|² groups, so the
    // probability window runs on a tiny aggregate — data-sized work is the
    // single user partition pass regardless of corpus size. ----
    "evt_transitions" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_transitions"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("p_transition",
          round(col("n_transitions").cast("double") /
            sum(col("n_transitions")).over(Window.partitionBy(col("from_type")))
              .cast("double"), 6))
        .orderBy(col("from_type"), col("to_type"))
    }),
    // ---- entry-path histogram: each user's first 3 event types as a
    // '>'-joined path. row_number gets WindowGroupLimit pushdown (rank <=
    // 3 filters inside the sort), the per-user pivot reuses the window's
    // user partitioning (no second exchange), and the path rollup is a
    // partial agg over a bounded path vocabulary. ----
    "evt_user_paths" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("rn", row_number().over(byUser))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("rn") === 1, col("event_type"))).as("e1"),
          max(when(col("rn") === 2, col("event_type"))).as("e2"),
          max(when(col("rn") === 3, col("event_type"))).as("e3"))
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("path"))
    }),
    // ---- DAU / rolling 7-day WAU / stickiness, WITHOUT a range join:
    // each distinct (user, day) row is exploded onto the ≤7 spine days it
    // contributes to, turning the rolling-distinct window into a plain
    // groupBy(day) distinct count. The alternative (day-spine range join)
    // re-scans the activity table per spine day; the explode form shuffles
    // a bounded 7× of the already-collapsed (user, day) set — the shape
    // that survives when days × users is large. Inner join back to DAU
    // drops the ghost days after the last activity date. ----
    // ---- A/B test readout: user_id parity as the assignment, "ever
    // purchased" as the conversion metric, and the two-proportion z-score
    // computed from EXACT integer counts — the n/c sums are the only
    // data-sized aggregation (constant state per variant), and every
    // double in the output derives from identical integer inputs through
    // identically-spelled IEEE expressions (sqrt is correctly rounded, so
    // it is oracle-portable — the same argument as graft_cosine). ----
    "evt_ab_test" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 90, 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("variant", pmod(col("user_id"), lit(2L)))
      val agg = perUser.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).cast("bigint").as("n_a"),
        sum(when(col("variant") === 0, col("converted")).otherwise(0L)).cast("bigint").as("conv_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).cast("bigint").as("n_b"),
        sum(when(col("variant") === 1, col("converted")).otherwise(0L)).cast("bigint").as("conv_b"))
      agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(col("conv_a").cast("double") / col("n_a").cast("double"), 6).as("rate_a"),
        round(col("conv_b").cast("double") / col("n_b").cast("double"), 6).as("rate_b"),
        round(
          (col("conv_a").cast("double") / col("n_a").cast("double") -
            col("conv_b").cast("double") / col("n_b").cast("double")) /
          sqrt(((col("conv_a") + col("conv_b")).cast("double") /
                (col("n_a") + col("n_b")).cast("double")) *
               (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
                (col("n_a") + col("n_b")).cast("double")) *
               (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double"))), 4).as("z_score"))
    }),

    // ---- cohort retention triangle: users grouped by first-activity
    // week, the classic cohort × weeks-since matrix. Two bounded
    // aggregations: per-user first week (constant state), then distinct
    // (cohort, week_n, user) counts — volume collapses to ≤ users × 5
    // rows before the final rollup. Integer week arithmetic only. ----
    "evt_cohort_triangle" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(date_trunc("week", to_date(col("ts"))))
          .as("wk"))
        .distinct()
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohorts.groupBy(col("cohort_wk")).agg(count(lit(1)).as("n_cohort"))
      ev.join(cohorts, "user_id")
        .withColumn("week_n", (datediff(col("wk"), col("cohort_wk")) / 7)
          .cast("bigint"))
        .filter(col("week_n").between(0, 4))
        .groupBy(col("cohort_wk"), col("week_n"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(sizes, "cohort_wk")
        .select(col("cohort_wk"), col("week_n"), col("n_active"), col("n_cohort"),
          round(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
            .as("pct_retained"))
        .orderBy(col("cohort_wk"), col("week_n"))
    }),

    "evt_dau_wau" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
        .orderBy(col("day"))
    }),
    // ---- CUSUM change-point alerts on daily event volume: the
    // sequential-detection monitor that catches a sustained small shift
    // the per-day outlier tests (MAD, 2×mean) can't see — ten days of
    // +20% volume never trips a daily threshold but accumulates here.
    // The recursion s_i = max(0, s_{i-1} + x_i − k) has the exact
    // prefix-sum closed form s_i = p_i − min(0, min_{j≤i} p_j) with
    // p = Σ(x − k), so the whole detector is two window passes per
    // event_type over the gap-filled daily series (missing days count 0 —
    // a dead source must DRAIN the statistic, not freeze it). Allowance
    // k = ⌈mean daily count⌉ and threshold h = 3k are derived from the
    // data in integer DIV arithmetic, so every row hashes exactly. The
    // windows run over |types| × |days| rows — report-sized, never event
    // volume; daily counts partial-agg before any shuffle. ----
    "evt_cusum_alerts" -> ((s, d) =>
      cusumAlerts(Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // ---- ROBUST per-type anomalies: median absolute deviation instead of
    // the mean — the estimator that doesn't move when the outliers it
    // hunts drag the mean (evt_value_outliers' 2×mean rule flags nothing
    // if one whale doubles the mean). Exact integer arithmetic end to end:
    // lower medians as the ⌈n/2⌉-th order statistic read off a
    // COUNT-OF-COUNTS histogram — the median is a VALUE, so "the min
    // value whose ascending cumulative count reaches rank (n+1) DIV 2"
    // is bit-identical to a row_number walk at any tie structure, but the
    // cumulative window runs over histogram rows (distinct cent values
    // per type — the evt_rfm_segments bounded-input class), never the
    // event volume a per-type rank window would funnel through one sort
    // task at 100 TB. Outlier test |cents − med| > 3·MAD as integer
    // compare; the |types|-row median and MAD tables broadcast back. ----
    "evt_outliers_mad" -> ((s, d) => {
      def lowerMedian(df: DataFrame, vCol: String, out: String): DataFrame = {
        val cumW = Window.partitionBy(col("event_type")).orderBy(col(vCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val allW = Window.partitionBy(col("event_type"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.groupBy(col("event_type"), col(vCol)).agg(count(lit(1)).as("k"))
          .withColumn("cum", sum(col("k")).over(cumW))
          .withColumn("n", sum(col("k")).over(allW))
          .groupBy(col("event_type"))
          .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col(vCol))).as(out))
      }
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("bigint").as("cents"))
      val med = lowerMedian(ev, "cents", "med_cents")
      val res = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("cents") - col("med_cents")))
      val mad = lowerMedian(res, "dev", "mad_cents")
      res.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("med_cents")).as("med_cents"),
          max(col("mad_cents")).as("mad_cents"),
          sum(when(col("dev") > lit(3L) * col("mad_cents"), 1L).otherwise(0L))
            .cast("bigint").as("n_outliers"),
          max(col("dev")).as("max_dev"))
        .orderBy(col("event_type"))
    }),

    // ---- per-type value anomalies in EXACT integer arithmetic: an event
    // is an outlier when value > 2 × the type mean, tested as
    // value_cents · n > 2 · sum_cents — no division, no doubles, so both
    // engines agree bit-for-bit (all products < 2^63: cents ≤ 49 002,
    // n ≤ corpus rows). The per-type moments are one partial agg; the
    // verdict join broadcasts the |types|-row moment table. ----
    "evt_value_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("bigint").as("cents"))
      val moments = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      ev.join(broadcast(moments), "event_type")
        .filter(col("cents") * col("n") > lit(2L) * col("sum_cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"),
          min(col("event_id")).as("first_outlier_id"),
          max(col("cents")).as("max_cents"))
        .orderBy(col("event_type"))
    }),
    // ---- per-type value percentiles via the mergeable constant-state
    // sketch (graft_qsketch) — the ops/report query every event stream
    // grows ("p95 purchase value by type"), here in its batch form; the
    // streaming twin is EventStreams.windowedValueSketch. ~8 KB state per
    // event_type regardless of event count; same integer rank walk (and
    // oracle) family as q_percentiles_sketch. ----
    "evt_value_sketch" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          call_function("graft_qsketch", col("cents")).as("sk"))
        .select(col("event_type"), col("n_events"),
          Relational.sketchEst("sk", "(n_events - 1L) * 50 DIV 100 + 1L")
            .as("median_value_est"),
          Relational.sketchEst("sk", "(n_events - 1L) * 95 DIV 100 + 1L")
            .as("p95_value_est"))
        .orderBy(col("event_type"))
    }),
    "evt_click_attribution" -> ((s, d) => clickAttribution(s, d)),
    "evt_range_join" -> ((s, d) => rangeJoin(s, d)),
    "evt_sessions_native" -> ((s, d) => sessionsNative(s, d)),
    "evt_hourly_window" -> ((s, d) => hourly(s, d)),

    // ---- SLIDING windows (1 h length, 15 min slide): every event lands in
    // exactly 4 overlapping windows — window() expands them inline (an
    // Expand of factor 4, the window/slide ratio), then one partial-agg
    // shuffle on (window, type); no self-join, no range join. The oracle
    // replays the same expansion with a 4-element UNNEST over quarter-hour
    // buckets. Overlap factor is the plan's only volume multiplier, fixed
    // by window/slide — the 100 TB cost model is explicit. ----
    "evt_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(
          unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n_events"), col("n_users"))
        .orderBy(col("win_start_us"), col("event_type"))),
    "evt_sessions" -> ((s, d) => sessions(s, d)),
    "evt_argmax_typed" -> ((s, d) => argmaxTyped(s, d)),
    "evt_asof_join" -> ((s, d) => asof(s, d)),
    // forward variant: each purchase matched to the user's NEXT signup
    // snapshot at-or-after it
    "evt_asof_join_fwd" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
          unix_micros(col("ts")).as("p_ts"))
      val snapshots = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id").as("s_user"), unix_micros(col("ts")).as("s_ts"))
        .agg(min(col("value")).as("s_val"))
      graft.plans.AsOfJoin(purchases, "p_user", "p_ts", snapshots, "s_user", "s_ts",
          forward = true)
        .select(col("p_event_id"), col("p_user"), col("s_ts"), col("s_val"))
        .orderBy(col("p_event_id"))
    }),
    // left-outer variant: purchases with no prior signup kept, null snapshot
    "evt_asof_join_left" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
          unix_micros(col("ts")).as("p_ts"))
      val snapshots = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id").as("s_user"), unix_micros(col("ts")).as("s_ts"))
        .agg(min(col("value")).as("s_val"))
      graft.plans.AsOfJoin(purchases, "p_user", "p_ts", snapshots, "s_user", "s_ts",
          leftOuter = true)
        .select(col("p_event_id"), col("p_user"), col("s_ts"), col("s_val"))
        .orderBy(col("p_event_id"))
    }),

    // ---- the feature-store extraction job: ONE scan of the event lake
    // produces the per-user wide feature row a training pipeline joins
    // against (activity, breadth, monetary, recency/tenure, decayed
    // engagement — the evt_decay_engagement weight inline). Exact
    // integers throughout. Plan: one partial-agg'd user shuffle; the two
    // all-time COUNT(DISTINCT)s expand the scan 3× map-side (the
    // q_profile single-Expand class), so the exchange carries (user,
    // day) and (user, type) partials — the honest exact-distinct cost
    // (7.4 MB at sf1). `active_days_w9` demonstrates the at-scale exact
    // alternative for BOUNDED windows: a 63-day day-bitmap folded by
    // bit_or — constant 8-byte state, no Expand, bit_count at the end —
    // which is the serving-feature form ("active days in the last 9
    // weeks"); the horizon stops at shift 62 because 1<<63 overflows
    // BIGINT in DuckDB (and a >=64 shift WRAPS in the JVM — the decay
    // guard's bug class). Note HLL registers are NOT the answer here:
    // per-user day counts are tiny and the libm-free raw estimate is
    // biased high below ~2.5m without linear counting (documented at
    // q_hll_distinct). The full output IS the product (a feature
    // table), so there is no top-k. ----
    "evt_user_features" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val ref = ev.agg(max(to_date(col("ts"))).as("ref_day"))
      ev.crossJoin(broadcast(ref))
        .withColumn("day", to_date(col("ts")))
        .withColumn("days_ago", datediff(col("ref_day"), col("day")).cast("bigint"))
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("w_cents",
          when(col("days_ago") >= 63, lit(0L))
            .otherwise(expr("shiftright(cents, CAST(days_ago AS INT))")))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("day")).as("active_days"),
          expr("""CAST(bit_count(bit_or(
            CASE WHEN days_ago <= 62
                 THEN shiftleft(CAST(1 AS BIGINT), CAST(days_ago AS INT))
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""").as("active_days_w9"),
          // the widened horizon: [[dayBitmapWordAggs]] — a TWO-long
          // bitmap (word 0 = days 0-62, word 1 = days 63-125), 16-byte
          // constant state for an ~18-week exact active-day count
          dayBitmapWordAggs(0), dayBitmapWordAggs(1),
          countDistinct(col("event_type")).as("n_types"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
            .as("m_cents"),
          min(col("days_ago")).as("recency_days"),
          max(col("days_ago")).as("tenure_days"),
          sum(col("w_cents")).as("decay_cents"))
        .withColumn("active_days_w18", activeDaysW18)
        .drop("__w18_0", "__w18_1")
        .orderBy(col("user_id"))
    }),

    // ---- recency-weighted engagement (exponential decay, libm-free):
    // each event contributes value_cents >> days_ago — an exact
    // half-life-of-one-day decay in pure integer arithmetic (pow/exp
    // doubles would be partition-order hash-unstable). Events 63+ days
    // old contribute exactly 0 via an explicit guard: Java/Spark mask
    // shift distances mod 64, so an UNGUARDED 64-day-old event would
    // wrap to FULL weight — the planted-fixture spec pins this. One
    // partial-agg'd per-user shuffle; the corpus anchor is a 1-row
    // broadcast; top-20 report. The feature-store "hot users now"
    // signal that complements RFM's coarse terciles. ----
    "evt_decay_engagement" -> ((s, d) =>
      decayEngagement(Tables.events(s, d))),

    // ---- RFM (recency/frequency/monetary) user segmentation with
    // DATA-DERIVED tercile boundaries — the classic lifecycle-marketing
    // segmentation, in exact integer arithmetic. Per-user RFM is one
    // partial-agg'd shuffle; each metric's tercile boundaries come from
    // its count-of-counts histogram (cumulative window over |distinct
    // values| rows — the q_skew_report bounded-input class, never a
    // users-sized NTILE sort); the three 1-row boundary frames broadcast
    // back. Scores 1-3 per axis (3 = best: LOW recency-days, HIGH
    // frequency/monetary), segment = r·100 + f·10 + m, report = per-
    // segment user counts and exact integer-DIV averages.
    // BOUNDED-CARDINALITY CONTRACT: the cumulative window's input is the
    // |distinct metric values| histogram, which for r_days (≤ retention
    // days) and f (≤ purchases per user) stays tiny at any corpus size —
    // but m_cents cardinality approaches |users|, so the exact cut is
    // only safe while distinct spend values ≪ users. Past that,
    // evt_rfm_segments_sketch below is the scale-safe form (mergeable
    // qsketch cuts, no unpartitioned window anywhere). ----
    "evt_rfm_segments" -> ((s, d) => {
      val rfm = rfmBase(s, d)
      def tercileBounds(metric: String): DataFrame = {
        val hist = rfm.groupBy(col(metric)).agg(count(lit(1)).as("k"))
        val cum = hist.withColumn("cum",
          sum(col("k")).over(Window.orderBy(col(metric))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        cum.crossJoin(broadcast(rfm.agg(count(lit(1)).as("nu"))))
          .agg(
            min(when(col("cum") >= expr("(nu + 2) DIV 3"), col(metric)))
              .as(s"${metric}_t1"),
            min(when(col("cum") >= expr("(2 * nu + 2) DIV 3"), col(metric)))
              .as(s"${metric}_t2"))
      }
      rfmSegmentReport(rfm, tercileBounds)
    }),

    // ---- the SCALE-SAFE RFM twin: the same segmentation with each
    // metric's tercile cuts taken from the mergeable constant-state
    // quantile sketch (graft_qsketch — the q_percentiles_sketch /
    // evt_value_sketch family) instead of the exact cumulative-histogram
    // window. The cut value is the sketch's log-linear bucket midpoint
    // at the same integer rank, so segments can differ from the exact
    // form by at most a bucket's width — the price of removing the one
    // stage whose input (the m_cents histogram) grows with |users|. The
    // whole plan is partial-agg'd aggregations + three 1-row broadcast
    // cut frames: no window over unbounded input anywhere, at any SF.
    // The oracle replays the identical bucket map and rank walk. ----
    "evt_rfm_segments_sketch" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      val rfm = rfmBase(s, d)
      def sketchBounds(metric: String): DataFrame =
        rfm.agg(count(lit(1)).as("nu"),
            call_function("graft_qsketch", col(metric)).as("sk"))
          .select(
            Relational.sketchEstRaw("sk", "(nu + 2) DIV 3")
              .as(s"${metric}_t1"),
            Relational.sketchEstRaw("sk", "(2 * nu + 2) DIV 3")
              .as(s"${metric}_t2"))
      rfmSegmentReport(rfm, sketchBounds)
    }),

    // ---- ingest-freshness audit: per event_type, how stale is the
    // newest data relative to the corpus watermark — the "did stream X
    // stop?" report every ingest pipeline pages on. One partial-agg'd
    // scan to per-type (n_events, first/last day), corpus watermark as a
    // broadcast 1-row agg OVER THE TYPE REPORT (not a second lake scan);
    // lag in exact integer days, stale at > 2 days. ----
    "evt_freshness" -> ((s, d) => {
      val byType = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(to_date(col("ts"))).as("first_day"),
          max(to_date(col("ts"))).as("last_day"))
      val watermark = byType.agg(max(col("last_day")).as("corpus_last"))
      byType.crossJoin(broadcast(watermark))
        .select(col("event_type"), col("n_events"),
          date_format(col("first_day"), "yyyy-MM-dd").as("first_day"),
          date_format(col("last_day"), "yyyy-MM-dd").as("last_day"),
          datediff(col("corpus_last"), col("last_day")).cast("bigint").as("lag_days"),
          (datediff(col("corpus_last"), col("last_day")) > 2).as("stale"))
        .orderBy(col("event_type"))
    }),

    // ---- day-of-week seasonal baseline: traffic monitors that compare
    // today against "a normal Tuesday", not against the whole history —
    // the weekday-seasonality report CUSUM (trend shifts) and MAD (value
    // outliers) don't give. Baseline = exact lower median of the daily
    // count for that (type, ISO weekday) — the ⌈n/2⌉-th order statistic,
    // same convention as evt_outliers_mad — and a day flags as
    // spike/dip at ±50% of baseline in pure integer compares. Scale: the
    // lake reduces to the (type × day) report in ONE partial-agg'd
    // shuffle; the median windows run over that report (≤ weeks rows per
    // (type, dow) partition), and the |types × 7|-row baseline broadcasts
    // back. weekday()+1 pins ISO 1=Monday on both engines (the
    // q_datetime_functions portability rule). ----
    "evt_seasonal_baseline" -> ((s, d) =>
      seasonalBaseline(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt")))))

  /** The seasonal-baseline detector body on any (event_type, day, cnt)
    * daily-count frame — factored out so specs can drive it with planted
    * spikes/dips (the fixture's uniform volume rarely alerts). See the
    * `evt_seasonal_baseline` scaladoc above for the median convention and
    * the broadcast shape.
    */
  def seasonalBaseline(daily0: DataFrame): DataFrame = {
    val daily = daily0.withColumn("dow", expr("CAST(weekday(day) + 1 AS BIGINT)"))
    val wc = Window.partitionBy(col("event_type"), col("dow"))
    val wv = wc.orderBy(col("cnt"), col("day"))
    val base = daily.withColumn("rn", row_number().over(wv))
      .withColumn("n", count(lit(1)).over(wc))
      .filter(expr("rn = (n + 1) DIV 2"))
      .select(col("event_type"), col("dow"), col("cnt").as("baseline_cnt"))
    daily.join(broadcast(base), Seq("event_type", "dow"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dow"), col("cnt"), col("baseline_cnt"),
        (col("cnt") * 100L >= col("baseline_cnt") * 150L).as("spike"),
        (col("cnt") * 100L <= col("baseline_cnt") * 50L).as("dip"))
      .orderBy(col("event_type"), col("day"))
  }

  /** The two-long day-bitmap horizon over a `days_ago` column — 16-byte
    * constant state for an exact ~18-week (126-day) active-day count.
    * Word 0 covers days 0–62, word 1 days 63–125; each word stops at
    * shift 62 because 1<<63 overflows BIGINT in DuckDB and a ≥64 shift
    * WRAPS mod 64 in the JVM (the decay guard's bug class — a day-100
    * activity under a single-long form would either vanish or, worse,
    * alias onto day 36). Generalizes to any horizon as ⌈days/63⌉ words.
    * Factored so the planted-fixture spec and evt_user_features share one
    * definition.
    */
  private[graft] def dayBitmapWordAggs: Seq[org.apache.spark.sql.Column] = Seq(
    expr("""bit_or(CASE WHEN days_ago <= 62
           THEN shiftleft(CAST(1 AS BIGINT), CAST(days_ago AS INT))
           ELSE CAST(0 AS BIGINT) END)""").as("__w18_0"),
    expr("""bit_or(CASE WHEN days_ago BETWEEN 63 AND 125
           THEN shiftleft(CAST(1 AS BIGINT), CAST(days_ago - 63 AS INT))
           ELSE CAST(0 AS BIGINT) END)""").as("__w18_1"))

  private[graft] def activeDaysW18: org.apache.spark.sql.Column =
    expr("CAST(bit_count(__w18_0) + bit_count(__w18_1) AS BIGINT)")

  /** Factored decay-engagement body (spec plants a 100-day-old whale that
    * must contribute 0 — the shift-wrap bug class). See the
    * evt_decay_engagement registration comment for the contract.
    */
  def decayEngagement(ev: DataFrame): DataFrame = {
    val ref = ev.agg(max(to_date(col("ts"))).as("ref_day"))
    ev.crossJoin(broadcast(ref))
      .withColumn("days_ago",
        datediff(col("ref_day"), to_date(col("ts"))).cast("bigint"))
      .withColumn("w_cents",
        when(col("days_ago") >= 63, lit(0L))
          .otherwise(expr(
            "shiftright(CAST(round(value * 100) AS BIGINT), CAST(days_ago AS INT))")))
      .groupBy(col("user_id"))
      .agg(sum(col("w_cents")).as("decay_cents"),
        count(lit(1)).as("n_events"),
        min(col("days_ago")).as("recency_days"))
      .orderBy(desc("decay_cents"), col("user_id"))
      .limit(20)
  }

  /** The CUSUM detector body on any (event_type, day, n) daily-count frame
    * — factored out so specs can drive it with planted change points (the
    * fixture's uniform volume never alerts). See the `evt_cusum_alerts`
    * scaladoc above for the closed form and the integer k/h derivation.
    */
  def cusumAlerts(daily: DataFrame): DataFrame = {
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
    val kTab = filled.groupBy(col("event_type"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("nd"))
      .select(col("event_type"),
        expr("(tot + nd - 1) DIV nd").cast("bigint").as("k"))
    val prefix = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.join(broadcast(kTab), "event_type")
      .withColumn("p", sum(col("n") - col("k")).over(prefix))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(prefix)))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").cast("bigint").as("n_events"),
        col("s").cast("bigint").as("cusum"),
        (col("s") > lit(3L) * col("k")).as("alert"))
      .orderBy(col("event_type"), col("day"))
  }

  override def oracleSql: Map[String, String] = Map(
    "evt_user_features" ->
      """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
        |w AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
        |    date_diff('day', CAST(ts AS DATE), ref.ref_day) AS days_ago,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN date_diff('day', CAST(ts AS DATE), ref.ref_day) >= 63 THEN 0
        |         ELSE CAST(round(value * 100) AS BIGINT)
        |              >> date_diff('day', CAST(ts AS DATE), ref.ref_day) END AS w_cents
        |  FROM events, ref
        |)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT day) AS BIGINT) AS active_days,
        |  CAST(bit_count(bit_or(
        |    CASE WHEN days_ago <= 62 THEN CAST(1 AS BIGINT) << days_ago
        |         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS active_days_w9,
        |  CAST(bit_count(bit_or(
        |    CASE WHEN days_ago <= 62 THEN CAST(1 AS BIGINT) << days_ago
        |         ELSE CAST(0 AS BIGINT) END)) +
        |  bit_count(bit_or(
        |    CASE WHEN days_ago BETWEEN 63 AND 125 THEN CAST(1 AS BIGINT) << (days_ago - 63)
        |         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS active_days_w18,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS m_cents,
        |  CAST(min(days_ago) AS BIGINT) AS recency_days,
        |  CAST(max(days_ago) AS BIGINT) AS tenure_days,
        |  CAST(sum(w_cents) AS BIGINT) AS decay_cents
        |FROM w GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "evt_decay_engagement" ->
      """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
        |w AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(ts AS DATE), ref.ref_day) AS days_ago,
        |    CASE WHEN date_diff('day', CAST(ts AS DATE), ref.ref_day) >= 63 THEN 0
        |         ELSE CAST(round(value * 100) AS BIGINT)
        |              >> date_diff('day', CAST(ts AS DATE), ref.ref_day) END AS w_cents
        |  FROM events, ref
        |)
        |SELECT user_id, CAST(sum(w_cents) AS BIGINT) AS decay_cents,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(days_ago) AS BIGINT) AS recency_days
        |FROM w GROUP BY user_id
        |ORDER BY decay_cents DESC, user_id LIMIT 20""".stripMargin,
    "evt_rfm_segments" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |), ref AS (SELECT max(day) AS ref_day FROM ev
        |), rfm AS (
        |  SELECT user_id,
        |    CAST(ref_day - max(day) AS BIGINT) AS r_days,
        |    CAST(count(*) AS BIGINT) AS f,
        |    CAST(sum(cents) AS BIGINT) AS m_cents
        |  FROM ev CROSS JOIN ref GROUP BY user_id, ref_day
        |), nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM rfm
        |), rb AS (
        |  SELECT min(CASE WHEN cum >= (nu + 2) // 3 THEN v END) AS t1,
        |    min(CASE WHEN cum >= (2 * nu + 2) // 3 THEN v END) AS t2
        |  FROM (SELECT r_days AS v, sum(count(*)) OVER (ORDER BY r_days) AS cum
        |        FROM rfm GROUP BY r_days) CROSS JOIN nu
        |), fb AS (
        |  SELECT min(CASE WHEN cum >= (nu + 2) // 3 THEN v END) AS t1,
        |    min(CASE WHEN cum >= (2 * nu + 2) // 3 THEN v END) AS t2
        |  FROM (SELECT f AS v, sum(count(*)) OVER (ORDER BY f) AS cum
        |        FROM rfm GROUP BY f) CROSS JOIN nu
        |), mb AS (
        |  SELECT min(CASE WHEN cum >= (nu + 2) // 3 THEN v END) AS t1,
        |    min(CASE WHEN cum >= (2 * nu + 2) // 3 THEN v END) AS t2
        |  FROM (SELECT m_cents AS v, sum(count(*)) OVER (ORDER BY m_cents) AS cum
        |        FROM rfm GROUP BY m_cents) CROSS JOIN nu
        |), scored AS (
        |  SELECT rfm.*,
        |    (4 - CASE WHEN r_days <= rb.t1 THEN 1
        |              WHEN r_days <= rb.t2 THEN 2 ELSE 3 END) * 100
        |    + (CASE WHEN f <= fb.t1 THEN 1
        |            WHEN f <= fb.t2 THEN 2 ELSE 3 END) * 10
        |    + CASE WHEN m_cents <= mb.t1 THEN 1
        |           WHEN m_cents <= mb.t2 THEN 2 ELSE 3 END AS segment
        |  FROM rfm CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb
        |)
        |SELECT CAST(segment AS BIGINT) AS segment,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(r_days) // count(*) AS BIGINT) AS avg_r_days,
        |  CAST(sum(f) // count(*) AS BIGINT) AS avg_f,
        |  CAST(sum(m_cents) // count(*) AS BIGINT) AS avg_m_cents
        |FROM scored GROUP BY segment ORDER BY segment""".stripMargin,
    // the sketch-cut twin: identical RFM base and scoring, but each
    // metric's (t1, t2) comes from the qsketch bucket map's midpoint at
    // the same integer rank — the same log-linear map + rank walk as the
    // evt_value_sketch oracle, per metric
    "evt_rfm_segments_sketch" -> {
      def b(v: String) =
        s"CASE WHEN $v < 1 THEN 0 WHEN $v < 32 THEN CAST($v AS INT) " +
          s"ELSE CAST(length(bin($v)) * 16 + CAST(($v >> (length(bin($v)) - 5)) & 15 AS INT) AS INT) END"
      val mid = "CASE WHEN b < 32 THEN CAST(b AS BIGINT) " +
        "ELSE CAST(33 + 2 * (b % 16) AS BIGINT) << (b // 16 - 6) END"
      def cuts(name: String, metric: String) =
        s"""$name AS (
           |  SELECT min(CASE WHEN cum >= (nu + 2) // 3 THEN mid END) AS t1,
           |    min(CASE WHEN cum >= (2 * nu + 2) // 3 THEN mid END) AS t2
           |  FROM (
           |    SELECT b, $mid AS mid, sum(cnt) OVER (ORDER BY b) AS cum FROM (
           |      SELECT ${b("v")} AS b, count(*) AS cnt
           |      FROM (SELECT $metric AS v FROM rfm) GROUP BY 1))
           |  CROSS JOIN nu
           |)""".stripMargin
      s"""WITH ev AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'
         |), ref AS (SELECT max(day) AS ref_day FROM ev
         |), rfm AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(ref_day - max(day) AS BIGINT) AS r_days,
         |    CAST(count(*) AS BIGINT) AS f,
         |    CAST(sum(cents) AS BIGINT) AS m_cents
         |  FROM ev CROSS JOIN ref GROUP BY user_id, ref_day
         |), nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM rfm
         |), ${cuts("rb", "r_days")},
         |${cuts("fb", "f")},
         |${cuts("mb", "m_cents")},
         |scored AS (
         |  SELECT rfm.*,
         |    (4 - CASE WHEN r_days <= rb.t1 THEN 1
         |              WHEN r_days <= rb.t2 THEN 2 ELSE 3 END) * 100
         |    + (CASE WHEN f <= fb.t1 THEN 1
         |            WHEN f <= fb.t2 THEN 2 ELSE 3 END) * 10
         |    + CASE WHEN m_cents <= mb.t1 THEN 1
         |           WHEN m_cents <= mb.t2 THEN 2 ELSE 3 END AS segment
         |  FROM rfm CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb
         |)
         |SELECT CAST(segment AS BIGINT) AS segment,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(r_days) // count(*) AS BIGINT) AS avg_r_days,
         |  CAST(sum(f) // count(*) AS BIGINT) AS avg_f,
         |  CAST(sum(m_cents) // count(*) AS BIGINT) AS avg_m_cents
         |FROM scored GROUP BY segment ORDER BY segment""".stripMargin
    },
    "evt_freshness" ->
      """WITH bt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |    min(CAST(ts AS DATE)) AS first_day,
        |    max(CAST(ts AS DATE)) AS last_day
        |  FROM events GROUP BY event_type
        |), wm AS (SELECT max(last_day) AS corpus_last FROM bt)
        |SELECT event_type, n_events,
        |  CAST(first_day AS VARCHAR) AS first_day,
        |  CAST(last_day AS VARCHAR) AS last_day,
        |  CAST(corpus_last - last_day AS BIGINT) AS lag_days,
        |  corpus_last - last_day > 2 AS stale
        |FROM bt CROSS JOIN wm ORDER BY event_type""".stripMargin,
    "evt_seasonal_baseline" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), dd AS (
        |  SELECT *, CAST(isodow(day) AS BIGINT) AS dow FROM daily
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, dow
        |      ORDER BY cnt, day) AS rn,
        |    count(*) OVER (PARTITION BY event_type, dow) AS n
        |  FROM dd
        |), base AS (
        |  SELECT event_type, dow, cnt AS baseline_cnt
        |  FROM r WHERE rn = (n + 1) // 2
        |)
        |SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.dow, d.cnt,
        |  b.baseline_cnt,
        |  d.cnt * 100 >= b.baseline_cnt * 150 AS spike,
        |  d.cnt * 100 <= b.baseline_cnt * 50 AS dip
        |FROM dd d JOIN base b USING (event_type, dow)
        |ORDER BY d.event_type, day""".stripMargin,
    "evt_cusum_alerts" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), spine AS (
        |  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)
        |), filled AS (
        |  SELECT s.event_type, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
        |  FROM spine s LEFT JOIN daily d USING (event_type, day)
        |), k AS (
        |  SELECT event_type,
        |    CAST((sum(n) + count(*) - 1) // count(*) AS BIGINT) AS k
        |  FROM filled GROUP BY 1
        |), cs AS (
        |  SELECT f.event_type, f.day, f.n, k.k,
        |    CAST(sum(f.n - k.k) OVER (PARTITION BY f.event_type ORDER BY f.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        |  FROM filled f JOIN k USING (event_type)
        |), s2 AS (
        |  SELECT event_type, day, n, k, p,
        |    p - least(CAST(0 AS BIGINT), min(p) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
        |  FROM cs
        |)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  n AS n_events, CAST(s AS BIGINT) AS cusum, s > 3 * k AS alert
        |FROM s2 ORDER BY event_type, day""".stripMargin,
    "evt_value_sketch" -> {
      // identical integer log-linear bucket map + rank walk as the
      // q_percentiles_sketch oracle (see Relational), over event values
      val b = "CASE WHEN cents < 1 THEN 0 WHEN cents < 32 THEN CAST(cents AS INT) " +
        "ELSE CAST(length(bin(cents)) * 16 + CAST((cents >> (length(bin(cents)) - 5)) & 15 AS INT) AS INT) END"
      val mid = "CASE WHEN b < 32 THEN CAST(b AS BIGINT) " +
        "ELSE CAST(33 + 2 * (b % 16) AS BIGINT) << (b // 16 - 6) END"
      s"""WITH v AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
         |), bq AS (
         |  SELECT event_type, $b AS b, count(*) AS cnt
         |  FROM v GROUP BY 1, 2
         |), cq AS (
         |  SELECT event_type, b,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,
         |    sum(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM bq
         |)
         |SELECT event_type,
         |  CAST(min(n) AS BIGINT) AS n_events,
         |  round(min(CASE WHEN cum >= ((n - 1) * 50) // 100 + 1 THEN $mid END) / 100.0, 6) AS median_value_est,
         |  round(min(CASE WHEN cum >= ((n - 1) * 95) // 100 + 1 THEN $mid END) / 100.0, 6) AS p95_value_est
         |FROM cq GROUP BY event_type
         |ORDER BY event_type""".stripMargin
    },
    "evt_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
        |  FROM events
        |), t AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        |  FROM e
        |)
        |SELECT from_type, to_type, count(*) AS n_transitions,
        |  count(DISTINCT user_id) AS n_users,
        |  round(CAST(count(*) AS DOUBLE) /
        |        CAST(CAST(sum(count(*)) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE),
        |        6) AS p_transition
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "evt_user_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events
        |), p AS (
        |  SELECT user_id, concat_ws('>',
        |    max(CASE WHEN rn = 1 THEN event_type END),
        |    max(CASE WHEN rn = 2 THEN event_type END),
        |    max(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM e WHERE rn <= 3 GROUP BY user_id
        |)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path ORDER BY path""".stripMargin,
    "evt_ab_test" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END) AS converted,
        |    user_id % 2 AS variant
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        |), agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM per_user
        |)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
        |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
        |  round(
        |    (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |     CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |         (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |         (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 4) AS z_score
        |FROM agg""".stripMargin,
    "evt_cohort_triangle" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        |  FROM events WHERE user_id IS NOT NULL
        |), cohorts AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id
        |), sizes AS (
        |  SELECT cohort_wk, count(*) AS n_cohort FROM cohorts GROUP BY cohort_wk
        |), act AS (
        |  SELECT c.cohort_wk,
        |    date_diff('day', c.cohort_wk, e.wk) // 7 AS week_n, e.user_id
        |  FROM ev e JOIN cohorts c ON e.user_id = c.user_id
        |)
        |SELECT a.cohort_wk, CAST(a.week_n AS BIGINT) AS week_n,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active,
        |  CAST(s.n_cohort AS BIGINT) AS n_cohort,
        |  round(CAST(count(DISTINCT a.user_id) AS DOUBLE) / CAST(s.n_cohort AS DOUBLE), 6)
        |    AS pct_retained
        |FROM act a JOIN sizes s ON a.cohort_wk = s.cohort_wk
        |WHERE a.week_n BETWEEN 0 AND 4
        |GROUP BY a.cohort_wk, a.week_n, s.n_cohort
        |ORDER BY a.cohort_wk, a.week_n""".stripMargin,
    "evt_dau_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, count(*) AS dau FROM ud GROUP BY day
        |), contrib AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM ud
        |), wau AS (
        |  SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY day
        |)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6) AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    "evt_outliers_mad" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev
        |), med AS (
        |  SELECT event_type, cents AS med_cents FROM r WHERE rn = (n + 1) // 2
        |), res AS (
        |  SELECT ev.event_type, ev.event_id, ev.cents, med.med_cents,
        |    abs(ev.cents - med.med_cents) AS dev
        |  FROM ev JOIN med USING (event_type)
        |), r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM res
        |), mad AS (
        |  SELECT event_type, dev AS mad_cents FROM r2 WHERE rn = (n + 1) // 2
        |)
        |SELECT res.event_type, count(*) AS n_events,
        |  max(res.med_cents) AS med_cents,
        |  max(mad.mad_cents) AS mad_cents,
        |  CAST(sum(CASE WHEN res.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  max(res.dev) AS max_dev
        |FROM res JOIN mad USING (event_type)
        |GROUP BY res.event_type ORDER BY res.event_type""".stripMargin,
    "evt_value_outliers" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM ev GROUP BY event_type
        |)
        |SELECT ev.event_type, count(*) AS n_outliers,
        |  min(ev.event_id) AS first_outlier_id,
        |  max(ev.cents) AS max_cents
        |FROM ev JOIN m USING (event_type)
        |WHERE ev.cents * m.n > 2 * m.sum_cents
        |GROUP BY ev.event_type
        |ORDER BY ev.event_type""".stripMargin,
    "evt_click_attribution" ->
      """WITH i AS (
        |  SELECT user_id AS ad_id, event_id AS imp_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS i_ts_us
        |  FROM events WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id AS c_user, event_id AS click_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT click_id, imp_id, ad_id AS user_id, c_ts_us, i_ts_us
        |FROM c JOIN i ON c_user = ad_id
        |  AND c_ts_us >= i_ts_us AND c_ts_us <= i_ts_us + 1800000000
        |ORDER BY click_id, imp_id""".stripMargin,
    "evt_asof_join_fwd" ->
      """WITH p AS (
        |  SELECT event_id AS p_event_id, user_id AS p_user,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id AS s_user, epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts,
        |         min(value) AS s_val
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
        |)
        |SELECT p_event_id, p_user, s_ts, s_val
        |FROM p ASOF JOIN s ON p.p_user = s.s_user AND p.p_ts <= s.s_ts
        |ORDER BY p_event_id""".stripMargin,
    "evt_sessions_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |              OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), numbered AS (
        |  SELECT user_id, ts_us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, start_us""".stripMargin,
    "evt_range_join" ->
      """WITH i AS (
        |  SELECT user_id AS i_user, event_id AS i_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
        |         epoch_us(CAST(ts AS TIMESTAMP)) + CAST(floor(value * 1e9) AS BIGINT) AS end_us
        |  FROM events WHERE event_type = 'signup'
        |), p AS (
        |  SELECT user_id AS p_user, event_id AS p_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p_id, i_id, p_user, p_ts, start_us, end_us
        |FROM p JOIN i ON p_user = i_user AND p_ts BETWEEN start_us AND end_us
        |ORDER BY p_id, i_id""".stripMargin,
    "evt_asof_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_event_id, user_id AS p_user,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id AS s_user, epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts,
        |         min(value) AS s_val
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
        |)
        |SELECT p_event_id, p_user, p_ts, s_ts, s_val
        |FROM p ASOF JOIN s ON p.p_user = s.s_user AND p.p_ts >= s.s_ts
        |ORDER BY p_event_id""".stripMargin,
    "evt_asof_join_left" ->
      """WITH p AS (
        |  SELECT event_id AS p_event_id, user_id AS p_user,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id AS s_user, epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts,
        |         min(value) AS s_val
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
        |)
        |SELECT p_event_id, p_user, s_ts, s_val
        |FROM p ASOF LEFT JOIN s ON p.p_user = s.s_user AND p.p_ts >= s.s_ts
        |ORDER BY p_event_id""".stripMargin,
    "evt_argmax_typed" ->
      """SELECT user_id, event_id AS top_event_id FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) = 1
        |ORDER BY user_id""".stripMargin,
    "evt_daily_gapfill" ->
      """WITH big AS (
        |  SELECT CAST(ts AS DATE) AS day, value FROM events
        |  WHERE event_type = 'purchase' AND value > 100.0
        |), daily AS (
        |  SELECT day, count(*) AS n_events,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM big GROUP BY day
        |), b AS (
        |  SELECT min(day) AS d0, max(day) AS d1 FROM big
        |), spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b
        |)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        |  CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
        |  CAST(coalesce(sum_cents, 0) AS BIGINT) AS sum_cents
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY day""".stripMargin,
    "evt_scd2_intervals" ->
      """SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  event_id, value,
        |  lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS valid_to_us,
        |  CAST(CASE WHEN lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM events
        |ORDER BY user_id, event_type, ts_us, event_id""".stripMargin,
    "evt_time_to_convert" ->
      """WITH per AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v0,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p0
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id
        |)
        |SELECT count(*) AS n_users,
        |  count(CASE WHEN p0 > v0 THEN 1 END) AS n_converted,
        |  round(CAST(SUM(CASE WHEN p0 > v0 THEN p0 - v0 END) AS DOUBLE)
        |        / CAST(count(CASE WHEN p0 > v0 THEN 1 END) AS DOUBLE)
        |        / 1000000.0, 6) AS avg_lag_sec,
        |  round(quantile_cont(CASE WHEN p0 > v0 THEN p0 - v0 END, 0.5)
        |        / 1000000.0, 6) AS p50_lag_sec
        |FROM per""".stripMargin,
    "evt_latest_by_key" ->
      """SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  event_id, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "evt_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
        |), came AS (
        |  SELECT DISTINCT ev.user_id FROM ev JOIN f USING (user_id)
        |  WHERE ev.day - f.cohort_day BETWEEN 1 AND 7
        |)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  count(*) AS n_users,
        |  CAST(SUM(CASE WHEN came.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  round(CAST(SUM(CASE WHEN came.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE), 6) AS retention_7d
        |FROM f LEFT JOIN came ON f.user_id = came.user_id
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,
    "evt_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |                    WHEN 'purchase' THEN 3 END AS code
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |), pu AS (
        |  SELECT user_id, list(code ORDER BY ts_us, event_id) AS codes
        |  FROM e GROUP BY user_id
        |), dep AS (
        |  SELECT user_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
        |      (acc, c) -> CASE WHEN c = 1 THEN greatest(acc, 1)
        |                       WHEN c = 2 AND acc >= 1 THEN greatest(acc, 2)
        |                       WHEN c = 3 AND acc >= 2 THEN 3
        |                       ELSE acc END) AS depth
        |  FROM pu
        |)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_users
        |FROM dep GROUP BY depth ORDER BY depth""".stripMargin,
    "evt_hourly_window" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS win_start_us,
        |  event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin,
    "evt_sliding_window" ->
      """WITH slides AS (
        |  SELECT epoch_us(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |           - k * INTERVAL '15 minutes') AS win_start_us,
        |    event_type, user_id
        |  FROM events, UNNEST([0, 1, 2, 3]) AS u(k)
        |)
        |SELECT win_start_us, event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM slides GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin,
    "evt_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |              OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), numbered AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)
}
