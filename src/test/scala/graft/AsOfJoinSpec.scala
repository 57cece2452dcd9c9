package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuiteBase {

  /** Composed reference implementation: union-tag + window last-match. */
  private def asofViaWindow(l: DataFrame, r: DataFrame): Set[(Long, Long, Long, Double)] = {
    val tagged = l.select(col("p_user").as("k"), col("p_ts").as("ts"),
        col("p_event_id").as("lid"), lit(null).cast("double").as("rv"))
      .unionAll(r.select(col("s_user").as("k"), col("s_ts").as("ts"),
        lit(null).cast("bigint").as("lid"), col("s_val").as("rv")))
    val w = Window.partitionBy("k").orderBy(col("ts"), col("lid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_rv", last(col("rv"), ignoreNulls = true).over(w))
      .withColumn("last_rts",
        last(when(col("rv").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("lid").isNotNull && col("last_rv").isNotNull)
      .select(col("lid"), col("k"), col("last_rts"), col("last_rv"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSet
  }

  private def sides(): (DataFrame, DataFrame) = {
    val e = Tables.events(spark, sf0001)
    val l = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("p_ts"))
    val r = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user"), unix_micros(col("ts")).as("s_ts"))
      .agg(min(col("value")).as("s_val"))
    (l, r)
  }

  test("as-of join matches the composed window-form reference on fixture data") {
    val (l, r) = sides()
    val got = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts")
      .select(col("p_event_id"), col("p_user"), col("s_ts"), col("s_val"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSet
    val want = asofViaWindow(l, r)
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("physical plan: AsOfJoinExec with one exchange + sort per side") {
    val (l, r) = sides()
    val df = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix
    assert(plan.contains("AsOfJoin "), plan)
    // the operator's co-partitioning requirement pins one exchange per side
    // (REQUIRED_BY_STATEFUL_OPERATOR marks them; AQE cannot coalesce)
    assert("REQUIRED_BY_STATEFUL_OPERATOR".r.findAllIn(plan).size >= 2, plan)
  }

  test("null keys and timestamps never match (inner-join null semantics)") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(100L), 10L),
      (None, Some(100L), 11L),     // null key -> dropped
      (Some(1L), None, 12L))       // null ts -> dropped
      .toDF("p_user", "p_ts", "p_event_id")
    val r = Seq(
      (Some(1L), Some(10L), 1.5),
      (None, Some(5L), 7.7),       // null-keyed snapshot matches nothing
      (Some(1L), None, 8.8))
      .toDF("s_user", "s_ts", "s_val")
    val got = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts")
      .select("p_event_id", "s_ts", "s_val")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == Set((10L, 10L, 1.5)))
  }

  test("leftOuter keeps unmatched left rows with a null right side") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (1L, 5L, 11L), (2L, 50L, 12L))
      .toDF("p_user", "p_ts", "p_event_id")
    val r = Seq((1L, 10L, 1.5)).toDF("s_user", "s_ts", "s_val")
    val got = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts", leftOuter = true)
      .select("p_event_id", "s_ts", "s_val")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
    assert(got == Set(
      (10L, Some(10L), Some(1.5)),
      (11L, None, None),
      (12L, None, None)))
  }

  test("forward mode matches the earliest at-or-after row; tolerance bounds the distance") {
    import spark.implicits._
    val l = Seq((1L, 50L, 10L), (1L, 100L, 11L), (2L, 10L, 12L))
      .toDF("p_user", "p_ts", "p_event_id")
    val r = Seq((1L, 90L, 1.5), (1L, 120L, 2.0), (2L, 5L, 9.9))
      .toDF("s_user", "s_ts", "s_val")
    val fwd = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts", forward = true)
      .select("p_event_id", "s_ts")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fwd == Set((10L, 90L), (11L, 120L))) // user 2's snapshot is in the past

    // tolerance 25µs: 50→90 is 40 away (dropped), 100→120 is 20 (kept)
    val fwdTol = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts",
        forward = true, toleranceUs = 25L)
      .select("p_event_id", "s_ts")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fwdTol == Set((11L, 120L)))

    // backward tolerance: (1,100) backward match is 90, distance 10 ≤ 25 kept;
    // with tolerance 5 it drops
    val backTol = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts", toleranceUs = 5L)
      .select("p_event_id", "s_ts")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(backTol == Set((12L, 5L))) // user 2: 10-5=5 ≤ 5 kept; user 1's 100-90=10 dropped
  }

  test("left rows with no at-or-before match are dropped (inner asof)") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (1L, 5L, 11L), (2L, 50L, 12L))
      .toDF("p_user", "p_ts", "p_event_id")
      .select(col("p_event_id"), col("p_user"), col("p_ts"))
    val r = Seq((1L, 10L, 1.5), (3L, 1L, 9.9))
      .toDF("s_user", "s_ts", "s_val")
    val got = AsOfJoin(l, "p_user", "p_ts", r, "s_user", "s_ts")
      .select("p_event_id", "s_ts", "s_val")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    // event 10 (user 1, ts 100) matches (10, 1.5); event 11 (ts 5) has no
    // earlier snapshot; user 2 has no snapshots; user 3's snapshot unused
    assert(got == Set((10L, 10L, 1.5)))
  }
}
