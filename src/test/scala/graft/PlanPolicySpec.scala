package graft

import graft.operators.{EventTime, Relational}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}

/** Broadcast-policy plan assertions (SCALE.md "Broadcast policy"): explicit
  * broadcast hints exist ONLY on sides bounded by construction (region,
  * nation, query vectors, centroids) — never on SF-growing relations
  * (customer, supplier, event-derived intervals). At small SF the optimizer
  * may still CHOOSE broadcast from measured sizes; what must not happen is a
  * hint forcing it at any scale.
  */
class PlanPolicySpec extends SparkSuiteBase {

  /** Number of join sides carrying an explicit broadcast hint after
    * optimization (hints survive resolution into Join.hint).
    */
  private def broadcastHintedSides(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join =>
      Seq(j.hint.leftHint, j.hint.rightHint).flatten
        .count(_.strategy.contains(BROADCAST))
    }.sum

  test("q3_join_topk: no broadcast hints (customer grows with SF)") {
    assert(broadcastHintedSides(
      Relational.queries("q3_join_topk")(spark, sf0001)) == 0)
  }

  test("q5_star_join: hints only on nation and region (fixed 25/5 rows)") {
    assert(broadcastHintedSides(
      Relational.queries("q5_star_join")(spark, sf0001)) == 2)
  }

  test("evt_range_join: no broadcast hint (intervals derive from the event table)") {
    assert(broadcastHintedSides(
      EventTime.queries("evt_range_join")(spark, sf0001)) == 0)
  }

  test("with size-based broadcast disabled, unhinted joins degrade to shuffle joins") {
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val q3 = Relational.queries("q3_join_topk")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!q3.contains("BroadcastHashJoin"),
        "q3 must not broadcast when the size-based threshold is off — a " +
          "leftover hint would force it at any scale")
      val q5 = Relational.queries("q5_star_join")(spark, sf0001)
        .queryExecution.executedPlan.toString
      // exactly the two hinted fixed-size dims still broadcast
      val bhj = "BroadcastHashJoin".r.findAllIn(q5).size
      assert(bhj == 2, s"expected 2 hinted broadcasts (nation, region), saw $bhj")
    } finally spark.conf.set(thresholdKey, prev)
  }
}
