package graft

import graft.plans.{GraftExtensions, TopKBuffer}
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSuiteBase {

  test("TopKBuffer keeps k best with (score DESC, id ASC) tiebreak, bounded") {
    val b = new TopKBuffer(3)
    Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (1.0, 99L), (7.0, 1L), (9.0, 50L))
      .foreach { case (s, i) => b.insert(s, i) }
    assert(b.size == 3)
    val entries = (0 until b.size).map(i => (b.scores(i), b.ids(i)))
    assert(entries == Seq((9.0, 50L), (7.0, 1L), (7.0, 2L)))
    // inserting something worse than the current floor is a no-op
    b.insert(0.5, 1000L)
    assert((0 until b.size).map(i => (b.scores(i), b.ids(i))) == entries)
  }

  test("buffers merge across partitions: agg over repartitioned data equals window form") {
    GraftExtensions.ensureRegistered(spark)
    val o = Tables.orders(spark, sf0001).repartition(7) // force multi-partition partials
    val viaAgg = o.groupBy(col("o_custkey"))
      .agg(call_function("graft_topk", col("o_totalprice"), col("o_orderkey"), lit(2)).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("e"))
      .select(col("o_custkey"), col("e.id").as("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), col("o_orderkey"))
    val viaWindow = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k emit all their rows; empty input emits nothing") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, 5.0, 100L), (1L, 4.0, 101L), (2L, 3.0, 200L))
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("score"), col("id"), lit(10)).as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 1))
    val empty = df.filter(col("g") === 99)
      .groupBy(col("g"))
      .agg(call_function("graft_topk", col("score"), col("id"), lit(2)).as("top"))
    assert(empty.count() == 0)
  }
}
