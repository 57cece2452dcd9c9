package graft

import graft.plans.{BottomKBuffer, GraftExtensions}
import org.apache.spark.sql.functions._

class BottomKAggregateSpec extends SparkSuiteBase {

  test("BottomKBuffer keeps k smallest DISTINCT hashes, ascending, bounded") {
    val b = new BottomKBuffer(3)
    Seq((50L, 1.0), (10L, 2.0), (30L, 3.0), (10L, 99.0), (20L, 4.0), (40L, 5.0))
      .foreach { case (h, v) => b.insert(h, v) }
    assert(b.size == 3)
    val entries = (0 until b.size).map(i => (b.hs(i), b.vs(i)))
    // duplicate hash 10 kept once with the MIN payload (2.0 < 99.0); 40/50 evicted
    assert(entries == Seq((10L, 2.0), (20L, 4.0), (30L, 3.0)))
    // inserting >= current max when full is a no-op
    b.insert(35L, 6.0)
    assert((0 until b.size).map(i => (b.hs(i), b.vs(i))) == Seq((10L, 2.0), (20L, 4.0), (30L, 3.0)).map(identity))
    // a smaller hash displaces the max
    b.insert(5L, 7.0)
    assert((0 until b.size).map(i => (b.hs(i), b.vs(i))) == Seq((5L, 7.0), (10L, 2.0), (20L, 4.0)))
  }

  test("duplicate-hash payload rule is arrival-order independent (min wins)") {
    // the oracle dedupes (group, hash) with min(payload); the buffer must
    // keep exactly the same value no matter which row arrives first
    val fwd = new BottomKBuffer(4)
    Seq((10L, 2.0), (10L, 99.0)).foreach { case (h, v) => fwd.insert(h, v) }
    val rev = new BottomKBuffer(4)
    Seq((10L, 99.0), (10L, 2.0)).foreach { case (h, v) => rev.insert(h, v) }
    assert(fwd.size == 1 && rev.size == 1)
    assert(fwd.vs(0) == 2.0 && rev.vs(0) == 2.0)
  }

  test("buffers merge across partitions: agg over repartitioned data equals window form") {
    GraftExtensions.ensureRegistered(spark)
    val hashed = Tables.events(spark, sf0001)
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("bigint").as("h"))
    val viaAgg = hashed.repartition(7)
      .groupBy(col("event_type"))
      .agg(call_function("graft_bottomk", col("h"), lit(0.0), lit(8)).as("ks"))
      .select(col("event_type"), explode(col("ks")).as("e"))
      .select(col("event_type"), col("e.h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
    val viaWindow = hashed.distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .select(col("event_type"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k emit all distinct hashes; nulls are skipped") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(5L), 1.0), (1L, Some(5L), 2.0), (1L, Some(7L), 3.0),
      (2L, None, 4.0))
      .toDF("g", "h", "v")
    val out = df.groupBy(col("g"))
      .agg(call_function("graft_bottomk", col("h"), col("v"), lit(10)).as("ks"))
      .select(col("g"), size(col("ks")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 0))
  }
}
