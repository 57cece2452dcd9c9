package graft

import graft.plans.QuantileSketchAggregate.{bucketOf, midpointOf}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** graft_qsketch — the mergeable constant-state quantile sketch: bucket-map
  * invariants, merge-order determinism, and the 1/32 relative-error bound
  * against Spark's exact percentile.
  */
class QuantileSketchSpec extends SparkSuiteBase {

  private def check(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val positives = Gen.chooseNum(1L, Long.MaxValue / 2)

  test("bucket id is monotone in v and the midpoint decode stays in-bucket") {
    check(Prop.forAll(positives, positives) { (v1: Long, v2: Long) =>
      val (lo, hi) = if (v1 <= v2) (v1, v2) else (v2, v1)
      bucketOf(lo) <= bucketOf(hi)
    })
    check(Prop.forAll(positives) { v: Long =>
      val m = midpointOf(bucketOf(v))
      // hard relative-error bound: half a bucket width, <= v/32 for v >= 32,
      // exact below 32 (the class scaladoc's 3.1% guarantee)
      if (v < 32L) m == v
      else math.abs(m - v) <= v / 32L + 1
    })
  }

  test("small values are exact and ranges are disjoint") {
    (1L until 32L).foreach(v => assert(bucketOf(v) == v && midpointOf(v.toInt) == v))
    assert(bucketOf(0L) == 0 && bucketOf(-5L) == 0)
    assert(bucketOf(32L) >= 96) // log-linear ids never collide with exact ids
  }

  test("sketch is identical under any partitioning (merge-order determinism)") {
    val vals = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        (round(col("l_quantity") * 100)).cast("long").as("v"))
    def sketch(parts: Int): Array[(String, Seq[(Int, Long)])] =
      vals.repartition(parts)
        .groupBy(col("l_returnflag"))
        .agg(call_function("graft_qsketch", col("v")).as("sk"))
        .select(col("l_returnflag"), col("sk"))
        .collect()
        .map(r => (r.getString(0),
          r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getInt(0), e.getLong(1)))))
        .sortBy(_._1)
    assert(sketch(1).toSeq == sketch(13).toSeq)
  }

  test("merging fine-grain sketches is bit-identical to sketching raw (rollup contract)") {
    val vals = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_linestatus"),
        (round(col("l_quantity") * 100)).cast("long").as("v"))
    def entries(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Int, Long)]] = df
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getInt(0), e.getLong(1))))
      .toMap
    val direct = entries(vals.groupBy(col("l_returnflag"))
      .agg(call_function("graft_qsketch", col("v")).as("sk")))
    val rolled = entries(vals.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(call_function("graft_qsketch", col("v")).as("sk_fine"))
      .groupBy(col("l_returnflag"))
      .agg(call_function("graft_qsketch_merge", col("sk_fine")).as("sk")))
    assert(direct == rolled)
  }

  test("sketch summaries survive a parquet round-trip and still merge exactly") {
    // the persist-at-ingest shape: fine-grain sketches written to the lake,
    // read back later, rolled up — never touching raw rows again
    val vals = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_linestatus"),
        (round(col("l_quantity") * 100)).cast("long").as("v"))
    val fine = vals.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(call_function("graft_qsketch", col("v")).as("sk_fine"))
    val dir = tmpDir("qsketch_lake") + "/sketches"
    fine.write.parquet(dir)
    val rolled = spark.read.parquet(dir)
      .groupBy(col("l_returnflag"))
      .agg(call_function("graft_qsketch_merge", col("sk_fine")).as("sk"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getInt(0), e.getLong(1))))
      .toMap
    val direct = vals.groupBy(col("l_returnflag"))
      .agg(call_function("graft_qsketch", col("v")).as("sk"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getInt(0), e.getLong(1))))
      .toMap
    assert(rolled == direct)
  }

  test("rank estimates stay within the 1/32 bound of exact percentiles") {
    val est = SparkEntry.queries("q_percentiles_sketch")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("m50"),
        expr("percentile(l_quantity, 0.95)").as("m95"),
        expr("percentile(l_extendedprice, 0.99)").as("m99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (flag, (m50, m95, m99)) =>
      val (e50, e95, e99) = est(flag)
      // nearest-rank vs interpolated percentile differ by at most one
      // sample step; dominate both effects with a 5% tolerance on top of
      // the 3.125% bucket bound
      assert(math.abs(e50 - m50) <= m50 * 0.05, s"$flag median $e50 vs $m50")
      assert(math.abs(e95 - m95) <= m95 * 0.05, s"$flag p95 $e95 vs $m95")
      assert(math.abs(e99 - m99) <= m99 * 0.05, s"$flag p99 $e99 vs $m99")
    }
  }
}
