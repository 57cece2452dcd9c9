package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft_bloom — bitmap determinism under partitioning, the bitwise-OR
  * rollup contract, the no-false-negatives guarantee, and a measured
  * false-positive bound near the theoretical rate.
  */
class BloomSpec extends SparkSuiteBase {

  private def keyed(n: Int, tag: String) =
    spark.range(n).select(
      (col("id") % 5).cast("int").as("part"),
      graft.functions.TextFunctions.md5Bits(
        concat(lit(tag), col("id").cast("string")), 15).as("h"))

  private def bits(df: DataFrame): Seq[Long] =
    df.collect()(0).getSeq[Long](0)

  private val probeHit = expr(
    """forall(sequence(0, 3), i ->
      |  ((shiftright(element_at(bloom,
      |      CAST(((shiftright(h, 15 * i) & 32767) DIV 64) AS INT) + 1),
      |    CAST(((shiftright(h, 15 * i) & 32767) % 64) AS INT)) & 1) = 1))""".stripMargin)

  test("bitmap is 512 words and identical under any partitioning") {
    def build(parts: Int): Seq[Long] = bits(
      keyed(3000, "k").repartition(parts)
        .agg(call_function("graft_bloom", col("h")).as("bloom")))
    val b1 = build(1)
    assert(b1.length == 512)
    assert(b1 == build(13))
  }

  test("ORing per-partition filters equals one global build (rollup contract)") {
    val global = bits(keyed(3000, "k")
      .agg(call_function("graft_bloom", col("h")).as("bloom")))
    val perPart = keyed(3000, "k").groupBy(col("part"))
      .agg(call_function("graft_bloom", col("h")).as("b"))
      .agg(expr("aggregate(collect_list(b), " +
        "transform(sequence(1, 512), x -> 0L), " +
        "(acc, w) -> zip_with(acc, w, (x, y) -> x | y))").as("bloom"))
    assert(global == bits(perPart))
  }

  test("no false negatives: every inserted key probes positive") {
    val keys = keyed(3000, "k").cache()
    val bloom = keys.agg(call_function("graft_bloom", col("h")).as("bloom"))
    val misses = keys.crossJoin(broadcast(bloom))
      .filter(!probeHit).count()
    assert(misses == 0L)
  }

  test("false-positive rate on disjoint probes stays near theory") {
    val n = 2048
    val bloom = keyed(n, "in").agg(call_function("graft_bloom", col("h")).as("bloom"))
    val probes = keyed(20000, "out") // disjoint tag => none inserted
    val fp = probes.crossJoin(broadcast(bloom)).filter(probeHit).count()
    // theory: (1 - e^(-4n/32768))^4 ≈ 0.25% at n=2048; allow 4x headroom
    assert(fp.toDouble / 20000 < 0.01, s"FP rate ${fp / 20000.0} too high")
    assert(fp > 0, "a 0 FP count on 20k disjoint probes means the probe is broken")
  }
}
