package graft

import graft.plans.MgBuffer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** graft_mgsketch — the Misra–Gries guarantee (superset of items with
  * frequency > n/(k+1); undercount ≤ n/(k+1)) under eviction and under
  * arbitrary partitioning/merging, plus the deterministic two-pass
  * heavy-hitters consumer.
  */
class MisraGriesSpec extends SparkSuiteBase {

  /** 3 hot tokens at ~10% each, the rest singleton noise — eviction churns
    * constantly (k far below distinct count).
    */
  private def skewed = {
    spark.range(30000).select(
      when(col("id") % 10 === 0, lit("hot_a"))
        .when(col("id") % 10 === 1, lit("hot_b"))
        .when(col("id") % 10 === 2, lit("hot_c"))
        .otherwise(concat(lit("rare_"), col("id"))).as("word"))
  }

  private def summary(parts: Int, k: Int): Map[String, Long] =
    skewed.repartition(parts)
      .agg(call_function("graft_mgsketch", col("word"), lit(k)).as("sk"))
      .collect()(0).getSeq[Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("every item above the n/(k+1) frequency threshold survives, any partitioning") {
    val n = 30000L
    // hot tokens are 10% each, so the guarantee needs n/(k+1) < 0.10·n,
    // i.e. k >= 10; k=15 leaves slack while churn still evicts constantly
    val k = 15
    for (parts <- Seq(1, 7, 32)) {
      val sk = summary(parts, k)
      assert(sk.size <= k)
      for (hot <- Seq("hot_a", "hot_b", "hot_c")) {
        assert(sk.contains(hot), s"$hot missing at parts=$parts: $sk")
        // count undercounts, by at most n/(k+1)
        assert(sk(hot) <= 3000L)
        assert(3000L - sk(hot) <= n / (k + 1), s"$hot count ${sk(hot)} under floor")
      }
    }
  }

  test("buffer semantics: exact below k distinct, decrement-all on overflow") {
    val b = new MgBuffer(3)
    Seq("a", "a", "b", "c").foreach(b.add(_, 1L))
    assert(b.sortedEntries.toSeq == Seq(("a", 2L), ("b", 1L), ("c", 1L)))
    b.add("d", 1L) // full, d misses: all decrement by min(1, minC=1); b,c die, d doesn't enter
    assert(b.sortedEntries.toSeq == Seq(("a", 1L)))
    b.add("e", 5L) // room again
    assert(b.sortedEntries.toSeq == Seq(("a", 1L), ("e", 5L)))
  }

  test("weighted overflow: surviving mass enters after the sweep") {
    val b = new MgBuffer(2)
    b.add("a", 10L); b.add("b", 3L)
    b.add("c", 5L) // d = min(5, 3) = 3: a→7, b dies, c enters with 2
    assert(b.sortedEntries.toSeq == Seq(("a", 7L), ("c", 2L)))
  }

  test("merge preserves the guarantee and caps at k counters") {
    val b1 = new MgBuffer(3)
    val b2 = new MgBuffer(3)
    Seq("x", "x", "x", "y", "z").foreach(b1.add(_, 1L))
    Seq("x", "w", "w", "v", "y").foreach(b2.add(_, 1L))
    b1.mergeFrom(b2)
    assert(b1.size <= 3)
    // x has true count 4 of n=10; threshold n/(k+1)=2.5 — must survive merge
    assert(b1.sortedEntries.exists(_._1 == "x"))
  }

  test("two-pass heavy hitters equals exact SQL top-frequency on the fixture") {
    val got = operators.TextAnalysis.queries("txt_heavy_hitters")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
    val n = toks.count()
    val exact = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 33L > n)
      .orderBy(col("word"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
    assert(got.nonEmpty)
  }
}
