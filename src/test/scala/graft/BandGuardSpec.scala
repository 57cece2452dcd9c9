package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.{Dedup, Multimodal}

/** The hot-band guard and the dHash identity collapse, pinned on planted
  * degenerate corpora — the round-11 weak marks' done-criteria:
  *  - g identical images produce O(g) cluster edges (star), never the
  *    g²/2 pair expansion (and never 4·g²/2 banded-join intermediates);
  *  - a band value held by more than the cap is dropped by
  *    [[Dedup.capHotBands]] and its mass is visible via
  *    [[Dedup.hotBandMass]] (the no-silent-caps rule).
  */
class BandGuardSpec extends SparkSuiteBase {

  private val hashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("hash_hi", LongType),
    StructField("hash_lo", LongType)))

  private def hashFrame(rows: Seq[(Long, Long, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, h, l) => Row(i, h, l) }),
      hashSchema)

  test("g identical images -> exactly g-1 cluster edges (linear, not quadratic)") {
    val g = 200
    // one g-copy identity group + two singletons at hamming 1 of each other
    val rows = (0 until g).map(i => (i.toLong, 0x1234567890abcdL, 0x0fedcba098765432L)) ++
      Seq((1000L, 0x7777777777777777L, 0x1111111111111111L),
        (1001L, 0x7777777777777777L, 0x1111111111111113L))
    val edges = Multimodal.dhashClusterEdges(hashFrame(rows)).collect()
    // star edges: rep 0 -> members 1..g-1, plus the one near pair
    assert(edges.length === g - 1 + 1)
    val star = edges.filter(r => r.getLong(0) == 0L)
    assert(star.length === g - 1)
    assert(edges.exists(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L))
  }

  test("identity collapse: one representative per distinct hash, min doc_id") {
    val rows = Seq((5L, 1L, 2L), (3L, 1L, 2L), (9L, 1L, 2L), (7L, 4L, 4L))
    val m = Multimodal.dhashCollapse(hashFrame(rows))
      .select(col("doc_id"), col("rep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 7L -> 7L))
  }

  test("hot band value is dropped by capHotBands and counted by hotBandMass") {
    // 60 distinct hashes sharing band 0's 16-bit value (hash_lo & 0xffff)
    // but differing in high bits: band (0, 0xbeef) holds 60 > cap reps,
    // every other band value is unique
    val hot = (0 until 60).map(i =>
      (i.toLong, (i.toLong << 20) | (i.toLong + 7L), (i.toLong << 16) | 0xbeefL))
    val banded = Multimodal.dhashBanded(hashFrame(hot))
    val kept = Dedup.capHotBands(banded, Seq("ci", "cv"))
    assert(banded.count() === 60L * 4)
    assert(kept.count() === 60L * 3) // the hot (0, 0xbeef) rows are gone
    assert(kept.filter(col("ci") === 0 && col("cv") === 0xbeefL).count() === 0L)
    val mass = Dedup.hotBandMass(banded, Seq("ci", "cv")).collect()(0)
    assert(mass.getLong(0) === 1L)  // one hot value
    assert(mass.getLong(1) === 60L) // carrying 60 banded rows
  }

  test("hotBandMass reports a zero row when nothing is hot") {
    val banded = Multimodal.dhashBanded(hashFrame(Seq((1L, 2L, 3L), (4L, 5L, 6L))))
    val mass = Dedup.hotBandMass(banded, Seq("ci", "cv")).collect()(0)
    assert(mass.getLong(0) === 0L && mass.getLong(1) === 0L)
  }

  test("near pairs between hot-banded groups survive via their other bands") {
    // two hashes at hamming 1 whose band-0 value is hot (shared with 58
    // decoys): the pair must still be found through bands 1-3
    val pair = Seq(
      (100L, 0x1111222233334444L, 0x55556666777760L),
      (101L, 0x1111222233334444L, 0x55556666777761L))
    val decoys = (0 until 58).map(i =>
      (200L + i, 0x8000000000000000L + i * 281474976710656L, // vary hash_hi high bits
        (i.toLong << 20) | 0x7760L & 0xffffL))
    // make band 0 (hash_lo & 0xffff) identical across pair + decoys
    val rows = pair ++ decoys.map { case (id, hi, _) => (id, hi, 0x7760L) } :+
      ((400L, 0x1111222233334444L, 0x55556666777760L)) // identical to doc 100
    val hashes = hashFrame(rows.map { case (a, b, c) => (a, b, c) })
    // doc 100's band-0 value 0x7760 is held by 100,400-collapsed-rep + 58 decoys
    val members = Multimodal.dhashCollapse(hashes)
    val reps = members.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
    val pairs = Multimodal.dhashRepPairs(reps).collect()
    assert(pairs.exists(r => r.getLong(0) == 100L && r.getLong(1) == 101L &&
      r.getLong(2) == 1L))
  }
}
