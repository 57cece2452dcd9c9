package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSuiteBase {
  import spark.implicits._

  test("simhash: identical texts agree; near texts closer than far texts") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("id", "text")
    val hashed = docs.withColumn("sh", TextFunctions.simhash(col("text")))
      .select("id", "sh").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) == hashed(2L))
    val near = java.lang.Long.bitCount(hashed(1L) ^ hashed(3L))
    val far = java.lang.Long.bitCount(hashed(1L) ^ hashed(4L))
    assert(near < far, s"near=$near far=$far")
    assert(hashed(1L) >= 0L) // 60-bit sketch stays non-negative
  }

  test("native simhash (graft_simhash60) is bit-identical to the portable HOF form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely unrelated content here now"),
      (3L, ""),                       // single empty token
      (4L, "one"),
      (5L, "trailing space "),        // trailing empty token kept by split
      (6L, "a a a a a b b c")
    ).toDF("id", "text")
    val both = docs
      .withColumn("nat", TextFunctions.simhash(col("text")))
      .withColumn("hof", TextFunctions.simhashPortable(col("text")))
      .select("id", "nat", "hof").collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("hamming column matches JVM bitCount") {
    val df = Seq((0xF0L, 0x0FL)).toDF("a", "b")
      .select(TextFunctions.hamming(col("a"), col("b")).as("h"))
    assert(df.collect().head.getAs[Number]("h").longValue() == 8L)
  }

  test("rollingFingerprint: deterministic, order-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")
    ).toDF("id", "text")
      .withColumn("fp", TextFunctions.rollingFingerprint(col("text")))
      .select("id", "fp")
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L)) // rolling hash is position-sensitive
    assert(fp(1L) >= 0L && fp(1L) < 1000000007L)
  }

  test("cosine: parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(2.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))
    ).toDF("a", "b").withColumn("cos", VectorFunctions.cosine("a", "b"))
    assert(df.collect().map(_.getAs[Double]("cos")).toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("normalize yields unit vectors; l2Distance of identical vectors is 0") {
    val df = Seq(Tuple1(Seq(3.0f, 4.0f))).toDF("a")
      .withColumn("n", VectorFunctions.normalize("a"))
      .withColumn("norm_of_n", expr("sqrt(aggregate(n, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"))
      .withColumn("d_self", VectorFunctions.l2Distance("a", "a"))
    val r = df.collect().head
    assert(math.abs(r.getAs[Double]("norm_of_n") - 1.0) < 1e-12)
    assert(r.getAs[Double]("d_self") == 0.0)
    assert(r.getSeq[Double](r.fieldIndex("n")).toList == List(0.6, 0.8))
  }

  test("markerHits counts membership") {
    val df = Seq(Tuple1("the cat and the dog")).toDF("text")
      .withColumn("hits", TextFunctions.markerHits(col("text"), Seq("the", "and")))
    assert(df.collect().head.getAs[Int]("hits") == 3)
  }

  test("LatestEvent.micros keeps full sub-millisecond precision") {
    // unix_micros(ts) on the SQL side is epochSecond*1e6 + nanos/1000 —
    // the Timestamp fold must produce the identical value or batch and
    // typed paths would disagree on near-tie orderings
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:01.123456789")
    val expected = t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    assert(graft.functions.LatestEvent.micros(t) == expected)
    assert(graft.functions.LatestEvent.micros(t) % 1000L == 456L)
  }
}
