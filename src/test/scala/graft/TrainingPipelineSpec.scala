package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.Warehouse
import graft.sources.JsonlSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-data pipeline composition: JSONL ingest with
  * quarantine → quality filter → exact dedup (canonical keeper) → token
  * stats → date-partitioned write. Exercises the library as a whole the way
  * a production corpus build would chain it.
  */
class TrainingPipelineSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ds", StringType),
    StructField("text", StringType)))

  test("ingest -> quality filter -> dedup -> tokenize -> partitioned corpus") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val landing = tmpDir("tp_landing")
    val wh = new Warehouse(tmpDir("tp_wh"))

    Files.write(Paths.get(landing, "drop.jsonl"), Seq(
      """{"doc_id": 1, "ds": "2024-01-01", "text": "the quick brown fox jumps over the lazy dog"}""",
      """{"doc_id": 2, "ds": "2024-01-01", "text": "the quick brown fox jumps over the lazy dog"}""", // exact dup of 1
      """{"doc_id": 3, "ds": "2024-01-01", "text": "xx"}""",                                          // too short -> quality-filtered
      """{"doc_id": 4, "ds": "2024-01-02", "text": "a completely different document with enough words"}""",
      """this line is not json"""
    ).mkString("\n").getBytes("UTF-8"))

    // 1. ingest: clean rows in, malformed rows quarantined
    val docs = JsonlSource.readClean(spark, landing, schema)
    val quarantined = JsonlSource.readCorrupt(spark, landing, schema)
    assert(quarantined.count() == 1)

    // 2. quality filter: drop docs under 5 words
    val quality = docs.filter(size(split(col("text"), " ")) >= 5)

    // 3. exact dedup, keep min doc_id per content hash
    val keepers = quality
      .withColumn("content_hash", md5(col("text")))
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("content_hash", "keep_id")

    // 4. tokenize + stats
    val corpus = keepers
      .withColumn("n_tokens", regexp_count(col("text"), lit("[a-z0-9]+")).cast("bigint"))

    // 5. date-partitioned corpus write (idempotent per-date upsert)
    wh.partitionedUpsertWrite(corpus, "corpus", "ds")

    val out = wh.read(spark, "corpus")
      .select(col("doc_id"), col("ds").cast("string"), col("n_tokens"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "2024-01-01", 9L), (4L, "2024-01-02", 7L)))

    // re-running the whole pipeline is idempotent (no double-append)
    wh.partitionedUpsertWrite(corpus, "corpus", "ds")
    assert(wh.read(spark, "corpus").count() == 2)
  }
}
