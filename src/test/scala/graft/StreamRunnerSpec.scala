package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.Warehouse
import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming upsert into the date-partitioned warehouse: daily file drops
  * land as partition overwrites — the streaming form of the reference's
  * daily batch cadence with idempotent re-processing.
  */
class StreamRunnerSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("ds", StringType),
    StructField("keyword", StringType),
    StructField("n", LongType)))

  test("daily drops upsert their date partition; re-drop of a day replaces it") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val landing = tmpDir("srl")
    val wh = new Warehouse(tmpDir("srw"))
    val ckpt1 = tmpDir("src1")

    def drop(file: String, rows: Seq[(String, String, Long)]): Unit =
      Files.write(Paths.get(landing, file),
        rows.map { case (d, k, n) => s"""{"ds":"$d","keyword":"$k","n":$n}""" }
          .mkString("\n").getBytes("UTF-8"))

    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema).json(landing)
        .withColumn("keyword", upper(col("keyword")))
      val q = StreamRunner.upsertToWarehouse(
        stream, wh, "daily_keywords", "ds", ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }

    drop("day1.jsonl", Seq(("2021-03-10", "spark", 5L), ("2021-03-10", "scala", 3L)))
    runOnce(ckpt1)
    drop("day2.jsonl", Seq(("2021-03-11", "flink", 2L)))
    runOnce(ckpt1)

    val afterTwo = wh.read(spark, "daily_keywords")
      .select(col("ds").cast("string"), col("keyword"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(afterTwo == Set(
      ("2021-03-10", "SPARK", 5L), ("2021-03-10", "SCALA", 3L),
      ("2021-03-11", "FLINK", 2L)))

    // Re-processing from a fresh checkpoint (full replay of the landing dir)
    // rewrites the same partitions with the same contents — idempotent, no
    // double-append.
    runOnce(tmpDir("src2"))
    val afterReplay = wh.read(spark, "daily_keywords")
      .select(col("ds").cast("string"), col("keyword"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(afterReplay == afterTwo)
  }

  test("audited streaming upsert: passing batches publish, failing batches quarantine with reason") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val landing = tmpDir("sal")
    val whRoot = tmpDir("saw")
    val wh = new Warehouse(whRoot)
    val ckpt = tmpDir("sac")

    def drop(file: String, rows: Seq[(String, String, Long)]): Unit =
      Files.write(Paths.get(landing, file),
        rows.map { case (d, k, n) => s"""{"ds":"$d","keyword":"$k","n":$n}""" }
          .mkString("\n").getBytes("UTF-8"))

    // audit body: the uniqueness + non-negative expectations a publish
    // gate would run (q_expectations_audit's rule shapes on the batch)
    def audit(df: org.apache.spark.sql.DataFrame): Option[String] = {
      val r = df.agg(
        count(lit(1)).as("n"),
        countDistinct(col("ds"), col("keyword")).as("nk"),
        sum(when(col("n") < 0, 1L).otherwise(0L)).as("neg")).collect()(0)
      if (r.getLong(0) != r.getLong(1)) Some("duplicate (ds, keyword) keys")
      else if (r.getLong(2) > 0) Some("negative counts")
      else None
    }

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(landing)
      val q = graft.streaming.StreamRunner.auditedUpsertToWarehouse(
        stream, wh, "gated_keywords", "ds", audit, ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }

    drop("good.jsonl", Seq(("2021-03-10", "spark", 5L), ("2021-03-10", "scala", 3L)))
    runOnce()
    assert(wh.read(spark, "gated_keywords")
      .collect().length == 2, "passing batch must publish")

    // a replayed-upstream drop: duplicate keys AND a negative count
    drop("bad.jsonl", Seq(("2021-03-11", "flink", 2L), ("2021-03-11", "flink", 2L)))
    runOnce()
    val live = wh.read(spark, "gated_keywords")
      .select(col("ds").cast("string"), col("keyword"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(live == Set(("2021-03-10", "spark", 5L), ("2021-03-10", "scala", 3L)),
      "failing batch must leave live untouched")
    val quarantines = new java.io.File(whRoot).list()
      .filter(_.startsWith("__quarantine__gated_keywords")).toSeq
    assert(quarantines.size == 1, s"expected one quarantine table, got $quarantines")
    val qrows = wh.read(spark, quarantines.head).collect()
    assert(qrows.length == 2)
    assert(qrows.forall(_.getAs[String]("__reason") == "duplicate (ds, keyword) keys"))
    // no stage residue
    assert(!new java.io.File(whRoot).list().exists(_.startsWith("__stage__")))
  }
}
