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
}
