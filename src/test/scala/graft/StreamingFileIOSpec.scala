package graft

import java.nio.file.{Files, Paths}

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end streaming I/O: file source (JSONL landing dir) → watermarked
  * transform → parquet file sink with checkpoint. The deployment shape of
  * the engine's streaming side: new files dropped into the landing dir are
  * discovered per trigger; the checkpoint makes restarts exactly-once into
  * the fault-tolerant parquet sink.
  */
class StreamingFileIOSpec extends SparkSuiteBase {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("file readStream -> windowed agg -> parquet writeStream accumulates across drops") {
    val landing = tmpDir("landing")
    val sink = tmpDir("sink")
    val ckpt = tmpDir("ckpt")

    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(landing, name), String.join("\n", lines: _*).getBytes("UTF-8"))

    drop("batch0.jsonl", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":10,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:20:00.000Z","user_id":11,"event_type":"click","value":1.0}"""))

    val stream = spark.readStream.schema(eventSchema).json(landing)
    val q = EventStreams.windowedTypeCounts(stream, windowLen = "15 minutes")
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("approx_users"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // Window [00:00,00:15) closes only once the watermark (max ts - 10 min)
      // passes 00:15 — drop a later file to advance it.
      drop("batch1.jsonl", Seq(
        """{"event_id":3,"ts":"2024-01-01T01:00:00.000Z","user_id":10,"event_type":"buy","value":2.0}"""))
      q.processAllAvailable()
      drop("batch2.jsonl", Seq(
        """{"event_id":4,"ts":"2024-01-01T02:00:00.000Z","user_id":12,"event_type":"click","value":1.0}"""))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(sink)
      .select(date_format(col("win_start"), "HH:mm").as("w"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // closed windows: [00:00) click×1, [00:15) click×1; the 01:00/02:00
    // windows may still be open depending on the final watermark.
    assert(out.contains(("00:00", "click", 1L)))
    assert(out.contains(("00:15", "click", 1L)))
  }
}
