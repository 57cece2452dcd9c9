package graft

import java.nio.file.{Files, Paths}

import graft.sources.JsonlSource
import org.apache.spark.sql.types._

class JsonlSourceSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def writeFixture(): String = {
    val dir = tmpDir("jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """not json at all{{""",
      """{"doc_id": 4, "text": "ok", "lang": "en"}""")
    Files.write(Paths.get(dir, "part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir
  }

  test("readClean keeps well-formed rows with the declared schema") {
    val dir = writeFixture()
    val df = JsonlSource.readClean(spark, dir, schema)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text", "lang"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(rows(0).getString(1) == "hello world")
  }

  test("readCorrupt quarantines malformed lines verbatim") {
    val dir = writeFixture()
    val bad = JsonlSource.readCorrupt(spark, dir, schema).collect()
    assert(bad.map(_.getString(0)).toSeq == Seq("not json at all{{"))
  }
}
