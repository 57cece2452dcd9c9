package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines source — the de-facto interchange format of LLM training-data
  * pipelines (one document per line). Capability extension beyond the
  * reference (which ingests only CSV, SURVEY.md §2 S1), following the same
  * sourcing rules: explicit schema, no inference, malformed input quarantined
  * instead of failing the job.
  *
  * Scale: JSONL splits by line, so a single 100 TB directory parallelizes
  * per-file/per-split like CSV; schema stays fixed so a poisoned shard can't
  * widen types mid-lake. Corrupt rows are kept in `_corrupt_record` for a
  * quarantine sink rather than silently dropped (auditability at scale).
  */
object JsonlSource {

  val corruptCol = "_corrupt_record"

  /** Read with explicit schema; malformed lines land whole in
    * `_corrupt_record` with all data columns null (PERMISSIVE mode).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Well-formed rows only, corrupt column dropped. */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).filter(col(corruptCol).isNull).drop(corruptCol)

  /** The quarantine stream: raw text of every malformed line. Reads the
    * files as plain text and keeps lines `from_json` cannot parse — Spark
    * disallows querying only `_corrupt_record` from the JSON relation
    * (SPARK-21610) unless the whole parsed result is cached, which would be
    * a second full materialization at lake scale; the text scan is a single
    * cheap pass instead.
    */
  def readCorrupt(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.from_json
    val parsed = from_json(
      col("value"),
      schema.add(StructField(corruptCol, StringType)),
      java.util.Map.of("mode", "PERMISSIVE", "columnNameOfCorruptRecord", corruptCol))
    spark.read.text(path)
      .filter(parsed.getField(corruptCol).isNotNull)
      .select(col("value").as(corruptCol))
  }
}
