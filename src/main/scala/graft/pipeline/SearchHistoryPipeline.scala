package graft.pipeline

import graft.sources.CsvSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference pipeline 1: `dailiy_search_history` (sic — reference DAG id,
  * `dags/daily_search_history.py:31`), full task chain re-expressed as
  * DataFrame stages over a [[Warehouse]].
  *
  * gcs_to_bq (:37-53)            -> stage "load_raw": date-named CSV, header
  *                                  skipped, explicit 4×STRING schema,
  *                                  truncate-write to the raw table.
  * collect_n_update_data (:55-70)-> stage "typed_append": SAFE_CAST pass
  *                                  (try_cast null-on-failure), append.
  * most_searched_keywords (:72-91)-> stage "daily_top1": filter to the batch
  *                                  date via LEFT(created_at,10), ORDER BY
  *                                  count DESC LIMIT 1, append one row/day.
  *                                  Deviation from reference: deterministic
  *                                  tiebreak on search_keyword ASC (the
  *                                  reference's bare LIMIT 1 is
  *                                  nondeterministic on ties, SURVEY.md §2.6).
  */
object SearchHistoryPipeline {

  /** CSV load schema (`dags/daily_search_history.py:44-49`): everything
    * lands as STRING; typing happens in the second pass.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("search_keyword", StringType),
    StructField("search_result_count", StringType),
    StructField("created_at", StringType)))

  val rawTable = "daily_search_keyword_history"
  val typedTable = "daily_search_results"
  val reportTable = "most_search_keyword_history"

  def apply(inputPrefix: String): Pipeline = Pipeline(
    "daily_search_history",
    Seq(
      Stage("load_raw", (spark, wh, ctx) => {
        val df = CsvSource.read(spark,
          CsvSource.dailyPath(inputPrefix, ctx.dsNodash), rawSchema)
        wh.truncateWrite(df, rawTable)
      }),
      Stage("typed_append", (spark, wh, ctx) => {
        val typed = wh.read(spark, rawTable).select(
          expr("try_cast(user_id AS BIGINT)").as("user_id"),
          col("search_keyword"),
          expr("try_cast(search_result_count AS BIGINT)").as("search_result_count"),
          col("created_at"))
        wh.appendWrite(typed, typedTable)
      }),
      Stage("daily_top1", (spark, wh, ctx) => {
        // try_cast, not to_date: Spark 4 runs ANSI mode where to_date throws
        // on malformed input; the reference's SAFE_CAST is null-on-failure
        // (daily_search_history.py:79,83)
        val top1 = wh.read(spark, typedTable)
          .withColumn("created_date",
            expr("try_cast(substring(created_at, 1, 10) AS DATE)"))
          .filter(col("created_date") === lit(ctx.ds))
          .orderBy(desc("search_result_count"), col("search_keyword"))
          .limit(1)
        wh.appendWrite(top1, reportTable)
      })))
}
