package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference pipeline 1 — daily search history (SURVEY.md §2, §3 entry 1;
  * reference `dags/daily_search_history.py`).
  *
  * Semantics re-expressed over the `events` fixture table:
  *  - S1/S3 + X1-X3: load-raw-then-safely-cast two-phase typing. The
  *    reference lands all CSV columns as STRING (daily_search_history.py:44-49)
  *    then applies SAFE_CAST in a second pass (:57-65). Here the raw staging
  *    is modeled by casting typed columns to string, then `try_cast`-ing back
  *    — including a cast that always fails, to pin NULL-on-failure semantics.
  *  - F4 + O1 + O2: "most searched keyword per day" (:74-86). The reference
  *    realizes the grouped argmax across scheduler runs (ORDER BY ... DESC
  *    LIMIT 1 per day, appended daily); the whole-history equivalent is
  *    row_number over a window partitioned by day. The reference's top-1 is
  *    nondeterministic on ties — we add a documented keyword-asc tiebreak.
  *
  * Scale: the window form shuffles once on the (day) key after a partial
  * count aggregation; cardinality after groupBy(day, keyword) is tiny
  * relative to input, so the window sees pre-aggregated data only.
  * True CSV ingestion (header skip, explicit schema) lives in
  * [[graft.sources.CsvSource]] and is exercised by the pipeline tests.
  */
object SearchHistory extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // two-phase typing: raw string staging -> try_cast typed projection
    "sh_raw_typed_load" -> ((s, d) => {
      // ORDER BY is placed on the source key BEFORE the try_cast projection:
      // a global sort's range-sampling pass re-executes its child, so sorting
      // first means the sampler reads only the scan and the (expensive)
      // parsing projection runs once, after the exchange. Output order is
      // identical (event_id survives the string round-trip exactly).
      val raw = Tables.events(s, d).orderBy(col("event_id")).select(
        col("event_id").cast("string").as("event_id_s"),
        col("user_id").cast("string").as("user_id_s"),
        col("event_type").as("search_keyword"),
        col("ts").cast("string").as("created_at"))
      raw.select(
        expr("try_cast(event_id_s AS BIGINT)").as("event_id"),
        expr("try_cast(user_id_s AS BIGINT)").as("user_id"),
        col("search_keyword"),
        expr("try_cast(search_keyword AS BIGINT)").as("bad_num"),
        date_format(expr("try_cast(substring(created_at, 1, 10) AS DATE)"), "yyyy-MM-dd").as("created_date"))
    }),

    // per-day most frequent keyword (window form of the reference argmax)
    "sh_daily_top1" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("created_date"),
          col("event_type").as("search_keyword"))
        .agg(count(lit(1)).as("search_count"))
      val w = Window.partitionBy(col("created_date"))
        .orderBy(desc("search_count"), col("search_keyword"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy(col("created_date"))
    }),

    // faithful per-batch form: filter one logical date, ORDER BY DESC LIMIT 1
    "sh_top1_batch" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("created_date", date_format(col("ts"), "yyyy-MM-dd"))
        .filter(col("created_date") === lit("2024-01-05"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("created_date"))
        .orderBy(desc("value"), col("event_id"))
        .limit(1)
    }))

  override def oracleSql: Map[String, String] = Map(
    "sh_raw_typed_load" ->
      """WITH raw AS (
        |  SELECT CAST(event_id AS VARCHAR) AS event_id_s,
        |         CAST(user_id AS VARCHAR) AS user_id_s,
        |         event_type AS search_keyword,
        |         CAST(ts AS VARCHAR) AS created_at
        |  FROM events)
        |SELECT TRY_CAST(event_id_s AS BIGINT) AS event_id,
        |       TRY_CAST(user_id_s AS BIGINT) AS user_id,
        |       search_keyword,
        |       TRY_CAST(search_keyword AS BIGINT) AS bad_num,
        |       strftime(TRY_CAST(substr(created_at, 1, 10) AS DATE), '%Y-%m-%d') AS created_date
        |FROM raw ORDER BY event_id""".stripMargin,
    "sh_daily_top1" ->
      """SELECT created_date, search_keyword, search_count FROM (
        |  SELECT strftime(ts, '%Y-%m-%d') AS created_date, event_type AS search_keyword,
        |         COUNT(*) AS search_count,
        |         ROW_NUMBER() OVER (PARTITION BY strftime(ts, '%Y-%m-%d')
        |           ORDER BY COUNT(*) DESC, event_type) AS rn
        |  FROM events GROUP BY 1, 2) t
        |WHERE rn = 1 ORDER BY created_date""".stripMargin,
    "sh_top1_batch" ->
      """SELECT event_id, user_id, event_type, value, strftime(ts, '%Y-%m-%d') AS created_date
        |FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-05'
        |ORDER BY value DESC, event_id LIMIT 1""".stripMargin)
}
