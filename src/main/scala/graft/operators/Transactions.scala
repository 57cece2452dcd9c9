package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference pipeline 2 — transactions (SURVEY.md §2, §3 entry 2; reference
  * `dags/transaction_data.py`).
  *
  *  - F1 + F2 + X4-X6: equality filter on event name + 3-day BETWEEN window
  *    from the batch date (transaction_data.py:20-21), with P1 renames and
  *    the P3 literal batch-date stamp (:55-64).
  *  - P4-P6 + X8-X9: the conditional positional array unpack — the
  *    reference's single-threaded pandas row loop (:26-47) re-expressed as
  *    declarative when/size/element_at (whole-stage-codegen'd, distributed,
  *    no UDF). Full-length arrays unpack all slots; short arrays take the
  *    fallback branch (position 0 -> transaction_number, 1 -> product_id,
  *    rest NULL — :40-45).
  *  - P2 + X10: nested tagged-union struct slot extraction
  *    (`x.value.int_value`, :55-63).
  *
  * Scale: all narrow transformations — zero shuffles; a 100 TB input is one
  * scan -> project pipeline, fully codegen'd.
  */
object Transactions extends QueryModule {

  /** The P6 fallback arm is modeled on `embeddings` by deterministically
    * truncating every third vector to length 2 (the fixture has no ragged
    * array column; the branch logic is identical).
    */
  private def raggedArr: Column =
    slice(col("embedding"), lit(1),
      when(col("vec_id") % 3 === 0, lit(2)).otherwise(lit(64)))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 equality + F2 date window + P1 rename + P3 batch-date stamp
    "tx_filter_range" -> ((s, d) => {
      val runDate = "2024-01-10"
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .filter(col("ts") >= lit(runDate).cast("timestamp") &&
          col("ts") < date_add(lit(runDate).cast("date"), 3).cast("timestamp"))
        .orderBy(col("event_id"))
        .select(
          col("event_id").as("transaction_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("transaction_datetime"),
          col("user_id"),
          col("value").as("purchase_amount"),
          lit(runDate).as("ext_created_at"))
    }),

    // P4-P6 + X8-X9: conditional positional unpack with short-array fallback
    "tx_array_unpack" -> ((s, d) => {
      val full = 64
      Tables.embeddings(s, d).orderBy(col("vec_id"))
        .withColumn("event_params", raggedArr)
        .select(
          col("vec_id"),
          size(col("event_params")).cast("bigint").as("n_params"),
          when(size(col("event_params")) === full, element_at(col("event_params"), 1))
            .otherwise(lit(null)).as("transaction_id"),
          when(size(col("event_params")) === full, element_at(col("event_params"), 2))
            .otherwise(lit(null)).as("transaction_detail_id"),
          // fallback arms use try_element_at: NULL on out-of-bounds (the
          // reference's ValueError→pass path) instead of ANSI-mode errors
          when(size(col("event_params")) === full, element_at(col("event_params"), 3))
            .otherwise(try_element_at(col("event_params"), lit(1))).as("transaction_number"),
          when(size(col("event_params")) === full, element_at(col("event_params"), 4))
            .otherwise(lit(null)).as("purchase_quantity"),
          when(size(col("event_params")) === full, element_at(col("event_params"), 8))
            .otherwise(try_element_at(col("event_params"), lit(2))).as("product_id"))
    }),

    // P2 + X10: tagged-union struct construction + typed slot extraction
    "tx_struct_slots" -> ((s, d) => {
      val withParam = Tables.events(s, d).orderBy(col("event_id")).withColumn("param",
        struct(
          lit("transaction_id").as("key"),
          struct(
            col("event_type").as("string_value"),
            col("user_id").as("int_value"),
            col("value").as("float_value")).as("value")))
      withParam.select(
        col("event_id"),
        col("param.value.int_value").as("t_int"),
        col("param.value.string_value").as("t_str"),
        col("param.value.float_value").as("t_float"),
        col("param.key").as("t_key"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "tx_filter_range" ->
      """SELECT event_id AS transaction_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS transaction_datetime,
        |  user_id, value AS purchase_amount,
        |  '2024-01-10' AS ext_created_at
        |FROM events
        |WHERE event_type = 'purchase'
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
        |ORDER BY transaction_id""".stripMargin,
    "tx_array_unpack" ->
      """WITH src AS (
        |  SELECT vec_id,
        |    list_slice(embedding, 1, CASE WHEN vec_id % 3 = 0 THEN 2 ELSE 64 END) AS event_params
        |  FROM embeddings)
        |SELECT vec_id, len(event_params) AS n_params,
        |  CASE WHEN len(event_params) = 64 THEN event_params[1] END AS transaction_id,
        |  CASE WHEN len(event_params) = 64 THEN event_params[2] END AS transaction_detail_id,
        |  CASE WHEN len(event_params) = 64 THEN event_params[3] ELSE event_params[1] END AS transaction_number,
        |  CASE WHEN len(event_params) = 64 THEN event_params[4] END AS purchase_quantity,
        |  CASE WHEN len(event_params) = 64 THEN event_params[8] ELSE event_params[2] END AS product_id
        |FROM src ORDER BY vec_id""".stripMargin,
    "tx_struct_slots" ->
      """SELECT event_id, user_id AS t_int, event_type AS t_str, value AS t_float,
        |  'transaction_id' AS t_key
        |FROM events ORDER BY event_id""".stripMargin)
}
