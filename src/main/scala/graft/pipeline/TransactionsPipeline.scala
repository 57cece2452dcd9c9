package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference pipeline 2: `transactions_table_dag` (`dags/transaction_data.py`),
  * re-expressed as two DataFrame stages — notably WITHOUT the reference's
  * driver-side materialization cliff (`.to_dataframe()` pulls the whole
  * batch into one pandas process, transaction_data.py:22; here everything
  * stays distributed and narrow — zero shuffles).
  *
  * storing_preprocessed_data (:88-92 / pull_from_bq :19-53) -> stage
  * "unpack_stage": filter event_name + 3-day window (:20-21), conditional
  * positional unpack of `event_params` (:26-47) as declarative
  * when/size/element_at, drop the array (:48), truncate-write staging.
  *
  * storing_final_table (:94-100 / sql_store :55-66) -> stage "final_append":
  * nested tagged-union slot extraction (`x.value.int_value`), batch-date
  * stamp `ext_created_at` (:64), date window re-applied (:66), append.
  *
  * Null-semantics deviation (SURVEY.md §7.4): the reference's pandas loop
  * leaves `''` in columns when the try block threw before assignment and
  * np.NaN for short arrays; our columns are typed structs, so both become
  * NULL. Pinned in TransactionsPipelineSpec.
  */
object TransactionsPipeline {

  val sourceTable = "unified_events"
  val stagingTable = "transactions_raw"
  val finalTable = "transactions_table"

  /** Positions 0-7 at full length (transaction_data.py:28-36). */
  private val fullSlots = Seq(
    "transaction_id", "transaction_detail_id", "transaction_number",
    "purchase_quantity", "purchase_amount", "purchase_payment_method",
    "purchase_source", "product_id")

  /** The P6 conditional unpack: full-length arrays populate all 8 slots;
    * shorter non-empty arrays populate transaction_number (pos 0) and
    * product_id (pos 1) only (:40-45); empty/null arrays leave all null
    * (the ValueError→pass path, :46-47).
    */
  def unpack(df: DataFrame, fullLen: Int = 21): DataFrame = {
    val n = size(col("event_params"))
    def slot(name: String, fullPos: Int, shortPos: Option[Int]): Column = {
      val full = element_at(col("event_params"), fullPos + 1)
      shortPos match {
        case Some(p) =>
          when(n === fullLen, full)
            .when(n >= p + 1, element_at(col("event_params"), p + 1))
            .otherwise(lit(null))
            .as(name)
        case None =>
          when(n === fullLen, full).otherwise(lit(null)).as(name)
      }
    }
    val slots = fullSlots.zipWithIndex.map {
      case ("transaction_number", i) => slot("transaction_number", i, Some(0))
      case ("product_id", i)         => slot("product_id", i, Some(1))
      case (name, i)                 => slot(name, i, None)
    }
    df.select(col("*") +: slots: _*).drop("event_params")
  }

  /** sql_store's typed projection (:55-64). */
  def finalProjection(df: DataFrame, ds: String): DataFrame =
    df.select(
      col("transaction_id.value.int_value").as("transaction_id"),
      col("transaction_detail_id.value.int_value").as("transaction_detail_id"),
      col("transaction_number.value.string_value").as("transaction_number"),
      col("event_datetime").as("transaction_datetime"),
      col("purchase_quantity.value.int_value").as("purchase_quantity"),
      col("purchase_amount.value.float_value").as("purchase_amount"),
      col("purchase_payment_method.value.string_value").as("purchase_payment_method"),
      col("purchase_source.value.string_value").as("purchase_source"),
      col("product_id.value.int_value").as("product_id"),
      col("user_id"), col("state"), col("city"), col("created_at"),
      lit(ds).as("ext_created_at"))

  def apply(fullLen: Int = 21): Pipeline = Pipeline(
    "transactions_table",
    Seq(
      Stage("unpack_stage", (spark, wh, ctx) => {
        val src = wh.read(spark, sourceTable)
          .filter(col("event_name") === "purchase_item")
          .filter(to_date(col("event_datetime"))
            .between(lit(ctx.ds), date_add(lit(ctx.ds).cast("date"), 2)))
        wh.truncateWrite(unpack(src, fullLen), stagingTable)
      }),
      Stage("final_append", (spark, wh, ctx) => {
        val staged = wh.read(spark, stagingTable)
          .filter(to_date(col("event_datetime"))
            .between(lit(ctx.ds), date_add(lit(ctx.ds).cast("date"), 2)))
        wh.appendWrite(finalProjection(staged, ctx.ds), finalTable)
      })))
}
