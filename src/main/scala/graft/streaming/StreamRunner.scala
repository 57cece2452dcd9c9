package graft.streaming

import graft.pipeline.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Deployment wrapper for the streaming side — the micro-batch analog of
  * [[graft.pipeline.BatchRunner]].
  *
  * The main production shape is [[upsertToWarehouse]]: stream → foreachBatch
  * → `Warehouse.partitionedUpsertWrite`. It streams the reference's cadence
  * (one complete file set per logical day landing in a directory,
  * `dags/daily_search_history.py:40`): each micro-batch dynamically
  * overwrites exactly the date partitions it touches, so
  *  - replays after a checkpoint recovery are idempotent (same batch →
  *    same partitions → same contents), fixing the reference's
  *    double-append hazard (SURVEY.md §2.1) in the streaming world;
  *  - downstream batch readers see a date-partitioned lake with file-level
  *    pruning, identical to the batch pipelines' output layout.
  *
  * Correctness constraint: a date's rows must be complete within one
  * trigger (dates are closed when their files land — the reference's daily
  * drop — or `maxFilesPerTrigger` is left unset so AvailableNow takes whole
  * file sets). If a date could straddle triggers, use the built-in
  * exactly-once file sink in append mode instead (StreamingFileIOSpec).
  *
  * Scale: foreachBatch writes are ordinary distributed parquet jobs; state
  * in upstream operators stays watermark-bounded (see EventStreams). One
  * streaming query per sink table; checkpoint dir is the unit of recovery.
  */
object StreamRunner {

  /** Start `transformed` (a streaming DataFrame carrying `partitionCol`)
    * upserting into `wh`/`table` per micro-batch.
    */
  def upsertToWarehouse(
      transformed: DataFrame,
      wh: Warehouse,
      table: String,
      partitionCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    transformed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) wh.partitionedUpsertWrite(batch, table, partitionCol)
      }
      .start()

  /** The streaming form of [[graft.pipeline.Warehouse.writeAuditPublish]]:
    * every micro-batch is STAGED (quarantine table invisible to readers),
    * the caller's audit runs on a READBACK of the staged bytes (what
    * readers would see — catches writer-side truncation/schema drift),
    * and only a passing batch publishes, as a date-partition upsert (the
    * idempotent-replay publish [[upsertToWarehouse]] uses). A failing
    * batch never touches the live table: its rows are kept in a
    * per-batch-id quarantine table with the failure reason attached, so
    * forensics and replay-after-fix are table reads, not log archaeology.
    * The q_expectations_audit rule set is the natural audit body.
    *
    * At 100 TB this is the per-batch publish gate a streaming lake runs:
    * the stage write is the batch-sized cost already being paid, the
    * audit is one scan of the staged batch, and the gate keeps a bad
    * upstream drop (schema drift, null flood, duplicate replay) from ever
    * reaching readers — checkpoint recovery semantics are unchanged
    * because the gate lives inside foreachBatch's exactly-once contract.
    */
  def auditedUpsertToWarehouse(
      transformed: DataFrame,
      wh: Warehouse,
      table: String,
      partitionCol: String,
      audit: DataFrame => Option[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    transformed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val stage = s"__stage__${table}_b$batchId"
          wh.truncateWrite(batch, stage)
          val staged = wh.read(batch.sparkSession, stage)
          audit(staged) match {
            case None =>
              wh.partitionedUpsertWrite(staged, table, partitionCol)
              wh.dropTable(stage)
            case Some(reason) =>
              wh.truncateWrite(
                staged
                  .withColumn("__batch_id",
                    org.apache.spark.sql.functions.lit(batchId))
                  .withColumn("__reason",
                    org.apache.spark.sql.functions.lit(reason)),
                s"__quarantine__${table}_b$batchId")
              wh.dropTable(stage)
          }
        }
      }
      .start()
}
