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
}
