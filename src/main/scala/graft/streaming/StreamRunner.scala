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
        gatedPublish(batch, batchId, wh, table, Seq(partitionCol), audit)
      }
      .start()

  /** The per-micro-batch stage → audit-readback → publish/quarantine body
    * shared by every audited streaming sink (factored so new sinks reuse
    * the gate rather than re-implementing its crash-safety contract).
    */
  private def gatedPublish(
      batch: DataFrame,
      batchId: Long,
      wh: Warehouse,
      table: String,
      partitionCols: Seq[String],
      audit: DataFrame => Option[String]): Unit =
    if (!batch.isEmpty) {
      val stage = s"__stage__${table}_b$batchId"
      wh.truncateWrite(batch, stage)
      val staged = wh.read(batch.sparkSession, stage)
      audit(staged) match {
        case None =>
          wh.partitionedUpsertWrite(staged, table, partitionCols)
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

  /** Streaming IVF index ingest — the foreachBatch twin of
    * `sim_ivf_ingest`: each micro-batch of (vec_id, embedding) rows is
    * assigned to the FROZEN centroid set via
    * [[graft.operators.Similarity.cellAssignExpr]] (a narrow
    * literal-centroid projection: |K| codegen'd cosines + argmin per row —
    * no join, no window, no shuffle, so the whole transform is legal on
    * the streaming side), then published through the same staged-readback
    * audit gate as every other streaming sink, as a dynamic partition
    * upsert keyed (cell, ingest_batch):
    *  - `cell` first ⇒ the lake is cell-partitioned and a probe reading
    *    one cell prunes files at the top directory level (the
    *    sim_topk_ivf serving layout);
    *  - `ingest_batch` second ⇒ a checkpoint replay rewrites exactly its
    *    own leaf partitions — idempotent recovery without clobbering
    *    other batches' rows in the same cell.
    * At 100 TB the ingest cost is one narrow pass over each batch plus a
    * batch-sized partitioned write; the index grows with ingest and the
    * retrain signal stays with sim_ivf_drift.
    */
  def ivfIngestToWarehouse(
      embStream: DataFrame,
      centroids: Seq[(Long, Seq[Float])],
      wh: Warehouse,
      table: String,
      audit: DataFrame => Option[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    val (cellCol, csCol) =
      graft.operators.Similarity.cellAssignExpr(embStream.sparkSession, centroids)
    val assigned = embStream.select(col("vec_id"), col("embedding"), cellCol, csCol)
    assigned.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gatedPublish(batch.withColumn("ingest_batch", lit(batchId)),
          batchId, wh, table, Seq("cell", "ingest_batch"), audit)
      }
      .start()
  }
}
