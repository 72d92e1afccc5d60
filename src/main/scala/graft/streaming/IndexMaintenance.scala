package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.AnnIndex

/** Structured-Streaming incremental index maintenance.
  *
  * The reference maintains indexes via per-chunk Append/Delete hooks driven
  * by table DML + WAL persistence (src/diskann_index.cpp:316-385,536-546).
  * The Spark-native equivalent (SURVEY §2.8): a streaming source feeds
  * `foreachBatch`, each micro-batch appends an index segment (FLAT/IVF
  * rows, or a DISKANN delta shard) or tombstones ids; a periodic Vacuum
  * job compacts. No watermark state is needed — maintenance is stateless
  * per batch.
  *
  * Replay safety: micro-batch ids are monotonic per checkpoint, and the
  * index records the last applied id in meta.json atomically with the
  * count it publishes — a batch re-delivered after a failure (or a
  * restarted query re-running its last epoch) is detected and skipped
  * instead of double-inserting. The remaining redo window is a crash
  * between the parquet append and the meta write, the same redo semantics
  * as the reference's WAL (src/diskann_index.cpp:536-546).
  */
object IndexMaintenance {

  /** Apply one append micro-batch exactly once (skips replayed ids). */
  def applyAppendBatch(idx: AnnIndex, batch: DataFrame, batchId: Long,
                       idCol: String, vecCol: String): Unit = {
    if (batchId <= idx.lastAppliedBatch) return // replay: already applied
    if (batch.isEmpty) idx.recordAppliedBatch(batchId)
    else idx.insert(batch, idCol, vecCol, batchId = Some(batchId))
  }

  /** Apply one CDC micro-batch exactly once: tombstone deletes, then
    * insert appends; the batch id is recorded by the LAST write so a crash
    * mid-batch replays the whole batch (deletes are tombstone-idempotent
    * in effect; numDeleted is corrected by the replay skip afterwards). */
  def applyCdcBatch(idx: AnnIndex, batch: DataFrame, batchId: Long,
                    idCol: String, vecCol: String, opCol: String): Unit = {
    if (batchId <= idx.lastAppliedBatch) return // replay: already applied
    val dels = batch.filter(col(opCol) === "delete").select(col(idCol))
    val ins = batch.filter(col(opCol) === "insert")
    val hasIns = !ins.isEmpty
    if (!dels.isEmpty) idx.delete(dels, batchId = if (hasIns) None else Some(batchId))
    if (hasIns) idx.insert(ins.select(col(idCol), col(vecCol)), idCol, vecCol,
      batchId = Some(batchId))
    if (dels.isEmpty && !hasIns) idx.recordAppliedBatch(batchId)
  }

  /** Append-only maintenance: every micro-batch is inserted into the index. */
  def attachAppend(stream: DataFrame, idx: AnnIndex, idCol: String,
                   vecCol: String, checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAppendBatch(idx, batch, batchId, idCol, vecCol)
      }
      .start()

  /** CDC-style maintenance: rows carry an `op` column ("insert"/"delete");
    * deletes tombstone, inserts append (reference Delete hook,
    * src/diskann_index.cpp:363-385). */
  def attachCdc(stream: DataFrame, idx: AnnIndex, idCol: String,
                vecCol: String, opCol: String, checkpoint: String,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCdcBatch(idx, batch, batchId, idCol, vecCol, opCol)
      }
      .start()
}
