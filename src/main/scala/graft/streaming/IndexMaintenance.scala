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
  * rows, or a DISKANN delta shard — or, with
  * `spark.ann.onlineInsertMaxRows` set, an IN-PLACE extension of live
  * shard graphs that keeps the shard set flat, see
  * AnnIndex.writeOnlineInsert) or tombstones ids; a periodic Vacuum job
  * compacts. No watermark state is needed — maintenance is stateless per
  * batch.
  *
  * Replay safety: micro-batch ids are monotonic per checkpoint, and the
  * index records the last applied id in meta.json atomically with the
  * count it publishes — a batch re-delivered after a failure (or a
  * restarted query re-running its last epoch) is detected and skipped
  * instead of double-inserting. A crash BEFORE that publish leaves graph
  * engines with only unmanifested (invisible) shard dirs, so the replay
  * is clean; FLAT/IVF appends keep the reference's WAL-style redo window
  * there (src/diskann_index.cpp:536-546).
  *
  * Unbounded streams accumulate delta shards, and every live shard costs
  * one beam search per query — `autoCompact` caps that: when the live
  * shard count exceeds the cap after a batch, small shards are merged
  * in-line (`AnnIndex.compactShards`, a manifest-atomic copy-on-write
  * step), so steady-state search cost tracks data volume, not stream age.
  */
object IndexMaintenance {

  /** Apply one append micro-batch exactly once (skips replayed ids).
    *
    * `streamId` scopes the replay watermark: Spark batch ids are monotonic
    * only per checkpoint, so each stream feeding an index (or each fresh
    * checkpoint location) must use a distinct id or its batches would be
    * masked by another stream's watermark. */
  def applyAppendBatch(idx: AnnIndex, batch: DataFrame, batchId: Long,
                       idCol: String, vecCol: String,
                       streamId: String = "default"): Unit = {
    if (batchId <= idx.lastAppliedBatch(streamId)) return // replay
    if (batch.isEmpty) idx.recordAppliedBatch(batchId, streamId)
    else idx.insert(batch, idCol, vecCol, batch = Some((streamId, batchId)))
  }

  /** Apply one CDC micro-batch exactly once through `AnnIndex.applyCdc`:
    * tombstones land at the pre-batch epoch, inserts at the next epoch (a
    * delete+insert of one id in the same batch is therefore a visible
    * update, not a lost row), and ONE meta write publishes both counts and
    * the watermark — a crash mid-batch replays the whole batch with only
    * inert duplicate tombstone rows as residue. */
  def applyCdcBatch(idx: AnnIndex, batch: DataFrame, batchId: Long,
                    idCol: String, vecCol: String, opCol: String,
                    streamId: String = "default"): Unit = {
    if (batchId <= idx.lastAppliedBatch(streamId)) return // replay
    val dels = batch.filter(col(opCol) === "delete").select(col(idCol))
    val ins = batch.filter(col(opCol) === "insert").select(col(idCol), col(vecCol))
    if (dels.isEmpty && ins.isEmpty) idx.recordAppliedBatch(batchId, streamId)
    else idx.applyCdc(dels, ins, idCol, vecCol, batch = Some((streamId, batchId)))
  }

  /** Compact in-line when the live shard count exceeds the cap. The
    * trigger reads the count from metadata (free); the compaction itself
    * is a maintenance job over the small shards only. Runs AFTER the
    * batch commit, so a crash mid-compaction never loses batch data —
    * the manifest keeps readers on the pre-compaction index until the
    * swap publishes. */
  private def maybeCompact(idx: AnnIndex, cap: Option[Int]): Unit =
    cap.foreach { n =>
      if (idx.isGraphEngine && idx.meta.param("shards", 1) > n)
        idx.compactShards()
    }

  /** Append-only maintenance: every micro-batch is inserted into the
    * index. `autoCompact = Some(n)` merges small delta shards whenever
    * the live shard count passes `n`. */
  def attachAppend(stream: DataFrame, idx: AnnIndex, idCol: String,
                   vecCol: String, checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow(),
                   streamId: String = "default",
                   autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAppendBatch(idx, batch, batchId, idCol, vecCol, streamId)
        maybeCompact(idx, autoCompact)
      }
      .start()

  /** CDC-style maintenance: rows carry an `op` column ("insert"/"delete");
    * deletes tombstone, inserts append (reference Delete hook,
    * src/diskann_index.cpp:363-385). `autoCompact` as in `attachAppend`;
    * compaction also drops the compacted shards' dead rows and deflates
    * the tombstone overfetch, so a delete-heavy stream self-maintains. */
  def attachCdc(stream: DataFrame, idx: AnnIndex, idCol: String,
                vecCol: String, opCol: String, checkpoint: String,
                trigger: Trigger = Trigger.AvailableNow(),
                streamId: String = "default",
                autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCdcBatch(idx, batch, batchId, idCol, vecCol, opCol, streamId)
        maybeCompact(idx, autoCompact)
      }
      .start()
}
