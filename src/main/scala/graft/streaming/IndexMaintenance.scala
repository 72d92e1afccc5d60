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
  * rows, or a DISKANN delta shard) or tombstones ids; exactly-once comes
  * from the streaming checkpoint + idempotent per-batch writes; a periodic
  * Vacuum job compacts. No watermark state is needed — maintenance is
  * stateless per batch.
  */
object IndexMaintenance {

  /** Append-only maintenance: every micro-batch is inserted into the index. */
  def attachAppend(stream: DataFrame, idx: AnnIndex, idCol: String,
                   vecCol: String, checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) idx.insert(batch, idCol, vecCol)
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dels = batch.filter(col(opCol) === "delete").select(col(idCol))
        if (!dels.isEmpty) idx.delete(dels)
        val ins = batch.filter(col(opCol) === "insert")
        if (!ins.isEmpty) idx.insert(ins.select(col(idCol), col(vecCol)), idCol, vecCol)
      }
      .start()
}
