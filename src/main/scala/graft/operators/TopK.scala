package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import scala.collection.mutable

/** Distributed top-k operators.
  *
  * The reference's central operator is bounded top-k by distance
  * (reference: rust_lib/src/provider.rs:520-540 — streaming bounded sorted
  * list; src/diskann_index.cpp:597-637 — per-query k results).
  *
  * Scale design: a naive `Window.partitionBy(group).orderBy(dist)` sorts and
  * shuffles EVERY scored row (nq × N at 100 TB — the bottleneck). Instead:
  * phase 1 reduces each input partition to ≤ k rows per group with a bounded
  * heap (map-side combine for top-k), phase 2 resolves the global top-k on
  * the ≤ k·P·groups survivors. Only survivors shuffle.
  */
object TopK {

  /** Global top-k: Spark already executes sort+limit as per-partition
    * TakeOrdered + driver merge — no full sort. Kept for explicitness. */
  def global(df: DataFrame, distCol: String, k: Int, tieBreak: String): DataFrame =
    df.orderBy(col(distCol).asc, col(tieBreak).asc).limit(k)

  /** Per-group top-k (smallest distCol first, tieBreak for determinism),
    * passing through all columns. Output is NOT globally ordered; callers
    * add a final orderBy if they need one.
    *
    * Memory: heaps hold ≤ k rows per group, but the number of DISTINCT
    * groups per partition is unbounded (e.g. every query id reaches every
    * data partition in a batch search) — so buffered rows are capped and
    * the heap map FLUSHES to the output when the cap is hit. Emitting more
    * than k rows per group from phase 1 is sound: phase 2 is the exact
    * reducer; the flush only trades reduction ratio for flat memory.
    */
  def grouped(df: DataFrame, groupCol: String, distCol: String,
              tieBreakCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val gi = schema.fieldIndex(groupCol)
    val di = schema.fieldIndex(distCol)
    val ti = schema.fieldIndex(tieBreakCol)

    // phase-1 ordering must MATCH phase 2's column ordering exactly, or the
    // heap could evict a row the window would have kept: distance must be
    // DoubleType (getDouble) and the tie-break an integral id — a fractional
    // tie-break would be truncated by longValue() and compare differently.
    import org.apache.spark.sql.types._
    require(schema(di).dataType == DoubleType,
      s"distCol $distCol must be DOUBLE, got ${schema(di).dataType.catalogString}")
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(schema(ti).dataType),
      s"tieBreakCol $tieBreakCol must be an integral id column, " +
        s"got ${schema(ti).dataType.catalogString}")
    // `+ 0.0` collapses -0.0 to 0.0: SQL comparison treats them equal and
    // tie-breaks on id, but TotalOrdering sorts -0.0 < 0.0 — the heap
    // could evict the row the window would keep (ip metric emits -0.0 for
    // an exactly-zero dot). NaN stays consistent (greatest on both sides).
    val rowOrd: Ordering[Row] = Ordering.by((r: Row) =>
      (r.getDouble(di) + 0.0, r.getAs[Number](ti).longValue()))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

    val maxBuffered = df.sparkSession.conf
      .get("spark.ann.topkMaxBufferedRows", (1 << 20).toString).toInt

    val reduced = df.mapPartitions { it =>
      new Iterator[Iterator[Row]] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Iterator[Row] = {
          val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
          var buffered = 0
          while (it.hasNext && buffered < maxBuffered) {
            val row = it.next()
            val heap = heaps.getOrElseUpdate(row.getAs[Any](gi),
              mutable.PriorityQueue.empty[Row](rowOrd)) // max-heap: worst on top
            if (heap.size < k) { heap.enqueue(row); buffered += 1 }
            else if (rowOrd.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row) }
          }
          heaps.valuesIterator.flatMap(_.iterator)
        }
      }.flatten
    }(Encoders.row(schema))

    // phase 2: exact top-k over the reduced set (≤ k·P·flushes rows per group).
    val w = Window.partitionBy(groupCol).orderBy(col(distCol).asc, col(tieBreakCol).asc)
    reduced
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group top-k that also returns the 1-based rank as `rankCol`
    * (BIGINT, matching a DuckDB row_number oracle). */
  def groupedWithRank(df: DataFrame, groupCol: String, distCol: String,
                      tieBreakCol: String, k: Int, rankCol: String): DataFrame = {
    val topk = grouped(df, groupCol, distCol, tieBreakCol, k)
    val w = Window.partitionBy(groupCol).orderBy(col(distCol).asc, col(tieBreakCol).asc)
    topk.withColumn(rankCol, row_number().over(w).cast("long"))
  }
}
