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
    */
  def grouped(df: DataFrame, groupCol: String, distCol: String,
              tieBreakCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val gi = schema.fieldIndex(groupCol)
    val di = schema.fieldIndex(distCol)
    val ti = schema.fieldIndex(tieBreakCol)

    // (distance, tieBreak) lexicographic; tie-break column must be numeric
    // (an id). Heap keeps the k smallest by evicting the largest.
    require(schema(ti).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tieBreakCol $tieBreakCol must be numeric")
    val rowOrd: Ordering[Row] = Ordering.by((r: Row) =>
      (r.getDouble(di), r.getAs[Number](ti).longValue()))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

    val reduced = df.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val heap = heaps.getOrElseUpdate(row.getAs[Any](gi),
          mutable.PriorityQueue.empty[Row](rowOrd)) // max-heap: worst on top
        if (heap.size < k) heap.enqueue(row)
        else if (rowOrd.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))

    // phase 2: exact top-k over the reduced set (≤ k·P rows per group).
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
