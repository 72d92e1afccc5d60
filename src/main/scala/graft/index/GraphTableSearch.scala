package graft.index

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.TaskContext

import graft.operators.TopK

/** Fully distributed table-input search over a sharded graph index — the
  * scale path for the reference's flagship `ann_search_table`
  * (reference: src/ann_search.cpp:397-691) when the query relation is too
  * large to collect. The reference streams chunks through ONE in-memory
  * index; here BOTH sides stay distributed end-to-end:
  *
  *   - every query row is replicated to the shard ids it probes — ALL
  *     live shards by default (walk-all, the exact-compat baseline), or
  *     only its routed top-s when shard routing is on (`spark.ann
  *     .shardProbes` + full summary coverage; the row-local routing UDF
  *     ranks shard centroids per query) — a cheap `explode` with no
  *     driver materialization;
  *   - graph rows and replicated queries cogroup on the shard id, so each
  *     task sees one whole decoded shard plus a STREAMED iterator of its
  *     query share — per-task memory is one shard (the existing sizing
  *     contract) + one query row;
  *   - per-shard top-l candidates merge through the same bounded-heap
  *     grouped top-k as the broadcast path.
  *
  * Cost model vs the collect path: the cogroup shuffles the graph dataset
  * once per call and the query relation `numShards` times. For a bounded
  * query batch the broadcast path is strictly cheaper (zero shuffle against
  * a pinned index) — which is why [[graft.operators.AnnSearch.searchTable]]
  * keeps it for small batches and switches here above the collect bound.
  * Results are value-identical: same kernels, same beam widths, same
  * deterministic merge.
  *
  * Repeat-call cost (`graphPrePartitioned`): a standing workload — e.g. a
  * corpus-scale near-dup loop issuing many table searches against one
  * index — should not re-shuffle the index every pass. When the graph
  * dataset is PINNED (persisted post-`repartition(P, col("shard"))`, see
  * `AnnIndex.persist`), its cached layout already co-locates whole shards,
  * so instead of a cogroup (whose grouping key is a fresh serialized
  * column Catalyst cannot equate with `shard`, forcing an Exchange of the
  * graph side per call) we hash-route ONLY the query relation to the same
  * `HashPartitioning(shard, P)` layout and zip the two partitionings —
  * the reference's "index stays resident" semantics
  * (src/ann_search.cpp:397-691: one in-memory index, queries stream).
  */
object GraphTableSearch {

  /** Run the distributed table-input search.
    *
    * @param graphDf  column-pruned graph rows; `shard` must be field 0,
    *                 `label` field 1 (dense 0..n-1 per shard — per-label
    *                 epoch resolution indexes by it, Vamana.segArray), and
    *                 `seg` the LAST field (both engines' layouts comply)
    * @param queries  exactly (__qid, __qvec float[]); __qid of any type
    * @param shardIds live shard ids (manifest) to replicate queries onto
    * @param k        merged per-query result count; k <= 0 = NO top-k cut
    *                 (range semantics: every hit the per-shard `search`
    *                 emits survives the merge — the caller bounds the
    *                 emission, e.g. by a radius filter)
    * @param cacheKey executor shard-cache key prefix (None = no caching)
    * @param decode   whole-shard rows → engine shard object (cached)
    * @param search   (shard, query) → per-shard candidates
    *                 (id, distance, label) — the label resolves the hit's
    *                 per-row insert epoch (online-rewritten shards mix
    *                 epochs, see Vamana.segArray)
    * @param graphPrePartitioned graphDf is (a narrow projection of) a
    *                 dataset hash-partitioned by `col("shard")` — e.g. the
    *                 pinned index dataset. Routes only the queries; the
    *                 graph side is read in place, shuffle-free.
    * @param route    per-query shard routing (ShardSummaries): maps the
    *                 `__qvec` column to the ARRAY of shard ids this query
    *                 probes, replacing the walk-all explode over the full
    *                 manifest — THE lever that stops per-query cost growing
    *                 linearly with shard count. None = every live shard
    *                 (exact-compat walk-all).
    * @return (__qid, id, _distance, seg) — `seg` kept for tombstone masking
    */
  def run(spark: SparkSession, graphDf: DataFrame, queries: DataFrame,
          shardIds: Seq[Int], k: Int, cacheKey: Option[String],
          decode: (Int, IndexedSeq[Row]) => AnyRef,
          search: (AnyRef, Array[Float]) => Iterator[(Long, Double, Int)],
          graphPrePartitioned: Boolean = false,
          spill: Option[GraphShardCache.SpillCodec] = None,
          route: Option[Column => Column] = None): DataFrame = {
    if (graphPrePartitioned)
      return runZip(spark, graphDf, queries, shardIds, k, cacheKey, decode,
        search, spill, route)
    val qidField = queries.schema.fields(0).copy(name = "__qid")
    val out = StructType(Seq(qidField,
      StructField("id", LongType, nullable = false),
      StructField("_distance", DoubleType, nullable = false),
      StructField("seg", LongType, nullable = false)))
    val segIdx = graphDf.schema.length - 1

    // queries × probed shards: with no router this is the walk-all explode
    // (every query walks every shard — graph search's irreducible work
    // absent summaries); with one, each query fans out to only its top-s
    // shards and the cogroup below simply sees fewer replicated rows
    val qx = queries.select(col(queries.columns(0)).as("__qid"),
        col(queries.columns(1)).as("__qvec"))
      .withColumn("__shard", explode(
        route.map(f => f(col("__qvec"))).getOrElse(typedLit(shardIds.toArray))))

    val gk = graphDf.groupByKey(_.getInt(0))(Encoders.scalaInt)
    val qk = qx.groupByKey(_.getInt(2))(Encoders.scalaInt)

    val perShard = gk.cogroup(qk) { (shardId, gRows, qRows) =>
      if (!qRows.hasNext) Iterator.empty
      else {
        // graph side buffers (one whole shard — the sizing contract);
        // query side STREAMS: never materialized
        val shardRows = gRows.toIndexedSeq
        if (shardRows.isEmpty) Iterator.empty
        else {
          val sh = cacheKey match {
            case Some(ck) => GraphShardCache.getOrBuild(s"$ck#$shardId", spill)(
              decode(shardId, shardRows))
            case None => decode(shardId, shardRows)
          }
          val segs = Vamana.segArray(shardRows, segIdx)
          qRows.flatMap { qr =>
            val qid = qr.get(0)
            val q = qr.getSeq[Float](1).toArray
            search(sh, q).map { case (id, d, label) => Row(qid, id, d, segs(label)) }
          }
        }
      }
    }(Encoders.row(out))

    if (k <= 0) perShard.toDF()
    else TopK.grouped(perShard.toDF(), "__qid", "_distance", "id", k)
  }

  /** Shuffle-free-on-the-graph-side variant for a pre-partitioned (pinned)
    * graph dataset: queries are hash-routed by shard id to the SAME
    * `HashPartitioning(shard, P)` the pin laid down (identical murmur3
    * routing for equal int values), then the two equal partitionings are
    * zipped — each task pairs its cached whole shards with exactly the
    * query rows replicated onto them. Per call, the only exchanges are the
    * query routing and the bounded top-k merge; the graph moves zero bytes.
    *
    * Memory contract per task: the partition's whole shards (the same
    * bound `searchBatch`'s mapPartitions path already carries — one shard
    * per task in the common case, rarely 2+ on hash collisions) plus one
    * streamed query row.
    *
    * Misalignment is loud, never silent: a query whose shard has no graph
    * rows in its zipped partition throws (same-hash routing makes that
    * impossible unless the caller's pre-partitioning claim was false), and
    * a shard split across partitions fails decode's label-completeness
    * check. */
  private def runZip(spark: SparkSession, graphDf: DataFrame, queries: DataFrame,
                     shardIds: Seq[Int], k: Int, cacheKey: Option[String],
                     decode: (Int, IndexedSeq[Row]) => AnyRef,
                     search: (AnyRef, Array[Float]) => Iterator[(Long, Double, Int)],
                     spill: Option[GraphShardCache.SpillCodec],
                     route: Option[Column => Column] = None): DataFrame = {
    val qidField = queries.schema.fields(0).copy(name = "__qid")
    val out = StructType(Seq(qidField,
      StructField("id", LongType, nullable = false),
      StructField("_distance", DoubleType, nullable = false),
      StructField("seg", LongType, nullable = false)))
    val segIdx = graphDf.schema.length - 1

    val gRdd = graphDf.rdd
    val p = gRdd.getNumPartitions
    val qx = queries.select(col(queries.columns(0)).as("__qid"),
        col(queries.columns(1)).as("__qvec"))
      .withColumn("__shard", explode(
        route.map(f => f(col("__qvec"))).getOrElse(typedLit(shardIds.toArray))))
      .repartition(p, col("__shard"))

    val shardSet = shardIds.toSet
    val resRdd = gRdd.zipPartitions(qx.rdd) { (gIt, qIt) =>
      if (!qIt.hasNext) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        // the layout key embeds the graph's PARTITION COUNT as well as the
        // partition id: a recorded layout is only meaningful under the
        // exact HashPartitioning(shard, P) that produced it, so if the pin
        // layout ever becomes conf-dependent, a differently-partitioned
        // repeat call structurally misses the stale entry (full-scan path)
        // instead of trusting a mapping recorded under another P
        val layoutKey = cacheKey.map(ck => s"$ck#zipLayout#$p#$pid")
        // ---- repeat-call fast path ----
        // If a prior call already full-scanned this partition (layout
        // recorded) and every one of its shards is still decodable from
        // the executor cache (memory or the disk tier), serve the queries
        // WITHOUT consuming the graph iterator at all: the cached columnar
        // partition is never even decoded, so a repeat call costs
        // O(queries + per-shard beam work), not O(partition rows). The
        // layout key embeds the index meta version (via cacheKey), so any
        // index write invalidates it. A partially-evicted cache just falls
        // back to the full scan below — never a wrong answer.
        val bySid: Map[Int, (AnyRef, Array[Long])] = cacheKey.flatMap { ck =>
          GraphShardCache.getLayout(layoutKey.get).flatMap { layout =>
            val hits = layout.flatMap { case (sid, segs) =>
              GraphShardCache.peek(s"$ck#$sid", spill).map(sh => sid -> (sh, segs))
            }
            if (hits.length == layout.length) {
              GraphShardCache.zipFastPathHits.incrementAndGet()
              Some(hits.toMap)
            } else None
          }
        }.getOrElse {
          // ---- full path (first call, or after eviction) ----
          val grouped = new scala.collection.mutable.LinkedHashMap[
            Int, scala.collection.mutable.ArrayBuffer[Row]]()
          gIt.foreach { r =>
            grouped.getOrElseUpdate(r.getInt(0),
              new scala.collection.mutable.ArrayBuffer[Row]) += r
          }
          // decode every QUERIED shard of this partition eagerly (each one
          // would be decoded by its first query anyway — the query relation
          // replicates every query to every live shard), then record the
          // layout so the next call can take the fast path
          val served = grouped.iterator
            .filter { case (sid, _) => shardSet.contains(sid) }
            .map { case (sid, rows) =>
              val s = cacheKey match {
                case Some(ck) => GraphShardCache.getOrBuild(s"$ck#$sid", spill)(
                  decode(sid, rows.toIndexedSeq))
                case None => decode(sid, rows.toIndexedSeq)
              }
              sid -> (s, Vamana.segArray(rows, segIdx))
            }.toMap
          layoutKey.foreach { lk =>
            GraphShardCache.putLayout(lk,
              served.iterator.map { case (sid, (_, segs)) => (sid, segs) }.toArray)
          }
          served
        }
        qIt.flatMap { qr =>
          val shardId = qr.getInt(2)
          val (sh, segs) = bySid.getOrElse(shardId, throw new IllegalStateException(
            s"graph shard $shardId missing from its hash partition — the " +
              "graph dataset is not partitioned by col(\"shard\") as the " +
              "pre-partitioned contract requires"))
          val qid = qr.get(0)
          val q = qr.getSeq[Float](1).toArray
          search(sh, q).map { case (id, d, label) => Row(qid, id, d, segs(label)) }
        }
      }
    }
    if (k <= 0) spark.createDataFrame(resRdd, out)
    else TopK.grouped(spark.createDataFrame(resRdd, out), "__qid", "_distance", "id", k)
  }
}
