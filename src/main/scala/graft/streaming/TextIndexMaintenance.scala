package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.HybridSearch
import graft.operators.HybridSearch.{HeadDf, TextIndex}

/** Incremental maintenance for the BM25 inverted index — the FTS-side
  * sibling of [[IndexMaintenance]], so a standing hybrid-search workload
  * keeps BOTH modalities resident while the corpus streams in. The
  * reference CANNOT do this: its FTS side is DuckDB's fts extension,
  * whose index is a static snapshot rebuilt by `PRAGMA create_fts_index`
  * (reference src/ann_search.cpp:903-1163 shells out per query; any
  * corpus change means a full re-tokenize). Here an append batch
  * tokenizes ONLY itself:
  *
  *  - the batch's postings/doc-length relations are built with the same
  *    pipeline as [[HybridSearch.buildTextIndex]] and UNIONED onto the
  *    served relations — a document lives in exactly one batch, so no
  *    (term, id) posting group ever spans segments and the unioned
  *    posting rows are exactly a fresh build's;
  *  - corpus stats (numDocs, avgDl) are recomputed from the unioned
  *    doc-length relation — an O(numDocs) pass over (id, dl) pairs,
  *    cheap next to tokenization — so idf and length norms always match
  *    a fresh build's values (scores can differ from a monolithic
  *    rebuild only by the summation-order ULPs inside avg());
  *  - the [[HeadDf]] gate map merges additively; absent-term bounds
  *    (floors) ADD across segments so the upper-bound contract stays
  *    true, merely looser — compaction rebuilds the map exactly.
  *
  * Segment growth is bounded by `compactEvery`: like delta shards on the
  * ANN side, each append deepens the union lineage by one segment, and
  * compaction re-pins the union as ONE materialized relation (no
  * re-tokenize — the cached segments feed the re-pin) and releases the
  * old segment pins, so steady-state query cost tracks corpus size, not
  * stream age.
  *
  * Scope: a [[TextIndex]] is session-resident state (there is no on-disk
  * meta), so replay protection is session-scoped — `append` skips batch
  * ids at or below the last applied id; a restarted query rebuilds from
  * its source of truth.
  *
  * Deletes are EXACT tombstones: the served postings/doc-length
  * relations carry an anti-join against the deleted-id set, and the
  * corpus stats recompute from the masked doc lengths — df/idf are
  * derived per query from the MASKED matched postings, so every score is
  * exactly a fresh build's over the surviving corpus (the [[HeadDf]]
  * gate map keeps the deleted docs' counts, which only OVERSTATES the
  * volume bound — gate-only, never a score). An update is
  * delete + append. Compaction folds the mask physically, so the
  * anti-join cost never outlives a compaction cycle.
  */
class TextIndexMaintenance(initialDocs: DataFrame, idCol: String,
                           textCol: String, compactEvery: Int = 8) {
  require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")

  // every segment's pins, released on compaction (TextIndex.release only
  // unpersists the relations it names — union children must be tracked)
  private val segmentPins =
    scala.collection.mutable.ArrayBuffer.empty[TextIndex]
  private var segments = 1
  private var lastBatchId = Long.MinValue
  private var ti: TextIndex = {
    val t = HybridSearch.buildTextIndex(initialDocs, idCol, textCol,
      materialized = true)
    segmentPins += t
    t
  }

  /** The currently served index — safe to hand to
    * [[HybridSearch.hybridSearchTable]] / [[HybridSearch.bm25]] at any
    * point between appends. */
  def current: TextIndex = synchronized(ti)

  /** Live segment count (1 after build or compaction). */
  def segmentCount: Int = synchronized(segments)

  /** Append one batch of NEW documents (session-scoped replay skip on
    * `batchId`; pass increasing ids, e.g. the foreachBatch id). */
  def append(batch: DataFrame, batchId: Long = Long.MinValue + 1): TextIndex =
    synchronized {
      if (batchId <= lastBatchId) return ti // replay
      lastBatchId = batchId
      if (batch.isEmpty) return ti
      val seg = HybridSearch.buildTextIndex(batch, idCol, textCol,
        materialized = true)
      segmentPins += seg
      // the segments' baked per-posting impacts (contrib) are only valid
      // against their OWN df/numDocs/avgDl — a union changes all three, so
      // the column is dropped and scoring falls back to the exact
      // per-query derivation until compaction re-bakes it
      val postings = HybridSearch.dropImpacts(ti.postings)
        .unionByName(HybridSearch.dropImpacts(seg.postings))
      val docLens = ti.docLens.unionByName(seg.docLens)
      // exact stats from the unioned doc lengths: idf and norms match a
      // fresh build over the concatenated corpus
      val stats = docLens.agg(count(lit(1)), avg("dl")).head()
      val head = (ti.headDf, seg.headDf) match {
        case (Some(a), Some(b)) =>
          // additive merge; floors ADD, and a term ABSENT from one side's
          // head map is priced at that side's floor (its true df there is
          // <= floor but unknown), so "mapped df is an upper bound on the
          // term's df" stays true in the mixed case — under-pricing would
          // let the volume gate skip the prune it should take (perf-only,
          // never a score input)
          val df = (a.df.keySet ++ b.df.keySet).iterator.map { t =>
            t -> (a.df.getOrElse(t, a.floor) + b.df.getOrElse(t, b.floor))
          }.toMap
          Some(HeadDf(a.floor + b.floor, df))
        case _ => None
      }
      segments += 1
      ti = TextIndex(postings, docLens, stats.getLong(0), stats.getDouble(1), head)
      if (segments > compactEvery) compact()
      ti
    }

  /** Tombstone documents by id: an anti-join against the (broadcast)
    * deleted-id set folds INTO the served lineage — like a segment, it
    * deepens the plan by one layer, counts toward the compaction trigger,
    * and predates any later append, so re-appending a deleted id serves
    * the NEW contents. Stats recompute from the surviving doc lengths,
    * so every score is exactly a fresh build's over the remaining corpus
    * (df/idf derive per query from the masked matched postings). The
    * [[HeadDf]] gate map keeps the deleted docs' counts — the volume
    * bound only ever overstates, which is gate-only, never a score
    * input; compaction rebuilds it exactly. Unknown ids are inert. */
  def delete(ids: Seq[Long]): TextIndex = synchronized {
    if (ids.isEmpty) return ti
    val spark = ti.postings.sparkSession
    import spark.implicits._
    val tomb = org.apache.spark.sql.functions.broadcast(ids.toDF("id"))
    // the mask changes numDocs/avgDl/df: baked impacts (if any) are stale
    val postings = HybridSearch.dropImpacts(ti.postings)
      .join(tomb, Seq("id"), "left_anti")
    val docLens = ti.docLens.join(tomb, Seq("id"), "left_anti")
    val stats = docLens.agg(count(lit(1)), avg("dl")).head()
    val avgDl = if (stats.isNullAt(1)) 0.0 else stats.getDouble(1)
    segments += 1 // one more lineage layer — compaction folds it physically
    ti = TextIndex(postings, docLens, stats.getLong(0), avgDl, ti.headDf)
    if (segments > compactEvery) compact()
    ti
  }

  /** Update = delete of the ids present in `batch` + append of the new
    * contents as a segment (session-scoped replay skip as in
    * [[append]]); the mask predates the new segment in the lineage, so
    * only the new contents serve. */
  def update(batch: DataFrame, batchId: Long = Long.MinValue + 1): TextIndex =
    synchronized {
      if (batchId <= lastBatchId) return ti
      val ids = batch.select(col(idCol).cast("long")).collect().map(_.getLong(0))
      delete(ids.toSeq)
      append(batch, batchId)
    }

  /** Re-pin the union as one materialized relation (reads the cached
    * segments — no re-tokenize), rebuild the HeadDf map exactly, release
    * the old segment pins. */
  def compact(): TextIndex = synchronized {
    val postings = ti.postings.persist()
    val docLens = ti.docLens.persist()
    docLens.count(); postings.count()
    // the compacted postings are the exact (masked, unioned) corpus, so
    // the shared materialize-time derivation applies verbatim: persisted
    // dfStats (scalar bm25 then skips the per-call df agg, same as a
    // fresh materialized build) + the head map derived from it.
    // Append/delete between compactions intentionally DROP dfStats: a
    // union/mask changes df, and serving a stale relation would change
    // scores — the per-query agg fallback stays exact there.
    val (dfStats, head) = HybridSearch.dfStatsAndHead(postings, ti.numDocs)
    // re-bake the per-posting impacts against the compacted corpus's
    // exact (dfStats, numDocs, avgDl) — the same derivation a fresh
    // materialized build runs, so scalar serving regains the baked path
    val impacts = HybridSearch.bakeImpacts(
      postings, dfStats, ti.numDocs, ti.avgDl).persist()
    impacts.count()
    postings.unpersist() // superseded by the impact-augmented pin
    // new pins are live before the old ones drop; release only costs
    // recompute, never correctness
    segmentPins.foreach(_.release())
    segmentPins.clear()
    segments = 1
    ti = TextIndex(impacts, docLens, ti.numDocs, ti.avgDl,
      Some(head), Some(dfStats))
    segmentPins += ti
    ti
  }

  /** Drop every pin this maintainer holds (terminal). */
  def release(): Unit = synchronized {
    segmentPins.foreach(_.release())
    segmentPins.clear()
  }

  /** Attach to a streaming source of documents: each micro-batch appends
    * a segment; compaction folds segments per `compactEvery`. */
  def attach(stream: DataFrame, checkpoint: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch, batchId); ()
      }
      .start()
}
