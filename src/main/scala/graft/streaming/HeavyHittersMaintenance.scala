package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.pipeline.HeavyHitters

/** Streaming heavy hitters — a driver-resident Misra-Gries summary
  * maintained across micro-batches, the mergeable-summaries composition
  * (Agarwal et al., PODS'12): each batch runs the same shuffle-free
  * distributed MG candidate pass as the batch operator
  * ([[HeavyHitters.mgPartials]]), and the per-partition partials merge into
  * the running k-counter summary with the MG merge rule (add counters,
  * then subtract the (k+1)-th largest and drop non-positives). State is
  * O(k) on the driver at ANY stream length; per batch the cluster pays one
  * scan of the batch, nothing shuffles, nothing row-level collects.
  *
  * Guarantee (anytime): for every item, `est <= true count <= est + N/(k+1)`
  * where N is the total items observed — so any item with
  * `true count > N/(k+1)` is guaranteed present in the summary, and
  * [[heavyHitters]] returns a certified superset for any `phi > 1/(k+1)`.
  * For exact counts, recount the reported candidates against the retained
  * corpus (the batch operator's verify pass) — the summary is the standing
  * candidate generator a streaming pipeline needs.
  *
  * Replay protection is session-scoped like [[TextIndexMaintenance]]:
  * `append` skips batch ids at or below the last applied id (pass the
  * foreachBatch id); a restarted query rebuilds from its source of truth.
  */
class HeavyHittersMaintenance(k: Int, itemCol: String = "item") {
  require(k >= 1 && k <= graft.pipeline.HeavyHitters.MaxK,
    s"k=$k must be in [1, ${graft.pipeline.HeavyHitters.MaxK}]")

  // Sentinel for "no batchId given": such appends always apply and do not
  // move the replay cursor, so they can neither be dropped as replays of
  // each other nor shadow a later genuine explicit id.
  private val AutoBatchId = Long.MinValue

  private val summary = new java.util.HashMap[String, Long](k * 2)
  private var n = 0L
  private var lastBatchId = Long.MinValue

  /** Total items observed across applied batches. */
  def totalItems: Long = synchronized(n)

  /** The additive error bound: true count <= est + errorBound. */
  def errorBound: Long = synchronized(n / (k + 1L))

  /** Current summary snapshot, largest estimate first. */
  def candidates: Seq[(String, Long)] = synchronized {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](summary.size)
    summary.forEach((key, v) => out += ((key, v)))
    out.sortBy(-_._2).toSeq
  }

  /** Certified-superset heavy hitters at threshold phi: every item whose
    * TRUE count is >= ceil(phi*N) is included (requires phi > 1/(k+1) for
    * the certificate; smaller phi throws). Returns
    * `(item, estLow, estHigh)` with `estLow <= true <= estHigh`. */
  def heavyHitters(phi: Double): Seq[(String, Long, Long)] = synchronized {
    require(phi > 1.0 / (k + 1), // the bound cannot certify below 1/(k+1)
      s"phi=$phi not certifiable with k=$k (need phi > ${1.0 / (k + 1)})")
    val thr = math.max(1L, math.ceil(phi * n).toLong)
    val err = n / (k + 1L)
    candidates.collect {
      case (item, est) if est + err >= thr => (item, est, est + err)
    }
  }

  /** EXACT heavy hitters of `retained` at threshold `phi`, using this
    * summary as the certified candidate generator — the one-call verify
    * hook (candidate+verify composition): the summary's items are a
    * guaranteed superset of the true heavy hitters for any certifiable
    * `phi` (> 1/(k+1)), and one exact recount of that bounded set against
    * the retained corpus ([[HeavyHitters.recountCandidates]]) restores the
    * batch operator's exact contract — `(item, cnt)` with
    * `cnt >= ceil(phi·N)`, equal to `HeavyHitters.frequentItems(retained,
    * …)` whenever `retained` is the data this summary observed. The
    * candidate relation is ≤ k driver-resident rows (a literal local
    * relation — broadcasts for free); the corpus pays one scan and
    * shuffles only candidate matches. */
  def exactHeavyHitters(retained: DataFrame, phi: Double,
                        retainedItemCol: String): DataFrame = {
    require(phi > 1.0 / (k + 1),
      s"phi=$phi not certifiable with k=$k (need phi > ${1.0 / (k + 1)})")
    val spark = retained.sparkSession
    import spark.implicits._
    val cand = synchronized {
      val out = new scala.collection.mutable.ArrayBuffer[String](summary.size)
      summary.forEach((key, _) => out += key)
      out.toSeq
    }
    HeavyHitters.recountCandidates(retained, retainedItemCol, phi,
      cand.toDF("__cand"), "__cand")
  }

  /** [[exactHeavyHitters]] with the retained corpus carrying this
    * maintenance's own `itemCol`. */
  def exactHeavyHitters(retained: DataFrame, phi: Double): DataFrame =
    exactHeavyHitters(retained, phi, itemCol)

  /** Apply one micro-batch (session-scoped replay skip on `batchId`; pass
    * increasing ids, e.g. the foreachBatch id). Omitting `batchId` applies
    * the batch UNCONDITIONALLY and leaves the replay cursor untouched, so
    * the natural `m.append(df1); m.append(df2)` pattern applies both AND a
    * later genuine explicit id can never be mistaken for a replay of an
    * auto-assigned one — replay semantics belong only to caller-owned ids.
    * One shuffle-free pass over the batch; the driver receives at most
    * (k+1) rows per partition. */
  def append(batch: DataFrame, batchId: Long = AutoBatchId): this.type =
    synchronized {
      if (batchId != AutoBatchId) {
        if (batchId <= lastBatchId) return this // replay
        lastBatchId = batchId
      }
      val partials = HeavyHitters.mgPartials(
        HeavyHitters.itemStrings(batch, itemCol), k,
        checkpoint = false).collect() // single consumer: no block churn
      partials.foreach { r =>
        if (r.isNullAt(0)) n += r.getLong(1)
        else { // additive counter merge
          val item = r.getString(0)
          val cur = summary.get(item) // null unboxes to 0L
          summary.put(item, cur + r.getLong(1))
        }
      }
      // MG merge compression: if over capacity, subtract the (k+1)-th
      // largest counter from all and drop non-positives — restores |S| <= k
      // while keeping the additive-error invariant
      if (summary.size > k) {
        val values = new Array[Long](summary.size)
        var i = 0
        summary.forEach((_, v) => { values(i) = v; i += 1 })
        java.util.Arrays.sort(values)
        val sub = values(summary.size - (k + 1)) // (k+1)-th largest
        val itr = summary.entrySet().iterator()
        while (itr.hasNext) {
          val e = itr.next()
          if (e.getValue <= sub) itr.remove() else e.setValue(e.getValue - sub)
        }
      }
      this
    }
}
