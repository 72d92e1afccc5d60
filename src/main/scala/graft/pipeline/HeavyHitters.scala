package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT frequent-item mining without a full-cardinality shuffle — the
  * candidate+verify composition of the Misra-Gries summary (Misra & Gries
  * 1982; mergeability per Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *  1. CANDIDATE PASS — one `mapPartitions` scan builds a bounded
  *     Misra-Gries summary of capacity k = ceil(1/phi) per partition
  *     (constant memory, no shuffle). MG guarantees a per-partition
  *     undercount of at most n_p/(k+1), so summing over partitions every
  *     item with true count >= phi*N > N/(k+1) survives in at least one
  *     partition's summary — the union of survivors is a guaranteed
  *     SUPERSET of the heavy hitters, at most k rows per partition.
  *  2. VERIFY PASS — re-scan the items, semi-join against the broadcast
  *     (deduped) candidate set, and count exactly. Only candidate rows
  *     shuffle — at most ~k distinct keys — so the full token vocabulary
  *     (trillions of keys at 100 TB) never hits the wire.
  *
  * The result is exact: `(item, cnt)` for every item with
  * `cnt >= ceil(phi * N)`, N = total item count. Contrast with
  * `groupBy(item).count()`: correct but shuffles every distinct item;
  * and with Spark's `stat.freqItems`: approximate, false positives, no
  * counts. Two corpus scans is the inherent price of exactness in bounded
  * memory (one-pass exact needs Omega(distinct) space).
  *
  * 100 TB posture: pass 1 is shuffle-free; the partials relation is
  * bounded by (k+1) rows/partition and localCheckpoint'd ONCE so its two
  * consumers (N, candidates) don't re-scan the corpus; the candidate set
  * dedups (a tiny shuffle of <= k·partitions rows) BEFORE it broadcasts,
  * so the driver-side footprint is the post-dedup survivor union — ~k
  * items for any non-adversarial distribution.
  *
  * Null items are ignored (the per-partition item-count sentinel rides the
  * null slot, and null group keys are a cross-dialect hazard anyway).
  */
object HeavyHitters {

  /** Max MG counters per summary — 4M string counters is already far past
    * any sensible sketch; below phi ~ 2.4e-7 the sketch's memory stops
    * being "bounded" in any useful sense and a plain groupBy-count is the
    * honest plan. Guards the Int overflow of ceil(1/phi).toInt too. */
  private[graft] val MaxK = 1 << 22

  private def mgCapacity(phi: Double): Int = {
    require(phi > 0.0 && phi <= 1.0, s"phi=$phi must be in (0, 1]")
    require(1.0 / phi <= MaxK,
      s"phi=$phi needs ceil(1/phi) > $MaxK MG counters per partition — " +
        "use groupBy(item).count for thresholds this small")
    math.max(1, math.ceil(1.0 / phi).toInt)
  }

  private[graft] def itemStrings(items: DataFrame, itemCol: String): Dataset[String] = {
    import items.sparkSession.implicits._
    items.select(col(itemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull).as[String]
  }

  /** Per-partition MG survivors `(__item, __w)` plus one null-item sentinel
    * row per partition carrying that partition's item count. Bounded by
    * (k+1) rows per partition; localCheckpoint'd (eager) so downstream
    * consumers never re-scan the source — pass `checkpoint = false` for
    * single-consumer callers (the streaming maintenance collects the
    * partials immediately and would only pay block churn for the pin). */
  private[graft] def mgPartials(ds: Dataset[String], k: Int,
                                checkpoint: Boolean = true): DataFrame = {
    import ds.sparkSession.implicits._
    val raw = ds.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long](k * 2)
      var n = 0L
      while (it.hasNext) {
        val x = it.next(); n += 1L
        val cur = m.get(x) // null unboxes to 0L; MG never stores 0
        if (cur != 0L) m.put(x, cur + 1L)
        else if (m.size < k) m.put(x, 1L)
        else { // all k counters held by other items: decrement the summary
          val itr = m.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](m.size + 1)
      m.forEach((key, v) => out += ((key, v)))
      out += ((null, n))
      out.iterator
    }.toDF("__item", "__w")
    if (checkpoint) raw.localCheckpoint() else raw
  }

  /** Items with count >= ceil(phi * N) over `items(itemCol)` (cast to
    * string; nulls ignored). Returns `(itemCol, cnt: BIGINT)` — exact. */
  def frequentItems(items: DataFrame, itemCol: String, phi: Double): DataFrame = {
    val k = mgCapacity(phi)
    val ds = itemStrings(items, itemCol)
    val partials = mgPartials(ds, k)
    val n = partials.filter(col("__item").isNull)
      .agg(coalesce(sum("__w"), lit(0L))).head().getLong(0)
    val threshold = math.max(1L, math.ceil(phi * n).toLong)
    val candidates = partials.filter(col("__item").isNotNull)
      .select(col("__item")).distinct()
    ds.toDF("__item")
      .join(broadcast(candidates), Seq("__item"), "left_semi")
      .groupBy(col("__item").as(itemCol))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Token convenience form: split `textCol` on `pattern`, drop empties,
    * mine frequent tokens. Returns `(token, cnt)`. */
  def frequentTokens(df: DataFrame, textCol: String, phi: Double,
                     pattern: String = "\\s+"): DataFrame =
    frequentItems(
      df.select(explode(split(col(textCol), pattern)).as("token"))
        .filter(length(col("token")) > 0),
      "token", phi)

  /** Per-GROUP exact frequent items: for every group g, the items with
    * count >= ceil(phi * N_g) where N_g is g's item count — the
    * per-language / per-domain form (which boilerplate dominates EACH
    * slice). Same candidate+verify composition as [[frequentItems]], but
    * fully relational end-to-end: per-partition `mapPartitions` builds one
    * bounded MG summary PER GROUP seen in that partition (memory =
    * groups-in-partition x k counters), per-group totals ride the same
    * partials as null-item sentinel rows, and the per-group threshold is a
    * tiny aggregate JOINED in — nothing, not even a scalar, collects to
    * the driver, so group cardinality is unbounded. The recount semi-joins
    * on (group, item) at candidate volume (un-hinted: AQE picks broadcast
    * vs shuffle by size). Returns `(groupCol, itemCol, cnt)` — exact.
    * Null group keys are dropped with the null items. */
  def frequentItemsByGroup(df: DataFrame, groupCol: String, itemCol: String,
                           phi: Double): DataFrame = {
    val k = mgCapacity(phi)
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(groupCol).cast("string").as("__grp"),
        col(itemCol).cast("string").as("__item"))
      .filter(col("__grp").isNotNull && col("__item").isNotNull)
      .as[(String, String)]
    val partials = ds.mapPartitions { it =>
      val per = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
      val ns = new java.util.HashMap[String, Long]()
      while (it.hasNext) {
        val (g, x) = it.next()
        val curN = ns.get(g)
        ns.put(g, curN + 1L)
        var m = per.get(g)
        if (m == null) { m = new java.util.HashMap[String, Long](k * 2); per.put(g, m) }
        val cur = m.get(x)
        if (cur != 0L) m.put(x, cur + 1L)
        else if (m.size < k) m.put(x, 1L)
        else {
          val itr = m.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      per.forEach { (g, m) => m.forEach((x, v) => out += ((g, x, v))) }
      ns.forEach((g, n) => out += ((g, null, n)))
      out.iterator
    }.toDF("__grp", "__item", "__w").localCheckpoint()
    val totals = partials.filter(col("__item").isNull)
      .groupBy("__grp").agg(sum("__w").as("__n"))
      .select(col("__grp"),
        greatest(lit(1L), ceil(col("__n") * phi).cast("long")).as("__thr"))
    val candidates = partials.filter(col("__item").isNotNull)
      .select("__grp", "__item").distinct()
    ds.toDF("__grp", "__item")
      .join(candidates, Seq("__grp", "__item"), "left_semi")
      .groupBy("__grp", "__item")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .join(totals, Seq("__grp"))
      .filter(col("cnt") >= col("__thr"))
      .select(col("__grp").as(groupCol), col("__item").as(itemCol), col("cnt"))
  }

  /** The deduped candidate superset alone — exposed for the guarantee spec
    * (every true heavy hitter MUST appear here); use [[frequentItems]]
    * downstream. */
  private[pipeline] def mgCandidates(items: DataFrame, itemCol: String,
                                     phi: Double): DataFrame = {
    val k = mgCapacity(phi)
    mgPartials(itemStrings(items, itemCol), k)
      .filter(col("__item").isNotNull)
      .select(col("__item").as(itemCol)).distinct()
  }
}
