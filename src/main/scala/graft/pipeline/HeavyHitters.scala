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
  *  2. VERIFY PASS — re-scan the items, semi-join against the (deduped)
  *     candidate set — broadcast when its measured count is inside the
  *     driver-safe bound, shuffled otherwise — and count exactly. Only
  *     candidate rows shuffle — at most ~k distinct keys — so the full
  *     token vocabulary (trillions of keys at 100 TB) never hits the wire.
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
  * dedups (a tiny shuffle of <= k·partitions rows) and broadcasts only
  * below a measured size bound ([[BroadcastCandidateBound]]), so the
  * driver-side footprint is the post-dedup survivor union — ~k items for
  * any non-adversarial distribution — and an adversarial k·P union falls
  * back to a shuffled semi-join instead of a driver OOM.
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
      val m = new java.util.HashMap[String, Long](math.min(k, 1 << 16) * 2)
      var n = 0L
      while (it.hasNext) {
        val x = it.next(); n += 1L
        mgUpdate(m, x, k)
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
    val candidates0 = partials.filter(col("__item").isNotNull)
      .select(col("__item")).distinct()
    // Broadcast only below a measured bound: the survivor union is ~k
    // items normally but can reach k·partitions adversarially (k up to
    // MaxK), where a pinned broadcast would OOM the driver — yet with no
    // hint and AQE off, the LogicalRDD-derived side has no stats and the
    // static planner falls to a sort-merge join that shuffles the whole
    // corpus item column. The gate measures BYTES, not just rows: items
    // are arbitrary strings (substring/ngram candidates run kilobytes),
    // so 4M long items can pin a multi-GB broadcast that a row count
    // alone would wave through. One cheap agg job over the checkpointed,
    // (k+1)·P-bounded partials.
    val stats = candidates0
      .agg(count(lit(1)), coalesce(sum(length(col("__item"))), lit(0L)))
      .head()
    val candRows = stats.getLong(0)
    // UTF-16 chars + per-row UnsafeRow/hash-relation overhead ≈ resident
    // broadcast footprint on the driver
    val candBytes = candRows * BroadcastBytesPerRowOverhead + stats.getLong(1) * 2L
    val candidates =
      if (candRows <= BroadcastCandidateBound &&
          candBytes <= BroadcastCandidateByteBound) broadcast(candidates0)
      else candidates0
    ds.toDF("__item")
      .join(candidates, Seq("__item"), "left_semi")
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

  /** Candidate-set size above which the global form's verify semi-join is
    * left un-hinted (shuffle/AQE) instead of broadcast — ~4M short strings
    * is comfortably inside driver memory; beyond it a pinned broadcast is
    * the OOM risk the r12 advisory flagged. Paired with the BYTE bound
    * below: both must pass, because rows alone says nothing about string
    * width. */
  private[graft] val BroadcastCandidateBound = 1L << 22

  /** Estimated resident broadcast bytes above which the verify semi-join
    * is left un-hinted: 512 MB keeps the pinned hash relation far from
    * driver-heap trouble while preserving the broadcast for every sane
    * candidate set (4M 20-char tokens estimate ~0.4 GB). Estimate =
    * rows · [[BroadcastBytesPerRowOverhead]] + 2 bytes per char. */
  private[graft] val BroadcastCandidateByteBound = 1L << 29

  /** Per-row driver-resident overhead estimate for a broadcast hash
    * relation: UnsafeRow header + offset/size word + hash-map entry. */
  private[graft] val BroadcastBytesPerRowOverhead = 64L

  /** Per-task resident MG counter budget for the grouped form — above this
    * the shuffle-free pass (one summary per group seen in the partition)
    * would OOM the executor, so the operator switches to the co-located
    * path. ~2M entries is ~150-200 MB of HashMap at typical token sizes.
    * Override with `spark.graft.hh.maxCountersPerTask`. */
  private[graft] val DefaultMaxCountersPerTask = 1 << 21

  /** MG update step shared by the flat and grouped passes. */
  private def mgUpdate(m: java.util.HashMap[String, Long], x: String, k: Int): Unit = {
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

  /** Per-GROUP exact frequent items: for every group g, the items with
    * count >= ceil(phi * N_g) where N_g is g's item count — the
    * per-language / per-domain form (which boilerplate dominates EACH
    * slice). Same candidate+verify composition as [[frequentItems]], but
    * fully relational end-to-end: per-group totals ride the partials as
    * null-item sentinel rows and the per-group threshold is a tiny
    * aggregate JOINED in — no per-group state ever lands on the driver
    * (the only driver scalar is the optional one-number group-count
    * estimate of the memory gate, skipped when the caller passes the
    * hint). The recount semi-joins on (group, item) at candidate volume
    * (un-hinted: AQE picks broadcast vs shuffle by size). Returns
    * `(groupCol, itemCol, cnt)` — exact. Null group keys are dropped with
    * the null items.
    *
    * Memory bound (enforced, not aspirational): the candidate pass keeps
    * one bounded MG summary per RESIDENT group. When `groups x k` fits the
    * per-task budget (`spark.graft.hh.maxCountersPerTask`, default 2^21
    * counters) the pass is shuffle-free — every partition may see every
    * group. Above the budget (many domains x small phi — exactly the
    * web-corpus shape) the rows are hash-repartitioned by group and sorted
    * within partitions, so groups arrive contiguously and ONLY ONE summary
    * is ever resident: O(k) per task at ANY group cardinality, at the
    * price of one O(N) exchange. The gate reads `expectedGroups` when the
    * caller knows it; otherwise one approx_count_distinct scan estimates
    * it (pass the hint at 100 TB to skip that scan). */
  def frequentItemsByGroup(df: DataFrame, groupCol: String, itemCol: String,
                           phi: Double, expectedGroups: Long = -1L): DataFrame = {
    val k = mgCapacity(phi)
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(groupCol).cast("string").as("__grp"),
        col(itemCol).cast("string").as("__item"))
      .filter(col("__grp").isNotNull && col("__item").isNotNull)
      .as[(String, String)]
    val budget = spark.conf.getOption("spark.graft.hh.maxCountersPerTask")
      .map(_.toLong).getOrElse(DefaultMaxCountersPerTask.toLong)
    val groups =
      if (expectedGroups >= 0L) expectedGroups
      else ds.toDF("__grp", "__item")
        .agg(approx_count_distinct(col("__grp"), 0.05)).head().getLong(0)
    // overflow-safe gate: groups * k can exceed Long for a large caller
    // hint (the scaladoc invites 100 TB-scale hints), so compare by
    // division — a negative product would silently pick the unbounded path
    val partials = (if (groups <= budget / k) {
      // Shuffle-free pass: every partition can hold all groups' summaries.
      ds.mapPartitions { it =>
        val per = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
        val ns = new java.util.HashMap[String, Long]()
        while (it.hasNext) {
          val (g, x) = it.next()
          val curN = ns.get(g)
          ns.put(g, curN + 1L)
          var m = per.get(g)
          if (m == null) { m = new java.util.HashMap[String, Long](math.min(k, 1 << 16) * 2); per.put(g, m) }
          mgUpdate(m, x, k)
        }
        val out = new scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        per.forEach { (g, m) => m.forEach((x, v) => out += ((g, x, v))) }
        ns.forEach((g, n) => out += ((g, null, n)))
        out.iterator
      }
    } else {
      // Co-located pass: hash-partition by group, sort within partitions,
      // stream group-contiguous rows through a SINGLE active summary —
      // O(k) resident at any group count. Each group now lives whole in
      // one partition, so its MG error tightens to N_g/(k+1).
      ds.toDF("__grp", "__item")
        .repartition(col("__grp")).sortWithinPartitions("__grp")
        .as[(String, String)]
        .mapPartitions { it =>
          new Iterator[(String, String, Long)] {
            private var activeG: String = null
            private var m = new java.util.HashMap[String, Long](math.min(k, 1 << 16) * 2)
            private var n = 0L
            private var flush: Iterator[(String, String, Long)] = Iterator.empty
            private def drain(g: String): Iterator[(String, String, Long)] = {
              val out = new scala.collection.mutable.ArrayBuffer[(String, String, Long)](m.size + 1)
              m.forEach((x, v) => out += ((g, x, v)))
              out += ((g, null, n))
              m = new java.util.HashMap[String, Long](math.min(k, 1 << 16) * 2)
              n = 0L
              out.iterator
            }
            private def advance(): Unit = {
              while (!flush.hasNext && it.hasNext) {
                val (g, x) = it.next()
                if (activeG == null) activeG = g
                else if (g != activeG) { flush = drain(activeG); activeG = g }
                n += 1L
                mgUpdate(m, x, k)
              }
              if (!flush.hasNext && !it.hasNext && activeG != null) {
                flush = drain(activeG); activeG = null
              }
            }
            def hasNext: Boolean = { advance(); flush.hasNext }
            def next(): (String, String, Long) = { advance(); flush.next() }
          }
        }
    }).toDF("__grp", "__item", "__w").localCheckpoint()
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

  /** EXACT recount of an externally produced candidate set against `df` —
    * the verify half of the candidate+verify composition, for callers that
    * already hold a certified candidate SUPERSET per group: the streaming
    * MG operators ([[graft.streaming.StreamingPipeline.streamingGroupedHeavyHitters]],
    * [[graft.streaming.HeavyHittersMaintenance]]) emit one at every
    * trigger, and recounting it against the retained corpus (foreachBatch,
    * or offline) gives the streaming path the SAME exact contract as the
    * batch operator. Returns `(groupCol, itemCol, cnt)` with
    * `cnt >= ceil(phi * N_g)` — exact, because every true heavy hitter is
    * in the superset by the MG anytime bound, and false candidates cannot
    * survive the exact count. Shuffles are bounded: per-group totals (one
    * key per group, map-side combined) and the candidate-volume
    * semi-join + count — the corpus vocabulary never hits the wire. */
  def recountGroupedCandidates(df: DataFrame, groupCol: String,
                               itemCol: String, phi: Double,
                               candidates: DataFrame,
                               candGroupCol: String,
                               candItemCol: String): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi=$phi must be in (0, 1]")
    val ds = df.select(col(groupCol).cast("string").as("__grp"),
        col(itemCol).cast("string").as("__item"))
      .filter(col("__grp").isNotNull && col("__item").isNotNull)
    val cand = candidates.select(col(candGroupCol).cast("string").as("__grp"),
        col(candItemCol).cast("string").as("__item"))
      .filter(col("__grp").isNotNull && col("__item").isNotNull)
      .distinct()
    val totals = ds.groupBy("__grp").agg(count(lit(1)).as("__n"))
      .select(col("__grp"),
        greatest(lit(1L), ceil(col("__n") * phi).cast("long")).as("__thr"))
    ds.join(cand, Seq("__grp", "__item"), "left_semi")
      .groupBy("__grp", "__item")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .join(totals, Seq("__grp"))
      .filter(col("cnt") >= col("__thr"))
      .select(col("__grp").as(groupCol), col("__item").as(itemCol), col("cnt"))
  }

  /** Flat (ungrouped) EXACT recount of an externally produced candidate
    * superset against `df` — the one-call verify hook for
    * [[graft.streaming.HeavyHittersMaintenance]] (whose summary is a
    * certified superset at any `phi > 1/(k+1)`). Returns `(itemCol, cnt)`
    * with `cnt >= ceil(phi * N)` — identical to [[frequentItems]] when the
    * candidate set is a true superset. Fully lazy: execution pays the
    * recount pass plus a count-only total pass over df; only candidate
    * rows shuffle (the semi-join side broadcasts when small). */
  def recountCandidates(df: DataFrame, itemCol: String, phi: Double,
                        candidates: DataFrame,
                        candItemCol: String): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi=$phi must be in (0, 1]")
    val ds = itemStrings(df, itemCol).toDF("__item")
    val cand = candidates.select(col(candItemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull).distinct()
    // N computed IN-PLAN (one-row count aggregate broadcast-cross-joined
    // onto the bounded recount output), matching the grouped sibling's
    // lazy totals join — the eager ds.count() this replaces ran a full
    // corpus scan at CONSTRUCTION time (even for EXPLAIN, even if the
    // result was never collected) on top of the execution-time scans.
    // Execution now pays the recount pass plus the count-only aggregate
    // pass; nothing runs until the caller does.
    val total = ds.agg(count(lit(1)).cast("long").as("__n"))
    ds.join(cand, Seq("__item"), "left_semi")
      .groupBy(col("__item").as(itemCol))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= greatest(lit(1L),
        ceil(lit(phi) * col("__n")).cast("long")))
      .drop("__n")
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
