package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call corpus cleaning for training-data pipelines: exact dedup →
  * language ID → quality scoring → policy filters, composed from the
  * individual operators so the whole pass stays declarative (Catalyst sees
  * one plan: the dedup semi-join, then row-local codegen'd scoring, then
  * pushed-down filters — no materialization between stages).
  *
  * 100 TB posture: dedup is a hash-aggregate semi-join (map-side partials);
  * everything after it is row-local, so the pipeline's only shuffle is the
  * dedup grouping. Filters sit directly above the scan after optimization.
  */
object CorpusPipeline {

  /** Cleaned relation: exact duplicates dropped (first id wins), then rows
    * must pass `quality_score >= minQuality`, language membership (empty set
    * = keep all), `length >= minChars`, and — when `maxRepetition < 1` —
    * the Gopher duplicate-trigram cap ([[TextAnalysis.repetitionRatio]]).
    * Adds `lang_pred` and `quality_score` columns. */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.0, langs: Set[String] = Set.empty,
            minChars: Int = 0, maxRepetition: Double = 1.0): DataFrame = {
    val deduped = Dedup.dropExactDuplicates(df, idCol, textCol)
    val scored = TextAnalysis.withQualityScore(
      TextAnalysis.withLangId(deduped, textCol), textCol)
    val filters = Seq[Option[Column]](
      if (minQuality > 0) Some(col("quality_score") >= minQuality) else None,
      if (langs.nonEmpty) Some(col("lang_pred").isin(langs.toSeq: _*)) else None,
      if (minChars > 0) Some(length(col(textCol)) >= minChars) else None,
      if (maxRepetition < 1.0)
        Some(TextAnalysis.repetitionRatio(col(textCol)) <= maxRepetition)
      else None
    ).flatten
    filters.foldLeft(scored)(_ filter _)
  }

  /** Hex threshold for `deterministicSample`: rows whose 16-bit md5-prefix
    * value is below `round(fraction * 65536)` are kept. "zzzz" sorts above
    * every hex digit, so fraction >= 1 keeps all rows without a special
    * case in the comparison (and stays a plain string compare in any
    * engine). */
  private def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0, s"negative sampling fraction $fraction")
    if (fraction >= 1.0) "zzzz"
    else f"${math.round(fraction * 65536)}%04x"
  }

  /** First 4 hex chars of md5 of the row id — a uniform 16-bit bucket. */
  private def idHashPrefix(idCol: String): Column =
    substring(md5(col(idCol).cast("string").cast("binary")), 1, 4)

  /** Deterministic Bernoulli sampling keyed on the row id: keep iff the
    * 16-bit md5 prefix of the id falls below the fraction threshold.
    * Unlike `df.sample` (partition-order-dependent RNG), the decision is
    * a pure function of the id — stable across reruns, repartitioning,
    * engines, and incremental arrivals of the same rows, which is what a
    * reproducible training-data pipeline needs (and what makes held-out
    * splits consistent between jobs: sample(0.9) and its complement
    * partition the corpus exactly). Row-local, codegen'd, no shuffle. */
  def deterministicSample(df: DataFrame, idCol: String,
                          fraction: Double): DataFrame =
    df.filter(idHashPrefix(idCol) < lit(thresholdHex(fraction)))

  /** Per-stratum deterministic sampling — the corpus-mixing primitive:
    * one pass keeps each stratum (language, source, quality band) at its
    * own rate, e.g. downsample web text while keeping all books. Same
    * id-keyed hash as `deterministicSample`, so mixes are reproducible
    * and consistent across jobs. Strata absent from `fractions` use
    * `defaultFraction`. Row-local; the fraction lookup is a when-chain
    * over a handful of literals, not a join. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (None, (s, f)) => Some(when(col(stratumCol) === s, lit(thresholdHex(f))))
      case (Some(c), (s, f)) => Some(c.when(col(stratumCol) === s, lit(thresholdHex(f))))
    }.map(_.otherwise(lit(thresholdHex(defaultFraction))))
      .getOrElse(lit(thresholdHex(defaultFraction)))
    df.filter(idHashPrefix(idCol) < thr)
  }

  /** Temperature-scaled mixture weights: per-stratum keep-fractions
    * proportional to `count^alpha`, scaled so the expected kept total is
    * `budgetRows`. alpha < 1 flattens the mix (upweights rare domains /
    * languages — the standard temperature-sampling rule for multilingual
    * and multi-domain pretraining mixes; alpha = 1 is proportional,
    * alpha = 0 uniform per stratum). Fractions clamp to 1.0 (a stratum
    * can't be sampled above its size; the shortfall is NOT redistributed —
    * the returned map is transparent about what each stratum contributes).
    *
    * Driver-side arithmetic over one tiny groupBy-count (one row per
    * stratum); feed the result straight into [[stratifiedSample]] for the
    * id-keyed deterministic cut. Returns (stratum -> fraction), fractions
    * rounded to 6 decimals for cross-engine reproducibility of downstream
    * hash thresholds. */
  def temperatureFractions(df: DataFrame, stratumCol: String, alpha: Double,
                           budgetRows: Long): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(budgetRows > 0, s"budgetRows must be positive, got $budgetRows")
    val counts = df.groupBy(stratumCol).count().collect()
      .map(r => (r.get(0) match { case null => "" case v => v.toString },
        r.getLong(1)))
      .sortBy(_._1) // deterministic weight-sum order
    val weights = counts.map { case (s, n) => (s, n, math.pow(n.toDouble, alpha)) }
    val wSum = weights.map(_._3).sum
    weights.map { case (s, n, w) =>
      val target = budgetRows.toDouble * w / wSum
      val frac = math.min(1.0, target / n.toDouble)
      s -> (math.rint(frac * 1e6) / 1e6)
    }.toMap
  }

  /** Quantile bucketing without a global sort — the 100 TB form of the
    * CCNet head/middle/tail cut (`quality_perplexity_buckets` runs the
    * exact global-ntile oracle configuration; THIS is what a production
    * pipeline runs): ONE `approxQuantile` aggregate (Greenwald–Khanna,
    * driver receives nBuckets-1 cutoffs) and a row-local broadcast
    * assignment — no exchange, no sort, no window anywhere.
    *
    * Bucket b ∈ [1, nBuckets] = 1 + #cutoffs strictly below the value
    * (ties land in the lower bucket, matching ntile's stable ordering up
    * to the quantile-sketch error: bucket POPULATIONS deviate from exact
    * tertiles by at most ~relErr·n rows each — rank error, not value
    * error). Null values get a null bucket. */
  def withQuantileBuckets(df: DataFrame, valueCol: String, nBuckets: Int,
                          outCol: String = "bucket",
                          relErr: Double = 1e-3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(relErr > 0 && relErr < 1, s"relErr must be in (0,1), got $relErr")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cutoffs = df.na.drop(Seq(valueCol))
      .stat.approxQuantile(valueCol, probs, relErr)
    val v = col(valueCol).cast("double")
    val bucket = cutoffs.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(v > c, 1L).otherwise(0L)
    }
    df.withColumn(outCol, when(v.isNotNull, bucket))
  }

  /** [[temperatureFractions]] + [[stratifiedSample]] in one call: the
    * temperature-mixed corpus itself. */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        alpha: Double, budgetRows: Long): DataFrame =
    stratifiedSample(df, idCol, stratumCol,
      temperatureFractions(df, stratumCol, alpha, budgetRows),
      defaultFraction = 1.0)

  /** Deterministic token-budget cut: order rows by id (within a stratum
    * when `partitionBy` is set), keep the prefix whose running
    * whitespace-token total stays within `maxTokens` — "take the first N
    * tokens of each source", the standard way pretraining mixes cap a
    * corpus. Adds `n_tokens` and `cum_tokens`.
    *
    * Scale note: with `partitionBy` the running sum is a partitioned
    * window (shuffle by stratum, parallel across strata) — use it at any
    * scale. Without it the global ordered window is inherently
    * single-stream; reserve that form for bounded outputs. */
  def tokenBudget(df: DataFrame, idCol: String, textCol: String,
                  maxTokens: Long,
                  partitionBy: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = partitionBy.map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
    val w = base.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= maxTokens)
  }

  /** Greedy sequence packing — the concat-and-chunk batching rule
    * pretraining loaders use: documents are concatenated in id order
    * (per stratum when `partitionBy` is set) and the token stream is cut
    * every `seqLen` tokens. Each doc is tagged with the sequence it
    * STARTS in (`seq_id`) and its token offset there (`seq_offset`);
    * docs longer than the remaining window simply span into following
    * sequences, exactly like the flattened-stream chunker.
    *
    * One partitioned window cumsum — same scale shape as [[tokenBudget]]
    * (shuffle by stratum, parallel across strata; reserve the global
    * un-partitioned form for bounded outputs). Deterministic: a pure
    * function of (id order, token counts). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Long,
                    partitionBy: Option[String] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    import org.apache.spark.sql.expressions.Window
    val base = partitionBy.map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
    val w = base.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .withColumn("seq_id", floor(col("__start") / seqLen).cast("long"))
      .withColumn("seq_offset", (col("__start") % seqLen).cast("long"))
      .drop("__cum", "__start")
  }

  /** Overlapping token-window chunking — the step before embedding in a
    * retrieval/embedding pipeline: each document explodes into windows of
    * `chunkTokens` whitespace tokens advancing by `stride` (overlap =
    * chunkTokens - stride), so every token lands in at least one chunk and
    * boundary context is preserved in the overlap. Output appends
    * `chunk_id` (0-based), `chunk_start` (token offset), `chunk_len`, and
    * `chunk_text`.
    *
    * Entirely built-in codegen'd functions (split/sequence/explode/slice/
    * array_join) — row-local, no shuffle, no UDF; at any corpus size the
    * cost is the output explosion itself (~n_tokens/stride rows per doc). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens=$chunkTokens must be >= 1")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride=$stride must be in [1, chunkTokens=$chunkTokens]")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // last chunk starts at the largest multiple of stride that still has
    // uncovered tokens: ceil((n - chunkTokens) / stride) bounded at 0
    val lastChunk = greatest(
      ceil((n.cast("double") - chunkTokens) / stride).cast("long"), lit(0L))
    val start = (col("chunk_id") * stride).cast("long")
    df.withColumn("__toks", toks)
      .withColumn("chunk_id", explode(sequence(lit(0L), lastChunk)))
      .withColumn("chunk_start", start)
      .withColumn("__slice",
        slice(col("__toks"), (start + 1).cast("int"), lit(chunkTokens)))
      .withColumn("chunk_len", size(col("__slice")).cast("long"))
      .withColumn("chunk_text", array_join(col("__slice"), " "))
      .drop("__toks", "__slice")
  }

  /** Deterministic training-shard assignment — the last mile of a corpus
    * pipeline: a seeded global shuffle of the corpus into `nShards` stable
    * shards with a total order inside each, the layout a trainer consumes
    * (shard = input file, `shard_pos` = read order). Everything is a pure
    * function of (seed, id): shard is the md5-bucket of "seed:id" and
    * `shard_pos` ranks the same hash within the shard — rerunning, adding
    * executors, or switching engines reproduces the identical shuffle,
    * and different seeds give independent permutations (fresh data order
    * per training run without rewriting bytes).
    *
    * Scale posture: one hash-partition shuffle on `shard` plus a per-shard
    * sort (the window partitions by shard). Each shard materializes
    * through one task — inherent to emitting a totally-ordered shard
    * file — so pick `nShards` the way trainers do: at least the writer
    * parallelism, with rows-per-shard bounded by what one task should
    * write (e.g. corpus_rows / target_file_rows). */
  def shardCorpus(df: DataFrame, idCol: String, nShards: Int,
                  seed: Long = 42L): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val h = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))
      .cast("binary"))
    val shard = (conv(substring(h, 1, 15), 16, 10).cast("long") % nShards)
      .cast("int")
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__h"), col(idCol))).cast("long"))
      .drop("__h")
  }

  /** Writer companion to [[shardCorpus]]: one parquet directory per shard,
    * rows in `shard_pos` order inside each file. `repartition` on the
    * shard column co-locates each shard in one task so the sort is local
    * and each shard writes sequentially — the plan shape that holds at
    * any corpus size (parallelism = nShards). */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, outDir: String,
                  seed: Long = 42L): Unit =
    shardCorpus(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "shard_pos")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)

  /** Per-reason attrition report for a cleaning run: how many rows each
    * stage would drop (stages evaluated independently over the deduped
    * set, the way corpus-cleaning audits report them). One aggregation
    * pass — counts are conditional sums, not separate jobs. */
  def attritionReport(df: DataFrame, idCol: String, textCol: String,
                      minQuality: Double, langs: Set[String],
                      minChars: Int): DataFrame = {
    val total = count(lit(1))
    val scored = TextAnalysis.withQualityScore(
      TextAnalysis.withLangId(Dedup.dropExactDuplicates(df, idCol, textCol),
        textCol), textCol)
    // empty langs = keep-all (mirrors clean()): zero-arg isin is always
    // false, so not(isin()) would count EVERY row as wrong-language
    val wrongLang =
      if (langs.isEmpty) lit(0L)
      else sum(when(not(col("lang_pred").isin(langs.toSeq: _*)), 1L).otherwise(0L))
    scored.agg(
      total.as("n_after_dedup"),
      sum(when(col("quality_score") < minQuality, 1L).otherwise(0L)).as("n_low_quality"),
      wrongLang.as("n_wrong_lang"),
      sum(when(length(col(textCol)) < minChars, 1L).otherwise(0L)).as("n_too_short"))
  }

  /** Deterministic k-means clustering over an embedding column → adds
    * `cluster_id`. The topic-bucketing primitive of corpus curation
    * (semantic dedup, per-topic mixing quotas, diversity sampling).
    *
    * Scale posture: training runs driver-side on a bounded seeded sample
    * (O(sampleCap) rows at ANY table scale, same stance as IVF centroid
    * training); assignment is a row-local loop over the broadcast centroid
    * array — no shuffle, and the same rows land in the same clusters on
    * rerun or repartition (fixed seeds, fixed iteration order). */
  def clusterEmbeddings(df: DataFrame, idCol: String, vecCol: String,
                        k: Int, maxIter: Int = 10, seed: Long = 42,
                        sampleCap: Int = 65536): DataFrame =
    assignClusters(df, vecCol,
      trainClusterCentroids(df, vecCol, k, maxIter, seed, sampleCap))

  /** The training half of [[clusterEmbeddings]], exposed so a caller (e.g.
    * the strict-oracle builder, which inlines the centroids as double
    * literals into replayable SQL) can reuse the exact centroid array the
    * assignment ran with. */
  def trainClusterCentroids(df: DataFrame, vecCol: String, k: Int,
                            maxIter: Int = 10, seed: Long = 42,
                            sampleCap: Int = 65536): Array[(Int, Array[Float])] = {
    import graft.functions.AnnFunctions.vector_nonnull
    require(k >= 1, s"k=$k must be >= 1")
    val n = df.count()
    require(n > 0, "cannot cluster an empty relation")
    val train =
      if (sampleCap < n) df.sample(withReplacement = false, sampleCap.toDouble / n, seed)
      else df
    val sample = train.select(vector_nonnull(col(vecCol)).as("__v"))
      .collect().map(_.getSeq[Float](0).toArray)
    graft.index.AnnIndexBuilder.trainCentroids(
      sample, math.min(k, sample.length), maxIter, seed)
  }

  /** The assignment half of [[clusterEmbeddings]]: row-local argmin over
    * the broadcast centroids (first-minimum wins on exact ties, matching
    * an `ORDER BY dist, cid LIMIT 1` replay). */
  def assignClusters(df: DataFrame, vecCol: String,
                     centroids: Array[(Int, Array[Float])]): DataFrame = {
    import graft.functions.AnnFunctions.vector_nonnull
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assign = udf { (v: Seq[Float]) =>
      val q = v.toArray
      var best = 0; var bestD = Double.MaxValue
      for ((cid, c) <- bc.value) {
        val d = graft.functions.VectorKernels.l2Sq(q, c)
        if (d < bestD) { bestD = d; best = cid }
      }
      best
    }
    df.withColumn("cluster_id", assign(vector_nonnull(col(vecCol))))
  }

  /** Distributed FULL-DATA Lloyd refinement — the scale path past
    * [[trainClusterCentroids]]'s bounded-sample stance. A sampled pilot
    * seeds (kmeans++ on O(initSampleCap) rows, bounded driver cost at any
    * table size); then each Lloyd round is ONE shuffle-free
    * `mapPartitionsWithIndex` pass emitting a single (k·d sums, k counts)
    * partial per partition, merged on the driver IN PARTITION-INDEX ORDER
    * (deterministic for a fixed partitioning; cross-partitioning runs can
    * differ by float-summation ULPs, never by assignment on separated
    * data). Stops when the max centroid movement (L2) drops below `tol` or
    * after `maxIter` rounds. Empty cells keep their previous centroid
    * (same rule as the pilot).
    *
    * 100 TB posture: per round the cluster pays one full scan + n·k·d
    * flops and the driver pays P·k·d·8 bytes of partials (coalesce the
    * input when P·k·d is extreme); nothing row-level ever collects.
    * Callers iterating many rounds should persist/localCheckpoint the
    * input relation so the scan is from memory, not parquet. */
  def trainClusterCentroidsDistributed(df: DataFrame, vecCol: String, k: Int,
      maxIter: Int = 10, seed: Long = 42, initSampleCap: Int = 65536,
      tol: Double = 1e-7): Array[(Int, Array[Float])] = {
    import graft.functions.AnnFunctions.vector_nonnull
    require(k >= 1, s"k=$k must be >= 1")
    var cents: Array[Array[Float]] =
      trainClusterCentroids(df, vecCol, k, maxIter = 5, seed, initSampleCap)
        .map(_._2)
    val kk = cents.length
    val dim = cents(0).length
    val vecs = df.select(vector_nonnull(col(vecCol)).as("__v")).rdd
      .map(_.getSeq[Float](0).toArray)
    val sc = df.sparkSession.sparkContext
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val bc = sc.broadcast(cents)
      val partials = vecs.mapPartitionsWithIndex { (pid, it) =>
        val cs = bc.value
        val sums = new Array[Double](kk * dim)
        val cnt = new Array[Long](kk)
        it.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kk) { // first-minimum wins, matching assignClusters
            val d = graft.functions.VectorKernels.l2Sq(v, cs(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          val off = best * dim
          var j = 0
          while (j < dim) { sums(off + j) += v(j); j += 1 }
          cnt(best) += 1L
        }
        Iterator((pid, sums, cnt))
      }.collect().sortBy(_._1)
      bc.destroy()
      val sums = new Array[Double](kk * dim)
      val cnt = new Array[Long](kk)
      partials.foreach { case (_, s, c) =>
        var i = 0
        while (i < kk * dim) { sums(i) += s(i); i += 1 }
        var q = 0
        while (q < kk) { cnt(q) += c(q); q += 1 }
      }
      moved = 0.0
      val next = Array.tabulate(kk) { c =>
        if (cnt(c) == 0L) cents(c) // empty cell: keep previous centroid
        else {
          val off = c * dim
          val nc = new Array[Float](dim)
          var j = 0
          while (j < dim) { nc(j) = (sums(off + j) / cnt(c)).toFloat; j += 1 }
          moved = math.max(moved,
            math.sqrt(graft.functions.VectorKernels.l2Sq(nc, cents(c))))
          nc
        }
      }
      cents = next
      iter += 1
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** Mean squared L2 distance to the nearest centroid — the k-means
    * objective, for convergence/quality checks. Row-local over the
    * broadcast centroids; one aggregate, nothing collects. */
  def clusteringCost(df: DataFrame, vecCol: String,
                     centroids: Array[(Int, Array[Float])]): Double = {
    import graft.functions.AnnFunctions.vector_nonnull
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val minD = udf { (v: Seq[Float]) =>
      val q = v.toArray
      var best = Double.MaxValue
      for ((_, c) <- bc.value) {
        val d = graft.functions.VectorKernels.l2Sq(q, c)
        if (d < best) best = d
      }
      best
    }
    try {
      val row = df.select(avg(minD(vector_nonnull(col(vecCol))))).head()
      require(!row.isNullAt(0), "cannot compute clusteringCost of an empty relation")
      row.getDouble(0)
    } finally bc.destroy()
  }
}
