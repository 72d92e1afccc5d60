package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.AnnIndex
import graft.operators.{AnnSearch, TopK}

/** Hard-negative mining for embedding-model training — the retrieval-side
  * data op of the dense-retriever training loop (Karpukhin et al. 2020
  * DPR; Xiong et al. 2021 ANCE; Qu et al. 2021 RocketQA): for each
  * training pair (query vector, labeled-positive doc), retrieve the
  * query's nearest corpus candidates under the CURRENT model's index,
  * drop the labeled positive, optionally drop candidates ranking CLOSER
  * than the positive (likely unlabeled positives — RocketQA's denoising),
  * and keep the k nearest survivors as the pair's hard negatives.
  *
  * Spark-first shape: the candidate fetch is [[AnnSearch.searchTable]]
  * (any engine, all its batch strategies), candidates re-score EXACTLY
  * against the base vectors (`rawDistColumn` — quantized first stages
  * cannot perturb the final ranking), the positive's distance joins in at
  * pair volume, and the final cut is the map-side bounded-heap grouped
  * top-k. Corpus never shuffles; everything between scan and cut is
  * candidate-bounded (pairs × k·overfetch rows).
  *
  * 100 TB posture: this is the op that turns a trained checkpoint + corpus
  * index into the NEXT round's training data, so it runs at full corpus
  * scale per ANCE refresh — all volume-bearing stages here are index scan
  * (shard-parallel) and bounded joins.
  */
object NegativeMining {

  /** Mine `k` hard negatives per query. `pairs` carries one row per
    * (query, labeled positive): a query id, the query VECTOR (the current
    * encoder's output — not necessarily a corpus row; it must be
    * functionally dependent on the id), and the positive's base id.
    * MULTIPLE rows per query id = multiple labeled positives (the common
    * DPR shape): the fetch runs once per distinct query, EVERY listed
    * positive is excluded, and denoising thresholds on the most-similar
    * one. A NULL positive id means "no labeled positive": nothing is
    * excluded and denoising does not engage for that query. Returns
    * `(queryIdCol, baseIdCol, rank)` — the k nearest surviving candidates
    * per query, rank 1-based by (exact distance, id).
    *
    *   - `overfetch`: candidates fetched = k·overfetch + (max labeled
    *     positives on any query) — the reserve covers EVERY positive of a
    *     query landing among its top candidates, so a multi-positive query
    *     can still yield k·overfetch usable candidates. The max is one
    *     cheap pair-volume aggregate; pass `maxPositives` to skip it when
    *     the bound is known (an ANCE refresh knows its pair shape).
    *   - `denoiseMargin`: when > 0, drop candidates the model ranks
    *     CLOSER than margin × the nearest positive — such candidates are
    *     more likely unlabeled positives than useful negatives (RocketQA
    *     §4.1). 0 disables; 1.0 is the paper's cut. The margin is on the
    *     metric's TRUE distance scale: Euclidean distance for l2 indexes
    *     (the squared index distance is compared against margin²·posDist),
    *     angular distance (1 − cos) for cosine. REJECTED for ip indexes —
    *     the negated-dot "distance" is sign-indefinite, so a multiplicative
    *     margin silently inverts (normalize and use cosine instead).
    *     Positives whose id is missing from `base` contribute no
    *     threshold (their pairs denoise only via their query's other
    *     positives, if any).
    *
    * Fewer than k survivors (tiny corpus, aggressive margin) yield fewer
    * rows for that query — mining never pads. */
  def mineHardNegatives(idx: AnnIndex, pairs: DataFrame, queryIdCol: String,
                        queryVecCol: String, positiveIdCol: String,
                        base: DataFrame, baseIdCol: String, vecCol: String,
                        k: Int, overfetch: Int = 3,
                        denoiseMargin: Double = 0.0,
                        searchParam: Int = -1,
                        maxPositives: Int = -1): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(overfetch >= 1, s"overfetch=$overfetch must be >= 1")
    require(denoiseMargin >= 0.0, s"denoiseMargin=$denoiseMargin must be >= 0")
    require(denoiseMargin == 0.0 || idx.meta.metric != "ip",
      "denoiseMargin needs a non-negative distance metric (l2/cosine): the " +
        "ip metric's negated-dot distance is sign-indefinite and a " +
        "multiplicative margin inverts on it — normalize and use cosine")
    // internal rename: searchTable appends a hit column literally named
    // "id" (same hazard as Matryoshka.searchRerankTable)
    val p2 = pairs.select(col(queryIdCol).as("__nqid"),
      col(queryVecCol).as("__nqvec"), col(positiveIdCol).as("__npos"))
    // fetch reserve: room for EVERY labeled positive of the worst query to
    // appear among its candidates (the old +1 covered exactly one — a
    // query with p positives in the top candidates silently thinned its
    // negative yield). One pair-volume agg when the caller didn't pass
    // the bound; 0 positives (all-null) still reserves 1 for safety.
    // NOTE the agg is an EAGER action at construction time (the fetch
    // size must be a driver literal) — the pairs relation is the small
    // side by design, but hot paths (the SQL TVF resolves at analysis,
    // so even EXPLAIN pays it) should pass maxPositives explicitly: 1 is
    // exact for the standard one-positive-per-query shape.
    val posReserve =
      if (maxPositives >= 0) maxPositives
      else {
        val m = p2.filter(col("__npos").isNotNull)
          .groupBy("__nqid").agg(count(lit(1)).as("__np"))
          .agg(coalesce(max("__np"), lit(0L))).head().getLong(0)
        math.max(1L, m).toInt
      }
    // ONE fetch per distinct query — multi-positive pairs share it
    val q2 = p2.select("__nqid", "__nqvec").dropDuplicates("__nqid")
    val cands = AnnSearch.searchTable(idx, q2, k * overfetch + posReserve,
        nprobe = searchParam, queryVecCol = Some("__nqvec"),
        queryIdCol = Some("__nqid"))
      .select(col("__nqid"), col("__nqvec"), col("id").as(baseIdCol))
    // exact re-score against the raw base vectors: the index's stored
    // distance may be quantized/prefixed — the output ranking must not be
    val scored = cands
      .join(base.select(col(baseIdCol), col(vecCol)), Seq(baseIdCol))
      .withColumn("__nd",
        idx.rawDistColumn(col(vecCol), col("__nqvec")).cast("double"))
    // drop EVERY labeled positive of the query (pair-volume anti-join)
    val posSet = p2.filter(col("__npos").isNotNull)
      .select(col("__nqid"), col("__npos").as(baseIdCol)).distinct()
    val nonPos = scored.join(posSet, Seq("__nqid", baseIdCol), "left_anti")
    val denoised =
      if (denoiseMargin <= 0.0) nonPos
      else {
        val posDist = p2.filter(col("__npos").isNotNull)
          .join(base.select(col(baseIdCol).as("__npos"), col(vecCol).as("__npvec")),
            Seq("__npos"))
          .withColumn("__npd",
            idx.rawDistColumn(col("__npvec"), col("__nqvec")).cast("double"))
          .groupBy("__nqid").agg(min("__npd").as("__npd"))
        // l2 index distances are SQUARED: margin² there keeps the margin
        // on the true Euclidean scale the docstring promises
        val m = if (idx.meta.metric == "l2") denoiseMargin * denoiseMargin
                else denoiseMargin
        nonPos.join(posDist, Seq("__nqid"), "left")
          .filter(col("__npd").isNull || col("__nd") >= lit(m) * col("__npd"))
          .drop("__npd")
      }
    TopK.groupedWithRank(
        denoised.select(col("__nqid"), col(baseIdCol), col("__nd")),
        "__nqid", "__nd", baseIdCol, k, "rank")
      .select(col("__nqid").as(queryIdCol), col(baseIdCol), col("rank"))
  }
}
