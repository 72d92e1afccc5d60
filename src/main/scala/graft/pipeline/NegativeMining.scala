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

  /** Mine `k` hard negatives per pair. `pairs` carries one row per
    * training pair: a query id, the query VECTOR (the current encoder's
    * output — not necessarily a corpus row), and the labeled positive's
    * base id. Returns `(queryIdCol, baseIdCol, rank)` — the k nearest
    * non-positive (and non-denoised) candidates per query, rank 1-based
    * by (exact distance, id).
    *
    *   - `overfetch`: candidates fetched = k·overfetch + 1 (the +1 covers
    *     the positive appearing among them).
    *   - `denoiseMargin`: when > 0, drop candidates whose exact distance
    *     to the query is LESS than margin × the positive's distance —
    *     a candidate the model ranks above the labeled positive is more
    *     likely an unlabeled positive than a useful negative (RocketQA
    *     §4.1). 0 disables; 1.0 is the paper's cut. Requires every
    *     pair's positive id to exist in `base` (inner-joined; pairs with
    *     a dangling positive id are dropped with the join).
    *
    * Fewer than k survivors (tiny corpus, aggressive margin) yield fewer
    * rows for that query — mining never pads. */
  def mineHardNegatives(idx: AnnIndex, pairs: DataFrame, queryIdCol: String,
                        queryVecCol: String, positiveIdCol: String,
                        base: DataFrame, baseIdCol: String, vecCol: String,
                        k: Int, overfetch: Int = 3,
                        denoiseMargin: Double = 0.0,
                        searchParam: Int = -1): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(overfetch >= 1, s"overfetch=$overfetch must be >= 1")
    require(denoiseMargin >= 0.0, s"denoiseMargin=$denoiseMargin must be >= 0")
    // internal rename: searchTable appends a hit column literally named
    // "id" (same hazard as Matryoshka.searchRerankTable)
    val q2 = pairs.select(col(queryIdCol).as("__nqid"),
      col(queryVecCol).as("__nqvec"), col(positiveIdCol).as("__npos"))
    val cands = AnnSearch.searchTable(idx, q2, k * overfetch + 1,
        nprobe = searchParam, queryVecCol = Some("__nqvec"),
        queryIdCol = Some("__nqid"))
      .select(col("__nqid"), col("__nqvec"), col("__npos"),
        col("id").as(baseIdCol))
    // exact re-score against the raw base vectors: the index's stored
    // distance may be quantized/prefixed — the output ranking must not be
    val scored = cands
      .join(base.select(col(baseIdCol), col(vecCol)), Seq(baseIdCol))
      .withColumn("__nd",
        idx.rawDistColumn(col(vecCol), col("__nqvec")).cast("double"))
      .filter(col(baseIdCol) =!= col("__npos")) // the labeled positive is not a negative
    val denoised =
      if (denoiseMargin <= 0.0) scored
      else {
        val posDist = q2
          .join(base.select(col(baseIdCol).as("__npos"), col(vecCol).as("__npvec")),
            Seq("__npos"))
          .withColumn("__npd",
            idx.rawDistColumn(col("__npvec"), col("__nqvec")).cast("double"))
          .select(col("__nqid"), col("__npd"))
        scored.join(posDist, Seq("__nqid"))
          .filter(col("__nd") >= lit(denoiseMargin) * col("__npd"))
      }
    val top = TopK.grouped(
      denoised.select(col("__nqid"), col(baseIdCol), col("__nd")),
      "__nqid", "__nd", baseIdCol, k)
    import org.apache.spark.sql.expressions.Window
    // rank the <= k survivors (tiny per-query window over the cut set)
    top.withColumn("rank", row_number().over(
        Window.partitionBy("__nqid").orderBy(col("__nd"), col(baseIdCol)))
        .cast("long"))
      .select(col("__nqid").as(queryIdCol), col(baseIdCol), col("rank"))
  }
}
