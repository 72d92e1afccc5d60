package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{AnnIndex, AnnIndexManager}

/** Matryoshka (MRL) prefix serving — Kusupati et al. 2022: embeddings
  * trained with Matryoshka representation learning carry a usable
  * lower-dimensional embedding in every PREFIX of the vector, so the
  * first-stage index can store and scan only the first d' dimensions
  * (d'/d of the memory and FLOPs) and an exact full-dimension rerank of
  * the overfetched candidates restores quality — the same
  * coarse-then-refine contract as the PQ/BQ/RaBitQ rerank paths, with the
  * coarse code being a plain prefix instead of a learned quantizer.
  *
  * Exactness: at exhaustive overfetch (k·overfetch >= n) the rerank IS the
  * brute-force answer (the strict-oracle configuration); at serving
  * overfetch, recall depends on how well the prefix separates the corpus —
  * the MRL training property. Metrics: the rerank uses `rawDistColumn`
  * (the raw-base-vector convention of the filtered-search fallback), so
  * cosine ranks correctly on an unnormalized base column too.
  *
  * 100 TB posture: the first stage inherits whatever engine backs the
  * prefix index (IVF cells, DiskANN shards — all the existing machinery);
  * the rerank is a bounded candidate join (k·overfetch rows) against the
  * base relation, the same shape as `ann_search_fetch`. */
object Matryoshka {

  /** Build the first-stage index over the d'-dim PREFIX of `vecCol`
    * (any engine/params the index manager accepts). */
  def createPrefixIndex(spark: SparkSession, name: String, df: DataFrame,
                        idCol: String, vecCol: String, dPrefix: Int,
                        engine: String = "FLAT",
                        params: Map[String, String] = Map("metric" -> "l2"),
                        path: String): AnnIndex = {
    require(dPrefix >= 1, s"dPrefix=$dPrefix must be >= 1")
    // Mirror the query-side guard: a base vector shorter than dPrefix
    // would silently truncate and build an index of the wrong dim,
    // inconsistent with the query path, which raise_errors.
    val pref = df.select(col(idCol),
      when(size(col(vecCol)) < dPrefix,
        raise_error(concat(
          lit(s"base vector shorter than the requested prefix dim $dPrefix: size "),
          size(col(vecCol)).cast("string"))))
        .otherwise(slice(col(vecCol), 1, dPrefix)).as(vecCol))
    AnnIndexManager.create(spark, name, pref, idCol, vecCol, engine, params,
      path)
  }

  /** Table-input batch form: every query row's vector truncates to the
    * prefix for stage 1 (the existing [[AnnSearch.searchTable]] machinery
    * — any engine, bounded-heap grouped top-k), the FULL vector rides the
    * passthrough, and the per-query rerank joins the k·overfetch
    * candidates against `base` with a window-ranked exact cut. Returns
    * `(queryIdCol, baseIdCol, _distance)`. */
  def searchRerankTable(idx: AnnIndex, queries: DataFrame, base: DataFrame,
                        baseIdCol: String, vecCol: String, k: Int,
                        overfetch: Int, queryIdCol: String,
                        queryVecCol: String,
                        searchParam: Int = -1): DataFrame = {
    val dp = idx.meta.dim
    require(overfetch >= 1, s"overfetch=$overfetch must be >= 1")
    // internal rename: searchTable appends a hit column literally named
    // "id", so a queryIdCol called "id" would otherwise be ambiguous; and
    // a per-row raise_error mirrors the scalar form's short-query guard
    // (slice would silently truncate-to-nothing instead)
    val q2 = queries.select(col(queryIdCol).as("__mqid"),
      col(queryVecCol).as("__qfull"),
      when(size(col(queryVecCol)) < dp,
        raise_error(concat(lit(s"query vector shorter than the prefix index dim $dp: size "),
          size(col(queryVecCol)).cast("string"))).cast("array<float>"))
        .otherwise(slice(col(queryVecCol), 1, dp)).as("__qpref"))
    val cands = AnnSearch.searchTable(idx, q2, k * overfetch,
      nprobe = searchParam, queryVecCol = Some("__qpref"),
      queryIdCol = Some("__mqid"))
    val scored = cands
      .select(col("__mqid"), col("__qfull"), col("id").as(baseIdCol))
      .join(base.select(col(baseIdCol), col(vecCol)), Seq(baseIdCol))
      .withColumn("_distance",
        idx.rawDistColumn(col(vecCol), col("__qfull")).cast("double"))
      .select(col("__mqid"), col(baseIdCol), col("_distance"))
    // Map-side bounded-heap grouped top-k (same reducer as searchBatch):
    // each partition emits <= k rows per query before anything shuffles,
    // instead of exchanging the full k·overfetch candidate set through a
    // row_number Window.
    TopK.grouped(scored, "__mqid", "_distance", baseIdCol, k)
      .select(col("__mqid").as(queryIdCol), col(baseIdCol), col("_distance"))
  }

  /** Prefix-stage scan (query truncated to the index's dim) + exact
    * rerank of the k·overfetch candidates on the FULL query against
    * `base(vecCol)` under the index's metric. Returns
    * `(baseIdCol, _distance)` ordered by the exact distance. */
  def searchRerank(idx: AnnIndex, base: DataFrame, baseIdCol: String,
                   vecCol: String, q: Array[Float], k: Int, overfetch: Int,
                   searchParam: Int = -1): DataFrame = {
    val dp = idx.meta.dim
    require(q.length >= dp,
      s"query dim ${q.length} shorter than the prefix index dim $dp")
    require(overfetch >= 1, s"overfetch=$overfetch must be >= 1")
    val cands = idx.scan(q.take(dp), k * overfetch, searchParam)
      .select(col("id").as(baseIdCol))
    cands.join(base, Seq(baseIdCol))
      .withColumn("_distance", idx.rawDistColumn(col(vecCol), typedLit(q)))
      .select(col(baseIdCol), col("_distance"))
      .orderBy(col("_distance"), col(baseIdCol))
      .limit(k)
  }
}
