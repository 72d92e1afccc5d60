package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.AnnFunctions._

/** Late-interaction multi-vector scoring (ColBERT MaxSim — Khattab &
  * Zaharia, SIGIR 2020): a document is a BAG of token vectors, a query is
  * a bag of token vectors, and
  *
  *   score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} ⟨q, d⟩
  *
  * The reference engine is single-vector-only; this extends the search
  * tier the same way the pipeline tier extends dedup. Everything scores
  * through the codegen'd [[graft.functions.InnerProduct]] kernel inside
  * higher-order functions — no UDF in the hot path.
  *
  * Scale posture (100 TB):
  *  - [[searchTable]] is the exact kernel: the bounded query batch is
  *    broadcast, documents NEVER shuffle, and only ≤ k·P survivors per
  *    query move (TopK's map-side bounded heap). Cost is nq × ndocs ×
  *    |Q|·|D| dots — exact brute force, same contract as `knn_batch`.
  *  - The scale path is two-stage: a single-vector ANN first stage over
  *    [[meanPool]]ed documents (any existing index engine — the standard
  *    ColBERT serving shape) feeding [[rerank]], which joins ONLY the
  *    candidate (query, doc) pairs back to their token vectors. Candidate
  *    volume is nq × overfetch, independent of corpus size.
  */
object MaxSim {

  /** MaxSim score of one dynamic query-vectors column against a
    * doc-vectors column: left-to-right fold over query tokens of the max
    * inner product over doc tokens (NULL if either bag is NULL; NULL max
    * on an empty doc bag — callers filter empties at the edge). Native
    * codegen expression ([[graft.functions.MaxSimScore]]) — value-identical
    * to the former `aggregate`/`array_max`/`transform` composition, which
    * materialized one array per (row, query-token) and dominated the
    * line's GC. */
  def score(queryVecs: Column, docVecs: Column): Column =
    maxsim_score(queryVecs, docVecs)

  /** MaxSim score for a FIXED query (literal token vectors), summed in
    * query-token order. Same native kernel as [[score]] — the fold start
    * is immaterial (0.0 + a == a bit-exact here: inner_product accumulates
    * from +0.0, so a dot can never be -0.0). */
  def scoreLit(query: Seq[Array[Double]], docVecs: Column): Column = {
    require(query.nonEmpty, "query must have at least one token vector")
    maxsim_score(typedLit(query.map(_.toSeq)), docVecs)
  }

  /** Mean-pool a bag of token vectors into one DOUBLE vector — the
    * single-vector first-stage representation. Fold order is bag order. */
  def meanPool(vecs: Column): Column = {
    val sum = aggregate(
      slice(vecs, lit(2), greatest(size(vecs) - 1, lit(0))),
      transform(element_at(vecs, 1), x => x.cast("double")),
      (acc, v) => zip_with(acc, v, (a, b) => a + b))
    transform(sum, x => x / size(vecs))
  }

  private def nonEmpty(c: Column): Column = c.isNotNull && size(c) > 0

  /** Exact top-k for one query over a multi-vector corpus. Output:
    * (idCol, `_maxsim`) sorted best-first, ties by id. */
  def topK(docs: DataFrame, idCol: String, vecsCol: String,
           query: Seq[Array[Double]], k: Int): DataFrame =
    TopK.global(
        docs.filter(nonEmpty(col(vecsCol)))
          .withColumn("_maxsim", scoreLit(query, col(vecsCol)))
          .withColumn("__neg", -col("_maxsim"))
          .select(col(idCol), col("_maxsim"), col("__neg")) // vecs out of the sort
          // asc-sort puts NULLs first — an all-null bag would TOP the list
          .filter(col("_maxsim").isNotNull),
        "__neg", k, idCol)
      .select(col(idCol), col("_maxsim"))

  /** Exact batch form: every query row against every document — the
    * brute-force kernel. Queries broadcast; documents never shuffle;
    * TopK's bounded heap reduces map-side so only survivors move.
    * Output: (queryIdCol, rank, docIdCol, `_maxsim`). */
  def searchTable(queries: DataFrame, queryIdCol: String, queryVecsCol: String,
                  docs: DataFrame, docIdCol: String, docVecsCol: String,
                  k: Int): DataFrame = {
    val q = queries.filter(nonEmpty(col(queryVecsCol)))
      .select(col(queryIdCol), col(queryVecsCol))
    val scored = docs.filter(nonEmpty(col(docVecsCol)))
      .select(col(docIdCol), col(docVecsCol))
      .crossJoin(broadcast(q))
      .withColumn("_maxsim", score(col(queryVecsCol), col(docVecsCol)))
      .withColumn("__neg", -col("_maxsim"))
      // prune the token bags BEFORE the heap: TopK.grouped round-trips its
      // input through external Rows (Encoders.row), so every surviving
      // column is boxed per scored row — carrying |Q|+|D| vectors through
      // it dominated the line's GC (r16)
      .select(col(queryIdCol), col(docIdCol), col("_maxsim"), col("__neg"))
      // a NULL score (all-null token bag that passed the nonEmpty edge
      // filter) can never rank — drop it here rather than NPE the heap
      .filter(col("_maxsim").isNotNull)
    TopK.groupedWithRank(scored, queryIdCol, "__neg", docIdCol, k, "rank")
      .select(col(queryIdCol), col("rank"), col(docIdCol), col("_maxsim"))
  }

  /** Late-interaction rerank of first-stage candidates: joins each
    * (query, doc) candidate pair back to its token vectors and keeps the
    * per-query MaxSim top-k. `cands` is any first stage's output —
    * [[graft.operators.AnnSearch.searchTable]] over a [[meanPool]]ed
    * index, a brute-force pooled top-k, or an external list. The join is
    * bounded by the candidate volume (nq × overfetch), never by corpus
    * size; the query relation rides a broadcast. */
  def rerank(cands: DataFrame, queries: DataFrame, queryIdCol: String,
             queryVecsCol: String, docs: DataFrame, docIdCol: String,
             docVecsCol: String, k: Int): DataFrame = {
    val pairs = cands.select(col(queryIdCol), col(docIdCol))
      .join(docs.filter(nonEmpty(col(docVecsCol)))
        .select(col(docIdCol), col(docVecsCol)), Seq(docIdCol))
      .join(broadcast(queries.filter(nonEmpty(col(queryVecsCol)))
        .select(col(queryIdCol), col(queryVecsCol))), Seq(queryIdCol))
      .withColumn("_maxsim", score(col(queryVecsCol), col(docVecsCol)))
      .withColumn("__neg", -col("_maxsim"))
      .select(col(queryIdCol), col(docIdCol), col("_maxsim"), col("__neg"))
      .filter(col("_maxsim").isNotNull) // all-null bags can't rank (see searchTable)
    TopK.groupedWithRank(pairs, queryIdCol, "__neg", docIdCol, k, "rank")
      .select(col(queryIdCol), col("rank"), col(docIdCol), col("_maxsim"))
  }

  /** The staged serving shape end-to-end: ANN search over a pooled-vector
    * index (built by the caller on [[meanPool]]ed docs cast to FLOAT)
    * fans out `overfetch` candidates per query, then [[rerank]] restores
    * exact MaxSim order on that bounded set. Recall→1 as overfetch→ndocs
    * (asserted in MaxSimSpec). */
  def annSearchTable(idx: graft.index.AnnIndex, queries: DataFrame,
                     queryIdCol: String, queryVecsCol: String,
                     docs: DataFrame, docIdCol: String, docVecsCol: String,
                     k: Int, overfetch: Int): DataFrame = {
    require(overfetch >= k, s"overfetch=$overfetch must be >= k=$k")
    val pooledQ = queries.filter(nonEmpty(col(queryVecsCol)))
      .select(col(queryIdCol), col(queryVecsCol),
        meanPool(col(queryVecsCol)).cast("array<float>").as("__pooled"))
    val cands = AnnSearch.searchTable(idx, pooledQ, overfetch,
        queryVecCol = Some("__pooled"), queryIdCol = Some(queryIdCol))
      .withColumnRenamed("id", docIdCol)
    rerank(cands, queries, queryIdCol, queryVecsCol,
      docs, docIdCol, docVecsCol, k)
  }
}
