package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.AnnFunctions._
import QuerySupport._

/** Vector scalar-function and brute-force search surface
  * (reference operators S6 `vector_distances` and the exact ORDER BY
  * distance LIMIT k path, src/ann_search.cpp:741-892 and
  * test/sql/diskann_optimizer.test:20-41).
  *
  * Brute-force top-k is the baseline the ANN indexes are measured against;
  * in Spark it executes as scan → codegen'd distance → TakeOrderedAndProject
  * (per-partition bounded top-k + driver merge of k·P rows) — no full sort,
  * no shuffle of the data.
  */
object VectorQueries {

  private val K = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vector_distance_l2" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "embeddings")
        .select(
          col("vec_id"), col("label"),
          round(l2_distance(col("embedding"), typedLit(qvec(1))), 4).as("dist"))
        .orderBy("vec_id")
    }),

    "vector_distance_l2sq" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          round(l2_distance_sq(col("embedding"), typedLit(qvec(1))), 4).as("dist_sq"))
        .orderBy("vec_id")
    }),

    "vector_inner_product" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          (round(inner_product(col("embedding"), typedLit(qvec(2))), 4) + 0.0).as("ip"))
        .orderBy("vec_id")
    }),

    "vector_cosine" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          (round(cosine_similarity(col("embedding"), typedLit(qvec(3))), 4) + 0.0).as("cos_sim"))
        .orderBy("vec_id")
    }),

    "knn_topk" -> ((s: SparkSession, dir: String) => {
      // exact top-k: TakeOrdered, then rank the k survivors (k rows — the
      // window runs on a single tiny partition, not the full table).
      val top = table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          l2_distance_sq(col("embedding"), typedLit(qvec(0))).as("_d"))
        .orderBy(col("_d"), col("vec_id"))
        .limit(K)
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("_d"), col("vec_id"))).cast("long"))
        .select("rank", "vec_id")
        .orderBy("rank")
    }),

    "knn_batch" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val queries = Seq.tabulate(4)(i => (i, qvec(i))).toDF("query_idx", "qvec")
      val emb = table(s, dir, "embeddings")
      // broadcast the (tiny) query side against the data; per-query top-k
      // reduces map-side (a plain window would shuffle+sort every scored
      // row — nq x N at scale).
      val scored = emb.crossJoin(broadcast(queries))
        .withColumn("_d", l2_distance_sq(col("embedding"), col("qvec")))
        .select("query_idx", "vec_id", "_d")
      graft.operators.TopK
        .groupedWithRank(scored, "query_idx", "_d", "vec_id", K, "rank")
        .select("query_idx", "rank", "vec_id")
        .orderBy("query_idx", "rank")
    }),

    "vector_bq_hamming" -> ((s: SparkSession, dir: String) => {
      // binary-quantization kernel end-to-end: pack each embedding's sign
      // bits (8 dims/byte), then XOR+popcount against the folded query
      // bits. Integer-valued → exact oracle (the sign-disagreement count).
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          bq_hamming(bq_encode(col("embedding")), typedLit(qvec(4)), Dim)
            .cast("long").as("hamming"))
        .orderBy("vec_id")
    }),

    // ColBERT MaxSim, single query: 100+ multi-vector "documents" (each =
    // 5 consecutive embedding rows in vec_id order), scored exactly by
    // Σ_q max_d <q,d> through the codegen InnerProduct kernel inside
    // HOFs. Strict: same fold order as the oracle's comprehension
    "maxsim_topk" -> ((s: SparkSession, dir: String) => {
      val top = graft.operators.MaxSim.topK(multiVecDocs(s, dir), "doc_id",
        "vecs", Seq(qvec(21), qvec(22), qvec(23)), K)
      top.withColumn("rank", row_number().over(
          Window.orderBy(col("_maxsim").desc, col("doc_id"))).cast("long"))
        .select(col("rank"), col("doc_id"),
          (round(col("_maxsim") + 0.000000001, 4) + 0.0).as("maxsim"))
        .orderBy("rank")
    }),

    // batch form: 3 two-token queries against every document — queries
    // broadcast, docs never shuffle, map-side bounded-heap top-k
    "maxsim_table" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val qdf = Seq(
        (0, Seq(qvec(30).toSeq, qvec(40).toSeq)),
        (1, Seq(qvec(31).toSeq, qvec(41).toSeq)),
        (2, Seq(qvec(32).toSeq, qvec(42).toSeq))).toDF("query_idx", "qvecs")
      graft.operators.MaxSim.searchTable(qdf, "query_idx", "qvecs",
          multiVecDocs(s, dir), "doc_id", "vecs", k = 5)
        .select("query_idx", "rank", "doc_id")
        .orderBy("query_idx", "rank")
    }),

    // the staged serving shape with a RELATIONAL first stage (mean-pooled
    // inner-product top-30 per query, all-double arithmetic) feeding the
    // MaxSim rerank join — candidate volume bounded by nq x overfetch.
    // Strict: pooling, first-stage ranks, and the rerank all replay in SQL
    "maxsim_rerank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = multiVecDocs(s, dir)
      val qdf = Seq(
        (0, Seq(qvec(30).toSeq, qvec(40).toSeq)),
        (1, Seq(qvec(31).toSeq, qvec(41).toSeq)),
        (2, Seq(qvec(32).toSeq, qvec(42).toSeq))).toDF("query_idx", "qvecs")
      val pooledDocs = docs.withColumn("__pv",
        graft.operators.MaxSim.meanPool(col("vecs")))
      val pq = qdf.select(col("query_idx"),
        graft.operators.MaxSim.meanPool(col("qvecs")).as("__pq"))
      val cands = graft.operators.TopK.groupedWithRank(
        pooledDocs.crossJoin(broadcast(pq))
          .withColumn("__neg", -inner_product(col("__pv"), col("__pq")))
          // token bags and pooled vecs out before the object-encoded heap
          .select("query_idx", "doc_id", "__neg"),
        "query_idx", "__neg", "doc_id", 30, "c_rank")
      graft.operators.MaxSim.rerank(cands, qdf, "query_idx", "qvecs",
          docs, "doc_id", "vecs", K)
        .select("query_idx", "rank", "doc_id")
        .orderBy("query_idx", "rank")
    })
  )

  /** Multi-vector corpus derived from the embeddings table: document i =
    * the token-vector bag of rows `vec_id div 5 = i`, in vec_id order
    * (mirrored in SQL as `list(embedding ORDER BY vec_id)`). */
  private[queries] def multiVecDocs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
      .groupBy(expr("vec_id div 5").as("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
        x => x("embedding")).as("vecs"))

  def oracleSql: Map[String, String] = Map(
    "vector_distance_l2" ->
      s"""SELECT vec_id, label,
         | round(list_distance($EmbD, ${sqlVec(1)}), 4) AS dist
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "vector_distance_l2sq" ->
      s"""SELECT vec_id,
         | round(power(list_distance($EmbD, ${sqlVec(1)}), 2), 4) AS dist_sq
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "vector_inner_product" ->
      s"""SELECT vec_id,
         | round(list_inner_product($EmbD, ${sqlVec(2)}), 4) + 0.0 AS ip
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "vector_cosine" ->
      s"""SELECT vec_id,
         | round(list_cosine_similarity($EmbD, ${sqlVec(3)}), 4) + 0.0 AS cos_sim
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "knn_topk" ->
      s"""SELECT rank, vec_id FROM (
         |  SELECT vec_id, CAST(row_number() OVER (
         |    ORDER BY list_distance($EmbD, ${sqlVec(0)}), vec_id) AS BIGINT) AS rank
         |  FROM embeddings) t
         |WHERE rank <= $K ORDER BY rank""".stripMargin,

    "knn_batch" ->
      s"""SELECT query_idx, rank, vec_id FROM (
         |  SELECT q.query_idx, e.vec_id, CAST(row_number() OVER (
         |    PARTITION BY q.query_idx
         |    ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), q.qvec), e.vec_id) AS BIGINT) AS rank
         |  FROM (VALUES
         |    (CAST(0 AS INTEGER), ${sqlVec(0)}),
         |    (1, ${sqlVec(1)}),
         |    (2, ${sqlVec(2)}),
         |    (3, ${sqlVec(3)})) q(query_idx, qvec)
         |  CROSS JOIN embeddings e) t
         |WHERE rank <= $K ORDER BY query_idx, rank""".stripMargin,

    // the query's sign pattern is a compile-time constant, so the oracle
    // unrolls one boolean term per dimension (both engines apply the same
    // `> 0` sign rule; DuckDB lists are 1-indexed)
    "vector_bq_hamming" -> {
      val terms = qvec(4).zipWithIndex.map { case (x, i) =>
        s"CASE WHEN (embedding[${i + 1}] > 0) != ${x > 0.0} THEN 1 ELSE 0 END"
      }
      s"""SELECT vec_id, CAST(${terms.mkString(" + ")} AS BIGINT) AS hamming
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    // MaxSim replayed: the scoreLit reduce is (s21 + s22) + s23 in query-
    // token order; list_max is order-free; per-token max-dot comprehension
    "maxsim_topk" ->
      s"""$MaxSimDocsCte, scored AS (
         |  SELECT doc_id,
         |    list_max([list_inner_product(v, ${sqlVec(21)}) FOR v IN vecs])
         |    + list_max([list_inner_product(v, ${sqlVec(22)}) FOR v IN vecs])
         |    + list_max([list_inner_product(v, ${sqlVec(23)}) FOR v IN vecs]) AS s
         |  FROM dv)
         |SELECT rank, doc_id, round(s + 0.000000001, 4) + 0.0 AS maxsim FROM (
         |  SELECT doc_id, s, CAST(row_number() OVER (ORDER BY s DESC, doc_id)
         |    AS BIGINT) AS rank FROM scored) t
         |WHERE rank <= $K ORDER BY rank""".stripMargin,

    // batch form: the engine's aggregate fold starts at 0.0, so the mirror
    // keeps the leading 0.0 + for bit-identical sums
    "maxsim_table" ->
      s"""$MaxSimDocsCte, q AS (
         |  SELECT * FROM (VALUES $MaxSimQValues) AS t(query_idx, qa, qb)
         |), scored AS (
         |  SELECT q.query_idx, d.doc_id,
         |    0.0 + list_max([list_inner_product(v, q.qa) FOR v IN d.vecs])
         |        + list_max([list_inner_product(v, q.qb) FOR v IN d.vecs]) AS s
         |  FROM dv d CROSS JOIN q)
         |SELECT query_idx, rank, doc_id FROM (
         |  SELECT query_idx, doc_id, CAST(row_number() OVER (
         |    PARTITION BY query_idx ORDER BY s DESC, doc_id) AS BIGINT) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY query_idx, rank""".stripMargin,

    // staged: mean pooling replayed with list_reduce (the engine folds
    // v1+v2+... left-to-right, init = first vector), pooled-IP top-30
    // candidates per query, then the exact MaxSim rerank on that set
    "maxsim_rerank" ->
      s"""$MaxSimDocsCte, q AS (
         |  SELECT * FROM (VALUES $MaxSimQValues) AS t(query_idx, qa, qb)
         |), pd AS (
         |  SELECT doc_id, vecs,
         |    [list_reduce([v[i] FOR v IN vecs], (a, b) -> a + b) / len(vecs)
         |     FOR i IN generate_series(1, $Dim)] AS pv
         |  FROM dv
         |), pq AS (
         |  SELECT query_idx, qa, qb,
         |    [(qa[i] + qb[i]) / 2 FOR i IN generate_series(1, $Dim)] AS pqv
         |  FROM q
         |), cands AS (
         |  SELECT query_idx, doc_id, vecs, qa, qb,
         |    CAST(row_number() OVER (PARTITION BY query_idx
         |      ORDER BY list_inner_product(pv, pqv) DESC, doc_id) AS BIGINT) AS c_rank
         |  FROM pd CROSS JOIN pq
         |), final AS (
         |  SELECT query_idx, doc_id,
         |    0.0 + list_max([list_inner_product(v, qa) FOR v IN vecs])
         |        + list_max([list_inner_product(v, qb) FOR v IN vecs]) AS s
         |  FROM cands WHERE c_rank <= 30)
         |SELECT query_idx, rank, doc_id FROM (
         |  SELECT query_idx, doc_id, CAST(row_number() OVER (
         |    PARTITION BY query_idx ORDER BY s DESC, doc_id) AS BIGINT) AS rank
         |  FROM final) t
         |WHERE rank <= $K ORDER BY query_idx, rank""".stripMargin
  )

  /** Shared multi-vector oracle fixture — mirrors `multiVecDocs`. */
  private val MaxSimDocsCte: String =
    """WITH dv AS (
      |  SELECT vec_id // 5 AS doc_id,
      |    list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS vecs
      |  FROM embeddings GROUP BY 1
      |)""".stripMargin

  /** The 3 two-token literal queries shared by the batch MaxSim mirrors. */
  private val MaxSimQValues: String =
    (0 to 2).map { i =>
      val idx = if (i == 0) "CAST(0 AS INTEGER)" else i.toString
      s"($idx, ${sqlVec(30 + i)}, ${sqlVec(40 + i)})"
    }.mkString(", ")
}
