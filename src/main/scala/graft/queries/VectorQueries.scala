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
    })
  )

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
    }
  )
}
