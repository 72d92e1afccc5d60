package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Public function surface: Scala `Column` API + SQL registration for the
  * vector kernels. Mirrors the reference's scalar-function surface
  * (array_distance / list_distance / *_inner_product / *_cosine_similarity,
  * reference: src/ann_optimizer.cpp:237-258) with the sqrt-vs-squared
  * duality kept explicit.
  */
object AnnFunctions {

  private def col(e: Expression): Column = GraftBridge.column(e)
  private def expr(c: Column): Expression = GraftBridge.expression(c)

  /** Euclidean (sqrt) distance — SQL `array_distance` semantics. */
  def l2_distance(a: Column, b: Column): Column = col(L2Distance(expr(a), expr(b)))

  /** Squared L2 — index-internal `_distance` semantics. */
  def l2_distance_sq(a: Column, b: Column): Column = col(L2DistanceSq(expr(a), expr(b)))

  def inner_product(a: Column, b: Column): Column = col(InnerProduct(expr(a), expr(b)))

  def cosine_similarity(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))

  /** ColBERT MaxSim of a query token bag against a doc token bag — one
    * codegen'd loop nest, no per-pair array materialization (see
    * [[MaxSimScore]]). */
  def maxsim_score(queryVecs: Column, docVecs: Column): Column =
    col(MaxSimScore(expr(queryVecs), expr(docVecs)))

  /** Pack an ARRAY<FLOAT> column's sign bits, 8 dims/byte (see [[Bq]]). */
  def bq_encode(c: Column): Column = Bq.encodeUdf(c)

  /** Hamming distance (bit-disagreement count, as a double) between
    * bq-packed codes and a float query of dimension `dim`. */
  def bq_hamming(codes: Column, q: Column, dim: Int): Column =
    col(BqDistance(expr(codes), expr(q), dim, "hamming"))

  /** L2-normalize an ARRAY column to unit length (float elements);
    * zero vectors pass through. Cosine-metric plumbing (normalize-at-build
    * + inner product, SURVEY §2.7). Single-pass codegen expression — the
    * aggregate+transform SQL formulation is O(d²) per row (see
    * [[NormalizeVector]]). */
  def normalize_vector(c: Column): Column = col(NormalizeVector(expr(c)))

  /** Narrow an ARRAY<FLOAT|DOUBLE> column to `containsNull=false` float
    * elements by mapping null ELEMENTS to NaN. NaN distances sort after
    * all real values (nan-safe compare: NaN is greatest), so such rows
    * drop out of ascending top-k. CAUTION: the same rule makes NaN PASS
    * `sim > threshold` similarity cuts — consumers must pair the cut with
    * `!isnan(sim)` (the Dedup near-dup paths do). The narrowed TYPE lets
    * the distance kernels compile WITHOUT the per-element null guard —
    * one array rebuild per input row buys a branch-free
    * (auto-vectorizable) kernel loop on quadratic and scan paths. */
  def vector_nonnull(c: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(c, x => coalesce(x.cast("float"), lit(Float.NaN)))
  }

  /** Register all functions for SQL use (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("l2_distance_sq", es => L2DistanceSq(es(0), es(1)), "scala_udf")
    // DuckDB-compatible aliases (reference surface names)
    r.createOrReplaceTempFunction("array_distance", es => L2Distance(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("list_distance", es => L2Distance(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("inner_product", es => InnerProduct(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("array_inner_product", es => InnerProduct(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("list_inner_product", es => InnerProduct(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("array_cosine_similarity", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("list_cosine_similarity", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("normalize_vector", es => NormalizeVector(es(0)), "scala_udf")
    r.createOrReplaceTempFunction("maxsim_score", es => MaxSimScore(es(0), es(1)), "scala_udf")
  }
}
