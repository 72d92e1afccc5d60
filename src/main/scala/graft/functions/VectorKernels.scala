package graft.functions

/** Plain-Scala distance kernels over primitive float arrays.
  *
  * Used inside `mapPartitions` search kernels (index scans, graph search)
  * where we work on `Array[Float]` directly; the Catalyst expressions in
  * [[VectorExpressions]] are the DataFrame-visible twins.
  *
  * Semantics mirror the reference engine's kernels
  * (reference: rust_lib/src/distance.rs:15-24 — SquaredL2 and InnerProduct):
  *  - index-internal distances are **squared** L2 (lower = better);
  *  - inner product is negated only when used as an index ordering key
  *    (reference: src/ann_search.cpp:711-717);
  *  - accumulation is in Double for determinism and precision, matching a
  *    DuckDB oracle computing over DOUBLE[].
  *
  * Hot loops are over primitive arrays with no allocation so the JIT can
  * unroll/vectorize — the JVM stand-in for the reference's SIMD kernels.
  */
object VectorKernels extends Serializable {

  /** Dimension threshold above which the codegen'd expressions
    * ([[VectorExpressions]]) bulk-copy an ArrayData side to float[] before
    * the loop instead of reading per-element getters: the copy amortizes
    * once the auto-vectorized primitive loop saves more than the per-row
    * copy costs (A/B'd at d=64 getter-wins vs d=768 copy-wins). */
  final val CopyThreshold = 256

  /** Unwrap an ArrayData of floats to a primitive array for the codegen'd
    * kernels' fast path, reusing `scratch` when possible. UnsafeArrayData
    * (broadcast/shuffled/sorted rows) bulk-copies into the caller's scratch
    * buffer — no allocation, and no zeroing of a fresh array that the copy
    * would immediately overwrite. Other array classes (ColumnarArray from
    * cached/parquet scans) fall back to their own bulk `toFloatArray`,
    * which allocates — the returned array is handed back as the next
    * scratch, so a stream of same-dim columnar rows allocates each row
    * only because ColumnVector exposes no copy-into API.
    *
    * Callers must NOT retain the result across evaluations (the next call
    * overwrites it) — the generated kernels consume it within one row.
    * Only called from the no-null-elements codegen branch, so null slots
    * cannot reach the raw copy. */
  def unwrapFloats(a: org.apache.spark.sql.catalyst.util.ArrayData,
                   n: Int, scratch: Array[Float]): Array[Float] = a match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      val buf = if (scratch != null && scratch.length == n) scratch
                else new Array[Float](n)
      org.apache.spark.unsafe.Platform.copyMemory(
        u.getBaseObject,
        u.getBaseOffset + org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .calculateHeaderPortionInBytes(n),
        buf, org.apache.spark.unsafe.Platform.FLOAT_ARRAY_OFFSET, n * 4L)
      buf
    case other => other.toFloatArray()
  }

  /** One-branch guard on every kernel: iterating `a.length` over a shorter
    * `b` would throw mid-loop, and over a longer `b` would silently compare
    * only a prefix (e.g. a short user query vs index centroids → wrong
    * cells probed, wrong results with no error). */
  @inline private def checkLen(a: Array[Float], b: Array[Float]): Unit =
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vector dimensions differ (${a.length} vs ${b.length})")

  /** Squared L2 distance (sum of squared diffs). */
  def l2Sq(a: Array[Float], b: Array[Float]): Double = {
    checkLen(a, b)
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Euclidean (sqrt) L2 distance — SQL-level `array_distance` semantics. */
  def l2(a: Array[Float], b: Array[Float]): Double = math.sqrt(l2Sq(a, b))

  /** Dot product (positive; negate for index ordering where needed). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    checkLen(a, b)
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosineSimilarity(a: Array[Float], b: Array[Float]): Double = {
    checkLen(a, b)
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Distance under a named metric, in "lower is better" orientation.
    * Metrics mirror the reference (l2 → squared L2, ip → negated dot,
    * cosine → 1 - cosine similarity). */
  def orderingDistance(metric: String)(a: Array[Float], b: Array[Float]): Double =
    metric match {
      case "l2"     => l2Sq(a, b)
      case "ip"     => -dot(a, b)
      case "cosine" => 1.0 - cosineSimilarity(a, b)
      case m        => throw new IllegalArgumentException(s"unknown metric: $m")
    }

  /** L2-normalize in place-free copy (cosine index = normalize + IP,
    * reference: src/ann_optimizer.cpp:241-243 capability note). */
  def normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n == 0.0) a.clone()
    else {
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i) / n).toFloat; i += 1 }
      out
    }
  }
}
