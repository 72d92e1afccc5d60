package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Binary (1-bit) quantization: each dimension stores only its sign, packed
  * 8 dims/byte — 32x smaller than float32, the strongest memory-reduction
  * rung under SQ8/FP16/PQ and the standard "billions of embeddings" storage
  * mode in large-scale retrieval stacks (faiss exposes the same idea as
  * IndexBinaryFlat over binarized vectors; public API).
  *
  * Restricted to the cosine metric: for direction-only comparison the
  * Hamming distance h between sign patterns is a faithful angular proxy —
  * under the random-hyperplane model (Charikar STOC'02, the same result
  * behind the SimHash/LSH paths in [[graft.pipeline.Dedup]]),
  * E[h/d] = theta/pi, so cos(pi*h/d) estimates cos(theta). L2/IP need
  * magnitudes, which sign bits cannot carry.
  *
  * Candidate generation is Hamming-ordered (XOR + popcount, ~d/64 long ops
  * per pair); exact ranking comes from the re-rank path
  * ([[graft.index.AnnIndex.search]] rerank=true), which re-scores the
  * fetched candidates on raw floats — the same IndexRefineFlat pattern the
  * PQ path uses.
  */
object Bq {

  def numBytes(dim: Int): Int = (dim + 7) / 8

  /** Pack sign bits little-endian within the byte: dim i → byte i>>3, bit
    * i&7. Set iff v(i) > 0 (zeros and NaNs pack as 0 — deterministic).
    * Padding bits of the last byte stay 0 on every encode, so they never
    * contribute to an XOR. */
  def encode(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](numBytes(v.length))
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Best direction-only reconstruction: the unit vector with the stored
    * signs, ±1/sqrt(dim) per dim. Only meaningful under cosine — which is
    * the only metric the manager accepts for bq storage. */
  def decode(codes: Array[Byte], dim: Int): Array[Float] = {
    val s = (1.0 / math.sqrt(dim.toDouble)).toFloat
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = if (((codes(i >> 3) >> (i & 7)) & 1) == 1) s else -s
      i += 1
    }
    out
  }

  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    var h = 0
    var i = 0
    while (i < a.length) {
      h += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    h
  }

  /** Angular-distance estimate on the shared cosine `_distance` scale:
    * 1 - cos(pi*h/d), in [0, 2] like `1 - cosine_similarity`. Monotone in
    * h, so candidate ordering IS Hamming ordering. */
  def cosineDistanceEstimate(h: Int, dim: Int): Double =
    1.0 - math.cos(math.Pi * h / dim)

  val encodeUdf: UserDefinedFunction = udf((v: Seq[Float]) => encode(v.toArray))
  def decodeUdf(dim: Int): UserDefinedFunction =
    udf((b: Array[Byte]) => decode(b, dim))
}

/** Distance between bq-packed sign codes and a float query.
  * metric "cosine" → 1 - cos(pi*h/dim) (the index `_distance` scale);
  * metric "hamming" → the raw bit-disagreement count as a double (integer-
  * valued — exact, oracle-comparable).
  *
  * A constant query folds to packed bytes once (reference object), making
  * the per-row work pure XOR+popcount over dim/8 bytes; a column query
  * binarizes per row (O(dim), the cost class of the other decode-on-access
  * kernels). */
case class BqDistance(left: Expression, right: Expression, dim: Int, metric: String)
    extends BinaryExpression with Serializable {

  require(metric == "cosine" || metric == "hamming",
    s"bq_distance supports cosine|hamming, got $metric")

  override def prettyName: String = s"bq_distance_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, ARRAY<FLOAT|DOUBLE>), got ${l.catalogString}, ${r.catalogString}")
  }

  private def qIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Null query elements yield a null distance (and force nullability) —
    * same contract as [[Sq8Distance]]/[[Fp16Distance]]/[[PqDistance]]. */
  private def qMayHaveNullElems: Boolean =
    childrenResolved && (right.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def nullable: Boolean = super.nullable || qMayHaveNullElems

  /** Constant query packed once. None = query not constant, or constant
    * with a null element (expression is then constantly null). */
  @transient private lazy val constBits: Option[Array[Byte]] =
    if (!right.foldable) None
    else Option(right.eval(null)).map(_.asInstanceOf[ArrayData]).flatMap { qd =>
      val n = qd.numElements()
      if (n != dim) throw new IllegalArgumentException(
        s"$prettyName: dimensions differ (codes=$dim, query=$n)")
      var hasNull = false
      var i = 0
      while (i < n && !hasNull) { if (qd.isNullAt(i)) hasNull = true; i += 1 }
      if (hasNull) None
      else {
        val q = new Array[Float](n)
        i = 0
        while (i < n) {
          q(i) = if (qIsFloat) qd.getFloat(i) else qd.getDouble(i).toFloat
          i += 1
        }
        Some(Bq.encode(q))
      }
    }

  private def finish(h: Int): Double =
    if (metric == "hamming") h.toDouble else Bq.cosineDistanceEstimate(h, dim)

  private def checkCodeLen(n: Int): Unit =
    if (n != Bq.numBytes(dim)) throw new IllegalArgumentException(
      s"$prettyName: bq code length $n != ${Bq.numBytes(dim)} (dim=$dim)")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    // constant-null query (or constant query with a null element) → null,
    // bypassing BinaryExpression's non-null fast path
    if (right.foldable && constBits.isEmpty) null
    else super.eval(input)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    checkCodeLen(codes.length)
    constBits match {
      case Some(qb) => finish(Bq.hamming(codes, qb))
      case None =>
        val q = r.asInstanceOf[ArrayData]
        if (q.numElements() != dim) throw new IllegalArgumentException(
          s"$prettyName: dimensions differ (codes=$dim, query=${q.numElements()})")
        if (qMayHaveNullElems) {
          var i = 0
          while (i < dim) { if (q.isNullAt(i)) return null; i += 1 }
        }
        var h = 0
        var i = 0
        while (i < dim) {
          val qPos = if (qIsFloat) q.getFloat(i) > 0f else q.getDouble(i) > 0.0
          val cPos = ((codes(i >> 3) >> (i & 7)) & 1) == 1
          if (qPos != cPos) h += 1
          i += 1
        }
        finish(h)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nb = Bq.numBytes(dim)
    val finishCode = (h: String) =>
      if (metric == "hamming") s"(double) $h"
      else s"1.0 - java.lang.Math.cos(java.lang.Math.PI * $h / (double) $dim)"
    val lenCheck = (codes: String) =>
      s"""if ($codes.length != $nb) {
         |  throw new IllegalArgumentException("$prettyName: bq code length "
         |    + $codes.length + " != $nb (dim=$dim)");
         |}""".stripMargin
    constBits match {
      case Some(qb) => // constant query: XOR + popcount over dim/8 bytes
        val qbRef = ctx.addReferenceObj("bqQueryBits", qb, "byte[]")
        nullSafeCodeGen(ctx, ev, (codes, _) => {
          val i = ctx.freshName("i"); val h = ctx.freshName("h")
          s"""${lenCheck(codes)}
             |int $h = 0;
             |for (int $i = 0; $i < $nb; $i++) {
             |  $h += java.lang.Integer.bitCount(($codes[$i] ^ $qbRef[$i]) & 0xff);
             |}
             |${ev.value} = ${finishCode(h)};""".stripMargin
        })
      case None =>
        val getQPos = if (qIsFloat) (q: String, i: String) => s"$q.getFloat($i) > 0f"
                      else (q: String, i: String) => s"$q.getDouble($i) > 0.0"
        nullSafeCodeGen(ctx, ev, (codes, q) => {
          val i = ctx.freshName("i"); val h = ctx.freshName("h")
          val nullGuard =
            if (!qMayHaveNullElems) ""
            else {
              val j = ctx.freshName("j")
              s"""for (int $j = 0; $j < $dim; $j++) {
                 |  if ($q.isNullAt($j)) { ${ev.isNull} = true; break; }
                 |}
                 |if (!${ev.isNull}) {""".stripMargin
            }
          val nullGuardClose = if (qMayHaveNullElems) "}" else ""
          s"""${lenCheck(codes)}
             |if ($q.numElements() != $dim) {
             |  throw new IllegalArgumentException("$prettyName: dimensions differ (codes="
             |    + $dim + ", query=" + $q.numElements() + ")");
             |}
             |$nullGuard
             |int $h = 0;
             |for (int $i = 0; $i < $dim; $i++) {
             |  final boolean qPos = ${getQPos(q, i)};
             |  final boolean cPos = (($codes[$i >> 3] >> ($i & 7)) & 1) == 1;
             |  if (qPos != cPos) $h++;
             |}
             |${ev.value} = ${finishCode(h)};
             |$nullGuardClose""".stripMargin
        })
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distance between two bq-packed sign codes — the batch-search fast path:
  * queries are binarized ONCE driver-side (50 queries → 50 tiny encodes),
  * and every (candidate, query) pair is pure XOR+popcount over dim/8
  * bytes. Same output contract as [[BqDistance]] (cosine estimate or raw
  * Hamming count), so the two are interchangeable in ranking. */
case class BqCodesDistance(left: Expression, right: Expression, dim: Int, metric: String)
    extends BinaryExpression with Serializable {

  require(metric == "cosine" || metric == "hamming",
    s"bq_codes_distance supports cosine|hamming, got $metric")

  override def prettyName: String = s"bq_codes_distance_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY), got ${l.catalogString}, ${r.catalogString}")
  }

  private def finish(h: Int): Double =
    if (metric == "hamming") h.toDouble else Bq.cosineDistanceEstimate(h, dim)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    val nb = Bq.numBytes(dim)
    if (a.length != nb || b.length != nb) throw new IllegalArgumentException(
      s"$prettyName: code lengths (${a.length}, ${b.length}) != $nb (dim=$dim)")
    finish(Bq.hamming(a, b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nb = Bq.numBytes(dim)
    val finishCode = (h: String) =>
      if (metric == "hamming") s"(double) $h"
      else s"1.0 - java.lang.Math.cos(java.lang.Math.PI * $h / (double) $dim)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""if ($a.length != $nb || $b.length != $nb) {
         |  throw new IllegalArgumentException("$prettyName: code lengths ("
         |    + $a.length + ", " + $b.length + ") != $nb (dim=$dim)");
         |}
         |int $h = 0;
         |for (int $i = 0; $i < $nb; $i++) {
         |  $h += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = ${finishCode(h)};""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
