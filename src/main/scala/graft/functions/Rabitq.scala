package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** RaBitQ-style 1-bit quantization (Gao & Long, "RaBitQ: Quantizing High-
  * Dimensional Vectors with a Theoretical Error Bound for Approximate
  * Nearest Neighbor Search", SIGMOD 2024 — public paper): the modern
  * replacement for naive sign binarization ([[Bq]]) at the same ~1 bit/dim
  * budget.
  *
  * Per vector v with r = ‖v‖ and unit direction o = v/r:
  *  1. rotate by a seeded random ORTHONORMAL matrix P (the paper's
  *     randomized codebook, realized as sign quantization after a random
  *     rotation): o' = P·o;
  *  2. store the sign pattern x̄ = sign(o')/√d (1 bit/dim, packed like
  *     [[Bq]]: dim i → byte i>>3, bit i&7, set iff o'(i) > 0);
  *  3. store two float32 correction factors: r (the original norm) and
  *     cf = ⟨o', x̄⟩ = Σ|o'_i|/√d.
  *
  * Query side (ASYMMETRIC — the query stays float, unlike Hamming):
  * rotate q once, then ⟨o, q⟩ is estimated by the paper's estimator
  * specialized to the sign codebook: ⟨x̄, P·q⟩ / cf, which is a consistent
  * estimator of ⟨o, q⟩ with error O(1/√d) — concentration of the rotated
  * residual, RaBitQ §3.2/Theorem 3.2. Two advantages over [[Bq]]'s
  * symmetric Hamming ordering at identical storage (+8 bytes/vector):
  *  - the score is a real-valued dot against the float query, not an
  *    integer bit-disagreement count, so ties don't collapse ranks;
  *  - r and cf restore per-vector magnitude, making the estimate valid
  *    for L2 and IP — bq is cosine-only by construction.
  *
  * Distance output matches the engine's metric scales
  * ([[graft.index.AnnIndex.floatDistColumn]]):
  *   l2 → r² + ‖q‖² − 2·r·êst   (squared-L2 index semantics),
  *   ip → −(r·êst),
  *   cosine → 1 − êst           (build+query are unit-normalized).
  *
  * Like every lossy codec here, the exact ranking comes from the rerank
  * path (search(rerank = true), the IndexRefineFlat pattern): RaBitQ
  * selects candidates, raw floats re-score them.
  *
  * The rotation matrix is DETERMINISTIC per (seed, dim), regenerated from
  * the seed on each executor and cached per JVM (same no-state-on-the-wire
  * posture as [[Projection]]); Gram–Schmidt over a seeded Gaussian draw,
  * re-projected once for float-precision stability.
  */
object Rabitq {

  /** Packed sign bits + 2 float32 trailers (r, cf), little-endian. */
  def numBytes(dim: Int): Int = (dim + 7) / 8 + 8

  private val rotCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, java.lang.Long), Array[Float]]()

  /** Row-major (dim × dim) orthonormal matrix for (dim, seed) — cached per
    * JVM (d=768 → 2.3 MB, built once in ~O(d³)). */
  def rotation(dim: Int, seed: Long): Array[Float] =
    rotCache.computeIfAbsent((dim, seed), { _ =>
      val rnd = new java.util.Random(seed)
      // double-precision working copy: Gram–Schmidt with one
      // re-orthogonalization pass (classical GS is unstable in float)
      val m = Array.fill(dim * dim)(rnd.nextGaussian())
      var i = 0
      while (i < dim) {
        val base = i * dim
        var pass = 0
        while (pass < 2) { // "twice is enough" (Giraud et al., classical result)
          var j = 0
          while (j < i) {
            val jb = j * dim
            var dot = 0.0
            var k = 0
            while (k < dim) { dot += m(base + k) * m(jb + k); k += 1 }
            k = 0
            while (k < dim) { m(base + k) -= dot * m(jb + k); k += 1 }
            j += 1
          }
          pass += 1
        }
        var nrm = 0.0
        var k = 0
        while (k < dim) { nrm += m(base + k) * m(base + k); k += 1 }
        nrm = math.sqrt(nrm)
        if (nrm < 1e-9) { // measure-zero degenerate draw: fall back to e_i
          java.util.Arrays.fill(m, base, base + dim, 0.0)
          m(base + (i % dim)) = 1.0
        } else {
          k = 0
          while (k < dim) { m(base + k) /= nrm; k += 1 }
        }
        i += 1
      }
      val out = new Array[Float](dim * dim)
      i = 0
      while (i < dim * dim) { out(i) = m(i).toFloat; i += 1 }
      out
    })

  /** y = P·v (row-major rows are the orthonormal basis). Double
    * accumulation — shared kernel precision contract. */
  def rotate(v: Array[Float], dim: Int, seed: Long): Array[Float] = {
    val p = rotation(dim, seed)
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      var acc = 0.0
      val base = j * dim
      var i = 0
      while (i < dim) { acc += p(base + i).toDouble * v(i).toDouble; i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    out
  }

  /** y = Pᵀ·x — the inverse rotation (P orthonormal). */
  def rotateBack(x: Array[Float], dim: Int, seed: Long): Array[Float] = {
    val p = rotation(dim, seed)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += p(j * dim + i).toDouble * x(j).toDouble; j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  private def putFloatLE(b: Array[Byte], off: Int, f: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(f)
    b(off) = (bits & 0xff).toByte
    b(off + 1) = ((bits >>> 8) & 0xff).toByte
    b(off + 2) = ((bits >>> 16) & 0xff).toByte
    b(off + 3) = ((bits >>> 24) & 0xff).toByte
  }

  def getFloatLE(b: Array[Byte], off: Int): Float =
    java.lang.Float.intBitsToFloat(
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24))

  def encode(v: Array[Float], seed: Long): Array[Byte] = {
    val dim = v.length
    val nb = (dim + 7) / 8
    val out = new Array[Byte](numBytes(dim))
    var r = 0.0
    var i = 0
    while (i < dim) { r += v(i).toDouble * v(i).toDouble; i += 1 }
    r = math.sqrt(r)
    if (r == 0.0 || r.isNaN) return out // zero/NaN vector: bits 0, r=0, cf=0
    val o = new Array[Float](dim)
    i = 0
    while (i < dim) { o(i) = (v(i) / r).toFloat; i += 1 }
    val orot = rotate(o, dim, seed)
    var absSum = 0.0
    i = 0
    while (i < dim) {
      if (orot(i) > 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      absSum += math.abs(orot(i).toDouble)
      i += 1
    }
    putFloatLE(out, nb, r.toFloat)
    putFloatLE(out, nb + 4, (absSum / math.sqrt(dim.toDouble)).toFloat)
    out
  }

  /** Best direction-only reconstruction: v̂ = r · Pᵀ(sign bits/√d) — the
    * unit vector with the stored rotated signs, rescaled to the stored
    * norm. Feeds graph shard decode, vacuum rebuilds, and merges.
    *
    * Re-encoding a decoded vector preserves the bit pattern and r exactly
    * (P·Pᵀ = I) but sets cf = 1 by construction (Σ|±1/√d|/√d = 1) — after
    * a lossy graph rebuild the estimator is therefore EXACT over the
    * reconstructed vectors rather than corrected toward the originals.
    * FLAT/IVF vacuum copies codes verbatim, so it is fully lossless. */
  def decode(codes: Array[Byte], dim: Int, seed: Long): Array[Float] = {
    val nb = (dim + 7) / 8
    require(codes.length == numBytes(dim),
      s"rabitq code length ${codes.length} != ${numBytes(dim)} (dim=$dim)")
    val r = getFloatLE(codes, nb)
    if (r == 0f) return new Array[Float](dim)
    val s = (1.0 / math.sqrt(dim.toDouble)).toFloat
    val xbar = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      xbar(i) = if (((codes(i >> 3) >> (i & 7)) & 1) == 1) s else -s
      i += 1
    }
    val back = rotateBack(xbar, dim, seed)
    i = 0
    while (i < dim) { back(i) = back(i) * r; i += 1 }
    back
  }

  def encodeUdf(seed: Long): UserDefinedFunction =
    udf((v: Seq[Float]) => encode(v.toArray, seed))
  def decodeUdf(dim: Int, seed: Long): UserDefinedFunction =
    udf((b: Array[Byte]) => decode(b, dim, seed))
  /** Once-per-query rotation for batch table search (executor-side, cached
    * matrix) — the pair kernel then runs with `preRotated = true`. */
  def rotateUdf(dim: Int, seed: Long): UserDefinedFunction =
    udf((v: Seq[Float]) => rotate(v.toArray, dim, seed))
}

/** Serializable per-row rotation helper for the non-constant-query codegen
  * path (the matrix itself never crosses the wire — regenerated from
  * (dim, seed) and cached per JVM). */
final case class RabitqRotHelper(dim: Int, seed: Long) extends Serializable {
  def rotate(v: Array[Float]): Array[Float] = Rabitq.rotate(v, dim, seed)
}

/** Distance between RaBitQ codes and a float query — see [[Rabitq]] for
  * the estimator.
  *
  * Constant query (the single-query scan path): rotated ONCE at plan
  * construction, then folded into per-byte partial-sum lookup tables
  * (nb × 256 doubles — the ADC fast-scan trick, same shape as
  * [[PqDistance]]'s folded tables), so the per-row work is nb table loads
  * + adds and two trailer reads.
  *
  * Column query with `preRotated = true` (the batch table path: queries
  * rotated once per query row upstream): per-pair O(dim) bit-test loop —
  * no per-pair rotation.
  *
  * Column query with `preRotated = false`: correctness fallback; rotates
  * per row (O(dim²)) via a cached-matrix helper. */
case class RabitqDistance(left: Expression, right: Expression, dim: Int,
                          seed: Long, metric: String, preRotated: Boolean = false)
    extends BinaryExpression with Serializable {

  require(metric == "l2" || metric == "ip" || metric == "cosine",
    s"rabitq_distance supports l2|ip|cosine, got $metric")

  override def prettyName: String = s"rabitq_distance_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, ARRAY<FLOAT|DOUBLE>), got ${l.catalogString}, ${r.catalogString}")
  }

  private def qIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Null query elements yield a null distance — shared kernel contract. */
  private def qMayHaveNullElems: Boolean =
    childrenResolved && (right.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def nullable: Boolean = super.nullable || qMayHaveNullElems

  private val nb = (dim + 7) / 8
  private val invSqrtD = 1.0 / math.sqrt(dim.toDouble)

  /** Constant-query preprocessing: (lut, sumQ, qq). lut(p*256+b) =
    * Σ qrot(p*8+j) over set bits j of b (padding dims excluded). None =
    * query not constant, or constant with a null element. */
  @transient private lazy val constPrep: Option[(Array[Double], Double, Double)] =
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
        val qrot = if (preRotated) q else Rabitq.rotate(q, dim, seed)
        var sumQ = 0.0; var qq = 0.0
        i = 0
        while (i < dim) {
          sumQ += qrot(i).toDouble
          qq += q(i).toDouble * q(i).toDouble // rotation preserves ‖q‖; use raw
          i += 1
        }
        val lut = new Array[Double](nb * 256)
        var p = 0
        while (p < nb) {
          var b = 0
          while (b < 256) {
            var acc = 0.0
            var j = 0
            while (j < 8) {
              val d0 = p * 8 + j
              if (((b >> j) & 1) == 1 && d0 < dim) acc += qrot(d0).toDouble
              j += 1
            }
            lut(p * 256 + b) = acc
            b += 1
          }
          p += 1
        }
        Some((lut, sumQ, qq))
      }
    }

  @transient private lazy val rotHelper = RabitqRotHelper(dim, seed)

  /** est ≈ ⟨o, q⟩ (data direction × full-scale query) → metric distance. */
  private def finish(dotRaw: Double, r: Double, cf: Double, qq: Double): Double = {
    val est = if (cf > 0.0) dotRaw * invSqrtD / cf else 0.0
    metric match {
      case "l2"     => r * r + qq - 2.0 * r * est
      case "ip"     => -(r * est)
      case "cosine" => 1.0 - est
    }
  }

  private def checkCodeLen(n: Int): Unit =
    if (n != Rabitq.numBytes(dim)) throw new IllegalArgumentException(
      s"$prettyName: rabitq code length $n != ${Rabitq.numBytes(dim)} (dim=$dim)")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    // constant-null query (or constant with a null element) → null
    if (right.foldable && constPrep.isEmpty) null
    else super.eval(input)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    checkCodeLen(codes.length)
    val rr = Rabitq.getFloatLE(codes, nb).toDouble
    val cf = Rabitq.getFloatLE(codes, nb + 4).toDouble
    constPrep match {
      case Some((lut, sumQ, qq)) =>
        var s1 = 0.0
        var i = 0
        while (i < nb) { s1 += lut(i * 256 + (codes(i) & 0xff)); i += 1 }
        finish(2.0 * s1 - sumQ, rr, cf, qq)
      case None =>
        val qd = r.asInstanceOf[ArrayData]
        if (qd.numElements() != dim) throw new IllegalArgumentException(
          s"$prettyName: dimensions differ (codes=$dim, query=${qd.numElements()})")
        if (qMayHaveNullElems) {
          var i = 0
          while (i < dim) { if (qd.isNullAt(i)) return null; i += 1 }
        }
        val q = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          q(i) = if (qIsFloat) qd.getFloat(i) else qd.getDouble(i).toFloat
          i += 1
        }
        val qrot = if (preRotated) q else rotHelper.rotate(q)
        var s1 = 0.0; var sumQ = 0.0; var qq = 0.0
        i = 0
        while (i < dim) {
          val qi = qrot(i).toDouble
          sumQ += qi
          qq += qi * qi // qrot preserves ‖q‖ (orthonormal rotation)
          if (((codes(i >> 3) >> (i & 7)) & 1) == 1) s1 += qi
          i += 1
        }
        finish(2.0 * s1 - sumQ, rr, cf, qq)
    }
  }

  private def finishCode(dotRaw: String, r: String, cf: String, qq: String): String = {
    val est = s"(($cf > 0.0) ? ($dotRaw * $invSqrtD / $cf) : 0.0)"
    metric match {
      case "l2"     => s"$r * $r + $qq - 2.0 * $r * $est"
      case "ip"     => s"-($r * $est)"
      case "cosine" => s"1.0 - $est"
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val total = Rabitq.numBytes(dim)
    val lenCheck = (codes: String) =>
      s"""if ($codes.length != $total) {
         |  throw new IllegalArgumentException("$prettyName: rabitq code length "
         |    + $codes.length + " != $total (dim=$dim)");
         |}""".stripMargin
    // SINGLE line: a multi-line emission here would have its `| (...)`
    // bitwise-OR continuations eaten by the enclosing template's
    // stripMargin (whitespace + '|' parses as a margin)
    val readF = (codes: String, off: Int) =>
      s"java.lang.Float.intBitsToFloat(($codes[$off] & 0xff) | (($codes[${off + 1}] & 0xff) << 8) | (($codes[${off + 2}] & 0xff) << 16) | (($codes[${off + 3}] & 0xff) << 24))"
    constPrep match {
      case Some((lut, sumQ, qq)) =>
        val lutRef = ctx.addReferenceObj("rabitqLut", lut, "double[]")
        nullSafeCodeGen(ctx, ev, (codes, _) => {
          val i = ctx.freshName("i"); val s1 = ctx.freshName("s1")
          val rr = ctx.freshName("rr"); val cf = ctx.freshName("cf")
          s"""${lenCheck(codes)}
             |double $s1 = 0.0;
             |for (int $i = 0; $i < $nb; $i++) {
             |  $s1 += $lutRef[$i * 256 + ($codes[$i] & 0xff)];
             |}
             |final double $rr = (double) ${readF(codes, nb)};
             |final double $cf = (double) ${readF(codes, nb + 4)};
             |${ev.value} = ${finishCode(s"(2.0 * $s1 - $sumQ)", rr, cf, qq.toString)};""".stripMargin
        })
      case None =>
        val helperRef =
          if (preRotated) ""
          else ctx.addReferenceObj("rabitqRot", rotHelper, classOf[RabitqRotHelper].getName)
        val getQ = if (qIsFloat) (q: String, i: String) => s"$q.getFloat($i)"
                   else (q: String, i: String) => s"(float) $q.getDouble($i)"
        nullSafeCodeGen(ctx, ev, (codes, q) => {
          val i = ctx.freshName("i"); val s1 = ctx.freshName("s1")
          val sq = ctx.freshName("sumQ"); val qq = ctx.freshName("qq")
          val qa = ctx.freshName("qa"); val qi = ctx.freshName("qi")
          val rr = ctx.freshName("rr"); val cf = ctx.freshName("cf")
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
          val fill =
            s"""float[] $qa = new float[$dim];
               |for (int $i = 0; $i < $dim; $i++) { $qa[$i] = ${getQ(q, i)}; }""".stripMargin
          val rotateLine =
            if (preRotated) "" else s"$qa = $helperRef.rotate($qa);"
          s"""${lenCheck(codes)}
             |if ($q.numElements() != $dim) {
             |  throw new IllegalArgumentException("$prettyName: dimensions differ (codes="
             |    + $dim + ", query=" + $q.numElements() + ")");
             |}
             |$nullGuard
             |$fill
             |$rotateLine
             |double $s1 = 0.0; double $sq = 0.0; double $qq = 0.0;
             |for (int $i = 0; $i < $dim; $i++) {
             |  final double $qi = (double) $qa[$i];
             |  $sq += $qi;
             |  $qq += $qi * $qi;
             |  if ((($codes[$i >> 3] >> ($i & 7)) & 1) == 1) $s1 += $qi;
             |}
             |final double $rr = (double) ${readF(codes, nb)};
             |final double $cf = (double) ${readF(codes, nb + 4)};
             |${ev.value} = ${finishCode(s"(2.0 * $s1 - $sq)", rr, cf, qq)};
             |$nullGuardClose""".stripMargin
        })
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
