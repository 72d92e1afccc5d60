package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Product quantization (Jégou, Douze, Schmid: "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each vector into `m`
  * contiguous subvectors of `dsub = dim/m` dims, vector-quantize each
  * subspace against its own codebook of `ksub ≤ 256` centroids, store one
  * byte per subspace — `m` bytes per vector vs `4·dim` for float32.
  *
  * This is the compression tier the reference lacks (it stops at SQ8's 4x,
  * rust_lib/src/index_manager.rs:508-536) and the one that matters at
  * 100 TB: m = dim/8 is a 32x storage/shuffle reduction, the difference
  * between an embedding corpus fitting executor memory or not. Distances
  * are computed asymmetrically (ADC): the query stays float, each stored
  * code contributes its subspace centroid — equivalent to the distance
  * between the query and the PQ reconstruction, so for a CONSTANT query the
  * whole per-subspace geometry folds into an `m·ksub` lookup table and the
  * per-row cost is `m` table loads instead of `dim` multiply-adds.
  *
  * Codes quantize RAW vectors (the faiss IndexPQ shape; IVFPQ here is
  * by_residual=false). Residual encoding would couple every code to its
  * cell assignment, breaking the codec seam insert/vacuum/merge and the
  * graph engines decode through — instead `search(rerank = true)` recovers
  * exact ranking from the fetched raw floats at k·oversample cost.
  */
object Pq {

  /** Trained codebooks: `flat((s·ksub + code)·dsub + j)` = dim j of the
    * centroid for `code` in subspace `s`. */
  final case class Codebooks(m: Int, ksub: Int, dsub: Int, flat: Array[Float])
      extends Serializable {
    def dim: Int = m * dsub
    require(flat.length == m * ksub * dsub,
      s"codebook geometry mismatch: m=$m ksub=$ksub dsub=$dsub but ${flat.length} floats")
  }

  /** PQ geometry for a dimension: subspace width `dsub` is the first of
    * (8, 4, 2, 1) dividing `dim` unless `pq_m` is given explicitly; `ksub`
    * defaults to 256 (full byte codes). */
  def resolveGeometry(dim: Int, params: Map[String, String]): (Int, Int) = {
    val m = params.get("pq_m").map(_.toInt).getOrElse {
      val dsub = Seq(8, 4, 2, 1).find(dim % _ == 0).get
      dim / dsub
    }
    require(m >= 1 && dim % m == 0,
      s"pq_m=$m must be >= 1 and divide dim=$dim (subvectors are contiguous equal slices)")
    val ksub = params.get("pq_ksub").map(_.toInt).getOrElse(256)
    require(ksub >= 1 && ksub <= 256,
      s"pq_ksub=$ksub out of range [1, 256] (codes are single bytes)")
    (m, ksub)
  }

  /** Nearest-centroid code for subspace `s` of `v`. */
  private def encodeSub(v: Array[Float], s: Int, b: Codebooks): Byte = {
    val off = s * b.dsub
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < b.ksub) {
      val base = (s * b.ksub + c) * b.dsub
      var d = 0.0; var j = 0
      while (j < b.dsub) {
        val t = v(off + j) - b.flat(base + j)
        d += t * t; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best.toByte
  }

  def encode(v: Array[Float], b: Codebooks): Array[Byte] = {
    require(v.length == b.dim, s"cannot PQ-encode dim ${v.length} with dim-${b.dim} codebooks")
    val out = new Array[Byte](b.m)
    var s = 0
    while (s < b.m) { out(s) = encodeSub(v, s, b); s += 1 }
    out
  }

  /** Reconstruction: concatenated subspace centroids. */
  def decode(codes: Array[Byte], b: Codebooks): Array[Float] = {
    require(codes.length == b.m, s"PQ code length ${codes.length} != m=${b.m}")
    val out = new Array[Float](b.dim)
    var s = 0
    while (s < b.m) {
      System.arraycopy(b.flat, (s * b.ksub + (codes(s) & 0xff)) * b.dsub, out, s * b.dsub, b.dsub)
      s += 1
    }
    out
  }

  def encodeUdf(b: Codebooks): UserDefinedFunction = udf((v: Seq[Float]) => encode(v.toArray, b))
  def decodeUdf(b: Codebooks): UserDefinedFunction = udf((c: Array[Byte]) => decode(c, b))
}

/** Asymmetric (ADC) distance between PQ codes and a float query.
  * Value-identical to running the float kernels against the PQ
  * reconstruction: l2 → squared L2, ip → negated dot, cosine → 1 − cosine
  * over the reconstruction (renormalized inside the kernel, absorbing
  * quantization drift of build-normalized vectors — same contract as
  * [[Sq8Distance]]).
  *
  * Two codegen shapes:
  *  - constant query (the single-query scan path): the per-subspace
  *    distances fold into lookup tables built once per task — O(m) loads
  *    per row, the classic ADC fast path;
  *  - column query (batch search, one row per (candidate, query) pair):
  *    O(dim) loop through the referenced codebook array, same cost class
  *    as the SQ8/FP16 decode-on-access kernels.
  */
case class PqDistance(left: Expression, right: Expression,
                      b: Pq.Codebooks, metric: String)
    extends BinaryExpression with Serializable {

  override def prettyName: String = s"pq_distance_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, ARRAY<FLOAT|DOUBLE>), got ${l.catalogString}, ${r.catalogString}")
  }

  private def qIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Null query elements yield a null distance (and force nullability) —
    * same contract as [[Sq8Distance]]/[[Fp16Distance]]. */
  private def qMayHaveNullElems: Boolean =
    childrenResolved && (right.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def nullable: Boolean = super.nullable || qMayHaveNullElems

  /** The constant-query ADC tables. `lutA` is the metric's additive term
    * per (subspace, code): squared-L2 partial for l2, dot partial for
    * ip/cosine. `lutNorm` (cosine only) is the reconstruction's squared-norm
    * partial. Empty option = query not constant, or constant with a null
    * element (the expression is then constantly null). Rebuilt lazily per
    * deserialized task instance — m·ksub·dsub work, amortized over the
    * partition. */
  @transient private lazy val constLuts: Option[(Array[Double], Array[Double], Double)] =
    if (!right.foldable) None
    else Option(right.eval(null)).map(_.asInstanceOf[ArrayData]).flatMap { qd =>
      val n = qd.numElements()
      if (n != b.dim) throw new IllegalArgumentException(
        s"$prettyName: dimensions differ (codes=${b.m}x${b.dsub}, query=$n)")
      var hasNull = false
      var i = 0
      while (i < n && !hasNull) { if (qd.isNullAt(i)) hasNull = true; i += 1 }
      if (hasNull) None // constant query with a null element → constantly null
      else {
        val q = new Array[Double](n)
        i = 0
        while (i < n) { q(i) = if (qIsFloat) qd.getFloat(i).toDouble else qd.getDouble(i); i += 1 }
        val lutA = new Array[Double](b.m * b.ksub)
        val lutNorm = if (metric == "cosine") new Array[Double](b.m * b.ksub) else Array.empty[Double]
        var s = 0
        while (s < b.m) {
          var c = 0
          while (c < b.ksub) {
            val base = (s * b.ksub + c) * b.dsub
            var a = 0.0; var nv = 0.0; var j = 0
            while (j < b.dsub) {
              val v = b.flat(base + j).toDouble
              val x = q(s * b.dsub + j)
              metric match {
                case "l2" => val t = v - x; a += t * t
                case _ => a += v * x; nv += v * v
              }
              j += 1
            }
            lutA(s * b.ksub + c) = a
            if (metric == "cosine") lutNorm(s * b.ksub + c) = nv
            c += 1
          }
          s += 1
        }
        var qn = 0.0
        i = 0
        while (i < n) { qn += q(i) * q(i); i += 1 }
        Some((lutA, lutNorm, qn))
      }
    }

  private def checkCodeLen(n: Int): Unit =
    if (n != b.m) throw new IllegalArgumentException(
      s"$prettyName: PQ code length $n != m=${b.m}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    // constant-null query (or constant query with a null element) → null,
    // bypassing BinaryExpression's non-null fast path
    if (right.foldable && constLuts.isEmpty) null
    else super.eval(input)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    checkCodeLen(codes.length)
    constLuts match {
      case Some((lutA, lutNorm, qn)) =>
        var acc = 0.0; var nv = 0.0; var s = 0
        while (s < b.m) {
          val idx = s * b.ksub + (codes(s) & 0xff)
          acc += lutA(idx)
          if (metric == "cosine") nv += lutNorm(idx)
          s += 1
        }
        metric match {
          case "l2" => acc
          case "ip" => -acc
          case "cosine" => 1.0 - acc / (math.sqrt(nv) * math.sqrt(qn))
        }
      case None =>
        val q = r.asInstanceOf[ArrayData]
        if (q.numElements() != b.dim) throw new IllegalArgumentException(
          s"$prettyName: dimensions differ (codes=${b.m}x${b.dsub}, query=${q.numElements()})")
        if (qMayHaveNullElems) {
          var i = 0
          while (i < b.dim) { if (q.isNullAt(i)) return null; i += 1 }
        }
        var acc = 0.0; var nv = 0.0; var nq = 0.0
        var s = 0
        while (s < b.m) {
          val base = (s * b.ksub + (codes(s) & 0xff)) * b.dsub
          var j = 0
          while (j < b.dsub) {
            val v = b.flat(base + j).toDouble
            val x = if (qIsFloat) q.getFloat(s * b.dsub + j).toDouble
                    else q.getDouble(s * b.dsub + j)
            metric match {
              case "l2" => val t = v - x; acc += t * t
              case _ => acc += v * x; nv += v * v; nq += x * x
            }
            j += 1
          }
          s += 1
        }
        metric match {
          case "l2" => acc
          case "ip" => -acc
          case "cosine" => 1.0 - acc / (math.sqrt(nv) * math.sqrt(nq))
        }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    constLuts match {
      case Some((lutA, lutNorm, qn)) => // constant-query ADC: O(m) per row
        val lutARef = ctx.addReferenceObj("pqLutA", lutA, "double[]")
        nullSafeCodeGen(ctx, ev, (codes, _) => {
          val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
          val idx = ctx.freshName("idx")
          val check =
            s"""if ($codes.length != ${b.m}) {
               |  throw new IllegalArgumentException("$prettyName: PQ code length "
               |    + $codes.length + " != m=${b.m}");
               |}""".stripMargin
          metric match {
            case "l2" | "ip" =>
              val sign = if (metric == "ip") "-" else ""
              s"""$check
                 |double $acc = 0.0;
                 |for (int $s = 0; $s < ${b.m}; $s++) {
                 |  $acc += $lutARef[$s * ${b.ksub} + ($codes[$s] & 0xff)];
                 |}
                 |${ev.value} = $sign$acc;""".stripMargin
            case "cosine" =>
              val lutNRef = ctx.addReferenceObj("pqLutNorm", lutNorm, "double[]")
              val nv = ctx.freshName("nv")
              s"""$check
                 |double $acc = 0.0; double $nv = 0.0;
                 |for (int $s = 0; $s < ${b.m}; $s++) {
                 |  final int $idx = $s * ${b.ksub} + ($codes[$s] & 0xff);
                 |  $acc += $lutARef[$idx];
                 |  $nv += $lutNRef[$idx];
                 |}
                 |${ev.value} = 1.0 - $acc / (java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($qn));""".stripMargin
          }
        })
      case None if right.foldable =>
        // constant query that is null, or has a null element → constantly null
        import org.apache.spark.sql.catalyst.expressions.codegen.Block._
        ev.copy(code = code"boolean ${ev.isNull} = true; double ${ev.value} = 0.0;")
      case None => // column query: O(dim) decode-on-access through the codebooks
        val flatRef = ctx.addReferenceObj("pqBooks", b.flat, "float[]")
        val getQ = if (qIsFloat) (i: String) => s"((double) %s.getFloat($i))"
                   else (i: String) => s"%s.getDouble($i)"
        nullSafeCodeGen(ctx, ev, (codes, q) => {
          val s = ctx.freshName("s"); val j = ctx.freshName("j")
          val base = ctx.freshName("base"); val v = ctx.freshName("v")
          val x = ctx.freshName("x")
          val qe = getQ(s"$s * ${b.dsub} + $j").format(q)
          val nullGuard =
            if (!qMayHaveNullElems) ""
            else {
              val g = ctx.freshName("g")
              s"""for (int $g = 0; $g < ${b.dim}; $g++) {
                 |  if ($q.isNullAt($g)) { ${ev.isNull} = true; break; }
                 |}
                 |if (!${ev.isNull}) {""".stripMargin
            }
          val nullGuardClose = if (qMayHaveNullElems) "}" else ""
          val check =
            s"""if ($codes.length != ${b.m} || $q.numElements() != ${b.dim}) {
               |  throw new IllegalArgumentException("$prettyName: dimensions differ (codes="
               |    + $codes.length + "x${b.dsub}, query=" + $q.numElements() + ")");
               |}
               |$nullGuard""".stripMargin
          metric match {
            case "l2" =>
              val acc = ctx.freshName("acc"); val t = ctx.freshName("t")
              s"""$check
                 |double $acc = 0.0;
                 |for (int $s = 0; $s < ${b.m}; $s++) {
                 |  final int $base = ($s * ${b.ksub} + ($codes[$s] & 0xff)) * ${b.dsub};
                 |  for (int $j = 0; $j < ${b.dsub}; $j++) {
                 |    final double $t = (double) $flatRef[$base + $j] - $qe;
                 |    $acc += $t * $t;
                 |  }
                 |}
                 |${ev.value} = $acc;
                 |$nullGuardClose""".stripMargin
            case "ip" =>
              val acc = ctx.freshName("acc")
              s"""$check
                 |double $acc = 0.0;
                 |for (int $s = 0; $s < ${b.m}; $s++) {
                 |  final int $base = ($s * ${b.ksub} + ($codes[$s] & 0xff)) * ${b.dsub};
                 |  for (int $j = 0; $j < ${b.dsub}; $j++) {
                 |    $acc += (double) $flatRef[$base + $j] * $qe;
                 |  }
                 |}
                 |${ev.value} = -$acc;
                 |$nullGuardClose""".stripMargin
            case "cosine" =>
              val acc = ctx.freshName("dot"); val nv = ctx.freshName("nv")
              val nq = ctx.freshName("nq")
              s"""$check
                 |double $acc = 0.0; double $nv = 0.0; double $nq = 0.0;
                 |for (int $s = 0; $s < ${b.m}; $s++) {
                 |  final int $base = ($s * ${b.ksub} + ($codes[$s] & 0xff)) * ${b.dsub};
                 |  for (int $j = 0; $j < ${b.dsub}; $j++) {
                 |    final double $v = (double) $flatRef[$base + $j];
                 |    final double $x = $qe;
                 |    $acc += $v * $x; $nv += $v * $v; $nq += $x * $x;
                 |  }
                 |}
                 |${ev.value} = 1.0 - $acc / (java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($nq));
                 |$nullGuardClose""".stripMargin
          }
        })
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
