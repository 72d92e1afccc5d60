package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** SQ8 scalar quantization (reference: rust_lib/src/provider.rs:25-38,
  * 161-210): u8 code per dimension with per-dimension min/scale params;
  * quantize round((v-min)/scale*255), dequantize (q/255)*scale+min.
  * ~4x vector storage reduction (README.md:31).
  */
object Sq8 {

  /** Per-dimension quantization parameters. */
  final case class QuantParams(mins: Array[Float], scales: Array[Float]) {
    def dim: Int = mins.length
  }

  def quantize(v: Array[Float], p: QuantParams): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) {
      val s = p.scales(i)
      val q = if (s == 0f) 0.0 else (v(i) - p.mins(i)) / s * 255.0
      out(i) = math.max(0, math.min(255, math.round(q))).toByte
      i += 1
    }
    out
  }

  def dequantize(codes: Array[Byte], p: QuantParams): Array[Float] = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) {
      out(i) = (codes(i) & 0xff) / 255.0f * p.scales(i) + p.mins(i)
      i += 1
    }
    out
  }

  def quantizeUdf(p: QuantParams) = udf((v: Seq[Float]) => quantize(v.toArray, p))
  def dequantizeUdf(p: QuantParams) = udf((c: Array[Byte]) => dequantize(c, p))
}

/** Distance between SQ8 codes and a float query, dequantizing on access
  * inside the (codegen'd) loop — the search never materializes float
  * vectors (reference dequant-on-access, rust_lib/src/provider.rs:817-845).
  *
  * metric: "l2" → squared L2; "ip" → negated dot; "cosine" → 1 - cosine.
  */
case class Sq8Distance(left: Expression, right: Expression,
                       mins: Array[Float], scales: Array[Float],
                       metric: String)
    extends BinaryExpression with Serializable {

  override def prettyName: String = s"sq8_distance_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, ARRAY<FLOAT|DOUBLE>), got ${l.catalogString}, ${r.catalogString}")
  }

  private def qIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Same null-element contract as the float kernels
    * ([[BinaryVectorDoubleExpression]]): a null query ELEMENT yields a
    * null distance — reading the zeroed slot would silently corrupt
    * rankings — and makes the expression nullable even for non-nullable
    * inputs (nullSafeCodeGen would otherwise pin ev.isNull to `false`). */
  private def qMayHaveNullElems: Boolean =
    childrenResolved && (right.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def nullable: Boolean = super.nullable || qMayHaveNullElems

  private def checkDims(nCodes: Int, nQ: Int): Unit =
    if (nQ != nCodes || nCodes > mins.length)
      throw new IllegalArgumentException(
        s"$prettyName: dimensions differ (codes=$nCodes, query=$nQ, " +
          s"params=${mins.length}) — out-of-bounds reads would silently " +
          "corrupt distances")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    val q = r.asInstanceOf[ArrayData]
    val n = codes.length
    checkDims(n, q.numElements())
    if (qMayHaveNullElems) {
      var i = 0
      while (i < n) { if (q.isNullAt(i)) return null; i += 1 }
    }
    metric match {
      case "l2" =>
        var acc = 0.0; var i = 0
        while (i < n) {
          val v = (codes(i) & 0xff) / 255.0 * scales(i) + mins(i)
          val d = v - (if (qIsFloat) q.getFloat(i).toDouble else q.getDouble(i))
          acc += d * d; i += 1
        }
        acc
      case "ip" =>
        var acc = 0.0; var i = 0
        while (i < n) {
          val v = (codes(i) & 0xff) / 255.0 * scales(i) + mins(i)
          acc += v * (if (qIsFloat) q.getFloat(i).toDouble else q.getDouble(i)); i += 1
        }
        -acc
      case "cosine" =>
        var d = 0.0; var nv = 0.0; var nq = 0.0; var i = 0
        while (i < n) {
          val v = (codes(i) & 0xff) / 255.0 * scales(i) + mins(i)
          val x = if (qIsFloat) q.getFloat(i).toDouble else q.getDouble(i)
          d += v * x; nv += v * v; nq += x * x; i += 1
        }
        1.0 - d / (math.sqrt(nv) * math.sqrt(nq))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8mins", mins, "float[]")
    val scalesRef = ctx.addReferenceObj("sq8scales", scales, "float[]")
    val getQ = if (qIsFloat) (i: String) => s"((double) %s.getFloat($i))"
               else (i: String) => s"%s.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val qe = getQ(i).format(q)
      val nullGuard =
        if (!qMayHaveNullElems) ""
        else {
          val j = ctx.freshName("j")
          s"""for (int $j = 0; $j < $n; $j++) {
             |  if ($q.isNullAt($j)) { ${ev.isNull} = true; break; }
             |}
             |if (!${ev.isNull}) {""".stripMargin
        }
      val nullGuardClose = if (qMayHaveNullElems) "}" else ""
      val dimCheck =
        s"""if ($q.numElements() != $n || $n > $minsRef.length) {
           |  throw new IllegalArgumentException("$prettyName: dimensions differ (codes="
           |    + $n + ", query=" + $q.numElements() + ", params=" + $minsRef.length + ")");
           |}
           |$nullGuard""".stripMargin
      metric match {
        case "l2" =>
          val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
          s"""final int $n = $codes.length;
             |$dimCheck
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double $v = ($codes[$i] & 0xff) / 255.0 * $scalesRef[$i] + $minsRef[$i];
             |  final double $d = $v - $qe;
             |  $acc += $d * $d;
             |}
             |${ev.value} = $acc;
             |$nullGuardClose""".stripMargin
        case "ip" =>
          val acc = ctx.freshName("acc")
          s"""final int $n = $codes.length;
             |$dimCheck
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double $v = ($codes[$i] & 0xff) / 255.0 * $scalesRef[$i] + $minsRef[$i];
             |  $acc += $v * $qe;
             |}
             |${ev.value} = -$acc;
             |$nullGuardClose""".stripMargin
        case "cosine" =>
          val d = ctx.freshName("dot"); val nv = ctx.freshName("nv")
          val nq = ctx.freshName("nq"); val x = ctx.freshName("x")
          s"""final int $n = $codes.length;
             |$dimCheck
             |double $d = 0.0; double $nv = 0.0; double $nq = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double $v = ($codes[$i] & 0xff) / 255.0 * $scalesRef[$i] + $minsRef[$i];
             |  final double $x = $qe;
             |  $d += $v * $x; $nv += $v * $v; $nq += $x * $x;
             |}
             |${ev.value} = 1.0 - $d / (java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($nq));
             |$nullGuardClose""".stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
