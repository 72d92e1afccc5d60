package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Stored-vector codec: how an index dataset's `codes` BINARY column maps
  * to float vectors. Shard decode (graph engines) and the scan-path
  * distance expressions (FLAT/IVF) both route through this, so adding a
  * storage format is one new case, not seven touch points. */
sealed trait VectorCodec extends Serializable {
  def decode(codes: Array[Byte]): Array[Float]
  def encode(v: Array[Float]): Array[Byte]
  def encodeUdf: UserDefinedFunction
  def decodeUdf: UserDefinedFunction
  /** Stored bytes per vector of `dim` dims (memory accounting) — per-dim
    * for the scalar codecs, but PQ stores `m` bytes regardless of dim. */
  def bytesPerVector(dim: Int): Long
}

/** SQ8: 1 byte/dim with per-dimension (min, scale) — see [[Sq8]]. */
final case class Sq8Codec(p: Sq8.QuantParams) extends VectorCodec {
  def decode(codes: Array[Byte]): Array[Float] = Sq8.dequantize(codes, p)
  def encode(v: Array[Float]): Array[Byte] = Sq8.quantize(v, p)
  def encodeUdf: UserDefinedFunction = Sq8.quantizeUdf(p)
  def decodeUdf: UserDefinedFunction = Sq8.dequantizeUdf(p)
  def bytesPerVector(dim: Int): Long = dim.toLong
}

/** IEEE 754 half precision: 2 bytes/dim, parameter-free, ~1e-3 relative
  * rounding — halves index memory/shuffle vs float32 at near-lossless
  * recall (the fp16 storage mode common to FAISS/DiskANN deployments). */
case object Fp16Codec extends VectorCodec {
  def decode(codes: Array[Byte]): Array[Float] = Fp16.decode(codes)
  def encode(v: Array[Float]): Array[Byte] = Fp16.encode(v)
  def encodeUdf: UserDefinedFunction = Fp16.encodeUdf
  def decodeUdf: UserDefinedFunction = Fp16.decodeUdf
  def bytesPerVector(dim: Int): Long = 2L * dim
}

/** PQ codec behind the shared [[VectorCodec]] seam — graph shard decode and
  * every insert/vacuum/merge re-encode path pick it up unchanged (see
  * [[Pq]] for the algorithm and the ADC distance expression). */
final case class PqCodec(b: Pq.Codebooks) extends VectorCodec {
  def decode(codes: Array[Byte]): Array[Float] = Pq.decode(codes, b)
  def encode(v: Array[Float]): Array[Byte] = Pq.encode(v, b)
  def encodeUdf: UserDefinedFunction = Pq.encodeUdf(b)
  def decodeUdf: UserDefinedFunction = Pq.decodeUdf(b)
  def bytesPerVector(dim: Int): Long = b.m.toLong
}

/** Binary quantization: 1 bit/dim sign codes — see [[Bq]]. Decode is the
  * best direction-only reconstruction (±1/sqrt(dim) unit vector), which is
  * faithful exactly under the cosine metric the manager restricts bq to. */
final case class BqCodec(dim: Int) extends VectorCodec {
  def decode(codes: Array[Byte]): Array[Float] = Bq.decode(codes, dim)
  def encode(v: Array[Float]): Array[Byte] = Bq.encode(v)
  def encodeUdf: UserDefinedFunction = Bq.encodeUdf
  def decodeUdf: UserDefinedFunction = Bq.decodeUdf(dim)
  def bytesPerVector(dim: Int): Long = Bq.numBytes(dim).toLong
}

/** RaBitQ codec behind the shared [[VectorCodec]] seam — graph shard
  * decode, inserts, vacuum, and merges pick it up unchanged (see [[Rabitq]]
  * for the rotation + sign-bit + correction-trailer format). */
final case class RabitqCodec(dim: Int, seed: Long) extends VectorCodec {
  def decode(codes: Array[Byte]): Array[Float] = Rabitq.decode(codes, dim, seed)
  def encode(v: Array[Float]): Array[Byte] = Rabitq.encode(v, seed)
  def encodeUdf: UserDefinedFunction = Rabitq.encodeUdf(seed)
  def decodeUdf: UserDefinedFunction = Rabitq.decodeUdf(dim, seed)
  def bytesPerVector(dim: Int): Long = Rabitq.numBytes(dim).toLong
}

object VectorCodec {
  /** Codec for a `quantization` param value; sq8 needs its fitted params,
    * pq its trained codebooks (both persisted next to the index dataset),
    * bq the dimension (packed-bit geometry). */
  def forQuantization(q: Option[String],
                      sq8Params: => Option[Sq8.QuantParams],
                      pqBooks: => Option[Pq.Codebooks] = None,
                      dim: => Int = 0,
                      rabitqSeed: => Long = 42L): Option[VectorCodec] =
    q match {
      case Some("sq8") => sq8Params.map(Sq8Codec.apply)
      case Some("fp16") => Some(Fp16Codec)
      case Some("pq") => pqBooks.map(PqCodec.apply)
      case Some("bq") => Some(BqCodec(dim))
      case Some("rabitq") => Some(RabitqCodec(dim, rabitqSeed))
      case _ => None
    }

  val Supported: Set[String] = Set("sq8", "fp16", "pq", "bq", "rabitq")
}

/** IEEE 754 binary16 conversions (JDK 17 predates Float.float16ToFloat).
  * Pure bit manipulation of the published format: 1 sign, 5 exponent
  * (bias 15), 10 mantissa bits; round-to-nearest-even on encode. */
object Fp16 {

  /** half bits (as Int 0..65535) → float. */
  def halfBitsToFloat(bits: Int): Float = {
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    if (exp == 0) {
      if (mant == 0) java.lang.Float.intBitsToFloat(sign) // ±0
      else { // subnormal: renormalize into float32
        // after e shifts the implicit bit (0x400) is set, so the value is
        // (m/2^10) · 2^(-14-e) → float exponent field 127 - 14 - e
        var e = 0
        var m = mant
        while ((m & 0x400) == 0) { m <<= 1; e += 1 }
        java.lang.Float.intBitsToFloat(
          sign | ((127 - 14 - e) << 23) | ((m & 0x3ff) << 13))
      }
    } else if (exp == 0x1f) { // inf / nan
      java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    } else {
      java.lang.Float.intBitsToFloat(sign | ((exp - 15 + 127) << 23) | (mant << 13))
    }
  }

  /** float → half bits, round-to-nearest-even; overflow → ±inf,
    * underflow → ±0. */
  def floatToHalfBits(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f) // canonical NaN
    val sign = (bits >>> 16) & 0x8000
    val abs = bits & 0x7fffffff
    if (abs >= 0x7f800000) { // inf / nan
      val mant = if (abs > 0x7f800000) 0x200 else 0
      return (sign | 0x7c00 | mant).toShort
    }
    val e = (abs >>> 23) - 127 + 15
    if (e >= 0x1f) return (sign | 0x7c00).toShort // overflow → inf
    if (e <= 0) {
      if (e < -10) return sign.toShort // underflows even half subnormals
      // half subnormal: implicit bit becomes explicit, shift out 14-e bits
      val mant = (abs & 0x7fffff) | 0x800000
      val shift = 14 - e
      val half = mant >>> shift
      val rem = mant & ((1 << shift) - 1)
      val mid = 1 << (shift - 1)
      val rounded = half + (if (rem > mid || (rem == mid && (half & 1) == 1)) 1 else 0)
      return (sign | rounded).toShort
    }
    val mant = abs & 0x7fffff
    val half = (e << 10) | (mant >>> 13)
    val rem = mant & 0x1fff
    // round-to-nearest-even; a carry ripples into the exponent correctly
    // (1.111..×2^e rounds up to 1.0×2^(e+1); 2^16 overflow lands on inf)
    val rounded = half + (if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) 1 else 0)
    (sign | rounded).toShort
  }

  /** Decode lookup table: 64k floats (256 KB), shared per JVM — turns the
    * per-element decode into one array load in the codegen'd loop. */
  lazy val DecodeTable: Array[Float] = Array.tabulate(65536)(halfBitsToFloat)

  def encode(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 2)
    var i = 0
    while (i < v.length) {
      val h = floatToHalfBits(v(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte // little-endian
      i += 1
    }
    out
  }

  def decode(b: Array[Byte]): Array[Float] = {
    val n = b.length / 2
    val out = new Array[Float](n)
    val t = DecodeTable
    var i = 0
    while (i < n) {
      out(i) = t((b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8))
      i += 1
    }
    out
  }

  val encodeUdf: UserDefinedFunction = udf((v: Seq[Float]) => encode(v.toArray))
  val decodeUdf: UserDefinedFunction = udf((b: Array[Byte]) => decode(b))
}

/** Distance between fp16-packed codes and a float query, decoding through
  * the shared lookup table inside the (codegen'd) loop — same shape as
  * [[Sq8Distance]]. metric: "l2" → squared L2; "ip" → negated dot;
  * "cosine" → 1 - cosine. */
case class Fp16Distance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression with Serializable {

  override def prettyName: String = s"fp16_distance_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, ARRAY<FLOAT|DOUBLE>), got ${l.catalogString}, ${r.catalogString}")
  }

  private def qIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Null query elements yield a null distance (and force nullability) —
    * same contract as [[Sq8Distance]]. */
  private def qMayHaveNullElems: Boolean =
    childrenResolved && (right.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def nullable: Boolean = super.nullable || qMayHaveNullElems

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    val q = r.asInstanceOf[ArrayData]
    val n = codes.length / 2
    if (q.numElements() != n) throw new IllegalArgumentException(
      s"$prettyName: dimensions differ (codes=$n, query=${q.numElements()})")
    if (qMayHaveNullElems) {
      var i = 0
      while (i < n) { if (q.isNullAt(i)) return null; i += 1 }
    }
    val t = Fp16.DecodeTable
    def elem(i: Int): Double =
      t((codes(2 * i) & 0xff) | ((codes(2 * i + 1) & 0xff) << 8)).toDouble
    def qe(i: Int): Double = if (qIsFloat) q.getFloat(i).toDouble else q.getDouble(i)
    metric match {
      case "l2" =>
        var acc = 0.0; var i = 0
        while (i < n) { val d = elem(i) - qe(i); acc += d * d; i += 1 }
        acc
      case "ip" =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += elem(i) * qe(i); i += 1 }
        -acc
      case "cosine" =>
        var d = 0.0; var nv = 0.0; var nq = 0.0; var i = 0
        while (i < n) {
          val v = elem(i); val x = qe(i)
          d += v * x; nv += v * v; nq += x * x; i += 1
        }
        1.0 - d / (math.sqrt(nv) * math.sqrt(nq))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("fp16table", Fp16.DecodeTable, "float[]")
    val getQ = if (qIsFloat) (i: String) => s"((double) %s.getFloat($i))"
               else (i: String) => s"%s.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val qe = getQ(i).format(q)
      val decode = s"(double) $tableRef[($codes[2 * $i] & 0xff) | (($codes[2 * $i + 1] & 0xff) << 8)]"
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
        s"""if ($q.numElements() != $n) {
           |  throw new IllegalArgumentException("$prettyName: dimensions differ (codes="
           |    + $n + ", query=" + $q.numElements() + ")");
           |}
           |$nullGuard""".stripMargin
      metric match {
        case "l2" =>
          val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
          s"""final int $n = $codes.length / 2;
             |$dimCheck
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double $v = $decode;
             |  final double $d = $v - $qe;
             |  $acc += $d * $d;
             |}
             |${ev.value} = $acc;
             |$nullGuardClose""".stripMargin
        case "ip" =>
          val acc = ctx.freshName("acc")
          s"""final int $n = $codes.length / 2;
             |$dimCheck
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double $v = $decode;
             |  $acc += $v * $qe;
             |}
             |${ev.value} = -$acc;
             |$nullGuardClose""".stripMargin
        case "cosine" =>
          val d = ctx.freshName("dot"); val nv = ctx.freshName("nv")
          val nq = ctx.freshName("nq"); val x = ctx.freshName("x")
          s"""final int $n = $codes.length / 2;
             |$dimCheck
             |double $d = 0.0; double $nv = 0.0; double $nq = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double $v = $decode;
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
