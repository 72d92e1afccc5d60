package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Johnson-Lindenstrauss random projection: y = R·x with R a seeded
  * Gaussian matrix scaled by 1/sqrt(outDim), so pairwise L2 distances are
  * preserved in expectation (JL lemma) and cosine/IP geometry degrades
  * gracefully. The standard preprocessing step before LSH bucketing,
  * clustering, or coarse candidate generation when embeddings are wide:
  * projecting 1536 → 64 dims cuts every downstream distance kernel and
  * shuffle by 24x at a bounded, measurable recall cost.
  *
  * The matrix is DETERMINISTIC per (seed, dim, outDim) and regenerated
  * from the seed on every executor (outDim·dim floats — for 1536→64
  * that's 393 KB, cheaper to recompute per task than to broadcast for
  * typical shapes) — no RNG state crosses the wire, re-runs and
  * repartitions reproduce bit-identical projections.
  */
object Projection {

  /** Row-major (outDim × dim) Gaussian matrix, entries N(0, 1/outDim). */
  def gaussianMatrix(dim: Int, outDim: Int, seed: Long): Array[Float] = {
    val rnd = new java.util.Random(seed)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.fill(outDim * dim)((rnd.nextGaussian() * scale).toFloat)
  }

  def project(v: Array[Float], mat: Array[Float], outDim: Int): Array[Float] = {
    val dim = v.length
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      val base = j * dim
      // widen BOTH factors before multiplying — the expression paths
      // multiply in double, and a float*float product differs in the last
      // ulp, which would break bit-exact kernel-vs-codegen contracts
      while (i < dim) { acc += mat(base + i).toDouble * v(i).toDouble; i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    out
  }

  /** Column form — a codegen'd expression, not a UDF. */
  def projectColumn(c: Column, dim: Int, outDim: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.GraftBridge.column(RandomProjection(
      org.apache.spark.sql.GraftBridge.expression(c), dim, outDim, seed))
}

/** See [[Projection]]. Null ELEMENTS yield a null result (the shared
  * kernel contract); dimension mismatches throw. */
case class RandomProjection(child: Expression, dim: Int, outDim: Int, seed: Long)
    extends UnaryExpression with Serializable {

  require(dim > 0 && outDim > 0, s"invalid projection geometry $dim -> $outDim")

  override def prettyName: String = s"random_projection_${dim}_$outDim"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${dt.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def mayHaveNullElems: Boolean =
    childrenResolved && (child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def nullable: Boolean = super.nullable || mayHaveNullElems

  /** Regenerated lazily per (deserialized) task instance from the seed. */
  @transient private lazy val mat: Array[Float] =
    Projection.gaussianMatrix(dim, outDim, seed)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"$prettyName: input dim $n != $dim")
    if (mayHaveNullElems) {
      var i = 0
      while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    }
    val isF = elemIsFloat
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      val base = j * dim
      while (i < dim) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        acc += mat(base + i) * x
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("projMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val base = ctx.freshName("base")
      val get = if (elemIsFloat) (idx: String) => s"((double) $a.getFloat($idx))"
                else (idx: String) => s"$a.getDouble($idx)"
      val nullScan =
        if (!mayHaveNullElems) ""
        else {
          val z = ctx.freshName("z")
          s"""for (int $z = 0; $z < $dim; $z++) {
             |  if ($a.isNullAt($z)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        }
      // ev.isNull is only DECLARED by nullSafeCodeGen when this expression
      // is nullable — an unguarded reference for a non-nullable input
      // generates an undeclared name and the projection silently falls
      // back to the interpreted path (same hazard as NormalizeVector)
      val guardOpen = if (nullable) s"if (!${ev.isNull}) {" else "{"
      s"""if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException("$prettyName: input dim "
         |    + $a.numElements() + " != $dim");
         |}
         |$nullScan
         |$guardOpen
         |  final float[] $out = new float[$outDim];
         |  for (int $j = 0; $j < $outDim; $j++) {
         |    double $acc = 0.0;
         |    final int $base = $j * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $matRef[$base + $i] * ${get(i)};
         |    }
         |    $out[$j] = (float) $acc;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
