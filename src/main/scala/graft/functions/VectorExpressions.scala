package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions for vector distance kernels, with whole-stage
  * codegen. These replace the reference's SIMD/Metal distance kernels
  * (reference: rust_lib/src/distance.rs:15-24, src/ann_search.cpp:702-720)
  * with JIT-friendly generated Java loops that stay inside
  * WholeStageCodegen — the Spark-native path to batch-amortized distance.
  *
  * Both `ARRAY<FLOAT>` and `ARRAY<DOUBLE>` inputs are accepted (the
  * reference auto-detects LIST/ARRAY of numeric child,
  * src/ann_search.cpp:473-494); accumulation is always in double.
  *
  * Distance-semantics note (reference FIXTURES.md / test suite):
  * `l2_distance` is sqrt-Euclidean (SQL `array_distance` semantics) while
  * index-internal distances are squared L2 — both are exposed.
  */
abstract class BinaryVectorDoubleExpression extends BinaryExpression
    with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected final def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Codegen accessor for element i of `arr`, widened to double. */
  protected final def getter(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"

  @inline protected final def elemAt(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected final def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${n} vs ${b.numElements()})")
    }
    n
  }

  /** Generated length check shared by all subclasses. */
  protected final def genDimCheck(a: String, b: String, n: String): String =
    s"""final int $n = $a.numElements();
       |if ($b.numElements() != $n) {
       |  throw new IllegalArgumentException("$prettyName: vector dimensions differ ("
       |    + $n + " vs " + $b.numElements() + ")");
       |}""".stripMargin
}

/** Squared L2: sum((a_i - b_i)^2). Index-internal distance semantics
  * (reference: test/sql/diskann_basic.test:35-38 — 2.0 for orthogonal
  * unit vectors). */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryVectorDoubleExpression {
  override def prettyName: String = "l2_distance_sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkDims(a, b)
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = elemAt(a, af, i) - elemAt(b, bf, i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""${genDimCheck(a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${getter(left, a, i)} - ${getter(right, b, i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean distance: sqrt of squared L2 — SQL `array_distance` semantics
  * (reference: test/sql/diskann_optimizer.test:27-33 shows 0.70710677). */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryVectorDoubleExpression {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkDims(a, b)
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = elemAt(a, af, i) - elemAt(b, bf, i)
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""${genDimCheck(a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${getter(left, a, i)} - ${getter(right, b, i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product (positive; the reference negates internally only for index
  * ordering, rust_lib/src/distance.rs:20-23). */
case class InnerProduct(left: Expression, right: Expression)
    extends BinaryVectorDoubleExpression {
  override def prettyName: String = "inner_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkDims(a, b)
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0.0; var i = 0
    while (i < n) {
      acc += elemAt(a, af, i) * elemAt(b, bf, i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""${genDimCheck(a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $acc;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity: dot(a,b) / (|a| * |b|). Zero-norm inputs yield NaN,
  * matching a DOUBLE[] oracle. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorDoubleExpression {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkDims(a, b)
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elemAt(a, af, i); val y = elemAt(b, bf, i)
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""${genDimCheck(a, b, n)}
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${getter(left, a, i)};
         |  final double $y = ${getter(right, b, i)};
         |  $d += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
