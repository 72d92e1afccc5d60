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

  /** A null ELEMENT yields a null result even when the array inputs
    * themselves are non-nullable (e.g. array(a, b) literals over nullable
    * columns) — without this override nullSafeCodeGen would pin
    * `ev.isNull` to the FalseLiteral and the null-elem branch would
    * generate the non-compilable statement `false = true;`. */
  override def nullable: Boolean = super.nullable || mayHaveNullElems

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

  /** Whether either input's TYPE admits null elements. When false (e.g.
    * typedLit query vectors, canonicalized index datasets) the null-element
    * guard is compiled out entirely. Safe pre-resolution (nullable may be
    * queried before type checking): non-array inputs report false. */
  protected final def mayHaveNullElems: Boolean =
    childrenResolved && Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  /** A null ELEMENT must make the whole distance NULL (Spark's
    * null-propagation), never be read as 0.0 — ArrayData getters return
    * zeroed bytes for null slots, which would corrupt rankings silently. */
  @inline protected final def anyNullElem(a: ArrayData, b: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  private def primAt(e: Expression, prim: String, i: String): String =
    if (elemIsFloat(e)) s"((double) $prim[$i])" else s"$prim[$i]"

  /** Generates the kernel loop: `init` declares accumulators, `perElem`
    * emits the per-element statements from (xa, xb) double accessors, and
    * `result` is the final double expression over the accumulators.
    *
    * A FOLDABLE side (typedLit query vector — every constant-query index
    * scan) is decoded ONCE at codegen time into a referenced primitive
    * array, so the hot loop reads a plain float[] and the per-row work for
    * that side is zero. Non-foldable FLOAT sides are dimension-gated at
    * runtime: at `n >= CopyThreshold` each side is bulk-copied ONCE per row
    * (`toFloatArray` — Platform.copyMemory for UnsafeArrayData, vector bulk
    * reads for columnar arrays) and the loop runs over plain float[], which
    * the JIT auto-vectorizes; the per-element ArrayData getter cannot be
    * (measured ~3x the primitive loop at d=768: a virtual hop per element).
    * Below the threshold the inline getter loop wins — the copy/alloc per
    * row costs more than it saves at small d (the d=64 all-pairs near-dup
    * A/B that reverted the earlier always-copy version).
    * When null elements are possible, the guard folds INTO the loop (one
    * pass — a separate pre-scan would double the memory passes). */
  protected final def genKernel(ctx: CodegenContext, ev: ExprCode,
                                a: String, b: String, n: String,
                                init: String,
                                perElem: (String, String) => String,
                                result: String): String = {
    val dims = genDimCheck(a, b, n)
    val i = ctx.freshName("i")
    if (!mayHaveNullElems) {
      def hoist(e: Expression): Option[String] =
        if (!e.foldable) None
        else Option(e.eval(null).asInstanceOf[ArrayData]).map { v =>
          if (elemIsFloat(e)) ctx.addReferenceObj("constVec", v.toFloatArray(), "float[]")
          else ctx.addReferenceObj("constVec", v.toDoubleArray(), "double[]")
        }
      val hoistA = hoist(left); val hoistB = hoist(right)
      val accA = hoistA.map(primAt(left, _, i)).getOrElse(getter(left, a, i))
      val accB = hoistB.map(primAt(right, _, i)).getOrElse(getter(right, b, i))
      val getterLoop =
        s"""for (int $i = 0; $i < $n; $i++) {
           |  ${perElem(accA, accB)}
           |}""".stripMargin
      val canCopyA = hoistA.isEmpty && elemIsFloat(left)
      val canCopyB = hoistB.isEmpty && elemIsFloat(right)
      val body =
        if (!canCopyA && !canCopyB) getterLoop
        else {
          val pa = ctx.freshName("pa"); val pb = ctx.freshName("pb")
          // per-instance scratch: UnsafeArrayData sides copy into a reused
          // buffer (no alloc); columnar sides return a fresh array that
          // becomes the next scratch (see VectorKernels.unwrapFloats)
          val kernels = "graft.functions.VectorKernels"
          def copySide(can: Boolean, arr: String, prim: String): String =
            if (!can) ""
            else {
              val st = ctx.addMutableState("float[]", "kernelScratch")
              s"""$st = $kernels.unwrapFloats($arr, $n, $st);
                 |final float[] $prim = $st;""".stripMargin
            }
          val copyA = copySide(canCopyA, a, pa)
          val copyB = copySide(canCopyB, b, pb)
          val fastA = if (canCopyA) s"((double) $pa[$i])" else accA
          val fastB = if (canCopyB) s"((double) $pb[$i])" else accB
          s"""if ($n >= ${VectorKernels.CopyThreshold}) {
             |  $copyA
             |  $copyB
             |  for (int $i = 0; $i < $n; $i++) {
             |    ${perElem(fastA, fastB)}
             |  }
             |} else {
             |  $getterLoop
             |}""".stripMargin
        }
      s"""$dims
         |$init
         |$body
         |${ev.value} = $result;""".stripMargin
    } else {
      val body = perElem(getter(left, a, i), getter(right, b, i))
      val hn = ctx.freshName("hasNullElem")
      s"""$dims
         |$init
         |boolean $hn = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hn = true; break; }
         |  $body
         |}
         |if ($hn) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result;
         |}""".stripMargin
    }
  }
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
    if (mayHaveNullElems && anyNullElem(a, b, n)) return null
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
      val d = ctx.freshName("d")
      genKernel(ctx, ev, a, b, n,
        init = s"double $acc = 0.0;",
        perElem = (xa, xb) => s"final double $d = $xa - $xb; $acc += $d * $d;",
        result = s"$acc")
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
    if (mayHaveNullElems && anyNullElem(a, b, n)) return null
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
      val d = ctx.freshName("d")
      genKernel(ctx, ev, a, b, n,
        init = s"double $acc = 0.0;",
        perElem = (xa, xb) => s"final double $d = $xa - $xb; $acc += $d * $d;",
        result = s"java.lang.Math.sqrt($acc)")
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
    if (mayHaveNullElems && anyNullElem(a, b, n)) return null
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
      genKernel(ctx, ev, a, b, n,
        init = s"double $acc = 0.0;",
        perElem = (xa, xb) => s"$acc += $xa * $xb;",
        result = s"$acc")
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2-normalize an array to unit length → ARRAY<FLOAT>; zero vectors pass
  * through unchanged (cast to float). Single pass per row — the
  * SQL-builtin formulation (`transform(v, x -> x / sqrt(aggregate(...)))`)
  * re-evaluates the O(d) norm inside the per-element lambda, i.e. O(d²)
  * per row, because Catalyst neither hoists loop-invariant subtrees out of
  * higher-order functions nor CSEs lambda-bearing expressions. */
case class NormalizeVector(child: Expression)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "normalize_vector"
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

  /** See [[BinaryVectorDoubleExpression.nullable]]: a null ELEMENT makes
    * the result null even when the array input is non-nullable. */
  override def nullable: Boolean = super.nullable || mayHaveNullElems

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (mayHaveNullElems) {
      var i = 0
      while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    }
    val isF = elemIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x; i += 1
    }
    val norm = math.sqrt(acc)
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = (if (norm > 0.0) x / norm else x).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      val get = if (elemIsFloat) (idx: String) => s"((double) $a.getFloat($idx))"
                else (idx: String) => s"$a.getDouble($idx)"
      // `${ev.isNull}` may only be referenced when this expression is
      // nullable: for a non-nullable child with non-null elements,
      // nullSafeCodeGen never DECLARES the isNull variable (it pins
      // ev.isNull to the false literal after the fact), so an unguarded
      // `if (!${ev.isNull})` references an undeclared name — Janino
      // rejects the class and the whole projection silently falls back
      // to the interpreted path (the neardup_ann regression).
      val nullScan =
        if (!mayHaveNullElems) ""
        else {
          val j = ctx.freshName("j")
          s"""for (int $j = 0; $j < $n; $j++) {
             |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        }
      val guardOpen = if (nullable) s"if (!${ev.isNull}) {" else "{"
      s"""final int $n = $a.numElements();
         |$nullScan
         |$guardOpen
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ${get(i)};
         |    $acc += $x * $x;
         |  }
         |  final double $nrm = java.lang.Math.sqrt($acc);
         |  final float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ${get(i)};
         |    $out[$i] = (float) ($nrm > 0.0 ? $x / $nrm : $x);
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity: dot(a,b) / (|a| * |b|). Zero-norm inputs yield NaN,
  * matching a DOUBLE[] oracle. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorDoubleExpression {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkDims(a, b)
    if (mayHaveNullElems && anyNullElem(a, b, n)) return null
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
      val n = ctx.freshName("n")
      val d = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      genKernel(ctx, ev, a, b, n,
        init = s"double $d = 0.0; double $na = 0.0; double $nb = 0.0;",
        perElem = (xa, xb) =>
          s"""final double $x = $xa;
             |final double $y = $xb;
             |$d += $x * $y; $na += $x * $x; $nb += $y * $y;""".stripMargin,
        result = s"$d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))")
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ColBERT MaxSim score of a dynamic bag of query token vectors against a
  * bag of document token vectors:
  *
  *   Σ_{q ∈ Q} max_{d ∈ D} ⟨q, d⟩
  *
  * Native replacement for the higher-order-function composition
  * `aggregate(Q, 0.0, (acc, qv) => acc + array_max(transform(D, dv =>
  * inner_product(qv, dv))))` (graft.operators.MaxSim.score): that plan
  * materializes one |D|-element array PER (row, query-token) — measured
  * ~100-185 ms of GC per maxsim_table_50q rep — and each inner
  * `transform` re-reads the doc vectors through nested ArrayData
  * getters. This expression allocates nothing in steady state (doc and
  * query token vectors unwrap into reused per-instance scratch on the
  * float fast path) and keeps the whole score inside one codegen'd loop
  * nest.
  *
  * Value-identical to the composition by construction, including edge
  * semantics the strict oracle relies on:
  *  - NULL Q → NULL; empty Q → 0.0 (even when D is NULL — `aggregate`
  *    never evaluates its lambda on an empty array);
  *  - non-empty Q with NULL or empty D → NULL (array_max of nothing);
  *  - a NULL query token (or one containing a NULL element) nulls every
  *    dot for that token → NULL result; the fold still KEEPS GOING over
  *    the remaining tokens (the aggregate composition folded a null
  *    accumulator through every token), so a LATER token's dimension
  *    mismatch still throws even when the result is already null;
  *  - a NULL doc token (or one containing a NULL element) is SKIPPED by
  *    the max (array_max ignores nulls); all docs skipped → NULL;
  *  - max uses Spark's ordering (ArrayMax's `gt`): NaN is largest,
  *    0.0 > -0.0 — `Double.compare` reproduces both; first-wins ties;
  *  - a non-null doc token with mismatched dimensions throws, exactly
  *    where `inner_product` would.
  */
case class MaxSimScore(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "maxsim_score"
  override def dataType: DataType = DoubleType
  // empty/skipped doc bags yield NULL regardless of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ArrayType(FloatType | DoubleType, _), _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<ARRAY<FLOAT|DOUBLE>> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def outerMayNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull
  private def innerType(e: Expression): ArrayType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType]
  private def innerMayNull(e: Expression): Boolean = innerType(e).containsNull
  private def innerIsFloat(e: Expression): Boolean =
    innerType(e).elementType == FloatType

  private def dimError(a: Int, b: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"inner_product: vector dimensions differ ($a vs $b)")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val qOut = left.eval(input)
    if (qOut == null) return null
    val q = qOut.asInstanceOf[ArrayData]
    val nq = q.numElements()
    if (nq == 0) return 0.0
    val dOut = right.eval(input)
    if (dOut == null) return null
    val docs = dOut.asInstanceOf[ArrayData]
    val nd = docs.numElements()
    val qf = innerIsFloat(left); val df = innerIsFloat(right)
    val qInner = innerMayNull(left); val dInner = innerMayNull(right)
    val dOuter = outerMayNull(right)
    var total = 0.0
    var nullResult = false
    var i = 0
    while (i < nq) {
      // a WHOLLY null query token skips its own dots with no dim checks
      // (inner_product's null-safe eval never ran for that token) but
      // does NOT end the fold — the composition carried a null
      // accumulator through the REMAINING tokens, whose dim checks still
      // run (and can throw). A token with a null ELEMENT must likewise
      // dim-check every non-null doc token first — inner_product checks
      // dims BEFORE null elements, so the old composition threw on a
      // mismatched pair even when the dot would have been null.
      if (outerMayNull(left) && q.isNullAt(i)) nullResult = true
      else {
        val qv = q.getArray(i)
        val dim = qv.numElements()
        var qHasNull = false
        if (qInner) {
          var k = 0
          while (k < dim && !qHasNull) { if (qv.isNullAt(k)) qHasNull = true; k += 1 }
        }
        var best = 0.0
        var found = false
        var j = 0
        while (j < nd) {
          var skip = dOuter && docs.isNullAt(j)
          if (!skip) {
            val dv = docs.getArray(j)
            if (dv.numElements() != dim) throw dimError(dim, dv.numElements())
            if (qHasNull) skip = true
            if (dInner && !skip) {
              var k = 0
              while (k < dim && !skip) { if (dv.isNullAt(k)) skip = true; k += 1 }
            }
            if (!skip) {
              var acc = 0.0
              var k = 0
              while (k < dim) {
                val x = if (qf) qv.getFloat(k).toDouble else qv.getDouble(k)
                val y = if (df) dv.getFloat(k).toDouble else dv.getDouble(k)
                acc += x * y
                k += 1
              }
              if (!found || java.lang.Double.compare(acc, best) > 0) {
                best = acc; found = true
              }
            }
          }
          j += 1
        }
        if (!found) nullResult = true
        else total += best
      }
      i += 1
    }
    if (nullResult) null else total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val qGen = left.genCode(ctx)
    val dGen = right.genCode(ctx)
    val nq = ctx.freshName("nq"); val nd = ctx.freshName("nd")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val k = ctx.freshName("k")
    val qv = ctx.freshName("qv"); val dv = ctx.freshName("dv")
    val dim = ctx.freshName("dim"); val acc = ctx.freshName("acc")
    val best = ctx.freshName("best"); val found = ctx.freshName("found")
    val total = ctx.freshName("total"); val bail = ctx.freshName("bail")
    val qf = innerIsFloat(left); val df = innerIsFloat(right)
    val fastPath = qf && df && !innerMayNull(left) && !innerMayNull(right) &&
      !outerMayNull(left) && !outerMayNull(right)
    val kernels = "graft.functions.VectorKernels"

    val throwDim =
      s"""throw new IllegalArgumentException(
         |  "inner_product: vector dimensions differ (" + $dim + " vs " + %s + ")");"""
        .stripMargin

    val kernel = if (fastPath) {
      // floats, no nulls anywhere: unwrap docs ONCE per row and each query
      // token once, into reused per-instance scratch (steady-state
      // alloc-free); the dot runs over primitive float[] (JIT-vectorized)
      val docScr = ctx.addMutableState("float[][]", "msDocScratch")
      val qScr = ctx.addMutableState("float[]", "msQScratch")
      val dvp = ctx.freshName("dvp"); val qvp = ctx.freshName("qvp")
      val dA = ctx.freshName("dArr")
      s"""if ($docScr == null || $docScr.length < $nd) $docScr = new float[$nd][];
         |for (int $j = 0; $j < $nd; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $dA = ${dGen.value}.getArray($j);
         |  $docScr[$j] = $kernels.unwrapFloats($dA, $dA.numElements(), $docScr[$j]);
         |}
         |boolean $bail = false;
         |double $total = 0.0;
         |for (int $i = 0; $i < $nq && !$bail; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $qv = ${qGen.value}.getArray($i);
         |  final int $dim = $qv.numElements();
         |  $qScr = $kernels.unwrapFloats($qv, $dim, $qScr);
         |  final float[] $qvp = $qScr;
         |  double $best = 0.0;
         |  boolean $found = false;
         |  for (int $j = 0; $j < $nd; $j++) {
         |    final float[] $dvp = $docScr[$j];
         |    if ($dvp.length != $dim) {
         |      ${throwDim.format(s"$dvp.length")}
         |    }
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $dim; $k++) {
         |      $acc += ((double) $qvp[$k]) * ((double) $dvp[$k]);
         |    }
         |    if (!$found || java.lang.Double.compare($acc, $best) > 0) {
         |      $best = $acc; $found = true;
         |    }
         |  }
         |  if (!$found) { $bail = true; }
         |  else { $total += $best; }
         |}
         |if ($bail) { ${ev.isNull} = true; }
         |else { ${ev.value} = $total; }""".stripMargin
    } else {
      // general path: nested getters with the full null discipline
      val qGet = if (qf) s"((double) $qv.getFloat($k))" else s"$qv.getDouble($k)"
      val dGet = if (df) s"((double) $dv.getFloat($k))" else s"$dv.getDouble($k)"
      val skip = ctx.freshName("skip")
      val qHasNull = ctx.freshName("qHasNull")
      // a token with a null ELEMENT must still dim-check every non-null
      // doc token (inner_product checks dims BEFORE null elements — the
      // composition threw on a mismatched pair even when the dot would
      // have been null); a WHOLLY null token skips only its OWN dots —
      // the fold continues over later tokens, whose dim checks can still
      // throw (the composition folded a null accumulator to the end)
      val qNullScan = if (!innerMayNull(left)) s"final boolean $qHasNull = false;" else
        s"""boolean $qHasNull = false;
           |for (int $k = 0; $k < $dim && !$qHasNull; $k++) {
           |  if ($qv.isNullAt($k)) $qHasNull = true;
           |}""".stripMargin
      val qOuterCheck = if (!outerMayNull(left)) "" else
        s"if (${qGen.value}.isNullAt($i)) { $bail = true; continue; }"
      val dOuterCheck = if (!outerMayNull(right)) "false" else
        s"${dGen.value}.isNullAt($j)"
      val dNullScan = if (!innerMayNull(right)) "" else
        s"""for (int $k = 0; $k < $dim && !$skip; $k++) {
           |  if ($dv.isNullAt($k)) $skip = true;
           |}""".stripMargin
      s"""boolean $bail = false;
         |double $total = 0.0;
         |for (int $i = 0; $i < $nq; $i++) {
         |  $qOuterCheck
         |  org.apache.spark.sql.catalyst.util.ArrayData $qv = ${qGen.value}.getArray($i);
         |  final int $dim = $qv.numElements();
         |  $qNullScan
         |  double $best = 0.0;
         |  boolean $found = false;
         |  for (int $j = 0; $j < $nd; $j++) {
         |    boolean $skip = $dOuterCheck;
         |    if (!$skip) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $dv = ${dGen.value}.getArray($j);
         |      if ($dv.numElements() != $dim) {
         |        ${throwDim.format(s"$dv.numElements()")}
         |      }
         |      if ($qHasNull) $skip = true;
         |      $dNullScan
         |      if (!$skip) {
         |        double $acc = 0.0;
         |        for (int $k = 0; $k < $dim; $k++) {
         |          $acc += $qGet * $dGet;
         |        }
         |        if (!$found || java.lang.Double.compare($acc, $best) > 0) {
         |          $best = $acc; $found = true;
         |        }
         |      }
         |    }
         |  }
         |  if (!$found) { $bail = true; }
         |  else { $total += $best; }
         |}
         |if ($bail) { ${ev.isNull} = true; }
         |else { ${ev.value} = $total; }""".stripMargin
    }

    ev.copy(code =
      code"""
        ${qGen.code}
        boolean ${ev.isNull} = false;
        double ${ev.value} = 0.0;
        if (${qGen.isNull}) {
          ${ev.isNull} = true;
        } else {
          final int $nq = ${qGen.value}.numElements();
          if ($nq != 0) {
            ${dGen.code}
            if (${dGen.isNull}) {
              ${ev.isNull} = true;
            } else {
              final int $nd = ${dGen.value}.numElements();
              $kernel
            }
          }
        }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
