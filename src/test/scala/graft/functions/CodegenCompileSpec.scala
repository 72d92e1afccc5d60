package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Hard-compile the generated Java for every custom expression across ALL
  * nullability shapes of its inputs. `GenerateUnsafeProjection.generate`
  * throws on a Janino compile error — no interpreted fallback — so this
  * catches the silent-perf-cliff class of bug where an expression's
  * doGenCode references `${ev.isNull}` for a NON-nullable input (the
  * variable is never declared in that case; Spark would quietly fall back
  * to the interpreted projection in production, which is how the
  * neardup_ann cosine path ran un-codegen'd until round 9). */
class CodegenCompileSpec extends AnyFunSuite {

  private def arr(ordinal: Int, nullable: Boolean, containsNull: Boolean,
                  elem: DataType = FloatType): BoundReference =
    BoundReference(ordinal, ArrayType(elem, containsNull), nullable)

  private def bin(ordinal: Int, nullable: Boolean): BoundReference =
    BoundReference(ordinal, BinaryType, nullable)

  private def assertCompiles(label: String, e: Expression): Unit = {
    try GenerateUnsafeProjection.generate(Seq(Alias(e, "out")()))
    catch {
      case ex: Throwable =>
        fail(s"$label failed to codegen-compile: ${ex.getMessage}")
    }
  }

  private val shapes = for {
    nullable <- Seq(false, true)
    containsNull <- Seq(false, true)
  } yield (nullable, containsNull)

  test("unary array expressions compile for every input nullability shape") {
    for ((n, cn) <- shapes) {
      val a = arr(0, n, cn)
      assertCompiles(s"NormalizeVector(nullable=$n, containsNull=$cn)",
        NormalizeVector(a))
      assertCompiles(s"RandomProjection(nullable=$n, containsNull=$cn)",
        RandomProjection(a, dim = 8, outDim = 4, seed = 7))
    }
  }

  test("binary vector distances compile for every input nullability shape") {
    for ((n, cn) <- shapes) {
      val a = arr(0, n, cn)
      val b = arr(1, n, cn)
      assertCompiles(s"L2Distance($n,$cn)", L2Distance(a, b))
      assertCompiles(s"L2DistanceSq($n,$cn)", L2DistanceSq(a, b))
      assertCompiles(s"InnerProduct($n,$cn)", InnerProduct(a, b))
      assertCompiles(s"CosineSimilarity($n,$cn)", CosineSimilarity(a, b))
    }
  }

  test("MaxSimScore compiles for every nested-array nullability shape and both element types") {
    def bag(ordinal: Int, nullable: Boolean, outerCN: Boolean,
            innerCN: Boolean, elem: DataType): BoundReference =
      BoundReference(ordinal,
        ArrayType(ArrayType(elem, innerCN), outerCN), nullable)
    for {
      n <- Seq(false, true)
      ocn <- Seq(false, true)
      icn <- Seq(false, true)
      elem <- Seq[DataType](FloatType, DoubleType)
    } {
      val q = bag(0, n, ocn, icn, elem)
      val d = bag(1, n, ocn, icn, elem)
      assertCompiles(s"MaxSimScore(n=$n,ocn=$ocn,icn=$icn,$elem)",
        MaxSimScore(q, d))
    }
    // mixed shapes: the fast path requires BOTH sides clean — one dirty
    // side must still compile down the general path
    assertCompiles("MaxSimScore(mixed fast/general)",
      MaxSimScore(bag(0, false, false, false, FloatType),
        bag(1, false, true, false, FloatType)))
    assertCompiles("MaxSimScore(mixed float/double)",
      MaxSimScore(bag(0, false, false, false, FloatType),
        bag(1, false, false, false, DoubleType)))
  }

  test("quantized-code distances compile for every query nullability shape") {
    val mins = Array.fill(8)(0f); val scales = Array.fill(8)(1f)
    val books = Pq.Codebooks(2, 4, 4, Array.fill(2 * 4 * 4)(0.5f))
    for ((n, cn) <- shapes) {
      val codes = bin(0, nullable = n)
      val q = arr(1, n, cn)
      for (metric <- Seq("l2", "ip", "cosine")) {
        assertCompiles(s"Sq8Distance($metric,$n,$cn)",
          Sq8Distance(codes, q, mins, scales, metric))
        assertCompiles(s"Fp16Distance($metric,$n,$cn)",
          Fp16Distance(codes, q, metric))
        assertCompiles(s"PqDistance($metric,$n,$cn)",
          PqDistance(codes, q, books, metric))
      }
      assertCompiles(s"BqDistance($n,$cn)", BqDistance(codes, q, 8, "hamming"))
      assertCompiles(s"BqCodesDistance($n)",
        BqCodesDistance(codes, bin(1, nullable = n), 8, "hamming"))
      for (metric <- Seq("l2", "ip", "cosine"); pre <- Seq(false, true))
        assertCompiles(s"RabitqDistance($metric,$n,$cn,pre=$pre)",
          RabitqDistance(codes, q, 8, 42L, metric, preRotated = pre))
    }
  }
}
