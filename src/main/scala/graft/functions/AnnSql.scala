package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.index.AnnIndexManager

/** SQL table-valued-function surface, mirroring the reference's TVF
  * registrations (src/ann_search.cpp:1165-1218, src/ann_list.cpp:88-222,
  * src/diskann_functions.cpp:118-125):
  *
  *   SELECT * FROM ann_index_scan('idx', array(...), 10[, search_param])
  *   SELECT * FROM ann_list()
  *   SELECT * FROM ann_index_info()
  *   SELECT * FROM ann_engine_info()
  *
  * Scalar functions (l2_distance etc.) are registered by [[AnnFunctions]];
  * the in-out TABLE-argument shapes (S5/S6) are Scala-API operators
  * (`AnnSearch.searchTable` / `vectorDistances`).
  */
object AnnSql {

  /** Extract a constant float vector from a parsed (possibly unresolved)
    * argument expression: a folded Literal array, or array(...) of numeric
    * literals straight from the parser. */
  private def constVector(e: Expression): Array[Float] = e match {
    case Literal(a: ArrayData, ArrayType(FloatType, _)) => a.toFloatArray()
    case Literal(a: ArrayData, ArrayType(DoubleType, _)) => a.toDoubleArray().map(_.toFloat)
    case CreateArray(children, _) => children.map(constNum).toArray
    case uf: UnresolvedFunction if uf.nameParts.map(_.toLowerCase) == Seq("array") =>
      uf.arguments.map(constNum).toArray
    case other => throw new IllegalArgumentException(
      s"expected a constant array literal query vector, got: ${other.sql}")
  }

  private def constNum(e: Expression): Float = e match {
    case Literal(v: java.lang.Number, _) => v.floatValue()
    case Literal(d: Decimal, _) => d.toFloat
    case UnaryMinus(inner, _) => -constNum(inner)
    case Cast(inner, _, _, _) => constNum(inner)
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got: ${other.sql}")
  }

  private def constString(e: Expression): String = e match {
    case Literal(s, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"expected a string literal, got: ${other.sql}")
  }

  private def constInt(e: Expression): Int = e match {
    case Literal(v: java.lang.Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got: ${other.sql}")
  }

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.tableFunctionRegistry

    def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
      GraftBridge.analyzedPlan(df)

    r.createOrReplaceTempFunction("ann_list",
      (_: Seq[Expression]) => plan(AnnIndexManager.list(spark)), "scala_udf")

    r.createOrReplaceTempFunction("ann_index_info",
      (_: Seq[Expression]) => plan(AnnIndexManager.info(spark)), "scala_udf")

    r.createOrReplaceTempFunction("ann_engine_info",
      (_: Seq[Expression]) => plan(AnnIndexManager.engineInfo(spark)), "scala_udf")

    // ann_index_scan(index_name, query_vec, k [, search_param])
    // → (id BIGINT, _distance DOUBLE), pre-sorted (S1/S2)
    r.createOrReplaceTempFunction("ann_index_scan", (exprs: Seq[Expression]) => {
      require(exprs.length >= 3 && exprs.length <= 4,
        "usage: ann_index_scan(name, query_vec, k[, search_param])")
      val name = constString(exprs(0))
      val q = constVector(exprs(1))
      val k = constInt(exprs(2))
      val sp = if (exprs.length > 3) constInt(exprs(3)) else -1
      val path = AnnIndexManager.registered.getOrElse(name,
        throw new IllegalArgumentException(s"unknown ANN index: $name"))
      plan(AnnIndexManager.load(spark, path).scan(q, k, sp))
    }, "scala_udf")
  }
}
