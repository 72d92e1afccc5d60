package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{L2Distance, L2DistanceSq}
import graft.index.{AnnIndexManager, IndexMeta}

/** Optimizer rewrite: `ORDER BY l2_distance(col, const) LIMIT k` over a
  * relation with a registered ANN index → index-backed top-k scan
  * (reference: src/ann_optimizer.cpp:348-530 — pattern validation, metric
  * routing, cost gates, cardinality=k, ORDER BY removal).
  *
  * Differences from the reference, on purpose:
  *  - standalone ORDER BY without LIMIT is NOT rewritten (the reference
  *    silently truncates to k=100, src/ann_optimizer.cpp:555-557 — a bug
  *    we don't replicate);
  *  - a FILTER between sort and scan bails out here too, but the engine
  *    offers `AnnSearch.searchFiltered` (overfetch) as the supported path.
  *
  * Cost gates (reference :459-472) are confs:
  * `spark.ann.minTableRows` (50), `spark.ann.maxSelectivity` (0.1),
  * `spark.ann.maxSelectivityGraph` (0.3).
  */
case class AnnTopKRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(Literal(k: Int, _), LocalLimit(_,
        Sort(Seq(SortOrder(sortExpr, Ascending, _, _)), true, sortChild, _))) =>
      tryRewrite(k, sortExpr, sortChild).getOrElse(gl)
  }

  private def confInt(key: String, default: Int): Int =
    spark.conf.getOption(key).map(_.toInt).getOrElse(default)
  private def confDouble(key: String, default: Double): Double =
    spark.conf.getOption(key).map(_.toDouble).getOrElse(default)

  /** Resolve an attribute through intervening Projects to the expression
    * that defines it; bail on Filters/joins (reference bails on FILTER,
    * src/ann_optimizer.cpp:479-481). */
  private def resolveThroughProjects(e: Expression, plan: LogicalPlan): Option[Expression] =
    e match {
      case a: AttributeReference => plan match {
        case Project(exprs, child) =>
          exprs.collectFirst {
            case al @ Alias(aliased, _) if al.exprId == a.exprId => aliased
          } match {
            case Some(found) => resolveThroughProjects(found, child)
            case None => resolveThroughProjects(a, child) // pass-through column
          }
        case _: LogicalRelation => Some(a)
        case _ => None
      }
      case other => Some(other)
    }

  private def findRelation(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case lr: LogicalRelation => Some(lr)
    case Project(_, child) => findRelation(child)
    case _ => None // Filter or anything else → bail out
  }

  private def literalToFloats(lit: Literal): Option[Array[Float]] = lit.dataType match {
    case ArrayType(FloatType, _) =>
      Some(lit.value.asInstanceOf[ArrayData].toFloatArray())
    case ArrayType(DoubleType, _) =>
      Some(lit.value.asInstanceOf[ArrayData].toDoubleArray().map(_.toFloat))
    case _ => None
  }

  private def tryRewrite(k: Int, sortExpr: Expression,
                         sortChild: LogicalPlan): Option[LogicalPlan] = {
    val relation = findRelation(sortChild).getOrElse(return None)
    val resolved = resolveThroughProjects(sortExpr, sortChild).getOrElse(return None)

    // pattern: l2_distance(_sq)(vecCol, constant) in either arg order
    val (vecAttr, qvec) = resolved match {
      case L2Distance(a: AttributeReference, l: Literal) => (a, literalToFloats(l))
      case L2Distance(l: Literal, a: AttributeReference) => (a, literalToFloats(l))
      case L2DistanceSq(a: AttributeReference, l: Literal) => (a, literalToFloats(l))
      case L2DistanceSq(l: Literal, a: AttributeReference) => (a, literalToFloats(l))
      case _ => return None
    }
    val q = qvec.getOrElse(return None)

    // the sorted column must come straight from the scanned relation
    if (!relation.output.exists(_.exprId == vecAttr.exprId)) return None

    val relPaths: Seq[String] = relation.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString.stripPrefix("file:"))
      case _ => return None
    }

    // locate a registered, metric-compatible index on that path + column
    val hit = AnnIndexManager.registered.iterator.flatMap { case (_, path) =>
      scala.util.Try(IndexMeta.read(path)).toOption.map(m => (path, m))
    }.find { case (_, m) =>
      m.metric == "l2" && m.vecCol == vecAttr.name &&
        m.params.get("table_path").exists(tp =>
          relPaths.exists(rp => rp == tp || rp.stripSuffix("/") == tp.stripSuffix("/")))
    }
    val (idxPath, meta) = hit.getOrElse(return None)

    // cost gates (reference: src/ann_optimizer.cpp:459-472)
    val n = meta.numVectors
    if (n < confInt("spark.ann.minTableRows", 50)) return None
    val maxSel = if (meta.engine == "DISKANN")
      confDouble("spark.ann.maxSelectivityGraph", 0.3)
    else confDouble("spark.ann.maxSelectivity", 0.1)
    if (k > n * maxSel) return None

    logInfo(s"AnnTopKRule: rewriting ORDER BY ${resolved.prettyName} LIMIT $k " +
      s"to index scan (index=${meta.name}, engine=${meta.engine}, k=$k)")

    // replacement: index scan joined back to the base relation, keeping the
    // original output attributes (exprIds preserved via aliases)
    val idx = AnnIndexManager.load(spark, idxPath)
    val base = GraftBridge.ofRows(spark, relation)
    val hits = idx.scan(q, k)
    val joined = base
      .join(broadcast(hits), base(meta.idCol) === hits("id"))
      .drop(hits("id"))
      .orderBy(col("_distance"), base(meta.idCol))
      .limit(k)

    // embed the replacement fully OPTIMIZED: an analyzed subtree would leak
    // ResolvedHint past EliminateResolvedHint and break physical planning.
    // (No self-recursion: the replacement's sorts carry two keys, which the
    // single-key rule pattern does not match.)
    val newPlan = GraftBridge.optimizedPlan(joined)
    val newOutput = newPlan.output
    // rebuild each original output column by resolving it to an expression
    // over the relation and remapping attribute refs (by name) into the
    // replacement plan — computed columns (e.g. sqrt vs squared distance)
    // keep their exact original semantics, recomputed over just k rows.
    val projections: Seq[NamedExpression] = sortChild.output.map { oldAttr =>
      val resolvedExpr = resolveThroughProjects(oldAttr, sortChild).getOrElse(return None)
      val remapped = resolvedExpr.transform {
        case a: AttributeReference =>
          newOutput.find(_.name == a.name).getOrElse(return None)
      }
      Alias(remapped, oldAttr.name)(exprId = oldAttr.exprId)
    }
    Some(Project(projections, newPlan))
  }
}

/** Session-extension registration (`withExtensions`) and runtime enabling
  * for existing sessions (`spark.experimental.extraOptimizations`). */
class AnnExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectOptimizerRule(s => AnnTopKRule(s))
}

object AnnOptimizer {
  def enable(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[AnnTopKRule]))
      spark.experimental.extraOptimizations = existing :+ AnnTopKRule(spark)
  }
  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[AnnTopKRule])
}
