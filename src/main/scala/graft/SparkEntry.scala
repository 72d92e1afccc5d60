package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each module contributes `queries` (Spark impl) and `oracleSql`
  * (DuckDB-equivalent SQL the driver hash-compares against).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.queries("knn_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      VectorQueries.queries ++
      IndexQueries.queries ++
      TextQueries.queries ++
      MultimodalQueries.queries ++
      UrlQueries.queries

  /** Parameter-sweep diagnostics (approximate probe/beam configurations
    * with no oracle form BY CONSTRUCTION) — runnable like queries but kept
    * out of the driver's correctness inventory; each has a strict
    * exact-configuration sibling in [[queries]]. Exercised by
    * DiagnosticsSpec. */
  def diagnostics: Map[String, (SparkSession, String) => DataFrame] =
    IndexQueries.diagnostics

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++
      VectorQueries.oracleSql ++
      IndexQueries.oracleSql ++
      TextQueries.oracleSql ++
      MultimodalQueries.oracleSql ++
      UrlQueries.oracleSql
}
