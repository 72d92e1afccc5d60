package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static contract checks on the driver entry point: a typo'd oracle key
  * or a module-merge collision would silently zero queries in the
  * driver's correctness run — fail the suite instead. No SparkSession
  * needed; these are pure map assertions. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key names a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries with no matching query (typo?): $orphans")
  }

  test("query names are driver-safe identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-identifier query names: $bad")
  }

  test("module merge loses no queries (no cross-module name collisions)") {
    val modules = Seq(
      "RelationalQueries" -> graft.queries.RelationalQueries.queries.keySet,
      "VectorQueries" -> graft.queries.VectorQueries.queries.keySet,
      "IndexQueries" -> graft.queries.IndexQueries.queries.keySet,
      "TextQueries" -> graft.queries.TextQueries.queries.keySet,
      "MultimodalQueries" -> graft.queries.MultimodalQueries.queries.keySet,
      "UrlQueries" -> graft.queries.UrlQueries.queries.keySet)
    for (Seq((m1, k1), (m2, k2)) <- modules.combinations(2)) {
      val overlap = k1 & k2
      assert(overlap.isEmpty, s"$m1 and $m2 both define: $overlap")
    }
    assert(SparkEntry.queries.size == modules.map(_._2.size).sum)
  }

  test("oracle SQL strings are non-empty and single-statement") {
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.trim.stripSuffix(";").contains(";"),
        s"$name: oracle must be a single statement")
    }
  }

  // the driver's testdata generator has shipped events.ts as BOTH raw
  // int64 nanos (legacy TIMESTAMP(NANOS) read) and timestamp[us]
  // (TIMESTAMP_NTZ) across rounds — tsMicros must land on the identical
  // epoch-micros value for the same instant on every vintage
  test("QuerySupport.tsMicros normalizes every ts vintage to epoch-micros") {
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session
    import spark.implicits._
    val micros = 1723577130123456L // 2024-08-13T19:25:30.123456Z
    def tsu(df: org.apache.spark.sql.DataFrame): Long =
      df.select(graft.queries.QuerySupport.tsMicros(df).as("tsu"))
        .head().getLong(0)
    val nanosDf = Seq(micros * 1000L).toDF("ts") // legacy nanosAsLong read
    assert(tsu(nanosDf) == micros)
    val tsDf = spark.range(1).select(timestamp_micros(lit(micros)).as("ts"))
    assert(tsu(tsDf) == micros)
    // NTZ branch must be SESSION-TIMEZONE-INDEPENDENT (the generator's
    // timestamp[us] is a naive wall clock; DuckDB's epoch_us on it is
    // tz-free): assert under a deliberately non-UTC session zone
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try {
      val ntzDf = spark.range(1).select(
        expr("TIMESTAMP_NTZ '2024-08-13 19:25:30.123456'").as("ts"))
      assert(ntzDf.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      assert(tsu(ntzDf) == micros)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
