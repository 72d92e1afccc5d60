package graft.functions

import graft.SparkSpec
import graft.functions.VectorKernels
import graft.index.AnnIndexManager

import java.nio.file.Files

class AnnSqlSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_sql_spec").toString

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(17)
    Seq.tabulate(100)(i => (i.toLong, Array.fill(3)(rnd.nextFloat())))
  }

  private lazy val idx = {
    import spark.implicits._
    AnnIndexManager.create(spark, "sql_idx", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/sql_idx")
  }

  test("SQL TVF ann_index_scan returns sorted (id, _distance)") {
    idx
    AnnSql.register(spark)
    val rows = spark.sql(
      "SELECT * FROM ann_index_scan('sql_idx', array(0.5, 0.5, 0.5), 5)").collect()
    assert(rows.length == 5)
    val expect = vecs
      .map { case (id, v) => (id, VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v)) }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(rows.map(_.getLong(0)).toSeq == expect)
    assert(rows.map(_.getDouble(1)).toSeq.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("SQL TVFs ann_list / ann_index_info / ann_engine_info") {
    idx
    AnnSql.register(spark)
    val names = spark.sql("SELECT name FROM ann_list()").collect().map(_.getString(0))
    assert(names.contains("sql_idx"))
    val info = spark.sql(
      "SELECT num_vectors FROM ann_index_info() WHERE name = 'sql_idx'").head()
    assert(info.getLong(0) == 100)
    assert(spark.sql("SELECT * FROM ann_engine_info()").count() == 1)
  }

  test("SQL TVF composes with plain SQL (join back to a view)") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_vecs")
    val joined = spark.sql(
      """SELECT v.id, s._distance FROM ann_index_scan('sql_idx', array(0.1, 0.2, 0.3), 3) s
        |JOIN sql_vecs v ON v.id = s.id ORDER BY s._distance, v.id""".stripMargin)
      .collect()
    assert(joined.length == 3)
  }

  test("ann_index_scan errors: unknown index, non-literal vector") {
    AnnSql.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM ann_index_scan('nope_idx', array(1.0), 5)").collect()
    }
    assert(e.getMessage.contains("unknown ANN index") || e.getMessage.contains("nope_idx"))
  }
}
