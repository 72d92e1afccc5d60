package graft.operators

import graft.SparkSpec
import graft.functions.VectorKernels
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._

import java.nio.file.Files

class OperatorSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_op_spec").toString

  private lazy val vecs: Seq[(Long, Int, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(300)(i => (i.toLong, i % 5, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
  }

  private lazy val vecsDf = {
    import spark.implicits._
    vecs.toDF("id", "tag", "vec")
  }

  private lazy val flat = AnnIndexManager.create(spark, "op_flat", vecsDf,
    "id", "vec", "FLAT", Map("metric" -> "l2"), s"$tmp/op_flat")

  private lazy val ivf = AnnIndexManager.create(spark, "op_ivf", vecsDf,
    "id", "vec", "IVF", Map("metric" -> "l2", "nlist" -> "6", "nprobe" -> "6"),
    s"$tmp/op_ivf")

  private def brute(q: Array[Float], k: Int, pred: ((Long, Int, Array[Float])) => Boolean = _ => true): Seq[Long] =
    vecs.filter(pred)
      .map { case (id, _, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("searchTable (F8): VALUES-style input with passthrough columns") {
    import spark.implicits._
    val queries = Seq(
      ("near_first", vecs(0)._3),
      ("near_last", vecs(299)._3)
    ).toDF("qname", "qvec")
    val res = AnnSearch.searchTable(flat, queries, k = 3, queryIdCol = Some("qname"))
    val byName = res.collect().groupBy(_.getAs[String]("qname"))
    assert(byName.keySet == Set("near_first", "near_last"))
    for ((name, rows) <- byName) {
      assert(rows.length == 3)
      val ids = rows.sortBy(r => (r.getAs[Double]("_distance"), r.getAs[Long]("id")))
        .map(_.getAs[Long]("id")).toSeq
      val q = if (name == "near_first") vecs(0)._3 else vecs(299)._3
      assert(ids == brute(q, 3), name)
      assert(ids.head == (if (name == "near_first") 0L else 299L)) // self at distance 0
    }
  }

  test("searchTable over IVF with auto-detected vector column and generated qid") {
    import spark.implicits._
    val queries = Seq.tabulate(5)(i => Tuple1(vecs(i * 50)._3)).toDF("anon_vec")
    val res = AnnSearch.searchTable(ivf, queries, k = 4, nprobe = 6)
    assert(res.count() == 20)
    // every query's best hit is itself at distance 0
    val zero = res.filter(col("_distance") === 0.0).count()
    assert(zero == 5)
  }

  test("searchTable errors when no numeric array column exists (F8 error case)") {
    import spark.implicits._
    val bad = Seq(("a", 1)).toDF("s", "i")
    val e = intercept[IllegalArgumentException] {
      AnnSearch.searchTable(flat, bad, k = 3)
    }
    assert(e.getMessage.contains("no numeric array column"))
  }

  test("vectorDistances appends _distance without reordering (S6)") {
    val q = vecs(10)._3
    val res = AnnSearch.vectorDistances(vecsDf, "vec", q).collect()
    assert(res.length == 300)
    val m = res.map(r => r.getAs[Long]("id") -> r.getAs[Double]("_distance")).toMap
    assert(m(10L) == 0.0)
    assert(math.abs(m(11L) - VectorKernels.l2Sq(q, vecs(11)._3)) < 1e-9)
  }

  test("searchFiltered: overfetch path and exact fallback agree with brute force") {
    val q = vecs(42)._3
    // selective predicate (1/5 of rows): overfetch 3k+100 covers it at n=300
    val res = AnnSearch.searchFiltered(flat, vecsDf, "id", q, 5,
      predicate = col("tag") === 2)
    val got = res.collect().map(_.getAs[Long]("id")).toSeq
    assert(got == brute(q, 5, t => t._2 == 2))
  }

  test("TopK.grouped equals window-based top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(5000)(i => (i % 7, i.toLong, rnd.nextDouble()))
    val df = rows.toDF("g", "id", "d").repartition(8)
    val got = TopK.grouped(df, "g", "d", "id", 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (r._3, r._2)).take(10).map(r => (g, r._2))
    }.toSet
    assert(got == expect)
  }
}
