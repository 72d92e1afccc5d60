package graft.pipeline

import graft.SparkSpec
import graft.functions.VectorKernels
import org.apache.spark.sql.functions._

import java.nio.file.Files

class NegativeMiningSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_negmine_spec").toString

  // clustered corpus: 10 clusters x 30 docs in 16 dims — near neighbors are
  // cluster-mates, so "hard negatives" are semantically meaningful
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(17)
    Seq.tabulate(300) { i =>
      val c = i % 10
      (i.toLong, Array.tabulate(16)(j =>
        (if (j == c) 5f else 0f) + (rnd.nextFloat() - 0.5f)))
    }
  }

  private lazy val idx = {
    import spark.implicits._
    graft.index.AnnIndexManager.create(spark, "negmine_flat",
      vecs.toDF("id", "embedding"), "id", "embedding", "FLAT",
      Map("metric" -> "l2"), s"$tmp/flat")
  }

  private def dist(a: Array[Float], b: Array[Float]): Double =
    math.sqrt(VectorKernels.l2Sq(a, b))

  /** brute-force replay of the operator chain */
  private def brute(q: Array[Float], posId: Long, k: Int, overfetch: Int,
                    margin: Double): Seq[Long] = {
    val cands = vecs.map { case (id, v) => (id, dist(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k * overfetch + 1)
    val pdist = dist(q, vecs(posId.toInt)._2)
    cands.filter(_._1 != posId)
      .filter { case (_, d) => margin <= 0.0 || d >= margin * pdist }
      .take(k).map(_._1)
  }

  test("mined negatives equal the brute-force chain, with and without denoising") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    for (margin <- Seq(0.0, 1.0)) {
      val pairs = Seq.tabulate(6)(i =>
        (i.toLong, vecs(i * 7)._2, ((i * 7 + 30) % 300).toLong)) // pos = a cluster-mate
        .toDF("qid", "qvec", "pos_id")
      val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
          "pos_id", base, "id", "embedding", k = 4, overfetch = 3,
          denoiseMargin = margin)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
      for (i <- 0 until 6) {
        val want = brute(vecs(i * 7)._2, (i * 7 + 30) % 300, 4, 3, margin)
        assert(got.getOrElse(i.toLong, Nil) == want, s"qid=$i margin=$margin")
      }
    }
  }

  test("the labeled positive never appears among the negatives") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    // positive = each query's own row: the trivially-nearest candidate
    val pairs = Seq.tabulate(8)(i => (i.toLong, vecs(i)._2, i.toLong))
      .toDF("qid", "qvec", "pos_id")
    val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
      "pos_id", base, "id", "embedding", k = 5, overfetch = 2)
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) != r.getLong(0),
      s"positive leaked for qid=${r.getLong(0)}"))
    // ranks are 1-based and contiguous per query
    got.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq, s"qid=$q")
    }
  }

  test("partitioning-invariant: repartitioned inputs mine the same negatives") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val pairs = Seq.tabulate(4)(i => (i.toLong, vecs(i * 11)._2, (i * 11).toLong))
    val a = NegativeMining.mineHardNegatives(idx,
        pairs.toDF("qid", "qvec", "pos_id"), "qid", "qvec", "pos_id",
        base, "id", "embedding", k = 3, overfetch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = NegativeMining.mineHardNegatives(idx,
        pairs.toDF("qid", "qvec", "pos_id").repartition(7),
        "qid", "qvec", "pos_id", base.repartition(5), "id", "embedding",
        k = 3, overfetch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("an aggressive margin yields fewer than k rows rather than padding") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    // positive FAR from the query (different cluster): margin 1.0 drops
    // every nearby candidate — expect under-full output, never pad rows
    val pairs = Seq((0L, vecs(0)._2, 155L)).toDF("qid", "qvec", "pos_id")
    val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
        "pos_id", base, "id", "embedding", k = 10, overfetch = 2,
        denoiseMargin = 1.0)
      .collect()
    val want = brute(vecs(0)._2, 155L, 10, 2, 1.0)
    assert(got.length == want.length && got.length < 10)
  }
}
