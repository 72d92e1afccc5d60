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

  test("margin is on the TRUE distance scale for l2 (squared index distance uses margin²)") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val qi = 3
    val pos = ((qi + 30) % 300).toLong // a cluster-mate
    val pairs = Seq((0L, vecs(qi)._2, pos)).toDF("qid", "qvec", "pos_id")
    for (margin <- Seq(0.3, 0.7, 1.2)) {
      val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
          "pos_id", base, "id", "embedding", k = 6, overfetch = 4,
          denoiseMargin = margin)
        .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
      // brute() computes sqrt distances, so its margin IS the true scale
      assert(got == brute(vecs(qi)._2, pos, 6, 4, margin), s"margin=$margin")
    }
  }

  test("multiple positives per query: one fetch, every positive excluded, denoise on the nearest") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val q = vecs(0)._2
    // positives: two cluster-mates of query 0 (ids ≡ 0 mod 10)
    val pairs = Seq((0L, q, 10L), (0L, q, 20L)).toDF("qid", "qvec", "pos_id")
    val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
        "pos_id", base, "id", "embedding", k = 5, overfetch = 4)
      .collect()
    val ids = got.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    // brute: fetch once (reserve = 2, one per labeled positive), drop BOTH
    // positives, take 5
    val cands = vecs.map { case (id, v) => (id, dist(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(5 * 4 + 2)
    val want = cands.filter(c => c._1 != 10L && c._1 != 20L).take(5).map(_._1)
    assert(ids == want)
    // no duplicate (qid, doc) rows; ranks contiguous
    assert(got.map(_.getLong(1)).distinct.length == got.length)
    assert(got.map(_.getLong(2)).sorted.toSeq == (1L to got.length).toSeq)
  }

  test("multi-positive yield: the fetch reserves room for EVERY positive (the +1 bug)") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    // query 0's three nearest candidates are all labeled positives:
    // k=2, overfetch=1 fetched k·overfetch+1 = 3 under the old reserve —
    // all three positives, ZERO negatives. The widened reserve (+3) must
    // still yield the full k=2.
    val q = vecs(0)._2
    val nearest3 = vecs.map { case (id, v) => (id, dist(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(3).map(_._1)
    val pairs = nearest3.map(p => (0L, q, p)).toDF("qid", "qvec", "pos_id")
    val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
        "pos_id", base, "id", "embedding", k = 2, overfetch = 1)
      .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    val want = vecs.map { case (id, v) => (id, dist(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(5)
      .filterNot(c => nearest3.contains(c._1)).take(2).map(_._1)
    assert(got == want && got.length == 2, s"got $got want $want")
    // the explicit maxPositives hint (skips the pair agg) mines the same
    val hinted = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
        "pos_id", base, "id", "embedding", k = 2, overfetch = 1,
        maxPositives = 3)
      .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    assert(hinted == got)
  }

  test("ANN first stage: exhaustive-probe IVF mines exactly the FLAT negatives; partial probe overlaps") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val ivf = graft.index.AnnIndexManager.create(spark, "negmine_ivf",
      base, "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "10"), s"$tmp/ivf")
    try {
      val pairs = Seq.tabulate(6)(i =>
        (i.toLong, vecs(i * 13)._2, ((i * 13 + 40) % 300).toLong))
        .toDF("qid", "qvec", "pos_id")
      def mine(index: graft.index.AnnIndex, nprobe: Int) =
        NegativeMining.mineHardNegatives(index, pairs, "qid", "qvec",
            "pos_id", base, "id", "embedding", k = 4, overfetch = 3,
            searchParam = nprobe)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
      val flat = mine(idx, -1)
      // nprobe = nlist probes every cell — the candidate pool is exact, so
      // the mined negatives (exactly re-scored either way) must be EQUAL
      assert(mine(ivf, 10) == flat)
      // a partial probe only gates candidate recall — never correctness of
      // surviving candidates; nlist matches the 10 planted clusters, so a
      // 3-cell probe covers each query's neighborhood most of the time
      val part = mine(ivf, 3)
      // keys is a SET — map per-query overlaps through a Seq or identical
      // values collapse and the mean is garbage
      val overlap = flat.keys.toSeq.map { q =>
        val f = flat(q).toSet
        f.intersect(part.getOrElse(q, Nil).toSet).size.toDouble / f.size
      }.sum / flat.size
      assert(overlap >= 0.6, s"overlap=$overlap")
    } finally graft.index.AnnIndexManager.drop("negmine_ivf")
  }

  test("a NULL positive id excludes nothing and skips denoising for that query") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val pairs = Seq((0L, vecs(5)._2, Option.empty[Long]))
      .toDF("qid", "qvec", "pos_id")
    val got = NegativeMining.mineHardNegatives(idx, pairs, "qid", "qvec",
        "pos_id", base, "id", "embedding", k = 4, overfetch = 2,
        denoiseMargin = 1.0)
      .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    // with no positive, the k nearest candidates pass untouched
    val want = vecs.map { case (id, v) => (id, dist(vecs(5)._2, v)) }
      .sortBy { case (id, d) => (d, id) }.take(4).map(_._1)
    assert(got == want)
  }

  test("denoising on an ip-metric index is rejected with guidance") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val ipIdx = graft.index.AnnIndexManager.create(spark, "negmine_ip",
      base, "id", "embedding", "FLAT", Map("metric" -> "ip"), s"$tmp/ip")
    try {
      val pairs = Seq((0L, vecs(0)._2, 1L)).toDF("qid", "qvec", "pos_id")
      val ex = intercept[IllegalArgumentException] {
        NegativeMining.mineHardNegatives(ipIdx, pairs, "qid", "qvec",
          "pos_id", base, "id", "embedding", k = 3, denoiseMargin = 0.9)
      }
      assert(ex.getMessage.contains("cosine"))
      // margin 0 still works on ip
      assert(NegativeMining.mineHardNegatives(ipIdx, pairs, "qid", "qvec",
        "pos_id", base, "id", "embedding", k = 3).collect().length == 3)
    } finally graft.index.AnnIndexManager.drop("negmine_ip")
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
