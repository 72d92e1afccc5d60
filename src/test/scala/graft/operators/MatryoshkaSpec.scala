package graft.operators

import graft.SparkSpec
import graft.functions.VectorKernels

import java.nio.file.Files

class MatryoshkaSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_mrl_spec").toString

  // MRL-shaped fixture: cluster identity lives in the FIRST 8 dims (the
  // prefix), the tail 24 dims carry noise — the structure Matryoshka
  // training produces
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(9)
    Seq.tabulate(300) { i =>
      val c = i % 8
      val v = Array.tabulate(32) { j =>
        (if (j == c) 6f else 0f) + (rnd.nextFloat() - 0.5f) *
          (if (j < 8) 0.5f else 2.0f)
      }
      (i.toLong, v)
    }
  }

  private def bruteTopK(q: Array[Float], k: Int): Seq[Long] =
    vecs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  private lazy val idx = {
    import spark.implicits._
    Matryoshka.createPrefixIndex(spark, "mrl_t8", vecs.toDF("id", "embedding"),
      "id", "embedding", dPrefix = 8, "FLAT", Map("metric" -> "l2"),
      s"$tmp/mrl_t8")
  }

  private def queries(seed: Int, n: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val c = rnd.nextInt(8)
      Array.tabulate(32)(j => (if (j == c) 6f else 0f) + rnd.nextFloat() - 0.5f)
    }
  }

  test("exhaustive overfetch equals brute force (the strict-oracle configuration)") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    for (q <- queries(1, 4)) {
      val got = Matryoshka.searchRerank(idx, base, "id", "embedding", q,
        k = 10, overfetch = 30) // 300 cands = corpus
      assert(got.collect().map(_.getLong(0)).toSeq == bruteTopK(q, 10))
    }
  }

  test("serving overfetch on MRL-shaped data keeps recall high") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val recalls = queries(2, 10).map { q =>
      val got = Matryoshka.searchRerank(idx, base, "id", "embedding", q,
        k = 10, overfetch = 4).collect().map(_.getLong(0)).toSet
      got.intersect(bruteTopK(q, 10).toSet).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean under prefix separation")
  }

  test("table form equals the scalar form query-by-query") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val qs = queries(3, 5)
    val qdf = qs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("qid", "qvec")
    val batch = Matryoshka.searchRerankTable(idx, qdf, base, "id",
        "embedding", k = 7, overfetch = 5, queryIdCol = "qid",
        queryVecCol = "qvec")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(r => (r.getDouble(2), r.getLong(1)))
          .map(_.getLong(1)).toSeq
      }
    qs.zipWithIndex.foreach { case (q, i) =>
      val scalar = Matryoshka.searchRerank(idx, base, "id", "embedding", q,
        k = 7, overfetch = 5).collect().map(_.getLong(0)).toSeq
      assert(batch(i.toLong) == scalar, s"query $i")
    }
  }

  test("table form: a query-id column literally named 'id' is not ambiguous") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val qdf = queries(4, 2).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "qvec")
    val got = Matryoshka.searchRerankTable(idx, qdf, base, "id", "embedding",
      k = 3, overfetch = 4, queryIdCol = "id", queryVecCol = "qvec")
    assert(got.collect().length == 6) // 2 queries x k
  }

  test("table form: a short query vector raises a clear error, not silent truncation") {
    import spark.implicits._
    val base = vecs.toDF("id", "embedding")
    val qdf = Seq((0L, Array.fill(3)(0f))).toDF("qid", "qvec")
    val ex = intercept[Exception] {
      Matryoshka.searchRerankTable(idx, qdf, base, "id", "embedding",
        k = 3, overfetch = 2, queryIdCol = "qid", queryVecCol = "qvec")
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("energy-decay (MRL-trained) fixture: serving recall floor at spec scale") {
    import spark.implicits._
    // the SCALE.md clustered fixture in miniature: 40 clusters × 25 docs,
    // d=96, per-dim energy decaying 1/sqrt(1+j/8) (matryoshka training
    // concentrates signal in the prefix), doc noise at 0.35×
    val d = 96
    def vec(cluster: Int, seed: Long): Array[Float] = {
      val rc = new scala.util.Random(cluster * 9176L + 3)
      val rd = new scala.util.Random(seed * 2654435761L + 7)
      Array.tabulate(d) { j =>
        val decay = 1.0 / math.sqrt(1.0 + j / 8.0)
        ((rc.nextGaussian() + 0.35 * rd.nextGaussian()) * decay).toFloat
      }
    }
    val docs = Seq.tabulate(1000)(i => (i.toLong, vec(i % 40, i.toLong)))
    val base = docs.toDF("id", "embedding")
    val mIdx = Matryoshka.createPrefixIndex(spark, "mrl_decay", base, "id",
      "embedding", dPrefix = 16, "FLAT", Map("metric" -> "l2"),
      s"$tmp/mrl_decay")
    val qs = Seq.tabulate(20)(qi => vec(qi * 2, 100000L + qi))
    val recalls = qs.map { q =>
      val truth = docs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
        .sortBy { case (id, dd) => (dd, id) }.take(10).map(_._1).toSet
      val got = Matryoshka.searchRerank(mIdx, base, "id", "embedding", q,
        k = 10, overfetch = 4).collect().map(_.getLong(0)).toSet
      got.intersect(truth).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean on the energy-decay shape")
  }

  test("build side: a base vector shorter than dPrefix raises, not silent truncation") {
    import spark.implicits._
    val bad = Seq((0L, Array.fill(32)(0.1f)), (1L, Array.fill(5)(0.1f)))
      .toDF("id", "embedding")
    val ex = intercept[Exception] {
      Matryoshka.createPrefixIndex(spark, "mrl_bad", bad, "id", "embedding",
        dPrefix = 8, "FLAT", Map("metric" -> "l2"), s"$tmp/mrl_bad")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("shorter than the requested prefix")),
      s"got: ${msgs(ex)}")
  }

  test("a query shorter than the prefix dim is rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Matryoshka.searchRerank(idx, vecs.toDF("id", "embedding"), "id",
        "embedding", Array.fill(4)(0f), 10, 4)
    }
  }
}
