package graft.operators

import graft.SparkSpec
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._

import java.nio.file.Files

class HybridSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_hybrid_spec").toString

  // F11-style corpus: known term frequencies + orthogonal-ish embeddings
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark engine fast analytics", Array(1f, 0f, 0f, 0f)),
      (2L, "spark spark spark tuning guide", Array(0f, 1f, 0f, 0f)),
      (3L, "cooking recipes for dinner", Array(0f, 0f, 1f, 0f)),
      (4L, "spark engine internals deep dive", Array(0f, 0f, 0f, 1f)),
      (5L, "gardening tips and tricks", Array(0.9f, 0.1f, 0f, 0f))
    ).toDF("doc_id", "text", "embedding")
  }

  private lazy val ti = HybridSearch.buildTextIndex(corpus, "doc_id", "text")

  private lazy val idx = AnnIndexManager.create(spark, "h_flat", corpus,
    "doc_id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/h_flat")

  test("bm25: tf and idf drive ranking; non-matching docs absent") {
    val scores = HybridSearch.bm25(ti, Seq("spark"), 10).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("_bm25_score")).toMap
    assert(scores.keySet == Set(1L, 2L, 4L))
    assert(scores(2L) > scores(1L)) // tf=3 beats tf=1 (shorter doc wins ties)
    // rare term gets higher idf than common term
    val rare = HybridSearch.bm25(ti, Seq("cooking"), 10).collect()
    assert(rare.map(_.getAs[Long]("id")).toSeq == Seq(3L))
  }

  test("hybrid RRF fuses text and vector ranks with weights (S7 shape)") {
    val res = HybridSearch.hybridSearch(corpus, "doc_id", ti, idx,
      queryText = "spark engine", queryVec = Array(1f, 0f, 0f, 0f), k = 5)
    val rows = res.collect()
    assert(rows.nonEmpty)
    val cols = res.columns.toSet
    assert(Set("_rrf_score", "_bm25_rank", "_vector_rank").subsetOf(cols))
    // doc 1 matches both modalities → must rank first
    assert(rows.head.getAs[Long]("doc_id") == 1L)
    // doc appearing in only one modality has rank 0 on the other
    val doc3 = rows.find(_.getAs[Long]("doc_id") == 3L)
    doc3.foreach { r => assert(r.getAs[Int]("_bm25_rank") == 0) }
    // rrf math check for the top hit: w_b/(60+rb) + w_v/(60+rv)
    val top = rows.head
    val expect = 0.3 / (60 + top.getAs[Int]("_bm25_rank")) +
      0.7 / (60 + top.getAs[Int]("_vector_rank"))
    assert(math.abs(top.getAs[Double]("_rrf_score") - expect) < 1e-12)
  }

  test("cachedTextIndex: off by default (always fresh); opt-in caches per plan") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    // default: no caching — appended data must never be served stale
    val f1 = HybridSearch.cachedTextIndex(docs, "doc_id", "text")
    val f2 = HybridSearch.cachedTextIndex(docs, "doc_id", "text")
    assert(!(f1 eq f2))
    spark.conf.set("spark.ann.cacheTextIndex", "true")
    try {
      val a = HybridSearch.cachedTextIndex(docs, "doc_id", "text")
      val b = HybridSearch.cachedTextIndex(docs, "doc_id", "text")
      assert(a eq b) // sameResult hit → no rebuild
      val c = HybridSearch.cachedTextIndex(docs.filter(col("doc_id") > 1), "doc_id", "text")
      assert(!(a eq c) && c.numDocs == 1)
    } finally spark.conf.unset("spark.ann.cacheTextIndex")
  }
}
