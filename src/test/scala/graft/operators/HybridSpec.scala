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

  test("materialized build: identical results, postings pinned, release drops pin") {
    val mti = HybridSearch.buildTextIndex(corpus, "doc_id", "text",
      materialized = true)
    try {
      assert(mti.numDocs == ti.numDocs && mti.avgDl == ti.avgDl)
      // resident-index pin is live (the serving shape the bench times)
      assert(mti.postings.storageLevel.useMemory)
      assert(mti.docLens.storageLevel.useMemory)
      // the scratch tokens cache must NOT outlive the build
      val toksPlan = corpus.select(col("doc_id").as("id"),
        HybridSearch.tokenize(col("text")).as("toks"))
      assert(toksPlan.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      // same scores as the lazy build
      val lazyScores = HybridSearch.bm25(ti, Seq("spark", "engine"), 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
      val matScores = HybridSearch.bm25(mti, Seq("spark", "engine"), 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
      assert(matScores == lazyScores)
    } finally mti.release()
    assert(mti.postings.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // post-release queries recompute from lineage, still correct
    assert(HybridSearch.bm25(mti, Seq("cooking"), 10).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("hybridSearchTable: per-query results equal the scalar path") {
    import spark.implicits._
    val qs = Seq(
      (0, "spark engine", Array(1f, 0f, 0f, 0f)),
      (1, "cooking dinner spark", Array(0f, 0f, 1f, 0f)),
      (2, "zzz_absent_term", Array(0f, 1f, 0f, 0f)), // vector-only query
      (3, "gardening tips", null.asInstanceOf[Array[Float]]) // bm25-only query
    ).toDF("query_idx", "qtext", "qvec")
    val batch = HybridSearch.hybridSearchTable(corpus, "doc_id", ti, idx, qs,
        "query_idx", "qtext", "qvec", k = 5)
      .select("query_idx", "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank")
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4))).toSeq).toMap
    for ((i, text, vec) <- Seq((0, "spark engine", Array(1f, 0f, 0f, 0f)),
                               (1, "cooking dinner spark", Array(0f, 0f, 1f, 0f)),
                               (2, "zzz_absent_term", Array(0f, 1f, 0f, 0f)))) {
      val scalar = HybridSearch.hybridSearch(corpus, "doc_id", ti, idx, text, vec, k = 5)
        .select("doc_id", "_rrf_score", "_bm25_rank", "_vector_rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3))).toSeq
      assert(batch(i) == scalar, s"query $i")
    }
    // whole-null vector: bm25 modality still answers (scalar drops the row
    // in searchTable; the full_outer fusion keeps the text side)
    val q3 = batch(3)
    assert(q3.nonEmpty && q3.forall(_._4 == 0)) // no vector ranks
  }

  test("hybridSearchTable equals scalar on randomized corpora (seeded)") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa", "lambda", "mu")
      def text() = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      def vec() = Array.fill(4)(rnd.nextFloat() * 2f - 1f)
      val docsSeq = (1L to 80L).map(i =>
        (i, if (rnd.nextInt(10) == 0) "" else text(), vec()))
      val docsDf = docsSeq.toDF("doc_id", "text", "embedding")
      val rti = HybridSearch.buildTextIndex(docsDf, "doc_id", "text")
      val ridx = AnnIndexManager.create(spark, s"h_rand_$seed", docsDf,
        "doc_id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/h_rand_$seed")
      val qSeq = (0 until 5).map(i => (i, text(), vec()))
      val batch = HybridSearch.hybridSearchTable(docsDf, "doc_id", rti, ridx,
          qSeq.toDF("query_idx", "qtext", "qvec"), "query_idx", "qtext", "qvec", k = 7)
        .select("query_idx", "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank")
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.map(r =>
          (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4))).toSeq).toMap
      for ((i, qt, qv) <- qSeq) {
        val scalar = HybridSearch.hybridSearch(docsDf, "doc_id", rti, ridx, qt, qv, k = 7)
          .select("doc_id", "_rrf_score", "_bm25_rank", "_vector_rank").collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3))).toSeq
        assert(batch.getOrElse(i, Nil) == scalar, s"seed $seed query $i")
      }
      // forced max-score pruning must stay bit-equal on the same
      // randomized corpus — rank-safety is a property of the algorithm,
      // not of the crafted zipf fixture. bm25Candidates=3 keeps θ
      // reachable on this tiny corpus (the 64-doc df floor means no term
      // is "head" here, so every query with >=3 cheap-scored docs is
      // prunable with expUb=0 — the candidate semi-join path runs for
      // real, with boundary ties at the 3rd partial)
      val mti = HybridSearch.buildTextIndex(docsDf, "doc_id", "text",
        materialized = true)
      def batch3(): Map[Int, Seq[(Long, Double, Int, Int)]] =
        HybridSearch.hybridSearchTable(docsDf, "doc_id", mti, ridx,
            qSeq.toDF("query_idx", "qtext", "qvec"),
            "query_idx", "qtext", "qvec", k = 7, bm25Candidates = 3)
          .select("query_idx", "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank")
          .collect()
          .groupBy(_.getInt(0))
          .view.mapValues(_.map(r =>
            (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4))).toSeq).toMap
      spark.conf.set("spark.ann.bm25MaxScorePrune", "true")
      spark.conf.set("spark.ann.bm25PruneMinPostings", "0")
      val pruned3 = try batch3() finally {
        spark.conf.unset("spark.ann.bm25MaxScorePrune")
        spark.conf.unset("spark.ann.bm25PruneMinPostings")
      }
      val exact3 = try batch3() finally mti.release()
      assert(pruned3 == exact3, s"seed $seed: pruned batch != exact batch")
    }
  }

  test("max-score pruning: batch results bit-equal unpruned and scalar on a zipf corpus") {
    import spark.implicits._
    // deliberate zipf shape: "the" in EVERY doc (df=200 > the 64 head-df
    // floor → head term), r{i} unique (df=1), m{j} mid (df=10) — so a
    // "the + rare" query is prunable BY CONSTRUCTION (θ from rare/mid
    // scores ≫ the head term's tiny contrib bound) while a head-only
    // query has no cheap terms and must take the exact branch
    val rnd = new scala.util.Random(7)
    val docsSeq = (1L to 200L).map(i =>
      (i, s"the r$i r$i m${i % 20}", Array.fill(4)(rnd.nextFloat() * 2f - 1f)))
    val docsDf = docsSeq.toDF("doc_id", "text", "embedding")
    // materialized: pruning requires the head-df map a materialized build
    // populates (a lazy one-shot index never prunes)
    val zti = HybridSearch.buildTextIndex(docsDf, "doc_id", "text",
      materialized = true)
    val zidx = AnnIndexManager.create(spark, "h_zipf", docsDf,
      "doc_id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/h_zipf")
    val qSeq = Seq(
      (0, "the r5 m3", Array(0.5f, 0.5f, 0f, 0f)),   // prunable
      (1, "the", Array(0f, 0.5f, 0.5f, 0f)),          // head-only → exact branch
      (2, "m7 m13", Array(0.5f, 0f, 0f, 0.5f)),       // cheap-only
      (3, "zzz_absent the", Array(0f, 0f, 1f, 0f)),   // head + unmatched
      (4, "", Array(0.2f, 0f, 0.8f, 0f)),             // termless → vector-only
      (5, "zzz_absent", Array(0f, 0.8f, 0f, 0.2f)))   // all terms unmatched
    val qDf = qSeq.toDF("query_idx", "qtext", "qvec")
    def run(): Seq[(Int, Long, Double, Int, Int)] =
      HybridSearch.hybridSearchTable(docsDf, "doc_id", zti, zidx, qDf,
          "query_idx", "qtext", "qvec", k = 7,
          // bm25Candidates=5 lands the cutoff among the 10 tied m3-docs —
          // boundary ties must survive the candidate filter
          bm25Candidates = 5)
        .select("query_idx", "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
        .toSeq
    // pruning is volume-gated (this tiny corpus would never cross the 4M
    // default); force a zero gate so the pruned plan actually runs
    spark.conf.set("spark.ann.bm25MaxScorePrune", "true")
    spark.conf.set("spark.ann.bm25PruneMinPostings", "0")
    val pruned = try run() finally {
      spark.conf.unset("spark.ann.bm25MaxScorePrune")
      spark.conf.unset("spark.ann.bm25PruneMinPostings")
    }
    val exact = run()
    assert(pruned == exact, "max-score pruning must be rank-safe (bit-identical)")
    // and both equal the scalar path per query
    for ((i, qt, qv) <- qSeq) {
      val scalar = HybridSearch.hybridSearch(docsDf, "doc_id", zti, zidx, qt, qv,
          k = 7, bm25Candidates = 5)
        .select("doc_id", "_rrf_score", "_bm25_rank", "_vector_rank").collect()
        .map(r => (i, r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3))).toSeq
      assert(pruned.filter(_._1 == i) == scalar, s"query $i vs scalar")
    }
  }

  test("max-score pruning above the collect bound: distributed θ/expUb is value-identical") {
    import spark.implicits._
    // same zipf construction as the driver-stats test above — prunable,
    // exact-branch, cheap-only, unmatched, and termless queries all in
    // one batch — but run with spark.ann.maxCollectedQueries forced to 2,
    // so the per-query θ/ub/qid stats MUST stay distributed (the corpus-
    // scale path where collecting one row per query would pin the driver)
    val rnd = new scala.util.Random(11)
    val docsSeq = (1L to 200L).map(i =>
      (i, s"the r$i r$i m${i % 20}", Array.fill(4)(rnd.nextFloat() * 2f - 1f)))
    val docsDf = docsSeq.toDF("doc_id", "text", "embedding")
    val zti = HybridSearch.buildTextIndex(docsDf, "doc_id", "text",
      materialized = true)
    val zidx = AnnIndexManager.create(spark, "h_zipf_dist", docsDf,
      "doc_id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/h_zipf_dist")
    val qSeq = Seq(
      (0, "the r5 m3", Array(0.5f, 0.5f, 0f, 0f)),
      (1, "the", Array(0f, 0.5f, 0.5f, 0f)),
      (2, "m7 m13", Array(0.5f, 0f, 0f, 0.5f)),
      (3, "zzz_absent the", Array(0f, 0f, 1f, 0f)),
      (4, "", Array(0.2f, 0f, 0.8f, 0f)),
      (5, "zzz_absent", Array(0f, 0.8f, 0f, 0.2f)))
    val qDf = qSeq.toDF("query_idx", "qtext", "qvec")
    def run(): Seq[(Int, Long, Double, Int, Int)] =
      HybridSearch.hybridSearchTable(docsDf, "doc_id", zti, zidx, qDf,
          "query_idx", "qtext", "qvec", k = 7, bm25Candidates = 5)
        .select("query_idx", "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
        .toSeq.sortBy(t => (t._1, t._4, t._2))
    spark.conf.set("spark.ann.bm25MaxScorePrune", "true")
    spark.conf.set("spark.ann.bm25PruneMinPostings", "0")
    val driverStats = try run() finally () // 6 queries < default bound
    spark.conf.set("spark.ann.maxCollectedQueries", "2") // force distributed
    val distributed = try run() finally {
      spark.conf.unset("spark.ann.maxCollectedQueries")
      spark.conf.unset("spark.ann.bm25MaxScorePrune")
      spark.conf.unset("spark.ann.bm25PruneMinPostings")
    }
    assert(distributed == driverStats,
      "distributed per-query prune stats must be value-identical to the driver path")
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
