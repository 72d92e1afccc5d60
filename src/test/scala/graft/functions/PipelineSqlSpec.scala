package graft.functions

import graft.SparkSpec
import graft.pipeline.{CorpusPipeline, Dedup}
import org.apache.spark.sql.functions.col

/** The SQL pipeline TVFs must return exactly what the Scala API returns —
  * each test runs the same operator both ways and compares collected rows. */
class PipelineSqlSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "ein kleiner Text mit ein paar deutschen Worten und mehr dazu"),
      (4L, "short"),
      (5L, "the cat sat on the mat and that was that for the day")
    ).toDF("doc_id", "text")
  }

  private def sameRows(sql: String, api: org.apache.spark.sql.DataFrame): Unit = {
    val got = spark.sql(sql)
    assert(got.columns.sorted.toSeq == api.columns.sorted.toSeq,
      s"columns: ${got.columns.toSeq} vs ${api.columns.toSeq}")
    val order = got.columns.sorted.toSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(order.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(got) == canon(api))
  }

  test("corpus TVFs mirror the Scala API") {
    PipelineSql.register(spark)
    docsDf.createOrReplaceTempView("pl_docs")

    sameRows("SELECT * FROM corpus_chunk(TABLE(pl_docs), 'doc_id', 'text', 4, 3)",
      CorpusPipeline.chunkDocuments(docsDf, "doc_id", "text", 4, 3))
    sameRows("SELECT * FROM corpus_shard(TABLE(pl_docs), 'doc_id', 3)",
      CorpusPipeline.shardCorpus(docsDf, "doc_id", 3))
    sameRows("SELECT * FROM corpus_sample(TABLE(pl_docs), 'doc_id', 0.5)",
      CorpusPipeline.deterministicSample(docsDf, "doc_id", 0.5))
    sameRows("SELECT * FROM corpus_pack(TABLE(pl_docs), 'doc_id', 'text', 8)",
      CorpusPipeline.packSequences(docsDf, "doc_id", "text", 8))
    sameRows(
      "SELECT * FROM corpus_token_budget(TABLE(pl_docs), 'doc_id', 'text', 20)",
      CorpusPipeline.tokenBudget(docsDf, "doc_id", "text", 20))
    sameRows("SELECT * FROM corpus_clean(TABLE(pl_docs), 'doc_id', 'text', 0.1, '', 10)",
      CorpusPipeline.clean(docsDf, "doc_id", "text", 0.1, Set.empty, 10))
  }

  test("text and dedup TVFs mirror the Scala API") {
    PipelineSql.register(spark)
    docsDf.createOrReplaceTempView("pl_docs")
    import spark.implicits._

    sameRows("SELECT * FROM text_pii_scrub(TABLE(pl_docs), 'text')",
      graft.pipeline.TextAnalysis.piiScrub(docsDf, "text"))
    sameRows("SELECT * FROM text_quality_rules(TABLE(pl_docs), 'text')",
      graft.pipeline.TextAnalysis.withQualityRules(docsDf, "text"))
    sameRows("SELECT * FROM text_repetition_rules(TABLE(pl_docs), 'doc_id', 'text')",
      graft.pipeline.TextAnalysis.withRepetitionRules(docsDf, "doc_id", "text"))
    sameRows("SELECT * FROM c4_clean_lines(TABLE(pl_docs), 'text', 3, 1)",
      graft.pipeline.TextAnalysis.c4CleanLines(docsDf, "text", 3, 1))
    sameRows("SELECT * FROM dedup_exact_drop(TABLE(pl_docs), 'doc_id', 'text')",
      Dedup.dropExactDuplicates(docsDf, "doc_id", "text"))
    sameRows("SELECT * FROM dedup_paragraphs(TABLE(pl_docs), 'doc_id', 'text')",
      Dedup.dedupParagraphs(docsDf, "doc_id", "text"))
    sameRows("SELECT * FROM dedup_minhash_pairs(TABLE(pl_docs), 'doc_id', 'text', 0.5)",
      Dedup.minhashNearDups(docsDf, "doc_id", "text", threshold = 0.5))
    sameRows("SELECT * FROM dedup_substr(TABLE(pl_docs), 'doc_id', 'text', 20)",
      graft.pipeline.SubstrDedup.dedupSubstrings(docsDf, "doc_id", "text", 20))
    sameRows("SELECT * FROM dedup_substr_spans(TABLE(pl_docs), 'doc_id', 'text', 20)",
      graft.pipeline.SubstrDedup.dupSpans(docsDf, "doc_id", "text", 20))
    sameRows("SELECT * FROM heavy_hitters(TABLE(pl_docs), 'text', 0.3)",
      graft.pipeline.HeavyHitters.frequentItems(docsDf, "text", 0.3))
    val grouped = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("grp", "item")
    grouped.createOrReplaceTempView("pl_grp")
    sameRows("SELECT * FROM heavy_hitters_by_group(TABLE(pl_grp), 'grp', 'item', 0.5)",
      graft.pipeline.HeavyHitters.frequentItemsByGroup(grouped, "grp", "item", 0.5))
    sameRows("SELECT * FROM heavy_hitters_by_group_hinted(TABLE(pl_grp), 'grp', 'item', 0.5, 2)",
      graft.pipeline.HeavyHitters.frequentItemsByGroup(grouped, "grp", "item",
        0.5, expectedGroups = 2L))

    val urls = Seq(
      (1L, "HTTPS://User@Site.COM:443/a/?utm_source=x&q=1#f"),
      (2L, "https://site.com/b"), (3L, "https://other.co.uk/c"),
      (4L, "https://site.com/d"), (5L, "garbage"))
      .toDF("doc_id", "url")
    urls.createOrReplaceTempView("pl_urls")
    sameRows("SELECT * FROM url_normalize(TABLE(pl_urls), 'url')",
      urls.withColumn("url_norm", graft.pipeline.UrlOps.normalizeUrl(col("url")))
        .withColumn("url_host", graft.pipeline.UrlOps.urlHost(col("url")))
        .withColumn("url_domain", graft.pipeline.UrlOps.urlRegisteredDomain(col("url"))))
    sameRows("SELECT * FROM url_domain_cap(TABLE(pl_urls), 'url', 2, 'doc_id')",
      graft.pipeline.UrlOps.capPerDomain(urls, "url", 2, "doc_id"))
    sameRows("SELECT * FROM url_dedup(TABLE(pl_urls), 'url', 'doc_id')",
      graft.pipeline.UrlOps.dedupByUrl(urls, "url", "doc_id"))

    // psl_path argument: domain keying from a PSL file on disk (com.pl is
    // a registry suffix the bounded default set cannot key)
    val pslFile = java.nio.file.Files.createTempFile("psl_tvf", ".dat")
    java.nio.file.Files.writeString(pslFile,
      "// test psl\ncom.pl\nco.uk\n*.ck\n!www.ck\n")
    val pslUrls = Seq(
      (1L, "https://a.shop.com.pl/x"), (2L, "https://b.shop.com.pl/y"),
      (3L, "https://c.other.com.pl/z"), (4L, "https://news.site.co.uk/w"))
      .toDF("doc_id", "url")
    pslUrls.createOrReplaceTempView("pl_psl_urls")
    val rules = graft.pipeline.UrlOps.SuffixRules.parseFile(pslFile.toString)
    sameRows(s"SELECT * FROM url_normalize(TABLE(pl_psl_urls), 'url', '$pslFile')",
      pslUrls.withColumn("url_norm", graft.pipeline.UrlOps.normalizeUrl(col("url")))
        .withColumn("url_host", graft.pipeline.UrlOps.urlHost(col("url")))
        .withColumn("url_domain",
          graft.pipeline.UrlOps.urlRegisteredDomain(col("url"), rules)))
    sameRows(s"SELECT * FROM url_domain_cap(TABLE(pl_psl_urls), 'url', 1, 'doc_id', '$pslFile')",
      graft.pipeline.UrlOps.capPerDomain(pslUrls, "url", 1, "doc_id", rules))
    // and the PSL cap is genuinely different from the default-set cap:
    // under the default set all three com.pl rows merge into ONE "domain"
    // (+ the co.uk row → 2 survivors at cap 1); under the PSL the two
    // com.pl SITES are distinct domains (shop/other → 3 survivors)
    assert(spark.sql(s"SELECT * FROM url_domain_cap(TABLE(pl_psl_urls), 'url', 1, 'doc_id', '$pslFile')")
      .count() == 3L)
    assert(spark.sql("SELECT * FROM url_domain_cap(TABLE(pl_psl_urls), 'url', 1, 'doc_id')")
      .count() == 2L)

    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 2) 5f + i * 0.01f else 0f)))
      .toDF("vid", "emb")
    vecs.createOrReplaceTempView("pl_vecs")
    sameRows("SELECT * FROM corpus_clusters_full(TABLE(pl_vecs), 'emb', 2, 5)",
      CorpusPipeline.assignClusters(vecs, "emb",
        CorpusPipeline.trainClusterCentroidsDistributed(vecs, "emb", 2, 5)))

    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    pairs.createOrReplaceTempView("pl_pairs")
    sameRows("SELECT * FROM dedup_components(TABLE(pl_pairs), 'a', 'b')",
      Dedup.resolveComponents(pairs, "a", "b"))

    val bench = Seq((100L, "quick brown fox jumps over the lazy dog again")).toDF("bid", "text")
    bench.createOrReplaceTempView("pl_bench")
    sameRows(
      "SELECT * FROM corpus_decontaminate(TABLE(pl_docs), 'doc_id', 'text', TABLE(pl_bench), 'text', 8)",
      Dedup.decontaminate(docsDf, "doc_id", "text", bench, "text", 8))

    // semantic decontamination TVFs mirror the embedding-space API
    val corpusVec = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 0f, 1f))).toDF("id", "vec")
    val benchVec = Seq((100L, Array(1f, 0f, 0f))).toDF("bid", "bvec")
    corpusVec.createOrReplaceTempView("pl_vec_corpus")
    benchVec.createOrReplaceTempView("pl_vec_bench")
    sameRows(
      "SELECT * FROM corpus_contamination_semantic(TABLE(pl_vec_corpus), 'id', 'vec', " +
        "TABLE(pl_vec_bench), 'bid', 'bvec', 0.8)",
      Dedup.semanticContaminationHits(corpusVec, "id", "vec",
        benchVec, "bid", "bvec", 0.8))
    sameRows(
      "SELECT * FROM corpus_decontaminate_semantic(TABLE(pl_vec_corpus), 'id', 'vec', " +
        "TABLE(pl_vec_bench), 'bid', 'bvec', 0.8)",
      Dedup.decontaminateSemantic(corpusVec, "id", "vec",
        benchVec, "bid", "bvec", 0.8))

    // text_features = stats + langid + quality stacked
    val api = graft.pipeline.TextAnalysis.withQualityScore(
      graft.pipeline.TextAnalysis.withLangId(
        graft.pipeline.TextAnalysis.withTokenStats(docsDf, "text"), "text"), "text")
    sameRows("SELECT * FROM text_features(TABLE(pl_docs), 'text')", api)
  }

  test("TVF argument validation fails fast with usage messages") {
    PipelineSql.register(spark)
    docsDf.createOrReplaceTempView("pl_docs")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM corpus_chunk(TABLE(pl_docs), 'doc_id', 'text', 4)").collect())
    assert(e.getMessage.contains("usage: corpus_chunk"))
  }

  test("DSIR TVFs mirror the Scala API") {
    PipelineSql.register(spark)
    docsDf.createOrReplaceTempView("pl_docs")
    import spark.implicits._
    val target = Seq((10L, "the quick brown fox and the lazy dog"))
      .toDF("doc_id", "text")
    target.createOrReplaceTempView("pl_target")

    val model = graft.pipeline.Dsir.fitLogRatios(docsDf, target, "text")
    sameRows("SELECT * FROM dsir_weights(TABLE(pl_docs), 'text', TABLE(pl_target))",
      graft.pipeline.Dsir.withImportanceWeight(docsDf, "text", model))
    sameRows("SELECT * FROM dsir_resample(TABLE(pl_docs), 'doc_id', 'text', TABLE(pl_target), 3)",
      graft.pipeline.Dsir.resample(docsDf, "doc_id", "text", target, 3))
  }

  test("MaxSim TVFs mirror the Scala API") {
    PipelineSql.register(spark)
    import spark.implicits._
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, Seq.fill(3)(Seq.tabulate(4)(j => (i * 7 + j * 3 % 11) / 10.0f))))
      .toDF("doc_id", "vecs")
    val queries = Seq((0, Seq(Seq(0.1, 0.2, 0.3, 0.4), Seq(0.4, 0.3, 0.2, 0.1))))
      .toDF("query_idx", "qvecs")
    docs.createOrReplaceTempView("pl_mvdocs")
    queries.createOrReplaceTempView("pl_mvq")

    sameRows(
      "SELECT * FROM maxsim_search_table(TABLE(pl_mvq), 'query_idx', 'qvecs', TABLE(pl_mvdocs), 'doc_id', 'vecs', 5)",
      graft.operators.MaxSim.searchTable(queries, "query_idx", "qvecs",
        docs, "doc_id", "vecs", 5))

    val tmp = java.nio.file.Files.createTempDirectory("graft_maxsim_sql").toString
    val pooled = docs.select($"doc_id", graft.operators.MaxSim.meanPool($"vecs")
      .cast("array<float>").as("pv"))
    val idx = graft.index.AnnIndexManager.create(spark, "pl_maxsim_idx", pooled,
      "doc_id", "pv", "FLAT", Map("metric" -> "ip"), s"$tmp/idx")
    try {
      sameRows(
        "SELECT * FROM maxsim_ann_table('pl_maxsim_idx', TABLE(pl_mvq), 'query_idx', 'qvecs', TABLE(pl_mvdocs), 'doc_id', 'vecs', 5, 10)",
        graft.operators.MaxSim.annSearchTable(idx, queries, "query_idx", "qvecs",
          docs, "doc_id", "vecs", 5, 10))
    } finally graft.index.AnnIndexManager.drop("pl_maxsim_idx")
  }

  test("Matryoshka TVF mirrors the Scala API") {
    PipelineSql.register(spark)
    import spark.implicits._
    val base = Seq.tabulate(30)(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 5 + j) % 13 / 10.0f)))
      .toDF("id", "vec")
    val queries = Seq((0L, Array.tabulate(8)(j => j / 10.0f)),
      (1L, Array.tabulate(8)(j => (7 - j) / 10.0f))).toDF("qid", "qvec")
    base.createOrReplaceTempView("pl_mrl_base")
    queries.createOrReplaceTempView("pl_mrl_q")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mrl_sql").toString
    val idx = graft.operators.Matryoshka.createPrefixIndex(spark,
      "pl_mrl_idx", base, "id", "vec", dPrefix = 4, "FLAT",
      Map("metric" -> "l2"), s"$tmp/idx")
    try {
      sameRows(
        "SELECT * FROM matryoshka_table('pl_mrl_idx', TABLE(pl_mrl_q), 'qid', 'qvec', TABLE(pl_mrl_base), 'id', 'vec', 5, 6)",
        graft.operators.Matryoshka.searchRerankTable(idx, queries, base,
          "id", "vec", 5, 6, queryIdCol = "qid", queryVecCol = "qvec"))
    } finally graft.index.AnnIndexManager.drop("pl_mrl_idx")
  }

  test("mine_hard_negatives TVF mirrors the Scala API") {
    PipelineSql.register(spark)
    import spark.implicits._
    val base = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 17) / 10.0f)))
      .toDF("id", "vec")
    val pairs = Seq.tabulate(3)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 17) / 10.0f), (i + 5).toLong))
      .toDF("qid", "qvec", "pos_id")
    base.createOrReplaceTempView("pl_neg_base")
    pairs.createOrReplaceTempView("pl_neg_pairs")
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_neg_sql").toString
    val idx = graft.index.AnnIndexManager.create(spark, "pl_neg_idx", base,
      "id", "vec", "FLAT", Map("metric" -> "l2"), s"$tmp2/idx")
    try {
      sameRows(
        "SELECT * FROM mine_hard_negatives('pl_neg_idx', TABLE(pl_neg_pairs), 'qid', 'qvec', 'pos_id', TABLE(pl_neg_base), 'id', 'vec', 4, 2, 0.5)",
        graft.pipeline.NegativeMining.mineHardNegatives(idx, pairs, "qid",
          "qvec", "pos_id", base, "id", "vec", k = 4, overfetch = 2,
          denoiseMargin = 0.5))
    } finally graft.index.AnnIndexManager.drop("pl_neg_idx")
  }

  test("mine_hard_negatives TVF with max_positives launches no job at analysis") {
    PipelineSql.register(spark)
    import spark.implicits._
    val base = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 17) / 10.0f)))
      .toDF("id", "vec")
    val pairs = Seq.tabulate(3)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 17) / 10.0f), (i + 5).toLong))
      .toDF("qid", "qvec", "pos_id")
    base.createOrReplaceTempView("pl_negx_base")
    pairs.createOrReplaceTempView("pl_negx_pairs")
    val tmp = java.nio.file.Files.createTempDirectory("graft_negx_sql").toString
    graft.index.AnnIndexManager.create(spark, "pl_negx_idx", base,
      "id", "vec", "FLAT", Map("metric" -> "l2"), s"$tmp/idx")
    // the one job class allowed at analysis is the parquet-footer schema
    // read of the index dataset (one tiny file-listing job at index open,
    // stage name "parquet at ..."); any other job at analysis time is
    // computation — specifically the pair-volume aggregate the
    // max_positives hint exists to eliminate (under AQE it surfaces as
    // thread-pool jobs with mangled stage names, so the test counts
    // everything that is not a footer scan)
    val workJobs = new scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = j.stageInfos.map(_.name).mkString(" | ")
        if (!names.contains("parquet at"))
          workJobs.synchronized { workJobs += names }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the TVF resolves at analysis time; with max_positives the fetch
      // reserve is a literal, so building (and EXPLAINing) the plan must
      // not run the pair-volume aggregate job
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
      workJobs.synchronized(workJobs.clear())
      val df = spark.sql(
        "SELECT * FROM mine_hard_negatives('pl_negx_idx', TABLE(pl_negx_pairs), " +
          "'qid', 'qvec', 'pos_id', TABLE(pl_negx_base), 'id', 'vec', 4, 2, 0.0, -1, 1)")
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode) // full EXPLAIN, still job-free
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
      assert(workJobs.isEmpty,
        s"analysis/EXPLAIN with max_positives launched work jobs: ${workJobs.mkString("; ")}")
      // contrast: without the hint the reserve is an eager aggregate
      spark.sql(
        "SELECT * FROM mine_hard_negatives('pl_negx_idx', TABLE(pl_negx_pairs), " +
          "'qid', 'qvec', 'pos_id', TABLE(pl_negx_base), 'id', 'vec', 4)")
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
      assert(workJobs.nonEmpty, "hint-less TVF should pay the pair-volume agg")
      // and the hinted plan still answers correctly when executed
      val got = df.collect()
      assert(got.nonEmpty)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      graft.index.AnnIndexManager.drop("pl_negx_idx")
    }
  }

  test("Bloom decontamination, BPE, and quality-score TVFs mirror the Scala API") {
    PipelineSql.register(spark)
    import spark.implicits._
    docsDf.createOrReplaceTempView("pl_docs")
    val bench = docsDf.filter($"doc_id" === 1L)
    bench.createOrReplaceTempView("pl_bench")

    val bloom = Dedup.benchmarkShingleBloom(bench, "text", shingleSize = 4)
    sameRows(
      "SELECT * FROM corpus_decontaminate_bloom(TABLE(pl_docs), 'doc_id', 'text', TABLE(pl_bench), 'text', 4)",
      Dedup.decontaminateBloom(docsDf, "doc_id", "text", bloom, shingleSize = 4))

    val model = graft.pipeline.BpeTokenizer.train(docsDf, "text", numMerges = 20)
    sameRows(
      "SELECT * FROM bpe_token_count(TABLE(pl_docs), 'text', 20)",
      graft.pipeline.BpeTokenizer.tokenCount(docsDf, "text", model))

    val um = graft.pipeline.UnigramTokenizer.train(docsDf, "text", vocabSize = 50)
    sameRows(
      "SELECT * FROM unigram_token_count(TABLE(pl_docs), 'text', 50)",
      graft.pipeline.UnigramTokenizer.tokenCount(docsDf, "text", um))

    sameRows(
      "SELECT * FROM quantile_buckets(TABLE(pl_docs), 'doc_id', 3)",
      graft.pipeline.CorpusPipeline.withQuantileBuckets(docsDf, "doc_id", 3))

    val prior = docsDf.filter($"doc_id" % 2 === 1)
      .select($"doc_id".as("pid"), $"text".as("ptext"))
    prior.createOrReplaceTempView("pl_prior")
    sameRows(
      "SELECT * FROM dedup_incremental(TABLE(pl_docs), 'doc_id', 'text', TABLE(pl_prior), 'ptext')",
      Dedup.dedupAgainstCorpus(docsDf, "doc_id", "text", prior, "ptext"))
    val pBloom = Dedup.corpusTextBloom(prior, "ptext", fpp = 1e-9)
    sameRows(
      "SELECT * FROM dedup_incremental(TABLE(pl_docs), 'doc_id', 'text', TABLE(pl_prior), 'ptext', 0.000000001)",
      Dedup.dedupAgainstCorpusBloom(docsDf, "doc_id", "text", pBloom))

    val labeled = docsDf.withColumn("label",
      org.apache.spark.sql.functions.when($"doc_id" <= 2L, 1.0).otherwise(0.0))
    labeled.createOrReplaceTempView("pl_labeled")
    val qc = graft.pipeline.QualityClassifier.train(labeled, "text", "label",
      hashDim = 1 << 12, iters = 5)
    sameRows(
      "SELECT * FROM quality_score(TABLE(pl_docs), 'text', TABLE(pl_labeled), 'text', 'label', 4096, 5)",
      graft.pipeline.QualityClassifier.withQualityScore(docsDf, "text", qc))
  }

  test("asof_join and range_join TVFs mirror the Scala API") {
    PipelineSql.register(spark)
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 150L))
      .toDF("lid", "k", "lts")
    val right = Seq((10L, 1L, 90L, "a"), (11L, 1L, 180L, "b"), (12L, 2L, 150L, "c"))
      .toDF("rid", "k", "rts", "tag")
    left.createOrReplaceTempView("pl_asof_l")
    right.createOrReplaceTempView("pl_asof_r")
    sameRows(
      "SELECT * FROM asof_join(TABLE(pl_asof_l), TABLE(pl_asof_r), 'k', 'lts', 'rts', 'backward', 1000, 'rid')",
      graft.operators.AsofJoin.join(left, right, Seq("k"), "lts", "rts",
        tolerance = Some(1000L), rightTieBreak = Some("rid")))

    val points = Seq((1L, 1L, 100L), (2L, 1L, 500L)).toDF("pid", "k", "ts")
    val iv = Seq((10L, 1L, 50L, 150L), (11L, 1L, 400L, 600L)).toDF("iid", "k", "s", "e")
    points.createOrReplaceTempView("pl_rj_p")
    iv.createOrReplaceTempView("pl_rj_i")
    sameRows(
      "SELECT * FROM range_join(TABLE(pl_rj_p), 'ts', TABLE(pl_rj_i), 's', 'e', 100, 'k')",
      graft.operators.RangeJoin.pointInInterval(points, "ts", iv, "s", "e",
        Seq("k"), 100L))
  }
}
