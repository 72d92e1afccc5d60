package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-host A/B probe for committed-bench movers flagged by the verdict.
  *
  * r15 round (BENCH_r13 → BENCH_r14 ratios, all adjudicated HOST STATE):
  *   - `events_asof`   3.03× / `hnsw_build_sf` 1.48× / `..._spark_scan` 1.56×
  *
  * r16 round (BENCH_r14 → BENCH_r15 ratios; the r15 record was taken on a
  * load-2.94 host, these four did not move in the builder's clean sweep):
  *   - `ivf_search_50q` 5.64× — mode `ivf`
  *   - `url_dedup` 5.21×, `url_filter` 5.19×, `url_normalize` 4.59× — mode `url`
  *
  * This file is dropped UNCOMMITTED into a scratch worktree at the prior
  * round's marker commit and run at both HEADs back-to-back on the same
  * idle host — the r12-r15 adjudication method. Each line reproduces the
  * exact Bench.scala workload and methodology (one untimed warmup, min
  * over reps), so the printed numbers are directly comparable to the
  * committed BENCH records. DELIBERATELY self-contained (fixtures inline,
  * no shared tool helpers): the file must compile when dropped into OLD
  * worktrees where those helpers don't exist.
  *
  * Diagnostic modes outside the A/B sweep (`all` excludes them):
  *   - `maxsim`: the r15 rep_spread_gt2 line with per-rep GC time
  *   - `spatialbuild`: hash-vs-spatial create with debugTiming phases
  *   - `hybrid`: the r17 hybrid_table_50q / hybrid_scalar_5q pair
  *   - `hybridscalar`: r18 decomposition of the scalar-hybrid per-call
  *     premium (plan-only / bm25 leg / vector leg / full fused, with
  *     per-phase Spark job counts)
  *
  * Run: sbt -batch "runMain graft.tools.ABProbe
  *        [asof|hnswbuild|scan|ivf|url|maxsim|spatialbuild|hybrid|hybridscalar|all] [reps]"
  */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String, n: Int = reps)(f: => Unit): Unit = {
      f // untimed warmup, as Bench.time()
      val samples = Seq.fill(n) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab-probe] $name%-40s min=${samples.min}%.4f s " +
        f"spread=${samples.max / samples.min}%.2fx samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }

    if (mode == "all" || mode == "asof") {
      val q = graft.SparkEntry.queries
      time("events_asof") { noop(q("events_asof")(spark, sfDir)) }
    }

    if (mode == "all" || mode == "hnswbuild") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab").toString
      var rep = 0
      time("hnsw_build_sf") {
        rep += 1
        graft.index.AnnIndexManager.create(spark, s"ab_hnsw_$rep", emb,
          "vec_id", "embedding", "HNSW",
          Map("metric" -> "l2", "hnsw_m" -> "32", "shards" -> "8"),
          s"$tmp/hnsw$rep")
      }
    }

    if (mode == "all" || mode == "ivf") {
      // exact Bench shape: build IVF(nlist=16, nprobe=4) over sf embeddings,
      // persist (the reference serves from RAM), 50-query batch search
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab_ivf").toString
      val ivf = graft.index.AnnIndexManager.create(spark, "ab_ivf", emb,
        "vec_id", "embedding", "IVF",
        Map("metric" -> "l2", "nlist" -> "16", "nprobe" -> "4"), s"$tmp/ivf")
      val queries50 = Seq.tabulate(50)(i => graft.queries.QuerySupport.qvecF(i))
      ivf.persist()
      time("ivf_search_50q") { noop(ivf.searchBatch(queries50, 10)) }
    }

    if (mode == "all" || mode == "url") {
      val q = graft.SparkEntry.queries
      for (name <- Seq("url_normalize", "url_dedup", "url_filter"))
        time(name) { noop(q(name)(spark, sfDir)) }
    }

    if (mode == "hybrid") {
      // r17 adjudication target: hybrid_table_50q read 2.0328 (4225461,
      // load 0.55) → 2.7434 (ef42380, load 0.80) WITHIN r16's two clean
      // records with only MaxSim/SCALE.md commits in between (1.8814 in
      // r15). Exact Bench shape: sf docs + IVF(16/4, persisted) + resident
      // FTS postings, 50 hybrid queries in ONE declarative plan.
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab_hy").toString
      val ivf = graft.index.AnnIndexManager.create(spark, "ab_hy_ivf", emb,
        "vec_id", "embedding", "IVF",
        Map("metric" -> "l2", "nlist" -> "16", "nprobe" -> "4"), s"$tmp/ivf")
      ivf.persist()
      val hybridDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      val hti = graft.operators.HybridSearch.buildTextIndex(
        hybridDocs, "doc_id", "text", materialized = true)
      val hybridTexts = Seq(
        "spark table join merge", "hash group filter sort", "vector scan query",
        "window order batch line", "stream key value agg", "column part fast slow",
        "data big small sort", "query filter join scan", "table hash key group",
        "spark vector window stream")
      val hybridQs = spark.range(50).select(
        col("id").cast("int").as("query_idx"),
        element_at(typedLit(hybridTexts), (col("id") % 10).cast("int") + 1).as("qtext"),
        udf((i: Int) => graft.queries.QuerySupport.qvecF(i))
          .apply(col("id").cast("int")).as("qvec"))
      time("hybrid_table_50q") {
        noop(graft.operators.HybridSearch.hybridSearchTable(
          hybridDocs, "doc_id", hti, ivf, hybridQs,
          "query_idx", "qtext", "qvec", k = 10))
      }
      time("hybrid_scalar_5q") {
        for (i <- 0 until 5)
          noop(graft.operators.HybridSearch.hybridSearch(
            hybridDocs, "doc_id", hti, ivf,
            queryText = hybridTexts(i % hybridTexts.length),
            queryVec = graft.queries.QuerySupport.qvecF(i), k = 10))
      }
      hti.release()
    }

    if (mode == "hybridscalar") {
      // r18 directive #7: DECOMPOSE the scalar-hybrid per-call premium
      // (~0.49 s/q vs 39 ms/q batched, tracked since r10). Same fixture
      // as mode `hybrid`; phases isolate (a) pure Catalyst planning of
      // the scalar DataFrame, (b) the BM25 leg alone, (c) the vector leg
      // alone, (d) the full fused call — with per-phase Spark job counts
      // from a listener, so "re-planning vs re-reading vs scheduling"
      // stops being a guess.
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab_hs").toString
      val ivf = graft.index.AnnIndexManager.create(spark, "ab_hs_ivf", emb,
        "vec_id", "embedding", "IVF",
        Map("metric" -> "l2", "nlist" -> "16", "nprobe" -> "4"), s"$tmp/ivf")
      ivf.persist()
      val hybridDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      val hti = graft.operators.HybridSearch.buildTextIndex(
        hybridDocs, "doc_id", "text", materialized = true)
      val hybridTexts = Seq(
        "spark table join merge", "hash group filter sort", "vector scan query",
        "window order batch line", "stream key value agg")
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        })
      def phase(name: String)(f: Int => Unit): Unit = {
        f(0) // warmup
        Thread.sleep(200)
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        for (i <- 0 until 5) f(i)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[ab-probe] hybridscalar/$name%-28s ${wall / 5}%.4f s/q " +
          f"jobs/q=${(jobs.get() - j0) / 5.0}%.1f")
      }
      def scalarDf(i: Int) = graft.operators.HybridSearch.hybridSearch(
        hybridDocs, "doc_id", hti, ivf,
        queryText = hybridTexts(i % hybridTexts.length),
        queryVec = graft.queries.QuerySupport.qvecF(i), k = 10)
      phase("plan_only")(i => { scalarDf(i).queryExecution.executedPlan; () })
      phase("bm25_leg")(i => noop(graft.operators.HybridSearch.bm25(hti,
        hybridTexts(i % hybridTexts.length).split(" ").toSeq, 100)))
      phase("vector_leg")(i =>
        noop(ivf.scan(graft.queries.QuerySupport.qvecF(i), 100)))
      phase("full_fused")(i => noop(scalarDf(i)))
      // r19 candidates for the remaining premium:
      // (a) AQE off for the one scalar action — the fused plan is ~6 tiny
      //     exchanges, each of which AQE turns into its own job +
      //     replanning round-trip; a non-adaptive run submits one job
      phase("full_fused_aqeoff") { i =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try noop(scalarDf(i))
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      // (b) the VERDICT's batch-of-1 route: hybridSearchTable with a
      //     1-row queries relation (same plan-compile cost class, but the
      //     batch plan's windows replace the scalar plan's orderBy limits)
      phase("batch_1q") { i =>
        import spark.implicits._
        val q1 = Seq((i, hybridTexts(i % hybridTexts.length),
          graft.queries.QuerySupport.qvecF(i))).toDF("qidx", "qtext", "qvec")
        noop(graft.operators.HybridSearch.hybridSearchTable(
          hybridDocs, "doc_id", hti, ivf, q1, "qidx", "qtext", "qvec", k = 10))
      }
      // (c) both
      phase("batch_1q_aqeoff") { i =>
        import spark.implicits._
        val q1 = Seq((i, hybridTexts(i % hybridTexts.length),
          graft.queries.QuerySupport.qvecF(i))).toDF("qidx", "qtext", "qvec")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try noop(graft.operators.HybridSearch.hybridSearchTable(
          hybridDocs, "doc_id", hti, ivf, q1, "qidx", "qtext", "qvec", k = 10))
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      hti.release()
    }

    if (mode == "maxsim") {
      // the r15 record's only rep_spread_gt2 line (13.9x on a load-2.94
      // host): exact Bench shape — 10k 4-token d=128 docs, 50 two-token
      // queries, exact batch MaxSim. GC observability: print per-rep GC
      // time alongside, so a spread classifies as GC vs host vs code.
      val dim = 128
      val seededVec = udf { (id: Long, d: Int) =>
        val r = new scala.util.Random(id * 2654435761L + 42)
        Array.fill(d)(r.nextFloat())
      }
      val msDocs = spark.range(10000)
        .repartition(cpus.toInt)
        .select(col("id").as("doc_id"), array(Seq.tabulate(4)(t =>
          seededVec(col("id") * 4 + t, lit(dim))): _*).as("vecs"))
        .cache()
      msDocs.count()
      val msQs = spark.range(50)
        .select(col("id").as("query_idx"), array(
          seededVec(col("id") + 800000L, lit(dim)),
          seededVec(col("id") + 850000L, lit(dim))).as("qvecs"))
        .cache()
      msQs.count()
      def gcMillis: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      val plan = graft.operators.MaxSim.searchTable(msQs, "query_idx", "qvecs",
        msDocs, "doc_id", "vecs", k = 10)
      noop(plan) // warmup, as Bench.time()
      val samples = Seq.fill(math.max(reps, 8)) {
        val g0 = gcMillis; val t0 = System.nanoTime()
        noop(plan)
        ((System.nanoTime() - t0) / 1e9, gcMillis - g0)
      }
      val ts = samples.map(_._1)
      println(f"[ab-probe] maxsim_table_50q min=${ts.min}%.4f s " +
        f"spread=${ts.max / ts.min}%.2fx samples=" +
        samples.map { case (t, g) => f"$t%.3f(gc=${g}ms)" }.mkString(","))
    }

    if (mode == "spatialbuild") {
      // decompose the spatial build premium (r16 directive #4): the exact
      // vamana_spatial_build_10k_d128 bench shape, hash vs spatial, with
      // spark.ann.debugTiming phase lines (assign train / build+write /
      // create-time summaries)
      val dim = 128
      val seededVec = udf { (id: Long, d: Int) =>
        val r = new scala.util.Random(id * 2654435761L + 42)
        Array.fill(d)(r.nextFloat())
      }
      val synthDf = spark.range(10000)
        .select(col("id"), seededVec(col("id"), lit(dim)).as("vec")).cache()
      synthDf.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab_sb").toString
      spark.conf.set("spark.ann.debugTiming", "true")
      var rep = 0
      for (assign <- Seq("hash", "spatial"); _ <- 1 to reps) {
        rep += 1
        val t0 = System.nanoTime()
        graft.index.AnnIndexManager.create(spark, s"ab_sb_$rep", synthDf,
          "id", "vec", "DISKANN",
          Map("metric" -> "l2", "max_degree" -> "64",
            "build_complexity" -> "100", "shards" -> "16",
            "shard_assign" -> assign), s"$tmp/sb$rep")
        println(f"[ab-probe] build_10k_d128 $assign%-8s total=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.conf.unset("spark.ann.debugTiming")
    }

    if (mode == "all" || mode == "scan") {
      import graft.functions.AnnFunctions.l2_distance_sq
      val kd = 768; val kn = 1024
      val seededVec = udf { (id: Long, d: Int) =>
        val r = new scala.util.Random(id * 2654435761L + 42)
        Array.fill(d)(r.nextFloat())
      }
      val bigCands = spark.range(500L * kn)
        .select(col("id"), seededVec(col("id") + 500000L, lit(kd)).as("vec"))
        .coalesce(1).cache()
      bigCands.count()
      val qr5 = new scala.util.Random(5)
      val qlit = typedLit(Array.fill(kd)(qr5.nextFloat()))
      val scanPlan = bigCands.select(sum(l2_distance_sq(col("vec"), qlit)))
      noop(scanPlan) // warm codegen
      val samples = Seq.fill(math.max(reps, 5)) {
        val st0 = System.nanoTime(); noop(scanPlan)
        (System.nanoTime() - st0) / 1e9 / 500
      }
      println(f"[ab-probe] kernel_batch_l2_n1024_d768_spark_scan  " +
        f"min=${samples.min}%.7f s spread=${samples.max / samples.min}%.2fx")
    }
    spark.stop()
  }
}
