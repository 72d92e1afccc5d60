package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-16 work (appended to SCALE.md):
  *
  *  - `router`: the two-level Router (ShardSummaries.Router — coarse
  *    k-means cells over shard centroids, SPANN's posting hierarchy at
  *    the shard tier) measured at 10x and 100x the r15 shard count.
  *    Driver-side routing cost per 50-query batch at 40 / 400 / 4,000
  *    shards, one-level flat scan vs coarse, plus routing agreement
  *    (does the coarse level pick the same shards?). Then a REAL
  *    400-shard spatial DISKANN at 1M rows: routed search recall vs
  *    walk-all with the coarse level engaged (threshold 256 < 400) vs
  *    forced one-level — the "unchanged recall floor" check.
  *  - `cdc`: routing x sustained online CDC — 50 online insert batches
  *    into a spatial 1M/40-shard index; routed recall vs walk-all before
  *    and after, per-batch summary maintenance riding along, and
  *    refreshShardSummaries() cost as the repair lever (read-mostly
  *    fast path: ~0 when coverage is already complete and exact).
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R16Scale [mode]"
  * mode: all|router|cdc — plus the standalone diagnostic `routerbuild`
  * (coarse-graph param tiers: build time vs flat-scan agreement; excluded
  * from `all` because its 40k-shard graph builds take ~20 s of pure
  * driver CPU and the committed conclusion is a kept default).
  */
object R16Scale {

  /** The clustered synthetic used by every r15/r16 routing arm: gaussian
    * cluster sites (seed from the cluster id) + per-row jitter — one
    * definition so the router and cdc arms measure the same data shape. */
  private def clusteredPoint(cluster: Int, rowSeed: Long, d: Int,
                             jitter: Double = 0.3): Array[Float] = {
    val rc = new scala.util.Random(cluster * 9176L + 31)
    val rr = new scala.util.Random(rowSeed)
    Array.tabulate(d)(_ => (rc.nextGaussian() * 3 + jitter * rr.nextGaussian()).toFloat)
  }

  private def clusteredVecUdf(nClusters: Int, d: Int) = udf { (id: Long) =>
    clusteredPoint((id % nClusters).toInt, id * 2654435761L + 13, d)
  }

  private def clusteredQueries(nQ: Int, nClusters: Int, d: Int): Seq[Array[Float]] =
    Seq.tabulate(nQ)(i => clusteredPoint((i * 37) % nClusters, i * 7717L + 5, d))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = args.headOption.getOrElse("all")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val taskMillis = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          taskMillis.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        }
      })
    def measured[T](label: String)(f: => T): T = {
      Thread.sleep(300)
      val b0 = shuffleBytes.get()
      val c0 = taskMillis.get()
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val mb = (shuffleBytes.get() - b0) / 1e6
      val cpu = (taskMillis.get() - c0) / 1e3
      println(f"[r16-scale] $label%-56s wall=$wall%8.2f s cpu=$cpu%8.2f s " +
        f"shuffle_write=$mb%9.2f MB")
      out
    }
    def withConf[T](kvs: (String, String)*)(f: => T): T = {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
    }

    // ---- two-level router at 10x / 100x the r15 shard count --------------
    def routerArm(): Unit = {
      R15Scale.requireDriverMem(12, "router")
      import graft.index.ShardSummaries

      // (a) DRIVER routing cost, synthetic summaries: clustered centroids
      // (the spatial layout's shape) at d=64, 50-query batches. The r15
      // one-level scan is O(shards) per query; the coarse level is
      // O(sqrt(shards) x overscan) — per-BATCH driver wall should stay
      // ~flat as shards x100 while the flat scan grows ~linearly.
      val d = 64
      def synthSummaries(nShards: Int): Array[ShardSummaries.Summary] = {
        val nSites = math.max(1, nShards / 20)
        Array.tabulate(nShards)(i => ShardSummaries.Summary(i, 1000L,
          clusteredPoint(i % nSites, i * 7717L + 5, d, jitter = 0.2)))
      }
      val qs = Seq.tabulate(50)(i =>
        clusteredPoint(i % 37, i * 131L + 7, d, jitter = 0.2))
      def timeDriver(label: String, reps: Int = 7)(f: => Unit): Double = {
        f // warm
        val ts = Seq.fill(reps) {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
        }
        println(f"[r16-scale] $label%-56s min=${ts.min}%9.3f ms " +
          f"spread=${ts.max / ts.min}%.2fx")
        ts.min
      }
      for (nShards <- Seq(40, 400, 4000, 40000)) {
        val sums = synthSummaries(nShards)
        val t0 = System.nanoTime()
        val flat = ShardSummaries.Router.build(sums, "l2",
          coarseThreshold = Int.MaxValue, overscan = 4)
        val flatBuildMs = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        val coarse = ShardSummaries.Router.build(sums, "l2",
          coarseThreshold = 256, overscan = 4)
        val coarseBuildMs = (System.nanoTime() - t1) / 1e6
        println(f"[r16-scale] router build shards=$nShards%-5d flat=$flatBuildMs%.1f ms " +
          f"coarse=$coarseBuildMs%.1f ms (one-time per summaries version, driver-cached)")
        // s=8 FIXED is the serving shape (per-query probe width does not
        // grow with the corpus): driver routing must stay ~FLAT as shards
        // x1000. The n/10 fraction is the batch-analytics shape.
        for (s <- Seq(8, math.max(2, nShards / 10)).distinct) {
          timeDriver(s"route 50q shards=$nShards s=$s ONE-LEVEL") {
            qs.foreach(q => flat.topShards(q, s))
          }
          timeDriver(s"route 50q shards=$nShards s=$s COARSE" +
              (if (coarse.coarse.isEmpty) " (below threshold -> one-level)" else "")) {
            qs.foreach(q => coarse.topShards(q, s))
          }
          // routing agreement: coarse picks vs the flat ranking's true top-s
          if (coarse.coarse.isDefined) {
            val agree = qs.map { q =>
              val t = flat.topShards(q, s).toSet
              val c = coarse.topShards(q, s).toSet
              t.intersect(c).size.toDouble / t.size
            }.sum / qs.size
            println(f"[r16-scale]   routing agreement coarse-vs-flat top-$s = $agree%.3f")
          }
        }
      }

      // (b) REAL index at 10x the r15 shard count: 1M rows / 400 spatial
      // shards (2,500 rows each, d=32 keeps the build bounded). The coarse
      // level engages (400 > 256); recall vs walk-all must hold the same
      // floor as a forced one-level router at the same probe width.
      val rd2 = 32
      val nClusters = 2000
      val mkVec = clusteredVecUdf(nClusters, rd2)
      val n = 1000000L
      val tmp = java.nio.file.Files.createTempDirectory("graft_r16_router").toString
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val idx = measured(s"router create n=$n shards=400 (spatial d=$rd2)") {
        graft.index.AnnIndexManager.create(spark, "r16_rt", base,
          "id", "vec", "DISKANN",
          Map("metric" -> "l2", "max_degree" -> "16",
            "build_complexity" -> "32", "shards" -> "400",
            "shard_assign" -> "spatial"), s"$tmp/rt")
      }
      idx.persist()
      val qs2 = clusteredQueries(50, nClusters, rd2)
      def hits(): Map[Int, Set[Long]] = {
        idx.searchBatch(qs2, 10).count() // per-setting warm pass
        measured(s"router batch 50q n=$n shards=400 " +
            (if (spark.conf.getOption("spark.ann.shardProbes").isEmpty) "walk-all"
             else s"probes=${spark.conf.get("spark.ann.shardProbes")}" +
               s" threshold=${spark.conf.get("spark.ann.routeCoarseThreshold", "256")}")) {
          idx.searchBatch(qs2, 10).collect()
        }.groupBy(_.getInt(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      }
      val wAll = hits()
      // s=8 is the serving width where the graph coarse level actually
      // engages (l=48 < 400/8); at wider fractions the crossover guard
      // falls back to the flat scan (identical by construction)
      val oneLevel = withConf("spark.ann.shardProbes" -> "8",
        "spark.ann.routeCoarseThreshold" -> "1000000")(hits())
      val coarse = withConf("spark.ann.shardProbes" -> "8")(hits())
      def recall(a: Map[Int, Set[Long]]): Double =
        wAll.keys.toSeq.map { q =>
          val w = wAll(q)
          if (w.isEmpty) 1.0 else w.intersect(a.getOrElse(q, Set.empty)).size.toDouble / w.size
        }.sum / wAll.size
      println(f"[r16-scale]   recall one-level s=8 of 400 vs walk-all = ${recall(oneLevel)}%.3f")
      println(f"[r16-scale]   recall COARSE    s=8 of 400 vs walk-all = ${recall(coarse)}%.3f (floor: one-level - 0.02)")
      idx.unpersist(); base.unpersist()
    }

    // ---- routing x sustained online CDC -----------------------------------
    def cdcArm(): Unit = {
      R15Scale.requireDriverMem(12, "cdc")
      val d = 64
      val perShard = 25000
      val nClusters = 2000
      val mkVec = clusteredVecUdf(nClusters, d)
      val n = 40L * perShard
      val tmp = java.nio.file.Files.createTempDirectory("graft_r16_cdc").toString
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val idx = measured(s"cdc create n=$n shards=40 (spatial)") {
        graft.index.AnnIndexManager.create(spark, "r16_cdc", base,
          "id", "vec", "DISKANN",
          Map("metric" -> "l2", "max_degree" -> "32",
            "build_complexity" -> "64", "shards" -> "40",
            "shard_assign" -> "spatial"), s"$tmp/cdc")
      }
      val qs = clusteredQueries(50, nClusters, d)
      def recallRouted(label: String): Double = {
        idx.persist()
        def hits(): Map[Int, Set[Long]] = idx.searchBatch(qs, 10).collect()
          .groupBy(_.getInt(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        hits() // warm
        val w = hits()
        val r = withConf("spark.ann.shardProbes" -> "10") { hits(); hits() }
        idx.unpersist()
        val rec = w.keys.toSeq.map { q =>
          val x = w(q)
          if (x.isEmpty) 1.0 else x.intersect(r.getOrElse(q, Set.empty)).size.toDouble / x.size
        }.sum / w.size
        println(f"[r16-scale]   routed recall (s=10 of ~40) $label = $rec%.3f")
        rec
      }
      recallRouted("BEFORE cdc")
      // 50 online batches of 200 rows, drawn around existing cluster
      // centers (fresh ids): spatial online targeting routes each row to
      // its nearest shard; per-batch summary maintenance rides along
      spark.conf.set("spark.ann.onlineInsertMaxRows", "1000")
      try {
        measured("cdc 50 online batches x200 rows (incl summary maintenance)") {
          for (b <- 0 until 50) {
            val lo = 10000000L + b * 200
            idx.insert(spark.range(lo, lo + 200)
              .select(col("id"), mkVec(col("id") % (nClusters * 500)).as("vec")),
              "id", "vec")
          }
        }
      } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
      val (mode0, live0, sum0) = idx.routingStatus
      println(s"[r16-scale]   after cdc: live=$live0 summarized=$sum0 (mode=$mode0)")
      recallRouted("AFTER 50 cdc batches")
      // the repair lever: with incremental maintenance keeping summaries
      // exact, refresh is the read-mostly fast path (~0); timed anyway as
      // the documented repair cost
      val t0 = System.nanoTime()
      val refreshed = idx.refreshShardSummaries()
      println(f"[r16-scale]   refreshShardSummaries: recomputed=$refreshed " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      recallRouted("AFTER refresh")
      base.unpersist()
    }

    // ---- coarse-graph build params: does routing need R=32/L=64? ---------
    // The coarse build is single-threaded Vamana insertion (deterministic);
    // at 40k shards it reads ~11 s, projected minutes at 100k x d768. The
    // query side only needs coarse RECALL (beam floor 48 + overscan), so
    // measure build time and flat-scan agreement across param tiers.
    def routerBuildArm(): Unit = {
      import graft.index.{ShardSummaries, Vamana}
      val d = 64
      for (nShards <- Seq(4000, 40000)) {
        val nSites = math.max(1, nShards / 20)
        val sums = Array.tabulate(nShards)(i => ShardSummaries.Summary(i, 1000L,
          clusteredPoint(i % nSites, i * 7717L + 5, d, jitter = 0.2)))
        val flat = ShardSummaries.Router.build(sums, "l2",
          coarseThreshold = Int.MaxValue, overscan = 4)
        val qs = Seq.tabulate(50)(i => clusteredPoint(i % 37, i * 131L + 7, d, jitter = 0.2))
        for ((r, l) <- Seq((32, 64), (24, 48), (16, 32), (12, 24))) {
          val cents = sums.map(_.centroid)
          val t0 = System.nanoTime()
          val g = Vamana.buildShard(Array.tabulate(nShards)(_.toLong), cents,
            Vamana.Params(maxDegree = r, buildComplexity = l, alpha = 1.2), "l2")
          val buildMs = (System.nanoTime() - t0) / 1e6
          // query through the same beam the Router uses (s=8, overscan 4 -> l=48)
          val dist = graft.functions.VectorKernels.orderingDistance("l2") _
          val s = 8
          val agree = qs.map { q =>
            val pool = Vamana.beamSearchPool(g, q, 48, dist)
            val got = (0 until math.min(s, pool.size)).map(j => pool.labels(j)).toSet
            val want = flat.topShards(q, s).toSet
            want.intersect(got).size.toDouble / want.size
          }.sum / qs.size
          println(f"[r16-scale] coarse build shards=$nShards R=$r L=$l " +
            f"build=${buildMs}%9.1f ms agreement(s=8)=$agree%.3f")
        }
        // persisted router.bin: cold (build + write) vs a fresh driver's
        // digest-validated read — the per-driver-restart amortization
        val dir = java.nio.file.Files.createTempDirectory("graft_rb_cache").toString
        val t0 = System.nanoTime()
        ShardSummaries.Router.build(sums, "l2", 256, 4, cachePath = Some(dir))
        val cold = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        ShardSummaries.Router.build(sums, "l2", 256, 4, cachePath = Some(dir))
        val warm = (System.nanoTime() - t1) / 1e6
        println(f"[r16-scale] router.bin cache shards=$nShards " +
          f"cold(build+write)=$cold%9.1f ms warm(read)=$warm%9.1f ms")
      }
    }

    println(s"[r16-scale] mode=$mode cpus=$cpus " +
      s"driver_heap_gb=${Runtime.getRuntime.maxMemory() / (1L << 30)}")
    if (mode == "all" || mode == "router") routerArm()
    if (mode == "all" || mode == "cdc") cdcArm()
    if (mode == "routerbuild") routerBuildArm()
    spark.stop()
  }
}
