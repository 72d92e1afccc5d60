package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-17 router-lifecycle work (appended to
  * SCALE.md):
  *
  *  - `upkeep`: incremental coarse-router maintenance under a sustained
  *    online CDC stream — the r16 verdict's top scale-killer (every
  *    mutation digest-invalidated router.bin and paid a full
  *    single-threaded coarse rebuild; minutes per batch at the 100k×d768
  *    shape). REAL spatial DISKANN at 4,000 shards / 1M rows (coarse
  *    ENGAGED — the r16 cdc arm ran at 40 shards, below the floor, so
  *    the interaction was never exercised), ≥20 online batches;
  *    per-batch `Router.patch` cost vs a from-scratch rebuild of the
  *    same summary set, patched-vs-rebuilt routing agreement, tombstone
  *    accounting through the index's OWN routerFor path, and routed
  *    recall parity before/after the stream.
  *  - `routerbuild`: the batched-parallel driver build
  *    (Vamana.buildShardParallel) vs the serial insert loop at 4k / 40k
  *    centroids — wall ratio and routing agreement (serial-vs-parallel
  *    and each-vs-flat), plus determinism (two parallel builds route
  *    identically).
  *  - `bcast`: the pinned Broadcast[Router] on the routed TABLE path —
  *    N repeat table searches against one summaries version must ship
  *    ONE broadcast (r16 re-broadcast O(shards×dim) per call and never
  *    unpersisted); a mutation rotates to exactly one new id.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R17Scale [mode]"
  * mode: all|upkeep|spatialtarget|routerbuild|bcast
  */
object R17Scale {

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

    val taskMillis = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          taskMillis.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      })
    def measured[T](label: String)(f: => T): T = {
      Thread.sleep(300)
      val c0 = taskMillis.get()
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val cpu = (taskMillis.get() - c0) / 1e3
      println(f"[r17-scale] $label%-60s wall=$wall%8.2f s cpu=$cpu%8.2f s")
      out
    }
    def withConf[T](kvs: (String, String)*)(f: => T): T = {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
    }

    // ---- incremental coarse upkeep under online CDC at 4k shards --------
    def upkeepArm(): Unit = {
      R15Scale.requireDriverMem(12, "upkeep")
      import graft.index.ShardSummaries
      val d = 32
      val nClusters = 20000 // modes >> shards (the r16 lesson)
      val nShards = 4000
      val n = 1000000L
      val mkVec = clusteredVecUdf(nClusters, d)
      val tmp = java.nio.file.Files.createTempDirectory("graft_r17_up").toString
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val idx = measured(s"upkeep create n=$n shards=$nShards (spatial d=$d)") {
        graft.index.AnnIndexManager.create(spark, "r17_up", base,
          "id", "vec", "DISKANN",
          Map("metric" -> "l2", "max_degree" -> "16",
            "build_complexity" -> "32", "shards" -> nShards.toString,
            "shard_assign" -> "spatial"), s"$tmp/up")
      }
      idx.persist()
      val qs = clusteredQueries(50, nClusters, d)
      def hits(label: String): Map[Int, Set[Long]] = {
        idx.searchBatch(qs, 10).count() // warm
        measured(label)(idx.searchBatch(qs, 10).collect())
          .groupBy(_.getInt(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      }
      def recall(w: Map[Int, Set[Long]], a: Map[Int, Set[Long]]): Double =
        w.keys.toSeq.map { q =>
          val x = w(q)
          if (x.isEmpty) 1.0 else x.intersect(a.getOrElse(q, Set.empty)).size.toDouble / x.size
        }.sum / w.size
      val w0 = hits(s"upkeep walk-all 50q n=$n shards=$nShards")
      val r0 = withConf("spark.ann.shardProbes" -> "8")(
        hits("upkeep COARSE-routed 50q s=8 BEFORE cdc"))
      println(f"[r17-scale]   routed recall s=8 of $nShards BEFORE = ${recall(w0, r0)}%.3f")
      // the coarse level must actually be engaged for this arm to count
      val entry0 = idx.routerCacheEntry.flatMap(_.router).flatMap(_.coarse)
      require(entry0.isDefined, "coarse level not engaged at 4k shards")
      println(s"[r17-scale]   coarse engaged: nodes=${entry0.get.graphShards.length} " +
        s"live=${entry0.get.liveCount}")

      // measured head-to-head, driver-side: per-batch PATCH of the
      // previous router vs a from-scratch rebuild of the same summary
      // set (what r16 paid per mutation)
      def covered(): Array[ShardSummaries.Summary] = {
        val live = idx.meta.liveShards.get.toSet
        ShardSummaries.read(idx.path).get.filter(s => live(s.shard))
      }
      var prev = ShardSummaries.Router.build(covered(), "l2", 256, 4)
      var patchMsTotal = 0.0
      var rebuildMsTotal = 0.0
      var rebuilds = 0
      val batches = 20
      spark.conf.set("spark.ann.onlineInsertMaxRows", "1000")
      val insertWall = try {
        measured(s"upkeep $batches online batches x200 rows (incl summaries)") {
          for (b <- 0 until batches) {
            val lo = 10000000L + b * 200
            idx.insert(spark.range(lo, lo + 200)
              .select(col("id"), mkVec(col("id") % (nClusters * 50)).as("vec")),
              "id", "vec")
            val cov = covered()
            val t0 = System.nanoTime()
            val patched = ShardSummaries.Router.build(cov, "l2", 256, 4,
              base = Some(prev))
            val pMs = (System.nanoTime() - t0) / 1e6
            patchMsTotal += pMs
            // a patched graph keeps the old spine: it must be larger than
            // live (tombstones), never a fresh rebuild
            val co = patched.coarse.get
            require(co.graphShards.length > co.liveCount,
              s"batch $b did not patch (nodes=${co.graphShards.length} live=${co.liveCount})")
            if (b % 5 == 4) { // rebuild baseline every 5th batch (it's the slow side)
              val t1 = System.nanoTime()
              val rebuilt = ShardSummaries.Router.build(cov, "l2", 256, 4)
              rebuildMsTotal += (System.nanoTime() - t1) / 1e6
              rebuilds += 1
              val agree = qs.take(20).map { q =>
                val a = patched.topShards(q, 8).toSet
                val bb = rebuilt.topShards(q, 8).toSet
                a.intersect(bb).size.toDouble / math.max(1, bb.size)
              }.sum / 20
              println(f"[r17-scale]   batch $b%2d patch=${pMs}%8.2f ms " +
                f"agreement(patched vs rebuilt, s=8)=$agree%.3f")
            }
            prev = patched
          }
        }
      } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
      println(f"[r17-scale]   per-batch router upkeep: patch avg=${patchMsTotal / batches}%8.2f ms " +
        f"vs full rebuild avg=${rebuildMsTotal / math.max(1, rebuilds)}%8.2f ms " +
        f"(x${rebuildMsTotal / math.max(1, rebuilds) / (patchMsTotal / batches)}%.0f)")

      // the index's OWN path: a routed search after the stream must have
      // reconciled incrementally (tombstones visible), never rebuilt
      val r1 = withConf("spark.ann.shardProbes" -> "8")(
        hits(s"upkeep COARSE-routed 50q s=8 AFTER $batches batches"))
      val co1 = idx.routerCacheEntry.flatMap(_.router).flatMap(_.coarse).get
      println(s"[r17-scale]   index routerFor after cdc: nodes=${co1.graphShards.length} " +
        s"live=${co1.liveCount} tombstones=${co1.graphShards.length - co1.liveCount} " +
        s"(expected ~${batches} from ${batches} single-shard rewrites)")
      val w1 = hits("upkeep walk-all 50q AFTER cdc")
      println(f"[r17-scale]   routed recall s=8 of $nShards AFTER  = ${recall(w1, r1)}%.3f " +
        "(parity floor: BEFORE - 0.02)")
      // adjudication leg: the same width through the ONE-LEVEL scan (the
      // exact flat ranking, no coarse graph, no patch) — if it reads the
      // same, the loss is the index's spatial dilution under tiny online
      // batches (the r16 cdc finding, vacuum is the repair), not the
      // patched coarse graph
      val rFlat = withConf("spark.ann.shardProbes" -> "8",
        "spark.ann.routeCoarseThreshold" -> "100000000")(
        hits("upkeep ONE-LEVEL-routed 50q s=8 AFTER cdc"))
      println(f"[r17-scale]   one-level recall s=8 AFTER           = ${recall(w1, rFlat)}%.3f " +
        "(patched-coarse parity target)")
      val _ = insertWall
      idx.unpersist(); base.unpersist()
    }

    // ---- spatial vs rotation online-insert targeting ---------------------
    // Correlated CDC batches (each drawn around ONE cluster — the
    // realistic arrival pattern) under both target policies: rotation
    // merges each batch into whatever shard is next (bimodalizes its
    // centroid; routing then misses the fresh rows and the old ones the
    // diluted centroid no longer represents), spatial targeting rewrites
    // the shard the batch belongs to.
    def spatialTargetArm(): Unit = {
      val d = 32
      val nClusters = 2000
      val nShards = 400
      val n = 100000L
      val mkVec = clusteredVecUdf(nClusters, d)
      val batches = 10
      for (policy <- Seq("spatial", "rotation")) {
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_r17_st_$policy").toString
        val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        val idx = measured(s"st[$policy] create n=$n shards=$nShards (spatial d=$d)") {
          graft.index.AnnIndexManager.create(spark, s"r17_st_$policy", base,
            "id", "vec", "DISKANN",
            Map("metric" -> "l2", "max_degree" -> "16",
              "build_complexity" -> "32", "shards" -> nShards.toString,
              "shard_assign" -> "spatial"), s"$tmp/st")
        }
        idx.persist()
        val freshClusters = Seq.tabulate(batches)(b => (b * 37) % nClusters)
        withConf("spark.ann.onlineInsertMaxRows" -> "1000",
          "spark.ann.onlineSpatialTargets" ->
            (if (policy == "spatial") "true" else "false")) {
          measured(s"st[$policy] $batches correlated batches x200") {
            for (b <- 0 until batches) {
              val c = freshClusters(b)
              val ids = spark.range(20000000L + b * 200, 20000000L + b * 200 + 200)
              // every row of the batch jitters around cluster c's site
              idx.insert(ids.select(col("id"),
                udf((id: Long) => clusteredPoint(c, id * 31L + 5, d)).apply(col("id")).as("vec")),
                "id", "vec")
            }
          }
        }
        // recall at the FRESH clusters (query = the cluster site) and at
        // 50 standard queries, routed s=4 vs walk-all
        val freshQs = freshClusters.map(c => clusteredPoint(c, 999983L, d))
        val stdQs = clusteredQueries(50, nClusters, d)
        def hits(qs: Seq[Array[Float]]): Map[Int, Set[Long]] = {
          idx.searchBatch(qs, 10).count()
          idx.searchBatch(qs, 10).collect()
            .groupBy(_.getInt(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        }
        def recall(w: Map[Int, Set[Long]], a: Map[Int, Set[Long]]): Double =
          w.keys.toSeq.map { q =>
            val x = w(q)
            if (x.isEmpty) 1.0
            else x.intersect(a.getOrElse(q, Set.empty)).size.toDouble / x.size
          }.sum / w.size
        val wF = hits(freshQs); val wS = hits(stdQs)
        val (rF, rS) = withConf("spark.ann.shardProbes" -> "4") {
          (hits(freshQs), hits(stdQs))
        }
        println(f"[r17-scale]   st[$policy] routed s=4 recall: " +
          f"fresh-cluster=${recall(wF, rF)}%.3f standard=${recall(wS, rS)}%.3f")
        idx.unpersist()
      }
    }

    // ---- batched-parallel coarse build vs serial -------------------------
    def routerBuildArm(): Unit = {
      import graft.index.{ShardSummaries, Vamana}
      val d = 64
      for (nShards <- Seq(4000, 40000)) {
        val nSites = math.max(1, nShards / 20)
        val sums = Array.tabulate(nShards)(i => ShardSummaries.Summary(i, 1000L,
          clusteredPoint(i % nSites, i * 7717L + 5, d, jitter = 0.2)))
        val cents = sums.map(_.centroid)
        val ids = Array.tabulate(nShards)(_.toLong)
        val params = Vamana.Params(maxDegree = 32, buildComplexity = 64, alpha = 1.2)
        val t0 = System.nanoTime()
        val serial = Vamana.buildShard(ids, cents, params, "l2")
        val serialMs = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        val par = Vamana.buildShardParallel(ids, cents, params, "l2")
        val parMs = (System.nanoTime() - t1) / 1e6
        println(f"[r17-scale] coarse build shards=$nShards%-6d serial=${serialMs}%9.1f ms " +
          f"parallel=${parMs}%9.1f ms (x${serialMs / parMs}%.1f)")
        // routing agreement through the exact Router beam shape (s=8 ->
        // l=48): parallel vs serial, and each vs the flat scan's truth
        val flat = ShardSummaries.Router.build(sums, "l2",
          coarseThreshold = Int.MaxValue, overscan = 4)
        val qs = Seq.tabulate(50)(i => clusteredPoint(i % 37, i * 131L + 7, d, jitter = 0.2))
        val dist = graft.functions.VectorKernels.orderingDistance("l2") _
        val s = 8
        val l = ShardSummaries.Router.beamFloor(nShards) // the Router's beam at s=8
        def top(g: Vamana.Shard, q: Array[Float]): Set[Int] = {
          val pool = Vamana.beamSearchPool(g, q, l, dist)
          (0 until math.min(s, pool.size)).map(j => pool.labels(j)).toSet
        }
        var agreePS = 0.0; var agreePF = 0.0; var agreeSF = 0.0
        qs.foreach { q =>
          val ps = top(par, q); val se = top(serial, q)
          val fl = flat.topShards(q, s).map(_.toInt).toSet
          agreePS += ps.intersect(se).size.toDouble / s
          agreePF += ps.intersect(fl).size.toDouble / s
          agreeSF += se.intersect(fl).size.toDouble / s
        }
        println(f"[r17-scale]   agreement(s=8, 50q): parallel-vs-serial=${agreePS / 50}%.3f " +
          f"parallel-vs-flat=${agreePF / 50}%.3f serial-vs-flat=${agreeSF / 50}%.3f")
        // determinism: a second parallel build is node-for-node identical
        val par2 = Vamana.buildShardParallel(ids, cents, params, "l2")
        val identical = par.entry == par2.entry &&
          (0 until nShards).forall(v =>
            java.util.Arrays.equals(par.neighbors(v), par2.neighbors(v)))
        println(s"[r17-scale]   parallel build deterministic (2 runs identical): $identical")
      }
    }

    // ---- pinned Broadcast[Router] on the routed table path ---------------
    def bcastArm(): Unit = {
      import spark.implicits._
      val d = 32
      val nClusters = 2000
      val nShards = 400
      val n = 100000L
      val mkVec = clusteredVecUdf(nClusters, d)
      val tmp = java.nio.file.Files.createTempDirectory("graft_r17_bc").toString
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
      val idx = measured(s"bcast create n=$n shards=$nShards (spatial d=$d)") {
        graft.index.AnnIndexManager.create(spark, "r17_bc", base,
          "id", "vec", "DISKANN",
          Map("metric" -> "l2", "max_degree" -> "16",
            "build_complexity" -> "32", "shards" -> nShards.toString,
            "shard_assign" -> "spatial"), s"$tmp/bc")
      }
      idx.persist()
      val qdf = clusteredQueries(64, nClusters, d).zipWithIndex
        .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qvec")
        .persist()
      qdf.count()
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      withConf("spark.ann.shardProbes" -> "8",
        "spark.ann.maxCollectedQueries" -> "2") {
        for (call <- 0 until 10) {
          val t0 = System.nanoTime()
          graft.operators.AnnSearch.searchTable(idx, qdf, 10,
            queryIdCol = Some("qid")).count()
          val ms = (System.nanoTime() - t0) / 1e6
          val bid = idx.routerCacheEntry.flatMap(_.broadcastId)
          ids += bid.getOrElse(-1L)
          if (call < 3 || call == 9)
            println(f"[r17-scale]   routed table call $call%2d wall=${ms}%8.1f ms broadcast_id=${bid.getOrElse(-1L)}")
        }
        println(s"[r17-scale]   distinct broadcast ids over 10 repeat calls: " +
          s"${ids.distinct.size} (${ids.distinct.mkString(",")}) — must be 1")
        require(ids.distinct.size == 1, "router re-broadcast on a repeat call")
        // a mutation rotates the pin: exactly one NEW id afterwards
        withConf("spark.ann.onlineInsertMaxRows" -> "1000") {
          idx.insert(spark.range(20000000L, 20000200L)
            .select(col("id"), mkVec(col("id") % nClusters).as("vec")), "id", "vec")
        }
        graft.operators.AnnSearch.searchTable(idx, qdf, 10,
          queryIdCol = Some("qid")).count()
        val after = idx.routerCacheEntry.flatMap(_.broadcastId)
        println(s"[r17-scale]   post-mutation broadcast id: ${after.getOrElse(-1L)} " +
          s"(rotated from ${ids.head})")
        require(after.isDefined && after.get != ids.head, "stale broadcast served")
      }
      idx.unpersist(); qdf.unpersist()
    }

    println(s"[r17-scale] mode=$mode cpus=$cpus " +
      s"driver_heap_gb=${Runtime.getRuntime.maxMemory() / (1L << 30)}")
    if (mode == "all" || mode == "upkeep") upkeepArm()
    if (mode == "all" || mode == "spatialtarget") spatialTargetArm()
    if (mode == "all" || mode == "routerbuild") routerBuildArm()
    if (mode == "all" || mode == "bcast") bcastArm()
    spark.stop()
  }
}
