package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-15 work (appended to SCALE.md):
  *
  *  - Shard-routed graph search on a clustered 1M fixture: spatial
  *    DISKANN at two corpus scales with fixed per-shard budget (4 → 40
  *    shards). Walk-all per-query cost grows with the shard count; a
  *    fixed probe width keeps it roughly flat, and the recall floor vs
  *    walk-all is measured at s ≈ 25% of shards.
  *  - Online-insert per-batch floor decomposition: the bench CDC shape
  *    (20k-row d=64 shard, 200-row batches) run with
  *    `spark.ann.debugTiming=true` — per-phase stderr lines decompose
  *    prepare/rewrite/publish/reclaim so the floor's composition is
  *    numbers, not guesses. Run twice: insert-only and with tombstones
  *    (the consolidation phases only exist in the second).
  *  - The REAL full publicsuffix.org list (vendored test fixture,
  *    ~9.5k rules) through the UT1-scale blocklist arm: registered
  *    domains under full-PSL keying on a 4M-url corpus with multi-part
  *    suffixes, blocked count verified arithmetically; url_dedup +
  *    capPerDomain at the same scale under the same rules.
  *
  * Heavy arms self-guard on driver heap (fail fast with the required
  * SPARK_DRIVER_MEM instead of an OOM mid-run — the r14 footgun).
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R15Scale [mode]"
  * mode: all|routing|onlineprof|psl
  */
object R15Scale {

  /** Fail fast when the forked driver JVM cannot hold an arm's fixture —
    * the r14 `urldedup` 20M leg OOM'd at sbt's default 8g heap mid-run. */
  def requireDriverMem(minGb: Int, arm: String): Unit = {
    val haveGb = Runtime.getRuntime.maxMemory() / (1L << 30)
    require(haveGb + 1 >= minGb,
      s"[r15-scale] arm '$arm' needs ~${minGb}g of driver heap but this " +
        s"JVM has ~${haveGb}g — rerun with SPARK_DRIVER_MEM=${minGb}g")
  }

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
    // cpu = summed executor task time: at local[32] a 40-task job hides a
    // 10x WORK difference inside similar wall clock (tasks run in
    // parallel), but at 1000-executor scale aggregate work IS the cost —
    // cpu seconds are the scale-honest per-query metric here
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
      println(f"[r15-scale] $label%-52s wall=$wall%8.2f s cpu=$cpu%8.2f s " +
        f"shuffle_write=$mb%9.2f MB")
      out
    }

    // ---- shard-routed graph search at 1M ---------------------------------
    // Fixed per-shard budget (~25k rows at d=64) so corpus x10 = shards
    // x10 — the 100 TB growth shape. Queries are fresh noise around known
    // cluster centers; overlap vs walk-all is the recall measure (the
    // walk-all beam search is itself approximate, so overlap — not brute
    // force — is the honest comparator for what ROUTING costs).
    def routingArm(): Unit = {
      requireDriverMem(12, "routing")
      val d = 64
      val perShard = 25000
      val tmp = java.nio.file.Files.createTempDirectory("graft_r15_route").toString
      val nClusters = 2000
      val mkVec = udf { (id: Long) =>
        val c = (id % nClusters).toInt
        val rc = new scala.util.Random(c * 9176L + 31)
        val rd = new scala.util.Random(id * 2654435761L + 13)
        Array.tabulate(d)(_ => (rc.nextGaussian() * 3 + 0.3 * rd.nextGaussian()).toFloat)
      }
      val qs = Seq.tabulate(50) { i =>
        val c = (i * 37) % nClusters
        val rc = new scala.util.Random(c * 9176L + 31)
        val rd = new scala.util.Random(i * 7717L + 5)
        Array.tabulate(d)(_ => (rc.nextGaussian() * 3 + 0.3 * rd.nextGaussian()).toFloat)
      }
      var rep = 0
      def withProbes[T](s: Int)(f: => T): T = {
        if (s > 0) spark.conf.set("spark.ann.shardProbes", s.toString)
        try f finally spark.conf.unset("spark.ann.shardProbes")
      }
      def runScale(n: Long, shards: Int, probes: Seq[Int]): Map[Int, Map[Long, Seq[Long]]] = {
        rep += 1
        val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        base.count()
        val idx = measured(s"routing create n=$n shards=$shards (spatial)") {
          graft.index.AnnIndexManager.create(spark, s"r15_rt_$rep", base,
            "id", "vec", "DISKANN",
            Map("metric" -> "l2", "max_degree" -> "32",
              "build_complexity" -> "64", "shards" -> shards.toString,
              "shard_assign" -> "spatial"), s"$tmp/rt$rep")
        }
        idx.persist()
        idx.searchBatch(qs, 10).count() // warm pin + caches, untimed
        // recall + batch shuffle-volume evidence: the 50q batch spreads
        // over ~every shard in UNION (each query still probes only its
        // own s), so its win is the replicated-query/shuffle volume and
        // per-shard beam count, not the partition scan
        val out = probes.map { s =>
          withProbes(s) {
            val label = if (s > 0) s"probes=$s" else "walk-all"
            idx.searchBatch(qs, 10).count() // per-setting untimed warm pass
            val hits = measured(s"routing batch 50q n=$n shards=$shards $label") {
              idx.searchBatch(qs, 10).collect()
            }
            s -> hits.groupBy(_.getInt(0).toLong).map { case (q, rs) =>
              q -> rs.map(_.getLong(1)).toSeq }
          }
        }.toMap
        // PER-QUERY serving cost — the 100 TB metric: one query, walk-all
        // must scan every (cached) shard partition while the routed probe
        // touches only its s nearest, so aggregate cpu per query stays
        // roughly FLAT as corpus x10 -> shards x10
        for (s <- probes) withProbes(s) {
          val label = if (s > 0) s"probes=$s" else "walk-all"
          idx.scan(qs.head, 10).collect() // warm
          measured(s"routing per-query x10 n=$n shards=$shards $label") {
            qs.take(10).foreach(q => idx.scan(q, 10).collect())
          }
        }
        // TABLE path (the corpus-scale join shape): 200-query relation
        // through the distributed plan against the pin (the zip path) —
        // routing replaces the walk-all explode, so the query relation
        // replicates s ways instead of |shards| ways
        if (shards > 4) {
          val qdf = spark.range(200).select(col("id").as("qid"),
              mkVec((col("id") * 37) % nClusters + 7000000L).as("qvec"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          qdf.count()
          spark.conf.set("spark.ann.graphTableStrategy", "distributed")
          try {
            def tableHits(): Map[Long, Set[Long]] =
              graft.operators.AnnSearch.searchTable(idx, qdf, 10,
                  queryIdCol = Some("qid"))
                .select("qid", "id").collect()
                .groupBy(_.getLong(0)).map { case (q, rs) =>
                  q -> rs.map(_.getLong(1)).toSet }
            tableHits() // warm
            val wAll = measured(s"routing TABLE 200q n=$n shards=$shards walk-all") {
              tableHits()
            }
            val routed = withProbes(4) {
              tableHits() // warm under the routed plan
              measured(s"routing TABLE 200q n=$n shards=$shards probes=4") {
                tableHits()
              }
            }
            val ov = wAll.keys.toSeq.map { q =>
              val w = wAll(q)
              if (w.isEmpty) 1.0
              else w.intersect(routed.getOrElse(q, Set.empty)).size.toDouble / w.size
            }.sum / wAll.size
            println(f"[r15-scale]   TABLE-path recall(routed s=4 of $shards) = $ov%.3f")
          } finally spark.conf.unset("spark.ann.graphTableStrategy")
          qdf.unpersist()
        }
        idx.unpersist(); base.unpersist()
        out
      }
      def overlap(a: Map[Long, Seq[Long]], b: Map[Long, Seq[Long]]): Double =
        a.keys.toSeq.map { q =>
          val x = a(q).toSet; val y = b.getOrElse(q, Seq.empty).toSet
          if (x.isEmpty) 1.0 else x.intersect(y).size.toDouble / x.size
        }.sum / a.size
      // small scale: 100k rows -> 4 shards; large: 1M -> 40 shards
      runScale(4L * perShard, 4, Seq(0))
      val big = runScale(40L * perShard, 40, Seq(0, 10, 4))
      println(f"[r15-scale]   recall(routed s=10 of 40 vs walk-all) = ${overlap(big(0), big(10))}%.3f (floor 0.95)")
      println(f"[r15-scale]   recall(routed s=4 of 40 vs walk-all)  = ${overlap(big(0), big(4))}%.3f")
    }

    // ---- online-insert per-batch floor decomposition ---------------------
    def onlineProfArm(): Unit = {
      val d = 64
      val tmp = java.nio.file.Files.createTempDirectory("graft_r15_oprof").toString
      val mkVec = udf { (id: Long) =>
        val r = new scala.util.Random(id * 2654435761L + 42)
        Array.fill(d)(r.nextFloat())
      }
      val base = spark.range(20000).repartition(cpus.toInt)
        .select(col("id"), mkVec(col("id")).as("vec")).cache()
      base.count()
      def run(label: String, withDeletes: Boolean): Unit = {
        val idx = graft.index.AnnIndexManager.create(spark, s"r15_op_$label", base,
          "id", "vec", "DISKANN",
          Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64"),
          s"$tmp/$label")
        spark.conf.set("spark.ann.onlineInsertMaxRows", "1000")
        spark.conf.set("spark.ann.debugTiming", "true")
        try {
          for (b <- 0 until 5) {
            val lo = 100000L + b * 200
            if (withDeletes && b > 0) idx.delete(Seq(lo - 150, lo - 140, lo - 130))
            measured(s"onlineprof [$label] batch $b (200 rows)") {
              idx.insert(spark.range(lo, lo + 200)
                .select(col("id"), mkVec(col("id")).as("vec")), "id", "vec")
            }
          }
        } finally {
          spark.conf.unset("spark.ann.onlineInsertMaxRows")
          spark.conf.unset("spark.ann.debugTiming")
        }
      }
      run("insert-only", withDeletes = false)
      run("with-deletes", withDeletes = true)
      base.unpersist()
    }

    // ---- the REAL full PSL at UT1 scale -----------------------------------
    def pslArm(): Unit = {
      requireDriverMem(12, "psl")
      val pslPath = "src/test/resources/graft/public_suffix_full.dat"
      val rules = graft.pipeline.UrlOps.SuffixRules.parseFile(pslPath)
      println(s"[r15-scale] full PSL parsed: plain=${rules.plain.size} " +
        s"wildcard=${rules.wildcard.size} exception=${rules.exception.size}")
      require(rules.plain.size + rules.wildcard.size > 9000,
        "expected the real ~9.5k-rule PSL")
      // 4M urls across 200k sites, half .com, half under the multi-part
      // .co.uk suffix (a full-PSL rule the bounded default also knows, but
      // here the REGISTERED-domain keying runs through the full rule set);
      // 5% of sites blocked, blocklist padded to 1.2M entries (UT1 shape)
      val nUrls = 4000000L
      val nSites = 200000L
      val urls = spark.range(nUrls).select(col("id"),
        concat(lit("https://www.site"), (col("id") % nSites),
          when((col("id") % nSites) % 2 === 0, lit(".com")).otherwise(lit(".co.uk")),
          lit("/p"), col("id")).as("url"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      urls.count()
      val blocklist = spark.range(1200000L).select(
        when(col("id") % 20 === 3, concat(lit("site"), col("id"),
          when(col("id") % 2 === 0, lit(".com")).otherwise(lit(".co.uk"))))
          .otherwise(concat(lit("junk"), col("id"), lit(".net"))).as("dom"))
      val expectBlocked = (0L until nSites).count(s => s % 20 == 3) * (nUrls / nSites)
      val out = graft.pipeline.UrlOps.withUrlFilterSignals(urls, "url",
        blocklist = blocklist, blocklistCol = "dom",
        wordWeights = Map("casino" -> 2.0), maxWordScore = 1.0, rules = rules)
      val planChars = org.apache.spark.sql.GraftBridge
        .analyzedPlan(out).toString.length
      val blocked = measured(s"psl url_filter_bl urls=$nUrls bl=1.2M FULL rules") {
        out.agg(sum(when(col("url_blocked"), 1L).otherwise(0L))).head().getLong(0)
      }
      println(s"[r15-scale]   blocked=$blocked expect=$expectBlocked " +
        s"match=${blocked == expectBlocked} plan_chars=$planChars")
      val survivors = measured(s"psl dedupByUrl n=$nUrls") {
        graft.pipeline.UrlOps.dedupByUrl(urls, "url", "id").count()
      }
      println(s"[r15-scale]   dedup survivors=$survivors (expect $nUrls — all urls distinct)")
      val capped = measured(s"psl capPerDomain cap=10 FULL rules") {
        graft.pipeline.UrlOps.capPerDomain(urls, "url", 10, "id", rules).count()
      }
      println(s"[r15-scale]   capped=$capped (expect ${nSites * 10})")
      urls.unpersist()
    }

    println(s"[r15-scale] mode=$mode cpus=$cpus " +
      s"driver_heap_gb=${Runtime.getRuntime.maxMemory() / (1L << 30)}")
    if (mode == "all" || mode == "routing") routingArm()
    if (mode == "all" || mode == "onlineprof") onlineProfArm()
    if (mode == "all" || mode == "psl") pslArm()
    spark.stop()
  }
}
