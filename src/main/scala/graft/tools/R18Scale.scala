package graft.tools

import org.apache.spark.sql.SparkSession

/** r18 evidence arms (VERDICT r17 "Next" #2): run the two-level router at
  * its ADVERTISED scale — 100k shards, d=768 — instead of projecting from
  * the committed 40k/d64 arms. One synthetic-summary fixture (clustered,
  * modes >> shards per the r16 lesson), measuring the full lifecycle:
  *
  *   - cold parallel coarse build (+ the floor-validation ladder outcome)
  *   - router.bin write / digest-validated round-trip read
  *   - 20 incremental patch cycles (the per-online-batch upkeep cost)
  *   - per-query routing latency at serving width (cost-flat claim)
  *   - driver residency: analytic bytes + measured VmRSS
  *
  * Everything is driver-side (the router IS driver state) — no Spark jobs,
  * so wall time is the honest unit here.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R18Scale [mode]"
  * mode: all|router100k|driftcheck
  */
object R18Scale {

  private def clusteredPoint(cluster: Int, rowSeed: Long, d: Int,
                             jitter: Double = 0.2): Array[Float] = {
    val rc = new scala.util.Random(cluster * 9176L + 31)
    val rr = new scala.util.Random(rowSeed)
    Array.tabulate(d)(_ => (rc.nextGaussian() * 3 + jitter * rr.nextGaussian()).toFloat)
  }

  private def rssMb(): Long = {
    val s = scala.io.Source.fromFile("/proc/self/status")
    try s.getLines().find(_.startsWith("VmRSS"))
      .map(_.split("\\s+")(1).toLong / 1024).getOrElse(-1L)
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    // a SparkSession only so the harness matches the other scale tools;
    // every measurement below is driver-side
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "all" || mode == "router100k") router100kArm()
    if (mode == "all" || mode == "driftcheck") driftCheckArm()
    spark.stop()
  }

  /** 20 patch cycles of 20-shard swaps at 100k×d768 (this fixture's
    * churn cap is 1,000, so most cycles CARRY the floor/agreement behind
    * the 8-query spot check; the check can TRIP mid-window and
    * revalidate — the recorded run shows one doing exactly that). The
    * arm then measures the END state's TRUE serving agreement (64 fresh
    * probe points, routed topShards vs the flat ranking — end-to-end
    * through the Router, not the internal ladder) against (a) the
    * last validation reading and (b) a CONTROL fresh rebuild of the same
    * final summary set on the same queries — (b) isolates the
    * patch-accumulation graph-quality cost from probe-distribution
    * shift and from validation staleness. */
  private def driftCheckArm(): Unit = {
    R15Scale.requireDriverMem(20, "driftcheck")
    import graft.index.ShardSummaries.{Router, Summary}
    val d = 768
    val nShards = 100000
    val nSites = nShards / 20
    var sums = Array.tabulate(nShards)(i => Summary(i, 1000L,
      clusteredPoint(i % nSites, i * 7717L + 5, d)))
    var router = Router.build(sums, "l2", coarseThreshold = 256, overscan = 4)
    val co0 = router.coarse.getOrElse(sys.error("no coarse level"))
    println(f"[r18-scale] driftcheck cold: floor=${co0.floor} " +
      f"agreement=${co0.agreement}%.3f churn=${co0.churn}")
    var nextId = nShards
    val rnd = new scala.util.Random(11)
    for (c <- 0 until 20) {
      val (sums2, nextId2) = swapCycle(sums, nextId, nSites, d, rnd)
      sums = sums2; nextId = nextId2
      router = Router.build(sums, "l2", coarseThreshold = 256, overscan = 4,
        base = Some(router))
      if (c % 5 == 4) {
        val co = router.coarse.get
        println(f"[r18-scale]   after ${c + 1}%2d patches: floor=${co.floor} " +
          f"last validation reading=${co.agreement}%.3f churn=${co.churn}")
      }
    }
    val co = router.coarse.get
    // true end-to-end serving agreement: routed vs flat, 64 fresh queries
    val flat = Router.build(sums, "l2", coarseThreshold = Int.MaxValue,
      overscan = 4)
    val qs = Array.tabulate(64)(i =>
      clusteredPoint((i * 101) % nSites, i * 977L + 3, d))
    def serveAgree(r: Router): Double = {
      var hits = 0
      qs.foreach { q =>
        hits += r.topShards(q, 8).toSet
          .intersect(flat.topShards(q, 8).toSet).size
      }
      hits.toDouble / (64 * 8)
    }
    val trueAgree = serveAgree(router)
    println(f"[r18-scale] driftcheck end: last validation=${co.agreement}%.3f " +
      f"TRUE serving agreement=$trueAgree%.3f " +
      f"(delta=${trueAgree - co.agreement}%+.3f, churn=${co.churn} of cap 1000)")
    // CONTROL: a fresh full rebuild of the FINAL summary set on the SAME
    // queries — rebuild-vs-patched isolates the patch-accumulation cost
    val rebuildAgree = serveAgree(
      Router.build(sums, "l2", coarseThreshold = 256, overscan = 4))
    println(f"[r18-scale] driftcheck control: fresh-rebuild serving " +
      f"agreement=$rebuildAgree%.3f on the same queries " +
      f"(patched-vs-rebuild delta=${trueAgree - rebuildAgree}%+.3f — " +
      "the patch-accumulation graph-quality cost)")
  }

  /** One online-batch-shaped mutation of the summary set: ~20 random
    * shards swapped for fresh ids with fresh centroids (shared by the
    * router100k patch cycles and driftcheck so the two arms can never
    * drift apart in shape). Returns (new sums, next free id). */
  private def swapCycle(sums: Array[graft.index.ShardSummaries.Summary],
                        nextId: Int, nSites: Int, d: Int,
                        rnd: scala.util.Random)
      : (Array[graft.index.ShardSummaries.Summary], Int) = {
    import graft.index.ShardSummaries.Summary
    val removeIdx = Array.fill(20)(rnd.nextInt(sums.length)).distinct
    val removed = removeIdx.map(sums(_).shard).toSet
    val added = Array.tabulate(20)(j => Summary(nextId + j, 1000L,
      clusteredPoint((nextId + j) % nSites, (nextId + j) * 7717L + 5, d)))
    ((sums.filterNot(s => removed(s.shard)) ++ added).sortBy(_.shard),
      nextId + 20)
  }

  private def router100kArm(): Unit = {
    R15Scale.requireDriverMem(20, "router100k")
    import graft.index.ShardSummaries
    import graft.index.ShardSummaries.{Router, Summary}
    val d = 768
    val nShards = 100000
    val nSites = nShards / 20 // modes >> shards (r16 lesson)
    val tmp = java.nio.file.Files.createTempDirectory("graft_r18_router").toString

    println(s"[r18-scale] fixture: $nShards summaries d=$d " +
      f"(centroid residency ${nShards.toLong * d * 4 / (1 << 20)}%d MB analytic)")
    val rss0 = rssMb()
    var sums = Array.tabulate(nShards)(i => Summary(i, 1000L,
      clusteredPoint(i % nSites, i * 7717L + 5, d)))
    val rssAfterSums = rssMb()
    println(s"[r18-scale] VmRSS after summaries: ${rssAfterSums} MB (+${rssAfterSums - rss0})")

    def timedMs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = f
      (out, (System.nanoTime() - t0) / 1e6)
    }

    // digest cost (paid once per build/cache check — O(shards × dim))
    val (_, digMs) = timedMs(Router.digest(sums))
    println(f"[r18-scale] digest(100k x d768) = $digMs%.1f ms")

    // ---- cold parallel build + validation ladder + router.bin write ----
    val (r0, buildMs) = timedMs(
      Router.build(sums, "l2", coarseThreshold = 256, overscan = 4,
        cachePath = Some(tmp)))
    val co0 = r0.coarse.getOrElse(sys.error("coarse level not built at 100k"))
    println(f"[r18-scale] COLD parallel build+validate+persist = ${buildMs / 1000}%.2f s " +
      f"(floor=${co0.floor} agreement=${co0.agreement}%.3f servable=${co0.servable} " +
      s"beamFloorBase=${Router.beamFloor(nShards)})")
    val binBytes = java.nio.file.Files.size(Router.cacheFilePath(tmp))
    println(f"[r18-scale] router.bin size = ${binBytes / (1 << 20)}%d MB")

    // ---- digest-validated round-trip read (fresh-driver cold start) ----
    val (r1, readMs) = timedMs(
      Router.build(sums, "l2", coarseThreshold = 256, overscan = 4,
        cachePath = Some(tmp)))
    require(r1.coarse.isDefined, "round-trip lost the coarse level")
    println(f"[r18-scale] router.bin round-trip read = $readMs%.1f ms")

    // ---- 20 incremental patch cycles (per-online-batch upkeep) ---------
    // each cycle: 20 shards rewritten copy-on-write (20 removed ids, 20
    // fresh ids with fresh centroids) — the r17 upkeep arm's shape at 25x
    // the shard count and 12x the dimension
    var prev = r1
    var nextId = nShards
    val rnd = new scala.util.Random(7)
    val patchMs = new Array[Double](20)
    for (c <- 0 until 20) {
      val (sums2, nextId2) = swapCycle(sums, nextId, nSites, d, rnd)
      sums = sums2; nextId = nextId2
      val (r, ms) = timedMs(
        Router.build(sums, "l2", coarseThreshold = 256, overscan = 4,
          cachePath = Some(tmp), base = Some(prev)))
      require(r.coarse.isDefined, s"cycle $c lost the coarse level")
      patchMs(c) = ms
      prev = r
    }
    val sorted = patchMs.sorted
    println(f"[r18-scale] patch cycles (20 x 20-shard swap): " +
      f"avg=${patchMs.sum / 20}%.1f ms p50=${sorted(10)}%.1f ms max=${sorted(19)}%.1f ms " +
      f"(floor=${prev.coarse.get.floor} agreement=${prev.coarse.get.agreement}%.3f)")

    // ---- per-query routing latency at serving width --------------------
    val qs = Array.tabulate(100)(i => clusteredPoint(i % nSites, i * 131L + 9, d))
    qs.take(10).foreach(q => prev.topShards(q, 32)) // warm
    val (_, routeMs) = timedMs(qs.foreach(q => prev.topShards(q, 32)))
    // flat-scan comparator: what each query would pay without the coarse level
    val flat = new Router(prev.shards, prev.centroids, "l2", None, 4, 0L)
    qs.take(10).foreach(q => flat.topShards(q, 32))
    val (_, flatMs) = timedMs(qs.foreach(q => flat.topShards(q, 32)))
    println(f"[r18-scale] routing 100q s=32: coarse=${routeMs / 100}%.2f ms/q " +
      f"flat=${flatMs / 100}%.2f ms/q (x${flatMs / routeMs}%.1f)")

    // ---- full-rebuild comparator (what a >n/8 diff or dilution pays) ----
    val (rFull, fullMs) = timedMs(
      Router.build(sums, "l2", coarseThreshold = 256, overscan = 4))
    require(rFull.coarse.isDefined)
    println(f"[r18-scale] full parallel rebuild (no base, no cache) = ${fullMs / 1000}%.2f s")

    val rssEnd = rssMb()
    println(s"[r18-scale] VmRSS end: ${rssEnd} MB (+${rssEnd - rss0} over start; " +
      f"analytic: centroids ${nShards.toLong * d * 4 / (1 << 20)}%d MB + " +
      f"graph ~${(nShards.toLong * 32 * 4 + nShards * 4L) / (1 << 20)}%d MB, " +
      "x2 while a patched generation and its base coexist)")
  }
}
