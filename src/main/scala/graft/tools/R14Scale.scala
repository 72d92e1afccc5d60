package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-14 work (appended to SCALE.md):
  *
  *  - UT1-scale URL blocklist: `withUrlFilterSignals` with a ≥1M-domain
  *    blocklist DATAFRAME (the r13 `weak`: an `isin` literal of that size
  *    is a multi-million-node expression tree serialized into every task;
  *    the overload is one broadcast hash relation). Reports wall, shuffle
  *    volume, the physical-plan SIZE (bounded — the literal path's plan
  *    grows with the list), and verifies the blocked count arithmetically.
  *  - `dedupByUrl` decade (the C4 front door — first operator run on any
  *    real crawl): 10× rows at ~3 copies per normalized url; wall should
  *    track the data ratio (normalize is row-local; the grouped top-k cut
  *    shuffles survivors).
  *  - Hard-negative mining with an ANN first stage at refresh scale:
  *    FLAT exact vs IVF candidate fetch on a 1M-vector corpus — per-query
  *    cost drop and the negative-set overlap vs the FLAT-mined truth
  *    (approximation only costs candidate-pool recall: the exact re-score
  *    keeps every surviving candidate exactly ranked).
  *  - Audio fingerprint micro-decade: clips/second of `audioFingerprint64`
  *    after the multiplyHigh rewrite (allocation-free bit compare).
  *  - Online graph insert vs delta shards: the same CDC micro-batch stream
  *    through both mutation paths — shard count, mutation wall, bytes
  *    written (the online path's write amplification), search wall after
  *    the stream, and an exhaustive-beam exactness anchor across paths.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R14Scale [mode]"
  * mode: all|urlblock|urldedup|negmine|audio|online
  */
object R14Scale {
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
    var rep = 0

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val outputBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          outputBytes.addAndGet(
            s.stageInfo.taskMetrics.outputMetrics.bytesWritten)
        }
      })
    def measured[T](label: String)(f: => T): T = {
      Thread.sleep(500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val mb = (shuffleBytes.get() - b0) / 1e6
      println(f"[r14-scale] $label%-46s wall=$wall%8.2f s shuffle_write=$mb%10.2f MB")
      out
    }

    // ---- UT1-scale blocklist through the DataFrame overload -------------
    // 4M urls over 200k registered domains, 5% of domains blocked; the
    // blocklist carries those 10k real hits padded to 1.2M entries with
    // never-matching junk — the UT1 shape (a huge curated list, small hit
    // rate). Blocked rows are arithmetic in the fixture: site%20==3.
    def urlBlockArm(): Unit = {
      val nUrls = 4000000L
      val nDomains = 200000L
      val nBlockPad = 1200000L
      val urls = spark.range(nUrls)
        .select(col("id"), concat(lit("https://www.d"), (col("id") % nDomains),
          lit(".com/p"), col("id"), lit("?x=1")).as("url"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      urls.count()
      val blocklist = spark.range(nBlockPad)
        .select(when(col("id") % 20 === 3, concat(lit("d"), col("id"), lit(".com")))
          .otherwise(concat(lit("junk"), col("id"), lit(".net"))).as("dom"))
      // ids ≥ nDomains never match, so real hits = domains with id%20==3
      // and id < nDomains → urls blocked where (id % nDomains) % 20 == 3
      val expectBlocked = (0L until nDomains).count(d => d % 20 == 3) *
        (nUrls / nDomains)
      val out = graft.pipeline.UrlOps.withUrlFilterSignals(urls, "url",
        blocklist = blocklist, blocklistCol = "dom",
        wordWeights = Map("casino" -> 2.0), maxWordScore = 1.0)
      val planChars = org.apache.spark.sql.GraftBridge
        .analyzedPlan(out).toString.length
      val blocked = measured(s"url_filter_df urls=$nUrls blocklist=$nBlockPad") {
        out.agg(sum(when(col("url_blocked"), 1L).otherwise(0L))).head().getLong(0)
      }
      println(s"[r14-scale]   blocked=$blocked expect=$expectBlocked " +
        s"match=${blocked == expectBlocked} plan_chars=$planChars (bounded — " +
        "an isin literal at this size is ~25 MB of expression tree)")
      urls.unpersist()
    }

    // ---- dedupByUrl decade ----------------------------------------------
    // each normalized url appears ~3x under different messiness (tracking
    // param, uppercase host, fragment) — survivors = n/3, keep-oldest
    def urlDedupArm(nBase: Int): Unit = {
      // the 20M leg holds ~4 GB of persisted fixture — fail fast instead
      // of OOMing mid-run at the forked JVM's default 8g (r15 guard)
      if (nBase >= 2000000) R15Scale.requireDriverMem(24, "urldedup")
      def urlsOf(n: Long) = spark.range(n).select(col("id"),
        concat(lit("https://"),
          when(col("id") % 3 === 1, lit("WWW.")).otherwise(lit("www.")),
          lit("d"), (col("id") % (n / 3)), lit(".com/page"),
          when(col("id") % 3 === 0, lit("?utm_source=x"))
            .when(col("id") % 3 === 2, lit("#frag")).otherwise(lit("")))
          .as("url"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      for (n <- Seq(nBase.toLong, nBase * 10L)) {
        val u = urlsOf(n); u.count()
        val survivors = measured(s"dedup_by_url n=$n") {
          graft.pipeline.UrlOps.dedupByUrl(u, "url", "id").count()
        }
        println(s"[r14-scale]   n=$n survivors=$survivors (expect ${n / 3}, " +
          s"match=${survivors == n / 3})")
        u.unpersist()
      }
    }

    // ---- hard-negative mining: ANN first stage at refresh scale ----------
    // CLUSTERED 1M-vector corpus (the retrieval-corpus shape — smooth
    // uniform fixtures make every staged filter read as broken; r11
    // lesson): 10k clusters × 100 docs, d=64. Queries are fresh noise draws
    // around distinct centroids; the positive is each query's own cluster
    // seed. FLAT exact fetch vs IVF(nlist≈√n) candidate fetch, nprobe 8/16:
    // per-query wall and the overlap of the mined negative sets (the ANN
    // stage only gates CANDIDATE recall — survivors re-score exactly).
    def negMineArm(): Unit = {
      val d = 64
      val nClusters = 10000
      val perCluster = 100
      val n = nClusters * perCluster
      val mkVec = udf { (id: Long) =>
        val c = (id % nClusters).toInt
        val rc = new scala.util.Random(c * 9176L + 31)
        val rd = new scala.util.Random(id * 2654435761L + 13)
        Array.tabulate(d)(_ => (rc.nextGaussian() + 0.4 * rd.nextGaussian()).toFloat)
      }
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_r14_negmine").toString
      val nPairs = 5000
      // query qi sits near cluster (qi*2)%nClusters; its labeled positive
      // is that cluster's id-qi-congruent member (vector id = cluster index
      // mod-class representative: id % nClusters == cluster, take the
      // smallest such id ≥ 0 → id = cluster)
      val pairs = spark.range(nPairs)
        .select(col("id").as("qid"),
          mkVec((col("id") * 2) % nClusters + lit(n.toLong * 7)).as("qvec"),
          ((col("id") * 2) % nClusters).as("pos_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      // mkVec(id) clusters on id % nClusters, so id = c + 7n*... wait: the
      // qvec seed id above is ≡ (qi*2) mod nClusters when n % nClusters == 0
      // (n = nClusters*perCluster → 7n ≡ 0) — same cluster, fresh noise.
      def mineWith(idxKind: String, params: Map[String, String],
                   searchParam: Int, label: String): Map[Long, Set[Long]] = {
        rep += 1
        val idx = graft.index.AnnIndexManager.create(spark, s"r14_nm_$rep",
          base, "id", "vec", idxKind, params, s"$tmp/i$rep")
        idx.persist()
        val got = measured(label) {
          graft.pipeline.NegativeMining.mineHardNegatives(idx, pairs,
            "qid", "qvec", "pos_id", base, "id", "vec", k = 8,
            overfetch = 2, searchParam = searchParam).collect()
        }
        idx.unpersist()
        got.groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
      }
      val flat = mineWith("FLAT", Map("metric" -> "l2"), -1,
        s"mine_negatives FLAT pairs=$nPairs corpus=$n")
      val nlist = math.max(64, math.sqrt(n.toDouble).toInt)
      for (nprobe <- Seq(8, 16)) {
        val ivf = mineWith("IVF",
          Map("metric" -> "l2", "nlist" -> nlist.toString), nprobe,
          s"mine_negatives IVF nlist=$nlist nprobe=$nprobe pairs=$nPairs")
        // keys is a SET — per-query overlaps must map through a Seq or
        // identical values collapse before the mean
        val overlap = flat.keys.toSeq.map { q =>
          val f = flat(q); val i = ivf.getOrElse(q, Set.empty)
          if (f.isEmpty) 1.0 else f.intersect(i).size.toDouble / f.size
        }.sum / flat.size
        println(f"[r14-scale]   IVF nprobe=$nprobe negative-overlap vs FLAT = $overlap%.3f")
      }
      pairs.unpersist(); base.unpersist()
    }

    // ---- audio fingerprint micro-decade ----------------------------------
    // full WAV round-trip (encode → container parse → fingerprint) on 1s
    // 8kHz clips, 10× clip counts — the multiplyHigh rewrite's law check
    def audioArm(): Unit = {
      val sr = 8000
      val mkWav = udf { (id: Long) =>
        val r = new scala.util.Random(id * 6364136223846793005L + 23)
        val samples = Array.tabulate(sr) { t =>
          (math.sin(2 * math.Pi * (200 + (id % 40) * 10) * t / sr) * 12000 +
            r.nextGaussian() * 800).toShort
        }
        graft.pipeline.MediaCodecs.encodeWavPcm16(
          graft.pipeline.MediaCodecs.AudioData(sr, 1, samples))
      }
      for (n <- Seq(20000L, 200000L)) {
        val clips = spark.range(n)
          .select(col("id"), mkWav(col("id")).as("payload"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        clips.count()
        def pass() = graft.pipeline.Multimodal.withAudioFingerprints(clips)
          .agg(count(col("afp64"))).head()
        pass() // untimed warmup: JIT/codegen must not land in the small decade
        measured(s"audio_fingerprint64 n=$n")(pass())
        clips.unpersist()
      }
    }

    // ---- online graph insert vs delta shards ------------------------------
    // One CDC stream, both mutation paths. The trade being measured: the
    // online path rewrites ~one existing shard per micro-batch (write
    // amplification, but shard count stays flat and no compaction debt);
    // the delta path appends a tiny shard per batch (cheap writes, but the
    // shard set fragments and per-task search cost grows until someone
    // compacts). Both serve fresh rows immediately and exactly.
    def onlineArm(): Unit = {
      val d = 128
      val n = 150000L // → 2 shards at the n·d build budget
      val batches = 10
      val bs = 1000L
      val mkVec = udf { (id: Long) =>
        val r = new scala.util.Random(id * 6364136223846793005L + 7)
        Array.fill(d)(r.nextFloat() * 10f)
      }
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_r14_online").toString
      def dirBytes(p: String): Long = {
        val root = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      }
      val qs = Seq.tabulate(50) { i =>
        val r = new scala.util.Random(i * 104729L + 3)
        Array.fill(d)(r.nextFloat() * 10f)
      }
      def run(label: String, online: Boolean,
              engine: String = "DISKANN"): Seq[Long] = {
        if (online) spark.conf.set("spark.ann.onlineInsertMaxRows", bs.toString)
        else spark.conf.unset("spark.ann.onlineInsertMaxRows")
        val params =
          if (engine == "HNSW") Map("metric" -> "l2", "hnsw_m" -> "16")
          else Map("metric" -> "l2", "max_degree" -> "32",
            "build_complexity" -> "64")
        val idx = measured(s"online-arm [$label] create n=$n d=$d") {
          graft.index.AnnIndexManager.create(spark, s"r14_ol_$label", base,
            "id", "vec", engine, params, s"$tmp/$label")
        }
        val b0 = dirBytes(s"$tmp/$label/data")
        val w0 = outputBytes.get()
        measured(s"online-arm [$label] ${batches}x$bs inserts") {
          for (b <- 0 until batches)
            idx.insert(spark.range(n + b * bs, n + (b + 1) * bs)
              .select(col("id"), mkVec(col("id")).as("vec")), "id", "vec")
        }
        // write amplification = task output bytes (each online batch
        // rewrites ~one shard); retained = disk delta AFTER the publish
        // reclaims the swapped-out pre-rewrite dirs
        val writtenMb = (outputBytes.get() - w0) / 1e6
        val retainedMb = (dirBytes(s"$tmp/$label/data") - b0) / 1e6
        println(f"[r14-scale]   [$label] shards=${idx.meta.param("shards", 0)} " +
          f"bytes_written=$writtenMb%.1f MB bytes_retained=$retainedMb%.1f MB")
        idx.persist()
        measured(s"online-arm [$label] searchBatch 50q warm") {
          idx.searchBatch(qs, 10).count() // untimed pin happens here
          idx.searchBatch(qs, 10).count()
        }
        // graph QUALITY at a realistic beam: an online-grown graph must
        // hold the same recall as the delta layout (Algorithm 3 gives the
        // same contract either way; this measures it, not assumes it)
        val rec = graft.operators.Recall.meanRecall(idx, qs, 10, searchParam = 64)
        println(f"[r14-scale]   [$label] recall@10 beam=64: $rec%.3f")
        val anchor = idx.scan(qs.head, 10, searchParam = 200000)
          .collect().map(_.getLong(0)).toSeq
        idx.unpersist()
        anchor
      }
      val aDelta = run("delta", online = false)
      val aOnline = run("online", online = true)
      println(s"[r14-scale]   exhaustive top-10 equal across paths: " +
        s"${aDelta == aOnline} ($aDelta)")
      // the second graph engine through the same online stream: layered
      // insert cost + the same exhaustive-exactness anchor
      val aHnsw = run("hnsw-online", online = true, engine = "HNSW")
      println(s"[r14-scale]   HNSW exhaustive top-10 equal to DISKANN paths: " +
        s"${aHnsw == aDelta}")
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
      base.unpersist()
    }

    println(s"[r14-scale] mode=$mode cpus=$cpus")
    if (mode == "all" || mode == "urlblock") urlBlockArm()
    if (mode == "all" || mode == "urldedup") urlDedupArm(2000000)
    if (mode == "all" || mode == "negmine") negMineArm()
    if (mode == "all" || mode == "audio") audioArm()
    if (mode == "all" || mode == "online") onlineArm()
    spark.stop()
  }
}
