package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the round-13 hardening work (appended to SCALE.md):
  *
  *  - ExactSubstr self-sizing: the n=3M point that filled the container's
  *    disk in r12 (fixed 32 shuffle partitions → reducer sort-spill) must
  *    COMPLETE now that the position-pass exchange sizes itself from the
  *    measured char volume. Reports the computed partition count, wall,
  *    and the span/cut counts (linear-in-n expectations).
  *  - Grouped heavy hitters memory bound: ≥10k groups × phi=1e-3 (k=1000)
  *    pushes groups×k far past the per-task counter budget, forcing the
  *    co-located (repartition+sort, single-resident-summary) path; the
  *    result is verified EXACT against the naive relational plan, and the
  *    shuffle-volume trade of the two paths is measured.
  *  - Matryoshka serving recall on a CLUSTERED fixture (the r11 lesson:
  *    smooth-random fixtures make every coarse-to-fine stage read as
  *    broken): recall@10 at d'∈{64,128} of d=768, overfetch∈{2,4},
  *    100 docs per cluster, energy-decaying dims (the MRL shape).
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R13HardeningScale [mode] [nSubstr] [nHH]"
  * mode: all|substr|hhgroups|mrl|negmine
  */
object R13HardeningScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val mode = args.headOption.getOrElse("all")
    val nSubstr = if (args.length > 1) args(1).toInt else 3000000
    val nHH = if (args.length > 2) args(2).toInt else 20000000

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def measured[T](label: String)(f: => T): T = {
      Thread.sleep(500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val mb = (shuffleBytes.get() - b0) / 1e6
      println(f"[r13-scale] $label%-44s wall=$wall%8.2f s shuffle_write=$mb%10.2f MB")
      out
    }

    // ---- ExactSubstr at the r12 kill point -----------------------------
    // same fixture family as R12OpsScale: ~40 words/doc, 5% of docs carry
    // one of 20 shared boilerplate blocks
    val mkText = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 17)
      val body = Array.fill(36)(s"w${r.nextInt(2000)}u${id % 97}").mkString(" ")
      if (id % 20 == 7)
        body.substring(0, body.length / 2) +
          s" shared boilerplate block number ${(id / 20) % 20} terms apply " +
          body.substring(body.length / 2)
      else body
    }
    def substrArm(n: Int): Unit = {
      val c = spark.range(n).repartition(cpus.toInt)
        .select(col("id").as("doc_id"), mkText(col("id")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val chars = c.agg(sum(length(col("text")))).head().getLong(0)
      val parts = math.ceil(chars * 24.0 / (256L << 20)).toLong
      println(s"[r13-scale] substr n=$n total_chars=$chars → self-sized position partitions ≈ max(32, $parts)")
      val agg = measured(s"dedup_substr_selfsized n=$n") {
        graft.pipeline.SubstrDedup
          .dedupSubstrings(c, "doc_id", "text", minLength = 40)
          .agg(sum(col("n_chars_cut")), sum(col("n_spans"))).head()
      }
      println(s"[r13-scale]   n=$n chars_cut=${agg.getLong(0)} spans=${agg.getLong(1)} (expect spans=n/20)")
      c.unpersist()
    }

    // ---- grouped heavy hitters over many groups ------------------------
    // 12k groups; each group's items: 5 head items (heavy) + a long tail
    // unique to the row — per-group vocab grows with rows/group, and
    // groups×k = 12k×1000 = 12M counters ≫ the 2^21 per-task budget, so
    // the operator MUST take the co-located path to stay bounded.
    def hhGroupsArm(n: Int, groups: Int): Unit = {
      val mkRow = udf { (id: Long) =>
        val g = (id % groups).toInt
        val r = new scala.util.Random(id * 6364136223846793005L + 11)
        val item = if (r.nextInt(10) < 4) s"head${r.nextInt(5)}" else s"tail${id}"
        (s"g$g", item)
      }
      val rows = spark.range(n).repartition(cpus.toInt)
        .select(mkRow(col("id")).as("r"))
        .select(col("r._1").as("grp"), col("r._2").as("item"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rows.count()
      val phi = 1e-3
      val k = math.ceil(1 / phi).toLong
      println(s"[r13-scale] hhgroups n=$n groups=$groups phi=$phi: groups×k=${groups * k} vs budget ${1 << 21} → co-located path")
      val mg = measured(s"hh_by_group_colocated n=$n g=$groups") {
        graft.pipeline.HeavyHitters
          .frequentItemsByGroup(rows, "grp", "item", phi, expectedGroups = groups.toLong)
          .agg(count(lit(1)), coalesce(sum("cnt"), lit(0L))).head()
      }
      val naive = measured(s"hh_by_group_naive_groupby n=$n g=$groups") {
        val totals = rows.groupBy("grp").agg(count(lit(1)).as("__n"))
          .select(col("grp"),
            greatest(lit(1L), ceil(col("__n") * phi).cast("long")).as("__thr"))
        rows.groupBy("grp", "item").agg(count(lit(1)).as("cnt"))
          .join(totals, Seq("grp")).filter(col("cnt") >= col("__thr"))
          .agg(count(lit(1)), coalesce(sum("cnt"), lit(0L))).head()
      }
      println(s"[r13-scale]   mg=(rows=${mg.getLong(0)}, sum=${mg.getLong(1)}) naive=(rows=${naive.getLong(0)}, sum=${naive.getLong(1)}) exact_match=${mg == naive}")
      rows.unpersist()
    }

    // ---- Matryoshka serving recall on a clustered fixture --------------
    // MRL-shaped corpus: 1000 clusters × 100 docs, d=768, per-dim energy
    // decaying as 1/sqrt(1+j/32) (prefix carries most of the signal — what
    // matryoshka training produces), doc noise at 0.35× the same decay.
    def mrlArm(): Unit = {
      val d = 768
      val nClusters = 1000
      val perCluster = 100
      val n = nClusters * perCluster
      val mkVec = udf { (id: Long) =>
        val c = (id % nClusters).toInt
        val rc = new scala.util.Random(c * 9176L + 3)
        val rd = new scala.util.Random(id * 2654435761L + 7)
        Array.tabulate(d) { j =>
          val decay = 1.0 / math.sqrt(1.0 + j / 32.0)
          ((rc.nextGaussian() + 0.35 * rd.nextGaussian()) * decay).toFloat
        }
      }
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_r13_mrl").toString
      // queries: new noise draws around 50 distinct cluster centroids
      val qs = (0 until 50).map { qi =>
        val c = qi * (nClusters / 50)
        val rc = new scala.util.Random(c * 9176L + 3)
        val rq = new scala.util.Random(qi * 7919L + 1)
        (qi.toLong, Array.tabulate(d) { j =>
          val decay = 1.0 / math.sqrt(1.0 + j / 32.0)
          ((rc.nextGaussian() + 0.35 * rq.nextGaussian()) * decay).toFloat
        })
      }
      // rc.nextGaussian() above replays the centroid stream only if drawn in
      // the same order — rebuild per query to keep draws aligned
      val qdf = qs.toDF("qid", "qvec")
      val fullIdx = graft.index.AnnIndexManager.create(spark, "r13_mrl_full",
        base, "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/full")
      val truth = graft.operators.AnnSearch.searchTable(fullIdx, qdf, 10,
          queryVecCol = Some("qvec"), queryIdCol = Some("qid"))
        .select(col("qid"), col("id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      for (dp <- Seq(64, 128)) {
        val idx = graft.operators.Matryoshka.createPrefixIndex(spark,
          s"r13_mrl_$dp", base, "id", "embedding", dp, "FLAT",
          Map("metric" -> "l2"), s"$tmp/p$dp")
        for (of <- Seq(2, 4)) {
          val got = measured(s"mrl_rerank d'=$dp overfetch=$of (50q, n=$n)") {
            graft.operators.Matryoshka.searchRerankTable(idx, qdf, base, "id",
                "embedding", k = 10, overfetch = of, queryIdCol = "qid",
                queryVecCol = "qvec")
              .select(col("qid"), col("id")).collect()
          }.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
          val recall = qs.map { case (q, _) =>
            got.getOrElse(q, Set.empty).intersect(truth(q)).size / 10.0
          }.sum / qs.size
          println(f"[r13-scale]   mrl recall@10 d'=$dp overfetch=$of = $recall%.3f")
        }
      }
      base.unpersist()
    }

    // ---- hard-negative mining: linear in pairs, corpus-bounded fetch ----
    // 500k-vector corpus, FLAT l2; pairs at two decades. The claim is the
    // pair-bounded shape: wall grows ~linearly with the pair count (the
    // index scan dominates and is itself per-query), and shuffle volume is
    // candidates, not corpus.
    def negMineArm(): Unit = {
      val d = 64
      val n = 500000
      val mkVec = udf { (id: Long) =>
        val r = new scala.util.Random(id * 6364136223846793005L + 97)
        Array.tabulate(d)(_ => r.nextFloat())
      }
      val base = spark.range(n).select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_r13_negmine").toString
      val idx = graft.index.AnnIndexManager.create(spark, "r13_negmine", base,
        "id", "vec", "FLAT", Map("metric" -> "l2"), s"$tmp/flat")
      for (nPairs <- Seq(1000, 10000)) {
        val pairs = spark.range(nPairs)
          .select(col("id").as("qid"), mkVec(col("id") + 7777777L).as("qvec"),
            (col("id") % n).as("pos_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pairs.count()
        // margin 0: on smooth-random vectors a random positive is farther
        // than every near candidate (concentration of measure — the r11
        // smooth-fixture lesson), so margin 1.0 would denoise the output
        // to ~nothing and time an empty tail. Clustered data behaves
        // differently; the margin semantics are oracle-verified at sf0.01.
        val rows = measured(s"mine_negatives pairs=$nPairs corpus=$n") {
          graft.pipeline.NegativeMining.mineHardNegatives(idx, pairs,
            "qid", "qvec", "pos_id", base, "id", "vec", k = 8,
            overfetch = 2).count()
        }
        println(s"[r13-scale]   pairs=$nPairs mined_rows=$rows (<= pairs*k)")
        pairs.unpersist()
      }
      base.unpersist()
    }

    println(s"[r13-scale] mode=$mode nSubstr=$nSubstr nHH=$nHH cpus=$cpus")
    if (mode == "all" || mode == "substr") substrArm(nSubstr)
    if (mode == "all" || mode == "hhgroups") hhGroupsArm(nHH, 12000)
    if (mode == "all" || mode == "mrl") mrlArm()
    if (mode == "all" || mode == "negmine") negMineArm()
    spark.stop()
  }
}
