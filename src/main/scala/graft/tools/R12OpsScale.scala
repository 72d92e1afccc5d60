package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the round-12 operators (appended to SCALE.md):
  *
  *  - ExactSubstr span dedup: the claim is linear growth — the position
  *    pass is O(total chars) rows of 3 longs, the candidate/verify stages
  *    are bounded by true-duplicate volume, and nothing is quadratic.
  *    Measured at n/10 and n on a corpus with injected cross-doc
  *    boilerplate (~5% of docs carry one of 20 shared blocks).
  *  - Heavy hitters: the claim is that MG+recount never shuffles the
  *    vocabulary. Measured against the naive groupBy(token).count full
  *    shuffle on a corpus whose vocabulary GROWS with n (a unique-id long
  *    tail — the regime where the naive plan's shuffle volume explodes and
  *    MG's stays k·P).
  *  - Distributed Lloyd: the claim is per-round linearity (one partial-sum
  *    pass over the data) and full-data refinement beating the sampled
  *    pilot's objective on the same k. Measured train cost at n/10 and n,
  *    d=64, k=100, 5 rounds, plus clusteringCost pilot-vs-full.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.R12OpsScale [nDocs] [nVecs]"
  */
object R12OpsScale {
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

    val nDocs = args.headOption.map(_.toInt).getOrElse(300000)
    val nVecs = if (args.length > 1) args(1).toInt else 1000000

    // total shuffle-WRITE bytes across all stages — the volume law the
    // heavy-hitter sketch exists for (wall time at local[32] hides it:
    // an in-memory exchange is nearly free; a 1000-executor network one
    // is not)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def measureShuffle(label: String)(f: => Unit): Unit = {
      Thread.sleep(500) // drain listener bus
      val before = shuffleBytes.get()
      f
      Thread.sleep(500)
      val mb = (shuffleBytes.get() - before) / 1e6
      println(f"[r12-scale] $label%-38s shuffle_write=$mb%10.2f MB")
    }

    def timeIt(label: String, reps: Int = 2)(f: => Long): Double = {
      f // warm (untimed)
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[r12-scale] $label%-38s best=$best%8.2f s")
      best
    }

    // ---- corpora ------------------------------------------------------
    // ~40 words/doc; 5% of docs embed one of 20 shared boilerplate blocks
    // mid-text (the cross-doc duplicated-span population); the rest is a
    // unique-id long tail so the vocabulary grows with n
    val mkText = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 17)
      val body = Array.fill(36)(s"w${r.nextInt(2000)}u${id % 97}").mkString(" ")
      if (id % 20 == 7)
        body.substring(0, body.length / 2) +
          s" shared boilerplate block number ${(id / 20) % 20} terms apply " +
          body.substring(body.length / 2)
      else body
    }
    def corpus(n: Int): DataFrame =
      spark.range(n).repartition(cpus.toInt)
        .select(col("id").as("doc_id"), mkText(col("id")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- ExactSubstr span dedup --------------------------------------
    def substrArm(n: Int): Unit = {
      val c = corpus(n)
      c.agg(sum(length(col("text")))).head() // materialize the persist
      val t = timeIt(s"dedup_substr n=$n") {
        graft.pipeline.SubstrDedup
          .dedupSubstrings(c, "doc_id", "text", minLength = 40)
          .agg(sum(length(col("text_clean"))), sum(col("n_chars_cut")),
            sum(col("n_spans"))).head().getLong(2)
      }
      val cut = graft.pipeline.SubstrDedup
        .dedupSubstrings(c, "doc_id", "text", minLength = 40)
        .agg(sum(col("n_chars_cut")), sum(col("n_spans"))).head()
      println(s"[r12-scale]   n=$n chars_cut=${cut.getLong(0)} spans=${cut.getLong(1)}")
      c.unpersist()
    }

    // ---- heavy hitters vs naive full shuffle -------------------------
    // the heavy-hitter corpus has a vocabulary that GROWS with n (30 of 36
    // words per doc are globally unique; 6 draw from a 50-word head) — the
    // regime the sketch exists for: the naive plan's exchange carries ~n
    // distinct keys, MG's carries at most ceil(1/phi)·P
    val mkTextHH = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 29)
      (Array.tabulate(30)(i => s"u${id}x$i") ++
        Array.fill(6)(s"h${r.nextInt(50)}")).mkString(" ")
    }
    def hhArm(n: Int): Unit = {
      val c = spark.range(n).repartition(cpus.toInt)
        .select(col("id").as("doc_id"), mkTextHH(col("id")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val toks = c.select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      c.agg(sum(length(col("text")))).head()
      timeIt(s"heavy_hitters_mg n=$n") {
        graft.pipeline.HeavyHitters.frequentItems(toks, "token", phi = 1e-4)
          .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
      }
      timeIt(s"heavy_hitters_naive_groupby n=$n") {
        val total = toks.count()
        val thr = math.max(1L, math.ceil(1e-4 * total).toLong)
        toks.groupBy("token").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= thr)
          .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
      }
      measureShuffle(s"  mg shuffle n=$n") {
        graft.pipeline.HeavyHitters.frequentItems(toks, "token", phi = 1e-4)
          .agg(coalesce(sum("cnt"), lit(0L))).head()
      }
      measureShuffle(s"  naive shuffle n=$n") {
        toks.groupBy("token").agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum("cnt"), lit(0L))).head()
      }
      val distinct = toks.select(countDistinct("token")).head().getLong(0)
      println(s"[r12-scale]   n=$n distinct_tokens=$distinct")
      c.unpersist()
    }

    // ---- distributed Lloyd -------------------------------------------
    def kmeansArm(n: Int): Unit = {
      val mkVec = udf { (id: Long) =>
        val r = new scala.util.Random(id * 6364136223846793005L + 1442695040888963407L)
        val center = (id % 50).toInt
        Array.tabulate(64)(j => (if (j == center) 8f else 0f) +
          (r.nextFloat() - 0.5f) * 2f)
      }
      val vecs = spark.range(n).repartition(cpus.toInt)
        .select(col("id"), mkVec(col("id")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      timeIt(s"kmeans_full_train n=$n k=50 it=5", reps = 2) {
        // tol=0 pins the round count to maxIter so the decades compare the
        // per-round law, not early-stop luck
        graft.pipeline.CorpusPipeline.trainClusterCentroidsDistributed(
          vecs, "v", k = 50, maxIter = 5, initSampleCap = 65536,
          tol = 0.0).length.toLong
      }
      val pilot = graft.pipeline.CorpusPipeline.trainClusterCentroids(
        vecs, "v", k = 50, maxIter = 10, sampleCap = 2048)
      val full = graft.pipeline.CorpusPipeline.trainClusterCentroidsDistributed(
        vecs, "v", k = 50, maxIter = 5, initSampleCap = 2048)
      val cp = graft.pipeline.CorpusPipeline.clusteringCost(vecs, "v", pilot)
      val cf = graft.pipeline.CorpusPipeline.clusteringCost(vecs, "v", full)
      println(f"[r12-scale]   n=$n cost pilot(2k sample)=$cp%.4f full=$cf%.4f ratio=${cp / cf}%.3f")
      vecs.unpersist()
    }

    val mode = if (args.length > 2) args(2) else "all" // all|substr|hh|kmeans
    println(s"[r12-scale] nDocs=$nDocs nVecs=$nVecs cpus=$cpus mode=$mode")
    if (mode == "all" || mode == "substr") { substrArm(nDocs / 10); substrArm(nDocs) }
    if (mode == "all" || mode == "hh") { hhArm(nDocs / 10); hhArm(nDocs) }
    if (mode == "all" || mode == "kmeans") { kmeansArm(nVecs / 10); kmeansArm(nVecs) }
    spark.stop()
  }
}
