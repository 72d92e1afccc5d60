package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the batch-hybrid max-score pruning
  * (`spark.ann.bm25MaxScorePrune`): builds the ScaleSmoke corpus shape
  * (zipf-ish vocab draws, hot head terms) at the given n, pins the FTS
  * postings + an IVF index, then times `hybrid_table_50q` with pruning on
  * vs off and asserts the two result sets are IDENTICAL (the pruning is
  * rank-safe by construction; this harness re-proves it at scale while
  * measuring the win).
  *
  * Usage: runMain graft.tools.HybridPruneAB [n] [reps]
  */
object HybridPruneAB {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    // optional: head-df fraction for the prune=on arm (default = conf default)
    val headFrac = args.drop(2).headOption
    val vocab = 10000

    // same generators as ScaleSmoke (zipf-ish: squared uniform concentrates
    // token mass on low word ids — w0..w99 carry ~10% of all tokens)
    val genDoc = udf { (id: Long) =>
      val rs = new scala.util.Random(id * 6364136223846793005L + 1442695040888963407L)
      val len = 50 + rs.nextInt(150)
      Seq.fill(len)("w" + { val u = rs.nextDouble(); (u * u * vocab).toInt })
        .mkString(" ")
    }
    val genVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 99)
      Array.fill(d)(r.nextFloat() * 2f - 1f)
    }
    val docs = spark.range(n).repartition(cpus.toInt)
      .select(col("id").as("doc_id"), genDoc(col("id")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val vecs = spark.range(n).repartition(cpus.toInt)
      .select(col("id").as("vec_id"), genVec(col("id"), lit(64)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    val ti = graft.operators.HybridSearch.buildTextIndex(
      docs, "doc_id", "text", materialized = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft_hpab").toString
    val nlist = math.max(64, math.sqrt(n.toDouble).toInt)
    val idx = graft.index.AnnIndexManager.create(spark, "hpab_ivf", vecs,
      "vec_id", "vec", "IVF",
      Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8"),
      s"$tmp/ivf")
    idx.persist()

    val qs = spark.range(50).select(
      col("id").cast("int").as("qid"),
      concat(lit("w"), (col("id") * 7 % 100).cast("string"),
        lit(" w"), ((col("id") * 13 + 1) % 1000).cast("string"),
        lit(" w"), ((col("id") * 29 + 2) % 5000).cast("string")).as("qtext"),
      genVec(col("id") + 800000L, lit(64)).as("qvec"))

    def run(): DataFrame = graft.operators.HybridSearch.hybridSearchTable(
      docs, "doc_id", ti, idx, qs, "qid", "qtext", "qvec", 10)

    def timeIt(label: String): Double = {
      run().foreach(_ => ()) // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run().foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[hpab] $label%-10s n=$n reps=$reps best=$best%.3fs all=${times.map(t => f"$t%.3f").mkString(",")}")
      best
    }

    // exact arm FIRST: it is the baseline, and measuring it first keeps
    // JIT/codegen warm-up cost out of the prune arm's comparison
    spark.conf.set("spark.ann.bm25MaxScorePrune", "false")
    val b = run().collect().map(_.toString).sorted
    val tOff = timeIt("prune=off")
    spark.conf.set("spark.ann.bm25MaxScorePrune", "true")
    headFrac.foreach(f => spark.conf.set("spark.ann.bm25HeadDfFraction", f))
    val a = run().collect().map(_.toString).sorted
    val tOn = timeIt("prune=on")
    require(a.sameElements(b),
      s"rank-safety violation: pruned and exact results differ (${a.length} vs ${b.length} rows)")
    val speedup = tOff / tOn
    println(f"[hpab] identical=${a.length} rows; speedup=$speedup%.2fx (off=$tOff%.3fs on=$tOn%.3fs)")
    // performance floor: the prune exists to be FASTER; below the floor it
    // must stay off (this is the r10 regression's tripwire — r10 shipped
    // prune=on at a silent 0.16x). Two regimes: where the volume gate
    // ENGAGES pruning (matched postings >= spark.ann.bm25PruneMinPostings;
    // ~n >= 450k on this corpus shape) the prune must WIN — floor 1.0.
    // Where the gate keeps the exact plan (smaller n), prune=on is the
    // exact plan plus a free gate probe, so the contract is parity; floor
    // 0.93 flags real overhead while not tripping on ambient +/-5% noise.
    // Exit non-zero so a scripted gate run fails loudly either way.
    val gateMinVol = spark.conf.get("spark.ann.bm25PruneMinPostings", "4000000").toLong
    val approxMatchedVol = n.toLong * 125 * 3 / 40 // ~9.3 matched postings/doc measured
    val engaged = approxMatchedVol >= gateMinVol
    val floor = if (engaged) 1.0 else 0.93
    if (speedup < floor) {
      println(f"[hpab] FLOOR VIOLATION (${if (engaged) "engaged" else "gated-off parity"} " +
        f"regime): speedup=$speedup%.2fx < $floor%.2fx — keep " +
        "spark.ann.bm25MaxScorePrune=false")
      spark.stop()
      sys.exit(2)
    }
    spark.stop()
  }
}
