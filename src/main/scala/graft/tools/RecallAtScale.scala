package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall@10 at n=1M: speed evidence without quality evidence is half the
  * 100 TB story — a probe/beam config that holds recall at 10k may truncate
  * badly when cells/shards are 100x fuller. Builds IVF (scale-contract
  * nlist ~ sqrt n) and DISKANN over 1M seeded d=64 vectors and scores
  * graft.operators.Recall (exact exhaustive ground truth, distributed both
  * sides) for 50 queries at the default and a doubled search param.
  * Appends the table to SCALE.md (run right after ScaleSmoke, same pairing
  * as SpillPressure).
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.RecallAtScale"
  */
object RecallAtScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    // "tune" mode: the adaptive-nprobe recipe sweep (uniform regime only)
    // instead of the full two-regime table — see tuneNprobe below
    val mode = args.drop(1).headOption.getOrElse("all")
    val dim = 64
    val k = 10
    val genVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 99)
      Array.fill(d)(r.nextFloat() * 2f - 1f)
    }
    val vecs = spark.range(n).repartition(cpus.toInt)
      .select(col("id").as("vec_id"), genVec(col("id"), lit(dim)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    val qs = Seq.tabulate(50) { i =>
      val r = new scala.util.Random(7000 + i); Array.fill(dim)(r.nextFloat() * 2f - 1f)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall_scale").toString
    val nlist = math.max(64, math.sqrt(n.toDouble).toInt)

    def mean(idx: graft.index.AnnIndex, p: Int): Double = {
      val r = graft.operators.Recall.evaluate(idx, qs, k, p)
        .agg(avg("recall")).head().getDouble(0)
      r
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

    if (mode == "tune") {
      // ---- adaptive-nprobe recipe sweep (the SCALE.md worked example) ----
      // (a) fixed-nprobe decay: meanRecall at 8/32/64/128 — the tuning
      //     loop a user drives to hit a recall target on uniform data;
      // (b) adaptive probing (SPANN distance-ratio rule): same floor
      //     nprobe, per-query widening — recall AND mean probed cells, so
      //     the recipe can state what the ratio buys over a fixed cut.
      val ivf = graft.index.AnnIndexManager.create(spark, "tune_ivf", vecs,
        "vec_id", "vec", "IVF",
        Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8"),
        s"$tmp/tune_ivf")
      ivf.persist()
      // 256 is the verification point: the sweep's decay suggests a pick
      // for a 0.9 target, and the extra doubling confirms the interpolation
      for (np <- Seq(8, 32, 64, 128, 256)) {
        val r = graft.operators.Recall.meanRecall(ivf, qs, k, np)
        println(f"[nprobe-tune] fixed nprobe=$np recall@10 = $r%.3f " +
          f"(scan fraction = ${np.toDouble / nlist}%.3f)")
      }
      val adaptive = graft.index.AnnIndexManager.create(spark, "tune_ivf_ad", vecs,
        "vec_id", "vec", "IVF",
        Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8",
          "adaptive_nprobe" -> "true", "nprobe_ratio" -> "1.05"),
        s"$tmp/tune_ivf_ad")
      adaptive.persist()
      val meanCells = qs.map(q =>
        adaptive.probeLists(adaptive.prepQuery(q), 8, allowAdaptive = true).size)
        .sum.toDouble / qs.length
      val rAd = graft.operators.Recall.meanRecall(adaptive, qs, k)
      println(f"[nprobe-tune] adaptive ratio=1.05 floor=8: recall@10 = $rAd%.3f, " +
        f"mean probed cells = $meanCells%.1f of $nlist")
      spark.stop()
      return
    }

    val ivf = graft.index.AnnIndexManager.create(spark, "recall_ivf", vecs,
      "vec_id", "vec", "IVF",
      Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8"), s"$tmp/ivf")
    for (np <- Seq(8, 32, 64)) {
      val r = mean(ivf, np)
      rows += (s"IVF nlist=$nlist nprobe=$np (uniform)" -> r)
      println(f"[recall-scale] IVF uniform nprobe=$np recall@10 = $r%.3f")
    }

    val vam = graft.index.AnnIndexManager.create(spark, "recall_vam", vecs,
      "vec_id", "vec", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64",
        "shards" -> cpus), s"$tmp/vam")
    vam.persist()
    for (beam <- Seq(64, 128)) {
      val r = mean(vam, beam)
      rows += (s"DISKANN deg=32 beam=$beam (uniform)" -> r)
      println(f"[recall-scale] DISKANN uniform beam=$beam recall@10 = $r%.3f")
    }
    vam.unpersist()

    // clustered corpus — IVF's operating regime (real embedding corpora
    // are clustered; that is the premise the cell partition exploits).
    // 1000 planted centers, points jittered around them; queries jitter
    // around a sample of the same centers.
    val nCenters = 1000
    val genClustered = udf { (id: Long, d: Int) =>
      val c = (id % nCenters).toInt
      val cr = new scala.util.Random(c * 1664525L + 1013904223L)
      val center = Array.fill(d)(cr.nextFloat() * 2f - 1f)
      val r = new scala.util.Random(id * 2654435761L + 31)
      center.map(_ + (r.nextFloat() - 0.5f) * 0.1f)
    }
    val cvecs = spark.range(n).repartition(cpus.toInt)
      .select(col("id").as("vec_id"), genClustered(col("id"), lit(dim)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cvecs.count()
    vecs.unpersist()
    val cqs = Seq.tabulate(50) { i =>
      val c = i * 17 % nCenters
      val cr = new scala.util.Random(c * 1664525L + 1013904223L)
      val center = Array.fill(dim)(cr.nextFloat() * 2f - 1f)
      val r = new scala.util.Random(9000 + i)
      center.map(_ + (r.nextFloat() - 0.5f) * 0.1f)
    }
    val civf = graft.index.AnnIndexManager.create(spark, "recall_civf", cvecs,
      "vec_id", "vec", "IVF",
      Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8"), s"$tmp/civf")
    for (np <- Seq(8, 32)) {
      val r = graft.operators.Recall.evaluate(civf, cqs, k, np)
        .agg(avg("recall")).head().getDouble(0)
      rows += (s"IVF nlist=$nlist nprobe=$np (clustered)" -> r)
      println(f"[recall-scale] IVF clustered nprobe=$np recall@10 = $r%.3f")
    }
    val cvam = graft.index.AnnIndexManager.create(spark, "recall_cvam", cvecs,
      "vec_id", "vec", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64",
        "shards" -> cpus), s"$tmp/cvam")
    cvam.persist()
    val rCvam = graft.operators.Recall.evaluate(cvam, cqs, k, 64)
      .agg(avg("recall")).head().getDouble(0)
    rows += (s"DISKANN deg=32 beam=64 (clustered)" -> rCvam)
    println(f"[recall-scale] DISKANN clustered beam=64 recall@10 = $rCvam%.3f")
    cvam.unpersist()

    val scaleMd = java.nio.file.Paths.get("SCALE.md")
    if (java.nio.file.Files.exists(scaleMd)) {
      val sb = new StringBuilder
      sb.append("\n## Recall@10 at n=1,000,000 (graft.tools.RecallAtScale)\n\n")
      sb.append("Mean recall@10 over 50 seeded queries vs the exact exhaustive\n")
      sb.append("top-10 (graft.operators.Recall — both sides distributed), d=64.\n")
      sb.append("Two corpus regimes: UNIFORM random (the adversarial case for any\n")
      sb.append("space partition — neighbors are barely separated and scatter\n")
      sb.append("across cells) and CLUSTERED (1000 planted centers — the regime\n")
      sb.append("real embedding corpora live in and the premise IVF exploits):\n\n")
      sb.append("| config | mean recall@10 |\n|---|---|\n")
      for ((name, r) <- rows) sb.append(f"| $name | $r%.3f |\n")
      sb.append("\nReference point: the reference's only quality assertion is\n")
      sb.append("recall >= 0.70 at 200 rows (test/sql/diskann_streaming.test);\n")
      sb.append("the table above is the same bar measured at 5,000x that size.\n")
      sb.append("IVF on uniform data shows the textbook partition-truncation\n")
      sb.append("decay (nprobe buys recall back linearly in scan cost) — which is\n")
      sb.append("exactly the recall-harness-driven tuning loop the operator\n")
      sb.append("surface exists to support.\n")
      java.nio.file.Files.writeString(scaleMd, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("[recall-scale] appended to SCALE.md")
    }
    spark.stop()
  }
}
