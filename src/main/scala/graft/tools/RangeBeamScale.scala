package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the expanding-beam graph range search: at n=1M the
  * EXACT graph range scan is an irreducible full-index distance filter
  * (adjacency gives no radius certificate), while the opt-in beam
  * (`spark.ann.rangeBeam=true`) pays geometric per-query cost. This tool
  * measures both on the same pinned DISKANN index — wall clock for a
  * 50-query batch plus the beam's measured recall vs the exact set
  * (graft.operators.Recall.rangeRecall) — and appends the table to
  * SCALE.md. The radius is calibrated per corpus to the sampled ~100th
  * neighbor distance, so the ball holds a retrieval-sized result set.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.RangeBeamScale"
  */
object RangeBeamScale {
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

    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val dim = 64
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
    val tmp = java.nio.file.Files.createTempDirectory("graft_rangebeam").toString
    val idx = graft.index.AnnIndexManager.create(spark, "rb_vam", vecs,
      "vec_id", "vec", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64",
        "shards" -> cpus), s"$tmp/vam")
    idx.persist()

    // radius = sampled ~100th-neighbor distance of the first query, so a
    // ball holds a retrieval-sized set on ANY corpus distribution
    val radius = idx.scan(qs.head, 100, searchParam = 4096)
      .orderBy(col("_distance").desc).select("_distance").head().getDouble(0)
    println(f"[range-beam-scale] n=$n%,d calibrated radius=$radius%.4f")

    val qdf = qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("qid", "qvec")
    def runTable(): Long = graft.operators.AnnSearch.rangeTable(
      idx, qdf, radius, queryVecCol = Some("qvec"), queryIdCol = Some("qid")).count()

    def timeIt(label: String)(f: => Long): (Double, Long) = {
      f // warm
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val best = reps.minBy(_._1)
      println(f"[range-beam-scale] $label%-18s best=${best._1}%8.2f s rows=${best._2}")
      best
    }

    val (tExact, rowsExact) = timeIt("exact full-scan")(runTable())
    def beamArm(eps: Double): (Double, Long, Double) = {
      spark.conf.set("spark.ann.rangeBeam", "true")
      spark.conf.set("spark.ann.rangeBeamEps", eps.toString)
      val (t, rows) = try timeIt(f"beam (eps=$eps%.1f)")(runTable())
      finally {
        spark.conf.unset("spark.ann.rangeBeam")
        spark.conf.unset("spark.ann.rangeBeamEps")
      }
      val recall = graft.operators.Recall.meanRangeRecall(idx, qs, radius, eps)
      println(f"[range-beam-scale] eps=$eps%.1f speedup=${tExact / t}%.1fx " +
        f"recall=$recall%.3f (beam rows $rows of $rowsExact exact)")
      (t, rows, recall)
    }
    val (tBeam, rowsBeam, recall) = beamArm(0.1)
    val (tBeam3, rowsBeam3, recall3) = beamArm(0.3)

    val scaleMd = java.nio.file.Paths.get("SCALE.md")
    if (java.nio.file.Files.exists(scaleMd)) {
      val sb = new StringBuilder
      sb.append("\n## Graph beam range search at n=%,d (graft.tools.RangeBeamScale)\n\n"
        .formatLocal(java.util.Locale.US, n))
      sb.append("50-query batch range against a pinned DISKANN index (deg=32,\n")
      sb.append(s"shards=$cpus, d=$dim), radius calibrated to the sampled ~100th\n")
      sb.append("neighbor distance. The exact default is the irreducible\n")
      sb.append("full-index distance filter; the opt-in beam\n")
      sb.append("(spark.ann.rangeBeam=true, eps=0.1) pays geometric per-query\n")
      sb.append("cost on the zip path against the pinned shard layout:\n\n")
      sb.append("| path | wall (50 queries, warm best-of-2) | rows | mean range recall |\n|---|---|---|---|\n")
      sb.append(f"| exact full scan | $tExact%.2f s | $rowsExact | 1.000 |\n")
      sb.append(f"| beam eps=0.1 | $tBeam%.2f s | $rowsBeam | $recall%.3f |\n")
      sb.append(f"| beam eps=0.3 | $tBeam3%.2f s | $rowsBeam3 | $recall3%.3f |\n")
      sb.append(f"\nSpeedup ${tExact / tBeam}%.1fx (eps=0.1) / " +
        f"${tExact / tBeam3}%.1fx (eps=0.3); precision is 1 by construction\n")
      sb.append("(the beam filters on true engine distances), eps is the\n")
      sb.append("recall/cost knob exactly like nprobe above. The gap vs exact\n")
      sb.append("widens with n: the exact path is O(n) per batch while the\n")
      sb.append("beam tracks result-set size.\n")
      java.nio.file.Files.writeString(scaleMd, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("[range-beam-scale] appended to SCALE.md")
    }
    spark.stop()
  }
}
