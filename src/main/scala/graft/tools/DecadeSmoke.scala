package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-decade scale points (n=1,000,000 -> n=10,000,000) for the two
  * lines whose growth law was questioned at the first decade:
  * `hybrid_table_50q` (matched-posting-volume growth; the max-score prune
  * engages above its volume gate at these sizes) and `ivf_build_search50`
  * (k-means training grows ~ sample*nlist*d with nlist ~ sqrt n on top of
  * the linear assign/write pass). Same seeded generators and
  * scale-contract configs as `graft.tools.ScaleSmoke`'s 100x section, so
  * the decades chain: 100k -> 1M (ScaleSmoke big) -> 10M (this tool).
  *
  * Appends a section to SCALE.md. Hours-scale; run via nohup with
  * SPARK_DRIVER_MEM=64g (the 10M postings relation spills to the disk
  * tier of MEMORY_AND_DISK under smaller heaps — fine, but slower).
  *
  * Run: SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.tools.DecadeSmoke"
  */
object DecadeSmoke {

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vocab = 10000

    // generators — seed-identical to ScaleSmoke so decades are comparable
    val genDoc = udf { (id: Long) =>
      val r = new scala.util.Random(id * 6364136223846793005L + 1442695040888963407L)
      val src = if (id % 100 == 99) id - 1 else id
      val rs = new scala.util.Random(src * 6364136223846793005L + 1442695040888963407L)
      val n = 50 + rs.nextInt(150)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val u = rs.nextDouble()
        sb.append("w").append((u * u * vocab).toInt)
        if (i < n - 1) sb.append(' ')
        i += 1
      }
      if (src != id) {
        val words = sb.toString.split(' ')
        words(r.nextInt(words.length)) = "mut" + id
        words.mkString(" ")
      } else sb.toString
    }
    val genVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 99)
      Array.fill(d)(r.nextFloat() * 2f - 1f)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_decade").toString
    var rep = 0

    def runAt(n: Int): Seq[(String, Double)] = {
      // docs deliberately NOT persisted: the seeded generator recomputes
      // cheaply, and at n=10M pinning the raw corpus alongside the text
      // index's own postings/doc-lens pins plus shuffle spill exhausts
      // the disk tier (measured: the first 10M attempt died ENOSPC)
      val docs = spark.range(n).repartition(cpus.toInt)
        .select(col("id").as("doc_id"), genDoc(col("id")).as("text"))
      val vecs = spark.range(n).repartition(cpus.toInt)
        .select(col("id").as("vec_id"), genVec(col("id"), lit(64)).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      val nlist = math.max(64, math.sqrt(n.toDouble).toInt)

      var ti: graft.operators.HybridSearch.TextIndex = null
      var hybIdx: graft.index.AnnIndex = null
      val entries: Seq[(String, () => Unit)] = Seq(
        "ivf_build_search50" -> (() => {
          rep += 1
          val idx = graft.index.AnnIndexManager.create(spark, s"decade_ivf_$rep",
            vecs, "vec_id", "vec", "IVF",
            Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8"),
            s"$tmp/ivf$rep")
          val qs = Seq.tabulate(50) { i =>
            val r = new scala.util.Random(5000 + i)
            Array.fill(64)(r.nextFloat() * 2f - 1f)
          }
          noop(idx.searchBatch(qs, 10))
        }),
        "hybrid_table_50q" -> (() => {
          if (ti == null) {
            ti = graft.operators.HybridSearch.buildTextIndex(
              docs, "doc_id", "text", materialized = true)
            rep += 1
            hybIdx = graft.index.AnnIndexManager.create(spark, s"decade_hyb_$rep",
              vecs, "vec_id", "vec", "IVF",
              Map("metric" -> "l2", "nlist" -> nlist.toString, "nprobe" -> "8"),
              s"$tmp/hyb$rep")
            hybIdx.persist()
          }
          val qs = spark.range(50).select(
            col("id").cast("int").as("qid"),
            concat(lit("w"), (col("id") * 7 % 100).cast("string"),
              lit(" w"), ((col("id") * 13 + 1) % 1000).cast("string"),
              lit(" w"), ((col("id") * 29 + 2) % 5000).cast("string")).as("qtext"),
            genVec(col("id") + 800000L, lit(64)).as("qvec"))
          noop(graft.operators.HybridSearch.hybridSearchTable(
            docs, "doc_id", ti, hybIdx, qs, "qid", "qtext", "qvec", 10))
        }))
      val out = entries.map { case (name, f) =>
        f() // warm
        val dt = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[decade n=$n%,d] $name%-22s $dt%8.2f s")
        name -> dt
      }
      if (ti != null) ti.release()
      if (hybIdx != null) hybIdx.unpersist()
      vecs.unpersist()
      out
    }

    val a = runAt(1000000)
    val b = runAt(10000000).toMap

    val scaleMd = java.nio.file.Paths.get("SCALE.md")
    if (java.nio.file.Files.exists(scaleMd)) {
      val sb = new StringBuilder
      sb.append("\n## Second decade: n=1,000,000 -> n=10,000,000 (graft.tools.DecadeSmoke)\n\n")
      sb.append("Same seeded generators and scale-contract configs as the 100x\n")
      sb.append("section (IVF nlist ~ sqrt n; resident FTS postings + pinned IVF\n")
      sb.append("for the hybrid line — the max-score prune engages above its 4M\n")
      sb.append("matched-posting gate at both sizes), warm, min of 2 reps:\n\n")
      sb.append("| line | n=1,000,000 | n=10,000,000 | growth (x) at 10x data |\n")
      sb.append("|---|---|---|---|\n")
      for ((name, ta) <- a) {
        val tb = b(name)
        sb.append(f"| $name | $ta%.2f s | $tb%.2f s | ${tb / ta}%.1f |\n")
      }
      sb.append("\nCompare with the first-decade (100k -> 1M) ratios in the 100x\n")
      sb.append("section above; ratios ~10x are the linear asymptote emerging as\n")
      sb.append("fixed costs stop flattering the small-n points, ratios above\n")
      sb.append("~15x would flag a super-linear term. Interpret per line (the\n")
      sb.append("committed SCALE.md carries the per-line reading for this run).\n")
      java.nio.file.Files.writeString(scaleMd, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("[decade] appended to SCALE.md")
    }
    spark.stop()
  }
}
