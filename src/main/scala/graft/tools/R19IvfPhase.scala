package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 decomposition of the `ivfpq_build_10k_d128` and
  * `maxsim_pool_build_10k` bench lines: times the create's pieces
  * (prepare+count / coarse train / PQ codebook fit / assign+write /
  * radii) and counts Spark jobs per phase, so the "kmeans floor" claim
  * is checked against where the time actually goes.
  *
  * Run: sbt "runMain graft.tools.R19IvfPhase [reps]"
  */
object R19IvfPhase {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 128
    val seededVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val df = spark.range(10000)
      .repartition(cpus.toInt)
      .select(col("id"), seededVec(col("id"), lit(dim)).as("vec"))
      .cache()
    df.count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      Thread.sleep(100)
      val j0 = jobs.get()
      val samples = Seq.fill(reps) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(100)
      println(f"[ivf-phase] $name%-28s min=${samples.min}%.3f s " +
        f"jobs/rep=${(jobs.get() - j0).toDouble / reps}%.1f samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_r19ivf").toString
    val prepared = graft.index.AnnIndexBuilder.prepare(df, "id", "vec", "l2").cache()
    val n = prepared.count()

    time("prepare_count") {
      val p = graft.index.AnnIndexBuilder.prepare(df, "id", "vec", "l2").cache()
      p.count(); p.unpersist()
    }
    time("coarse_train_16") {
      val cap = math.min(n, 256L * 16)
      val trainDf =
        if (cap < n) prepared.sample(withReplacement = false, cap.toDouble / n, seed = 42)
        else prepared
      val s = trainDf.select("vector").collect().map(_.getSeq[Float](0).toArray)
      graft.index.AnnIndexBuilder.trainCentroids(s, 16, maxIter = 10, seed = 42)
    }
    var fp = 0
    time("fit_pq_m16") {
      fp += 1
      graft.index.AnnIndexBuilder.fitPq(prepared, s"$tmp/pq$fp", dim, n,
        Map("quantization" -> "pq", "pq_m" -> "16", "pq_ksub" -> "256"))
    }
    var c = 0
    time("create_ivfpq_full") {
      c += 1
      graft.index.AnnIndexManager.create(spark, s"r19ipq_$c", df,
        "id", "vec", "IVF",
        Map("metric" -> "l2", "nlist" -> "16", "nprobe" -> "4",
          "quantization" -> "pq", "pq_m" -> "16"), s"$tmp/ipq$c")
    }
    var v = 0
    time("create_ivf_plain_nlist32") {
      v += 1
      graft.index.AnnIndexManager.create(spark, s"r19ivf_$v", df,
        "id", "vec", "IVF",
        Map("metric" -> "ip", "nlist" -> "32"), s"$tmp/ivf$v")
    }
    spark.stop()
  }
}
