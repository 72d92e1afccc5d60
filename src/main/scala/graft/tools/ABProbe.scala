package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-host A/B probe for the three committed-bench movers the r14
  * verdict flagged (BENCH_r13 → BENCH_r14 ratios on lines whose code was
  * untouched or only lightly touched):
  *
  *   - `events_asof`   3.03× (AsofJoin untouched in r14)
  *   - `hnsw_build_sf` 1.48× (Hnsw.scala touched by online-insert commits)
  *   - `kernel_batch_l2_n1024_d768_spark_scan` 1.56× (kernel untouched)
  *
  * This file is dropped UNCOMMITTED into a scratch worktree at the r13
  * marker commit and run at both HEADs back-to-back on the same idle
  * host — the r12/r13 adjudication method. Each line reproduces the exact
  * Bench.scala workload and methodology (one untimed warmup, min over
  * reps), so the printed numbers are directly comparable to the committed
  * BENCH records.
  *
  * Run: sbt -batch "runMain graft.tools.ABProbe [asof|hnswbuild|scan|all] [reps]"
  */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String, n: Int = reps)(f: => Unit): Unit = {
      f // untimed warmup, as Bench.time()
      val samples = Seq.fill(n) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab-probe] $name%-40s min=${samples.min}%.4f s " +
        f"spread=${samples.max / samples.min}%.2fx samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }

    if (mode == "all" || mode == "asof") {
      val q = graft.SparkEntry.queries
      time("events_asof") { noop(q("events_asof")(spark, sfDir)) }
    }

    if (mode == "all" || mode == "hnswbuild") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab").toString
      var rep = 0
      time("hnsw_build_sf") {
        rep += 1
        graft.index.AnnIndexManager.create(spark, s"ab_hnsw_$rep", emb,
          "vec_id", "embedding", "HNSW",
          Map("metric" -> "l2", "hnsw_m" -> "32", "shards" -> "8"),
          s"$tmp/hnsw$rep")
      }
    }

    if (mode == "all" || mode == "scan") {
      import graft.functions.AnnFunctions.l2_distance_sq
      val kd = 768; val kn = 1024
      val seededVec = udf { (id: Long, d: Int) =>
        val r = new scala.util.Random(id * 2654435761L + 42)
        Array.fill(d)(r.nextFloat())
      }
      val bigCands = spark.range(500L * kn)
        .select(col("id"), seededVec(col("id") + 500000L, lit(kd)).as("vec"))
        .coalesce(1).cache()
      bigCands.count()
      val qr5 = new scala.util.Random(5)
      val qlit = typedLit(Array.fill(kd)(qr5.nextFloat()))
      val scanPlan = bigCands.select(sum(l2_distance_sq(col("vec"), qlit)))
      noop(scanPlan) // warm codegen
      val samples = Seq.fill(math.max(reps, 5)) {
        val st0 = System.nanoTime(); noop(scanPlan)
        (System.nanoTime() - st0) / 1e9 / 500
      }
      println(f"[ab-probe] kernel_batch_l2_n1024_d768_spark_scan  " +
        f"min=${samples.min}%.7f s spread=${samples.max / samples.min}%.2fx")
    }
    spark.stop()
  }
}
