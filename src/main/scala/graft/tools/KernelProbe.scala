package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiler for the Spark-level batch-distance overhead
  * (Bench's `kernel_batch_l2_n1024_d768_spark` line): prints the executed
  * plan of the crossJoin+sum shape and times a few variants to show where
  * the microseconds go. Diagnostic only — not part of the library. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val kd = 768; val kn = 1024
    val seededVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val cands = spark.range(kn)
      .select(col("id"), seededVec(col("id") + 500000L, lit(kd)).as("vec"))
      .coalesce(1).cache()
    cands.count()
    val batchQs = spark.range(500)
      .select(col("id").as("qid"), seededVec(col("id") + 900000L, lit(kd)).as("qvec"))
      .coalesce(1).cache()
    batchQs.count()

    import graft.functions.AnnFunctions.l2_distance_sq
    val batchPlan = cands.crossJoin(batchQs)
      .select(sum(l2_distance_sq(col("vec"), col("qvec"))))
    batchPlan.collect()
    println("==== executed plan (AQE final) ====")
    println(batchPlan.queryExecution.executedPlan.toString.take(4000))

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9 / 500)
      }
      println(f"$name: ${best * 1e3}%.4f ms/batch")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    time("crossJoin_sum")(noop(batchPlan))

    // same join+agg machinery, trivial per-pair expression: isolates the
    // BNLJ iteration + aggregate floor from the distance kernel
    val floorPlan = cands.crossJoin(batchQs)
      .select(sum(element_at(col("vec"), 1) + element_at(col("qvec"), 1)))
    time("crossJoin_floor")(noop(floorPlan))

    // the production scan shape: CONSTANT query vector over the same total
    // work (512k rows = 500 batches of 1024) in one job — the foldable
    // side hoists to a codegen-time primitive array
    val bigCands = spark.range(500L * kn)
      .select(col("id"), seededVec(col("id") + 500000L, lit(kd)).as("vec"))
      .coalesce(1).cache()
    bigCands.count()
    val qr = new scala.util.Random(5)
    val qlit = typedLit(Array.fill(kd)(qr.nextFloat()))
    val scanPlan = bigCands.select(sum(l2_distance_sq(col("vec"), qlit)))
    time("const_query_scan_sum")(noop(scanPlan))

    // scan floor: same cached read + agg, trivial per-row expression —
    // how much of the scan line is cache decode, not kernel
    val scanFloor = bigCands.select(sum(element_at(col("vec"), 1)))
    time("const_query_scan_floor")(noop(scanFloor))

    // uncompressed cache: is the floor dominated by codec work?
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    val bigCands2 = spark.range(500L * kn)
      .select(col("id"), seededVec(col("id") + 500000L, lit(kd)).as("vec"))
      .coalesce(1).cache()
    bigCands2.count()
    val scanPlan2 = bigCands2.select(sum(l2_distance_sq(col("vec"), qlit)))
    time("scan_sum_uncompressed_cache")(noop(scanPlan2))
    val scanFloor2 = bigCands2.select(sum(element_at(col("vec"), 1)))
    time("scan_floor_uncompressed_cache")(noop(scanFloor2))

    // 32-partition variants: the bench lines are coalesce(1) for a
    // like-for-like single-thread comparison with the JVM kernel, but the
    // ENGINE serves scans in parallel — what a real 512k-row scan costs
    val bigCandsP = spark.range(500L * kn).repartition(32)
      .select(col("id"), seededVec(col("id") + 500000L, lit(kd)).as("vec"))
      .cache()
    bigCandsP.count()
    time("scan_sum_32part")(noop(bigCandsP.select(sum(l2_distance_sq(col("vec"), qlit)))))
    spark.stop()
  }
}
