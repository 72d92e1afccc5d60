package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the vamana_50q_10k_d{128,256,768} bench lines: is the
  * d256 search cost (BENCH_r06: 0.436s vs 0.181s at both neighbors)
  * algorithmic (graph shape / distance-eval count differs by dim) or
  * infrastructural (caching / partitioning / GC)? Replicates the bench
  * workload exactly, then measures per-dim: average out-degree, pool
  * insertions per query, single-thread whole-index search time, and the
  * Spark-path timing over several reps.
  */
object DimProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val seededVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_dimprobe").toString

    for (dim <- Seq(128, 256, 768)) {
      val df = spark.range(10000)
        .repartition(cpus.toInt)
        .select(col("id"), seededVec(col("id"), lit(dim)).as("vec"))
        .cache()
      df.count()
      val idx = graft.index.AnnIndexManager.create(spark, s"probe_$dim", df,
        "id", "vec", "DISKANN",
        Map("metric" -> "l2", "max_degree" -> "64", "build_complexity" -> "100",
          "shards" -> cpus),
        s"$tmp/d$dim")
      val qs50 = Seq.tabulate(50)(i => {
        val r = new scala.util.Random(1000 + i)
        Array.fill(dim)(r.nextFloat())
      })
      idx.persist()

      // graph shape stats straight off the stored dataset
      val stats = idx.data
        .select(size(col("neighbors")).as("deg"))
        .agg(avg("deg").as("avg_deg"), max("deg").as("max_deg"), count("*").as("n"))
        .collect()(0)
      println(f"[dim $dim%4d] avg_deg=${stats.getDouble(0)}%6.2f max_deg=${stats.getInt(1)}%3d n=${stats.getLong(2)}")

      // Spark path: 6 timed reps (bench does warmup + min of 3)
      def noop(d: org.apache.spark.sql.DataFrame): Unit =
        d.write.mode("overwrite").format("noop").save()
      noop(idx.searchBatch(qs50, 10)) // warm
      val reps = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        noop(idx.searchBatch(qs50, 10))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dim $dim%4d] spark reps: " + reps.map(r => f"$r%.3f").mkString(" "))

      // single-thread replication: decode all shards driver-side, run the
      // same 50 beam searches, count pool insertions (= distance evals)
      // the REAL decode path (label-completeness validation included) — a
      // layout change must break this probe the same way it would break
      // the engine, or the probe's conclusions are about a different index
      val rows = idx.data
        .select("shard", "label", "id", "vector", "neighbors", "is_entry")
        .collect()
      val byShard = rows.groupBy(_.getInt(0))
      val shards = byShard.map { case (sid, rws) =>
        graft.index.Vamana.decodeShard(sid, rws.toIndexedSeq, None)
      }.toArray
      val distFn = graft.functions.VectorKernels.orderingDistance("l2") _
      var inserts = 0L
      val st0 = System.nanoTime()
      for (q <- qs50; sh <- shards) {
        val pool = graft.index.Vamana.beamSearchPool(sh, q, 100, distFn)
        inserts += pool.size
      }
      val stSec = (System.nanoTime() - st0) / 1e9
      // count actual distance evals via a wrapped metric
      var evals = 0L
      val countingDist = (a: Array[Float], b: Array[Float]) => {
        evals += 1; distFn(a, b)
      }
      for (q <- qs50; sh <- shards) {
        graft.index.Vamana.beamSearchPool(sh, q, 100, countingDist)
      }
      println(f"[dim $dim%4d] single-thread all-shards 50q: $stSec%.3f s, dist evals=$evals%,d")
      idx.unpersist()
      df.unpersist()
    }
    spark.stop()
  }
}
