package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the bench's vamana_build_10k_d128 shape. */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // single-thread kernel timing at the bench shard shape (10k/32 = 312)
    val krnd = new scala.util.Random(5)
    val kv = Array.fill(312)(Array.fill(128)(krnd.nextFloat()))
    val kids = Array.tabulate(312)(_.toLong)
    val kp = graft.index.Vamana.Params(64, 100, 1.2)
    graft.index.Vamana.buildShard(kids, kv, kp, "l2") // warm
    t("buildShard 312x128 x10 single-thread") {
      for (_ <- 1 to 10) graft.index.Vamana.buildShard(kids, kv, kp, "l2")
    }

    val dim = 128
    val seededVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val synthDf = spark.range(10000)
      .repartition(cpus.toInt)
      .select(col("id"), seededVec(col("id"), lit(dim)).as("vec"))
      .cache()
    t("synth cache+count")(synthDf.count())

    // stage 1: prepare (canonicalize id/vector)
    val prepared = t("prepare") {
      val p = graft.index.AnnIndexBuilder.prepare(synthDf, "id", "vec", "l2").cache()
      p.count()
      p
    }

    // stage 2: graph build alone, counted (no write)
    val graph = graft.index.Vamana.build(prepared, cpus.toInt,
      graft.index.Vamana.Params(64, 100, 1.2), "l2")
    t("Vamana.build count")(graph.count())
    t("Vamana.build count AGAIN")(
      graft.index.Vamana.build(prepared, cpus.toInt,
        graft.index.Vamana.Params(64, 100, 1.2), "l2").count())

    // stage 3: parquet write of the built graph
    val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
    t("graph write parquet") {
      graft.index.Vamana.build(prepared, cpus.toInt,
        graft.index.Vamana.Params(64, 100, 1.2), "l2")
        .write.mode("overwrite").partitionBy("shard").parquet(s"$tmp/data")
    }

    // stage 4: the full create() path for comparison
    t("AnnIndexManager.create full") {
      graft.index.AnnIndexManager.create(spark, "prof_10k", synthDf,
        "id", "vec", "DISKANN",
        Map("metric" -> "l2", "max_degree" -> "64", "build_complexity" -> "100",
          "shards" -> cpus),
        s"$tmp/full")
    }
    spark.stop()
  }
}
