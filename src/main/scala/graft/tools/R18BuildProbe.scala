package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 decomposition of `vamana_build_10k_d768` (the #2 bench line):
  * replays the exact Bench create (10k rows, d=768, max_degree=64,
  * bc=100, shards=32) with `spark.ann.debugTiming=true` and a wall clock
  * per create, separating graph-build CPU from write/meta mechanics.
  *
  * Run: sbt "runMain graft.tools.R18BuildProbe [reps] [dim]"
  */
object R18BuildProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(768)
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
    val df = spark.range(10000)
      .repartition(cpus.toInt)
      .select(col("id"), seededVec(col("id"), lit(dim)).as("vec"))
      .cache()
    df.count()
    spark.conf.set("spark.ann.debugTiming", "true")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bp").toString
    // single-thread kernel reference: one 313-row shard at this dim
    val kv = Array.tabulate(313)(i => {
      val r = new scala.util.Random(i * 2654435761L + 42)
      Array.fill(dim)(r.nextFloat())
    })
    val kids = Array.tabulate(313)(_.toLong)
    val kp = graft.index.Vamana.Params(64, 100, 1.2)
    graft.index.Vamana.buildShard(kids, kv, kp, "l2")
    val t1 = System.nanoTime()
    graft.index.Vamana.buildShard(kids, kv, kp, "l2")
    println(f"[build-probe] buildShard 313 x d$dim single-thread: " +
      f"${(System.nanoTime() - t1) / 1e9}%.3f s")
    for (r <- 0 until reps) {
      val t0 = System.nanoTime()
      graft.index.AnnIndexManager.create(spark, s"bp_$r", df,
        "id", "vec", "DISKANN",
        Map("metric" -> "l2", "max_degree" -> "64",
          "build_complexity" -> "100", "shards" -> cpus),
        s"$tmp/bp$r")
      println(f"[build-probe] create rep $r wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
