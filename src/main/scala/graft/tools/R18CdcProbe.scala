package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 decomposition of the `ann_online_cdc_5x200` bench line: replays the
  * exact Bench fixture (20k-row d64 DISKANN shard, 5 online batches of
  * 200) with `spark.ann.debugTiming=true`, printing the per-phase stderr
  * lines the insert path already emits — so the 5-batch cost decomposes
  * into prepare-count / spatial-targets / rewrite-job / dir-listing /
  * meta-publish / summaries / auto-compact instead of one opaque number.
  *
  * Run: sbt "runMain graft.tools.R18CdcProbe [batches]"
  */
object R18CdcProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seededVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdcprobe").toString
    val ocDf = spark.range(20000).repartition(cpus.toInt)
      .select(col("id"), seededVec(col("id"), lit(64)).as("vec"))
      .cache()
    ocDf.count()
    graft.index.AnnIndexManager.create(spark, "cdcprobe", ocDf,
      "id", "vec", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64"),
      s"$tmp/bonline")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "1000")
    spark.conf.set("spark.ann.debugTiming", "true")
    val ocIdx = graft.index.AnnIndexManager.load(spark, s"$tmp/bonline")
    // one untimed warm batch, then timed batches with per-batch walls
    for (b <- 0 until batches) {
      val lo = 100000L + b * 200
      val t0 = System.nanoTime()
      ocIdx.insert(spark.range(lo, lo + 200)
        .select(col("id"), seededVec(col("id"), lit(64)).as("vec")), "id", "vec")
      println(f"[cdc-probe] batch $b wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
