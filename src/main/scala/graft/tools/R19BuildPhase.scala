package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 decomposition of the `vamana_build_10k_d768` residual beyond graph
  * CPU: times the SAME build DataFrame (exchange + 32 shard graph tasks)
  * into a noop sink vs a real partitioned parquet write, plus the full
  * AnnIndexManager.create — so the line's cost splits into
  * (scan+exchange+graph CPU) / (+row encode+parquet) / (+meta/commit).
  *
  * Run: sbt "runMain graft.tools.R19BuildPhase [reps] [dim]"
  */
object R19BuildPhase {
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
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val samples = Seq.fill(reps) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[build-phase] $name%-28s min=${samples.min}%.3f s samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }
    val prepared = graft.index.AnnIndexBuilder.prepare(df, "id", "vec", "l2").cache()
    prepared.count()
    val params = graft.index.Vamana.Params(64, 100, 1.2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_r19bp").toString
    time("scan_only") { noop(prepared) }
    time("build_noop") {
      noop(graft.index.Vamana.build(prepared, cpus.toInt, params, "l2"))
    }
    var w = 0
    time("build_parquet") {
      w += 1
      graft.index.Vamana.build(prepared, cpus.toInt, params, "l2")
        .withColumn("seg", lit(0L))
        .write.mode("overwrite").partitionBy("shard").parquet(s"$tmp/w$w")
    }
    time("build_parquet_uncompressed") {
      w += 1
      graft.index.Vamana.build(prepared, cpus.toInt, params, "l2")
        .withColumn("seg", lit(0L))
        .write.mode("overwrite").partitionBy("shard")
        .option("compression", "uncompressed").parquet(s"$tmp/w$w")
    }
    time("build_parquet_nodict") {
      w += 1
      graft.index.Vamana.build(prepared, cpus.toInt, params, "l2")
        .withColumn("seg", lit(0L))
        .write.mode("overwrite").partitionBy("shard")
        .option("parquet.enable.dictionary", "false").parquet(s"$tmp/w$w")
    }
    time("build_parquet_unc_nodict") {
      w += 1
      graft.index.Vamana.build(prepared, cpus.toInt, params, "l2")
        .withColumn("seg", lit(0L))
        .write.mode("overwrite").partitionBy("shard")
        .option("compression", "uncompressed")
        .option("parquet.enable.dictionary", "false").parquet(s"$tmp/w$w")
    }
    time("build_parquet_flat") { // no partitionBy: isolates dynamic-partition cost
      w += 1
      graft.index.Vamana.build(prepared, cpus.toInt, params, "l2")
        .withColumn("seg", lit(0L))
        .write.mode("overwrite").parquet(s"$tmp/w$w")
    }
    var c = 0
    time("create_full") {
      c += 1
      graft.index.AnnIndexManager.create(spark, s"r19bp_$c", df,
        "id", "vec", "DISKANN",
        Map("metric" -> "l2", "max_degree" -> "64",
          "build_complexity" -> "100", "shards" -> cpus),
        s"$tmp/c$c")
    }
    spark.stop()
  }
}
