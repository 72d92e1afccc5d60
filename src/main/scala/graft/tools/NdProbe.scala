package graft.tools

import org.apache.spark.sql.SparkSession

/** Times just the neardup_cosine driver query (A/B harness for kernel
  * codegen changes). Diagnostic only. */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries("neardup_cosine")
    def run(): Double = {
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val best = (1 to 3).map(_ => run()).min
    println(f"[nd] neardup_cosine best: $best%.3f s")
    spark.stop()
  }
}
