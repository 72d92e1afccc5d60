package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the distributed graph table search: the WHOLE sf0.1
  * embeddings table (5k rows) queries a DISKANN index over itself through
  * the cogrouped no-driver-collect plan, with the collect bound forced
  * low so the auto strategy must take the distributed path. Prints wall
  * times for both strategies at the same beam so the crossover cost is
  * visible. Diagnostic only. */
object DistSearchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val tmp = java.nio.file.Files.createTempDirectory("dist_probe").toString
    val idx = graft.index.AnnIndexManager.create(spark, "probe_vam", emb,
      "vec_id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64",
        "shards" -> "8"), s"$tmp/vam")
    idx.persist()
    val queries = emb.select(col("vec_id").as("qid"), col("embedding"))

    def run(strategy: String): (Long, Double) = {
      spark.conf.set("spark.ann.graphTableStrategy", strategy)
      try {
        val t0 = System.nanoTime()
        val c = graft.operators.AnnSearch.searchTable(idx, queries, k = 10,
          queryIdCol = Some("qid")).count()
        (c, (System.nanoTime() - t0) / 1e9)
      } finally spark.conf.unset("spark.ann.graphTableStrategy")
    }
    run("collect") // warm shard caches + JIT
    val (cc, tc) = run("collect")
    val (cd, td) = run("distributed")
    println(f"[probe] n=$n collect: $cc rows in $tc%.2f s | distributed: $cd rows in $td%.2f s")
    // auto with a lowered bound must take the distributed path and agree
    spark.conf.set("spark.ann.maxCollectedQueries", "100")
    try {
      val t0 = System.nanoTime()
      val ca = graft.operators.AnnSearch.searchTable(idx, queries, k = 10,
        queryIdCol = Some("qid")).count()
      println(f"[probe] auto(bound=100): $ca rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      assert(ca == cc, s"auto/distributed row count $ca != collect $cc")
    } finally spark.conf.unset("spark.ann.maxCollectedQueries")
    spark.stop()
  }
}
