package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tiny warm-search probe for same-host A/B of the pinned searchBatch
  * path. Committed as a reusable harness (like ABProbe): to A/B against
  * an older commit, copy it into a scratch worktree at that commit and
  * run both sides back-to-back. Paths/CPUs come from the same env vars
  * every tool here uses (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sp").toString
    val queries50 = Seq.tabulate(50)(i => graft.queries.QuerySupport.qvecF(i))
    for ((engine, params) <- Seq(
      ("HNSW", Map("metric" -> "l2", "hnsw_m" -> "32", "shards" -> "8")),
      ("DISKANN", Map("metric" -> "l2", "max_degree" -> "64",
        "build_complexity" -> "100", "shards" -> "8")))) {
      val idx = graft.index.AnnIndexManager.create(spark, s"sp_$engine", emb,
        "vec_id", "embedding", engine, params, s"$tmp/$engine")
      idx.persist()
      noop(idx.searchBatch(queries50, 10)) // warm
      val samples = Seq.fill(7) {
        val t0 = System.nanoTime(); noop(idx.searchBatch(queries50, 10))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[search-probe] ${engine}_search_50q min=${samples.min}%.4f " +
        f"spread=${samples.max / samples.min}%.2fx " +
        samples.map(s => f"$s%.3f").mkString(","))
      idx.unpersist()
    }
    spark.stop()
  }
}
