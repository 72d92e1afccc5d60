package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-contained serving-line A/B probe (dropped uncommitted into
  * worktrees at different commits, run back-to-back on the same host —
  * the SCALE.md adjudication method). Reproduces the exact Bench
  * vamana_build_10k_d128 + vamana_50q_10k_d128 + vamana_table_50q_repeat
  * + hybrid_search_warm lines.
  */
object SvProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
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
      f
      val s = Seq.fill(n) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[sv-probe] $name%-28s min=${s.min}%.4f s samples=" +
        s.map(x => f"$x%.3f").mkString(","))
    }
    val seededVec = udf { (id: Long, d: Int) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val dim = 128
    val synthDf = spark.range(10000)
      .repartition(cpus.toInt)
      .select(col("id"), seededVec(col("id"), lit(dim)).as("vec"))
      .cache()
    synthDf.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_sv").toString
    val idx = graft.index.AnnIndexManager.create(spark, "sv_d128", synthDf,
      "id", "vec", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "64", "build_complexity" -> "100",
        "shards" -> cpus), s"$tmp/b")
    val qs50 = Seq.tabulate(50)(i => {
      val r = new scala.util.Random(1000 + i)
      Array.fill(dim)(r.nextFloat())
    })
    idx.persist()
    time("vamana_50q_10k_d128", 8) { noop(idx.searchBatch(qs50, 10)) }
    val repeatQ = spark.range(50)
      .select(col("id").as("qid"), seededVec(col("id") + 700000L, lit(dim)).as("qvec"))
    spark.conf.set("spark.ann.graphTableStrategy", "distributed")
    time("vamana_table_50q_repeat", 8) {
      noop(graft.operators.AnnSearch.searchTable(idx, repeatQ, 10,
        queryIdCol = Some("qid")))
    }
    spark.conf.unset("spark.ann.graphTableStrategy")
    spark.stop()
  }
}
