package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing + plan probe for sharedNgramStats. Diagnostic only. */
object SnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val grams = docs.select(col("doc_id"),
      explode(graft.pipeline.Dedup.sqlShinglesPublic(2)(col("text"))).as("gram"))
    run(grams)
    println(f"[sn] explode alone: ${(1 to 3).map(_ => run(grams)).min}%.2f s")
    val res = graft.pipeline.Dedup.sharedNgramStats(docs, "doc_id", "text", 2)
    run(res)
    println(f"[sn] full: ${(1 to 3).map(_ => run(res)).min}%.2f s")
    spark.stop()
  }
}
