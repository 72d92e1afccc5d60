package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19: dumps the EXECUTED plan of one scalar hybridSearch call (bench
  * fixture) with exchange/stage counts — the evidence base for cutting
  * the scalar call's per-exchange AQE job overhead structurally.
  *
  * Run: sbt "runMain graft.tools.R19HybridPlan [out]"
  */
object R19HybridPlan {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/hybrid_scalar_exec.txt")
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_r19hp").toString
    val ivf = graft.index.AnnIndexManager.create(spark, "r19hp_ivf", emb,
      "vec_id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "16", "nprobe" -> "4"), s"$tmp/ivf")
    ivf.persist()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hti = graft.operators.HybridSearch.buildTextIndex(
      docs, "doc_id", "text", materialized = true)
    val mode = args.drop(1).headOption.getOrElse("scalar")
    val df =
      if (mode == "table") {
        import spark.implicits._
        val texts = Seq("spark table join merge", "hash group filter sort",
          "vector scan query")
        val qs = spark.range(6).select(
          col("id").cast("int").as("qidx"),
          element_at(typedLit(texts), (col("id") % 3).cast("int") + 1).as("qtext"),
          udf((i: Int) => graft.queries.QuerySupport.qvecF(i))
            .apply(col("id").cast("int")).as("qvec"))
        graft.operators.HybridSearch.hybridSearchTable(
          docs, "doc_id", hti, ivf, qs, "qidx", "qtext", "qvec", k = 10)
      } else graft.operators.HybridSearch.hybridSearch(
        docs, "doc_id", hti, ivf,
        queryText = "spark table join merge",
        queryVec = graft.queries.QuerySupport.qvecF(0), k = 10)
    df.collect() // finalize AQE
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ShuffleExchangeLike, BroadcastExchangeLike}
    var shuffles = 0; var bcasts = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case _: ShuffleExchangeLike => shuffles += 1
        case _: BroadcastExchangeLike => bcasts += 1
        case _ =>
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      kids.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    val txt = s"shuffles=$shuffles broadcasts=$bcasts\n\n" +
      df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), txt)
    println(s"[r19hp] shuffles=$shuffles broadcasts=$bcasts -> $out")
    spark.stop()
  }
}
