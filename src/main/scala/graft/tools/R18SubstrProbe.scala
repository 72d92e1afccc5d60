package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Structural probe for the r18 substr-dedup position-pass restructure:
  * executes the position pass shape standalone and prints the EXECUTED
  * plan (AQE-final), so the shared-exchange claim (ReusedExchange /
  * one shuffle of the position volume) is checked against reality, not
  * the initial plan. Also times the pass in-process, old shape vs new
  * shape, same JVM/session — immune to cross-run host noise.
  *
  * Run: sbt "runMain graft.tools.R18SubstrProbe [reps]"
  */
object R18SubstrProbe {
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
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val minLength = 25
    val minCount = 2

    // inline copy of SubstrDedup.windowHashesUdf (private[pipeline]) —
    // self-contained probe, same rolling hash
    val hashes = udf { text: String =>
      if (text == null) Array.empty[Long]
      else {
        val L = 25
        val cps = {
          val out = new Array[Int](text.codePointCount(0, text.length))
          var i = 0; var j = 0
          while (i < text.length) {
            val cp = text.codePointAt(i); out(j) = cp; j += 1
            i += Character.charCount(cp)
          }
          out
        }
        if (cps.length < L) Array.empty[Long]
        else {
          val B = 1000003L
          val n = cps.length - L + 1
          val out = new Array[Long](n)
          var h = 0L; var pw = 1L; var i = 0
          while (i < L) { h = h * B + cps(i); if (i < L - 1) pw *= B; i += 1 }
          out(0) = h; i = 1
          while (i < n) {
            h = (h - cps(i - 1) * pw) * B + cps(i + L - 1); out(i) = h; i += 1
          }
          out
        }
      }
    }

    // the position pass, old (two consumers of the raw pos) vs new
    // (explicit shared repartition + shuffle_hash)
    def posRaw = df
      .select(col("doc_id"),
        posexplode(hashes(col("text"))).as(Seq("__i", "__h")))
      .select(col("doc_id"), (col("__i") + 1).cast("long").as("p"), col("__h"))

    def oldShape = {
      val pos = posRaw
      val dupH = pos.groupBy("__h").agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= minCount).select("__h")
      pos.join(dupH, Seq("__h")).select(col("doc_id"), col("p"))
    }
    def newShape = {
      val pos = posRaw.repartition(32, col("__h"))
      val dupH = pos.groupBy("__h").agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= minCount).select("__h")
      pos.join(dupH.hint("shuffle_hash"), Seq("__h"))
        .select(col("doc_id"), col("p"))
    }

    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.mode("overwrite").format("noop").save()

    def time(name: String)(f: => Unit): Unit = {
      f
      val samples = Seq.fill(reps) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[substr-probe] $name%-12s min=${samples.min}%.4f s samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }

    val newDf = newShape
    newDf.collect()
    println("[substr-probe] EXECUTED plan (new shape):")
    println(newDf.queryExecution.executedPlan.toString.take(4000))

    // window variant: ONE scan, ONE exchange, but WindowExec sorts each
    // partition by __h
    def winShape = {
      import org.apache.spark.sql.expressions.Window
      posRaw.repartition(32, col("__h"))
        .withColumn("__c", count(lit(1)).over(Window.partitionBy("__h")))
        .filter(col("__c") >= minCount)
        .select(col("doc_id"), col("p"))
    }

    time("old") { noop(oldShape) }
    time("win") { noop(winShape) }

    // full-query phase decomposition at HEAD (current impl)
    time("marked") {
      noop(graft.pipeline.SubstrDedup.markedPositions(
        df, "doc_id", "text", minLength = 25))
    }
    time("spans") {
      noop(graft.pipeline.SubstrDedup.dupSpans(
        df, "doc_id", "text", minLength = 25))
    }
    time("full") {
      noop(graft.pipeline.SubstrDedup.dedupSubstrings(
        df, "doc_id", "text", minLength = 25))
    }
    spark.stop()
  }
}
