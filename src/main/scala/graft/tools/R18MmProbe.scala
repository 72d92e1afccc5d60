package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 decomposition of the multimodal pair lines: separates the fixture
  * payload UDF, the hash UDF pass, and the banded-pair stage, and A/Bs
  * the old combined triple-hash UDF against the split per-family UDFs in
  * ONE JVM (cross-run host noise removed).
  *
  * Run: sbt "runMain graft.tools.R18MmProbe [reps]"
  */
object R18MmProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{MediaCodecs, Multimodal}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the bench queries' image fixture (MultimodalQueries.phashImgUdf shape)
    val imgUdf = udf { id: Long =>
      val g = id % 50
      val rnd = new scala.util.Random(g * 7919L + 3)
      val w = 16; val h = 16
      val px = Array.fill(w * h)((rnd.nextInt(256)).toByte)
      MediaCodecs.encodeNetpbm(MediaCodecs.ImageData(w, h, 1, px))
    }
    val media = docs.select(col("doc_id"), imgUdf(col("doc_id")).as("payload"))
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => Unit): Unit = {
      f
      val s = Seq.fill(reps) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[mm-probe] $name%-26s min=${s.min}%.4f s samples=" +
        s.map(x => f"$x%.3f").mkString(","))
    }
    val oldTriple = udf { payload: Array[Byte] =>
      val img = if (payload == null) None
        else MediaCodecs.decodeNetpbm(payload).orElse(MediaCodecs.decodeImageIO(payload))
      img.map(i => (MediaCodecs.aHash64(i), MediaCodecs.dHash64(i),
        MediaCodecs.pHash64(i))).orNull
    }
    time("payload-only") { noop(media) }
    time("hash-old-triple(ahash)") {
      noop(media.withColumn("__ph", oldTriple(col("payload")))
        .select(col("doc_id"), col("__ph._1").as("ahash64"))
        .filter(col("ahash64").isNotNull))
    }
    time("hash-new-split(ahash)") {
      noop(Multimodal.withImageHashes(media)
        .select("doc_id", "ahash64").filter(col("ahash64").isNotNull))
    }
    time("full-pairs(ahash)") {
      noop(graft.pipeline.Dedup.hammingNearDups(
        Multimodal.withImageHashes(media), "doc_id", "ahash64", maxHamming = 3))
    }
    spark.stop()
  }
}
