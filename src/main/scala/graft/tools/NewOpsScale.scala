package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the round-11 operators (appended to SCALE.md):
  *
  *  - Bloom decontamination: the claim is a ZERO-shuffle corpus pass
  *    against a fixed-size broadcast — wall clock rides scan bandwidth
  *    and the filter stays m/8 bytes at any benchmark size. Measured
  *    against the exact broadcast-join path at n/10 and n.
  *  - BPE training: the claim is that the corpus-scale cost is ONE
  *    histogram aggregation + a row-local apply; the merge loop runs on
  *    a zipf-bounded histogram whose size does NOT grow with the corpus.
  *    Measured: histogram, driver merge loop (500 merges), tokenize at
  *    n/10 and n.
  *  - RaBitQ vs BQ at the same ~1-bit/dim budget: build, 50-query batch
  *    search, and recall@10 vs exact float ground truth on a CLUSTERED
  *    corpus (the fixture class retrieval corpora look like; smooth
  *    uniform data drowns ANY sub-bit estimator in tie noise).
  *
  * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.NewOpsScale [nDocs] [nVecs]"
  */
object NewOpsScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val nVecs = if (args.length > 1) args(1).toInt else 1000000
    val mode = if (args.length > 2) args(2) else "all" // all|pipeline|ann
    val dim = 64

    def timeIt(label: String)(f: => Long): Double = {
      f // warm
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[newops-scale] $label%-34s best=$best%8.2f s")
      best
    }

    // ---- corpora ------------------------------------------------------
    val mkText = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 17)
      Array.fill(40)(s"word${r.nextInt(5000)}").mkString(" ")
    }
    def corpus(n: Int): DataFrame =
      spark.range(n).repartition(cpus.toInt)
        .select(col("id").as("doc_id"), mkText(col("id")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- Bloom vs exact decontamination -------------------------------
    def bloomArm(n: Int): (Double, Double, Double, Long) = {
      val docs = corpus(n)
      docs.count()
      val bench = docs.filter(col("doc_id") % 1000 === 0)
      val tExact = timeIt(s"decontam_exact_n$n") {
        graft.pipeline.Dedup.decontaminate(docs, "doc_id", "text",
          bench, "text", shingleSize = 8).count()
      }
      var bloom: graft.pipeline.BloomFilter = null
      val tBuild = timeIt(s"bloom_build_n$n") {
        bloom = graft.pipeline.Dedup.benchmarkShingleBloom(
          bench, "text", shingleSize = 8)
        bloom.numBits
      }
      val tScan = timeIt(s"decontam_bloom_n$n") {
        graft.pipeline.Dedup.decontaminateBloom(docs, "doc_id", "text",
          bloom, shingleSize = 8).count()
      }
      docs.unpersist()
      (tExact, tBuild, tScan, bloom.numBits / 8)
    }
    val runPipeline = mode == "all" || mode == "pipeline"
    val runAnn = mode == "all" || mode == "ann"
    val (be1, bb1, bs1, bBytes1) = if (runPipeline) bloomArm(nDocs / 10) else (0.0, 0.0, 0.0, 0L)
    val (be2, bb2, bs2, bBytes2) = if (runPipeline) bloomArm(nDocs) else (0.0, 0.0, 0.0, 0L)

    // ---- BPE: histogram + driver merges + apply ------------------------
    def bpeArm(n: Int): (Double, Double, Double, Int) = {
      val docs = corpus(n)
      docs.count()
      var hist: Seq[(String, Long)] = Seq.empty
      val tHist = timeIt(s"bpe_hist_n$n") {
        hist = graft.pipeline.BpeTokenizer
          .wordHistogram(docs, "text", maxWords = 50000, minCount = 2L)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        hist.size.toLong
      }
      var model: graft.pipeline.BpeTokenizer.Model = null
      val tTrain = timeIt(s"bpe_train500_n$n") {
        model = graft.pipeline.BpeTokenizer.trainFromHistogram(hist, 500)
        model.merges.size.toLong
      }
      val tApply = timeIt(s"bpe_tokenize_n$n") {
        graft.pipeline.BpeTokenizer.tokenCount(docs, "text", model)
          .agg(sum("n_bpe_tokens")).head().getLong(0)
      }
      docs.unpersist()
      (tHist, tTrain, tApply, hist.size)
    }
    val (ph1, pt1, pa1, pv1) = if (runPipeline) bpeArm(nDocs / 10) else (0.0, 0.0, 0.0, 0)
    val (ph2, pt2, pa2, pv2) = if (runPipeline) bpeArm(nDocs) else (0.0, 0.0, 0.0, 0)

    // ---- RaBitQ vs BQ: build / batch search / recall -------------------
    // CLUSTER-ROUTING fixture: 10 docs per centroid with k=10, so the
    // true top-10 is ~"the query's cluster" and recall measures whether
    // 1-bit codes route to the right neighborhood — the job coarse codes
    // actually have. Resolving rank WITHIN a dense cluster is the rerank
    // stage's job (measured separately below); asking raw 1-bit codes to
    // do it reads as chance for ANY sub-bit estimator (same lesson as
    // the staged-MaxSim smooth-data fixtures).
    final case class AnnRes(n: Int, quant: String, build: Double,
                            search: Double, recall: Double, rerank: Double)
    val annResults = scala.collection.mutable.ArrayBuffer.empty[AnnRes]

    def annArm(n: Int): Unit = {
      val nClusters = math.max(64, n / 10) // 10 docs per centroid AT THIS n
      val mkVec = udf { (id: Long) =>
        val c = new scala.util.Random((id % nClusters) * 97 + 5)
        val r = new scala.util.Random(id * 2654435761L + 31)
        Array.fill(dim)(c.nextFloat() * 2f - 1f + (r.nextFloat() - 0.5f) * 0.5f)
      }
      val vecs = spark.range(n).repartition(cpus.toInt)
        .select(col("id"), mkVec(col("id")).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      val tmp = java.nio.file.Files.createTempDirectory(s"newops_$n").toString
      val rnd = new scala.util.Random(123)
      val qs = Seq.fill(50) {
        val cid = rnd.nextInt(nClusters)
        val c = new scala.util.Random(cid.toLong * 97 + 5)
        val base = Array.fill(dim)(c.nextFloat() * 2f - 1f)
        base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f)
      }
      // exact float ground truth (FLAT cosine index, no quantization)
      val exact = graft.index.AnnIndexManager.create(spark, s"nos_exact_$n",
        vecs, "id", "vec", "FLAT", Map("metric" -> "cosine"), s"$tmp/exact")
      exact.persist()
      val truth = exact.searchBatch(qs, 10).collect()
        .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

      for (quant <- Seq("bq", "rabitq")) {
        // one-shot cold build (dominated by the encode pass, not JIT)
        val t0 = System.nanoTime()
        val idx = graft.index.AnnIndexManager.create(spark, s"nos_${quant}_$n",
          vecs, "id", "vec", "FLAT",
          Map("metric" -> "cosine", "quantization" -> quant), s"$tmp/$quant")
        val tBuild = (System.nanoTime() - t0) / 1e9
        idx.persist()
        val tSearch = timeIt(s"${quant}_50q_n$n") {
          idx.searchBatch(qs, 10).count()
        }
        val hits = idx.searchBatch(qs, 10).collect()
          .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        // NOTE .toSeq: mapping recalls over the KEY SET would collapse
        // equal per-query recalls before the mean
        val recall = truth.keys.toSeq.map(q =>
          hits.getOrElse(q, Set.empty).intersect(truth(q)).size / 10.0)
          .sum / truth.size
        // candidates + exact re-rank (the serving pair): oversample=4
        val rerank = qs.take(10).zipWithIndex.map { case (q, qi) =>
          val got = idx.search(vecs, "id", q, 10, oversample = 4, rerank = true)
            .select("id").collect().map(_.getLong(0)).toSet
          got.intersect(truth(qi)).size / 10.0
        }.sum / 10.0
        println(f"[newops-scale] ${quant}_recall10_n$n%-22s raw=$recall%.3f " +
          f"rerank4=$rerank%.3f (build=$tBuild%.2f s search50q=$tSearch%.2f s)")
        annResults += AnnRes(n, quant, tBuild, tSearch, recall, rerank)
      }
      vecs.unpersist()
    }
    if (runAnn) { annArm(nVecs / 10); annArm(nVecs) }

    // ---- SCALE.md append ----------------------------------------------
    val scaleMd = java.nio.file.Paths.get("SCALE.md")
    if (java.nio.file.Files.exists(scaleMd)) {
      val sb = new StringBuilder
      if (runPipeline) {
        sb.append("\n## Round-11 operators at 10x data (graft.tools.NewOpsScale)\n\n")
        sb.append("Bloom decontamination (~40-token docs, benchmark = every\n")
        sb.append("1000th doc, 8-gram shingles, fpp=1e-7): exact = broadcast\n")
        sb.append("string-set join over the exploded corpus; bloom = row-local\n")
        sb.append("probe of a fixed-size bit array, ZERO corpus shuffle.\n\n")
        sb.append("| n docs | exact | bloom build | bloom scan | filter bytes |\n|---|---|---|---|---|\n")
        sb.append(f"| ${nDocs / 10}%,d | $be1%.2f s | $bb1%.2f s | $bs1%.2f s | $bBytes1%,d |\n")
        sb.append(f"| $nDocs%,d | $be2%.2f s | $bb2%.2f s | $bs2%.2f s | $bBytes2%,d |\n")
        sb.append(f"\nGrowth at 10x: exact ${be2 / be1}%.1fx, bloom scan ${bs2 / bs1}%.1fx —\n")
        sb.append("both ride the corpus scan, but the bloom pass does it with no\n")
        sb.append("explode/join stage and a broadcast that did not grow (the\n")
        sb.append("benchmark grew 10x; the bit array is sized by its shingle\n")
        sb.append("count and stays KB-scale — at a FIXED benchmark it is\n")
        sb.append("constant-size at any corpus scale).\n")
        sb.append("\nBPE (maxWords=50k, minCount=2, 500 merges): histogram = one\n")
        sb.append("explode+count aggregation; train = driver loop on the bounded\n")
        sb.append("histogram; apply = row-local tokenize with per-task memo.\n\n")
        sb.append("| n docs | histogram | train 500 | tokenize | vocab rows |\n|---|---|---|---|---|\n")
        sb.append(f"| ${nDocs / 10}%,d | $ph1%.2f s | $pt1%.2f s | $pa1%.2f s | $pv1%,d |\n")
        sb.append(f"| $nDocs%,d | $ph2%.2f s | $pt2%.2f s | $pa2%.2f s | $pv2%,d |\n")
        sb.append(f"\nGrowth at 10x: histogram ${ph2 / ph1}%.1fx (scan), train ${pt2 / pt1}%.1fx\n")
        sb.append("(FLAT — the histogram the loop consumes is capped, so the\n")
        sb.append(f"driver share is corpus-size-independent), apply ${pa2 / pa1}%.1fx (scan).\n")
      }
      if (runAnn && annResults.nonEmpty) {
        sb.append("\n## RaBitQ vs BQ at 10x data (graft.tools.NewOpsScale <n> <n> ann)\n\n")
        sb.append("d=64 CLUSTER-ROUTING corpus (10 docs per centroid, k=10 — the\n")
        sb.append("true top-10 is the query's cluster, so raw recall measures\n")
        sb.append("neighborhood routing, the job 1-bit codes actually have;\n")
        sb.append("intra-cluster rank is the rerank stage's job). 50 cosine\n")
        sb.append("queries; rerank4 = candidates at oversample=4 + exact float\n")
        sb.append("re-rank (the serving pair), 10-query sample.\n\n")
        sb.append("| n | quant | build | 50q search | raw recall@10 | rerank4 recall@10 |\n|---|---|---|---|---|---|\n")
        annResults.foreach { r =>
          sb.append(f"| ${r.n}%,d | ${r.quant} | ${r.build}%.2f s | ${r.search}%.2f s | ${r.recall}%.3f | ${r.rerank}%.3f |\n")
        }
        sb.append("\nSame ~1 bit/dim budget; the magnitude-corrected asymmetric\n")
        sb.append("estimator (rabitq) vs symmetric Hamming (bq) on routing +\n")
        sb.append("refined recall, with the O(d)-bit-test vs XOR+popcount search\n")
        sb.append("cost visible in the 50q column. Both scale O(n) per batch as\n")
        sb.append("FLAT kernels; the IVF/graph engines compose with either codec\n")
        sb.append("for sublinear routing at larger n.\n")
      }
      java.nio.file.Files.writeString(scaleMd, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("[newops-scale] appended to SCALE.md")
    }
    spark.stop()
  }
}
