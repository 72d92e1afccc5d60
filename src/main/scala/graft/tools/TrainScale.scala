package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the trained-model pipeline operators:
  * [[graft.pipeline.QualityClassifier]] (hashed-ngram logistic GD, one
  * treeAggregate per pass) and [[graft.pipeline.UnigramTokenizer]] (EM
  * over the bounded word histogram). Measures train/score arms at n and
  * 10n documents and appends growth tables to SCALE.md.
  *
  * The contracts under test: the classifier's per-iteration cost rides
  * ONE corpus pass (featurized once, cached) and the driver holds only
  * the hashDim weight vector; the tokenizer's EM cost is bounded by the
  * histogram cap (maxWords), NOT the corpus — at 10x documents the
  * histogram pass grows like a scan and the EM stays flat.
  *
  * Usage: runMain graft.tools.TrainScale [n]
  */
object TrainScale {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nBig = args.headOption.map(_.toInt).getOrElse(1000000)

    // min of 2 reps: sub-2s arms are fixed-cost dominated and a single
    // sample swings enough to invert growth columns
    def timeIt(f: => Long): Double = {
      def once = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      math.min(once, once)
    }

    // classifier fixture: curated-vs-junk vocabularies with shared filler
    // (the QualityClassifierSpec shape at corpus scale) — dense per-class
    // heads make the model separate within the few timed passes, so the
    // table measures a model that actually learns, ~40 tokens/doc
    val curated = Vector("analysis", "method", "result", "theory", "study",
      "evidence", "chapter", "journal", "proof", "survey")
    val junk = Vector("click", "winner", "free", "casino", "pills",
      "subscribe", "deal", "prize", "offer", "bonus")
    val filler = Vector("the", "a", "of", "to", "and", "in")
    val mkText = udf { (id: Long) =>
      val cls = (id % 2).toInt
      val r = new scala.util.Random(id * 2654435761L + 17)
      val vocab = if (cls == 1) curated else junk
      Array.fill(40)(
        if (r.nextInt(3) == 0) filler(r.nextInt(filler.size))
        else vocab(r.nextInt(vocab.size))).mkString(" ")
    }
    def corpus(n: Int): DataFrame =
      spark.range(n).repartition(32)
        .select(col("id"), mkText(col("id")).as("text"),
          (col("id") % 2).cast("double").as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // tokenizer fixture: zipf draw over a 100k-word space so the corpus
    // histogram actually HITS the 50k maxWords cap — the EM's bounded
    // input at its production size, not a toy vocabulary
    val mkZipfText = udf { (id: Long) =>
      val r = new scala.util.Random(id * 40503 + 99)
      Array.fill(40)("w" + (math.pow(r.nextDouble(), 4.0) * 100000).toInt)
        .mkString(" ")
    }
    def zipfCorpus(n: Int): DataFrame =
      spark.range(n).repartition(32)
        .select(col("id"), mkZipfText(col("id")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    final case class Q(n: Int, train: Double, perIter: Double, score: Double,
                       auc: Double)
    final case class U(n: Int, hist: Double, em: Double, apply: Double, vocab: Int)
    val iters = 10

    // warmup at the small size (JIT for both code paths)
    locally {
      val d = corpus(nBig / 10); d.count()
      val m = graft.pipeline.QualityClassifier.train(d, "text", "label",
        hashDim = 1 << 18, iters = 2)
      graft.pipeline.QualityClassifier.withQualityScore(d, "text", m)
        .agg(sum("quality_prob")).head()
      d.unpersist()
      val z = zipfCorpus(nBig / 10); z.count()
      val um = graft.pipeline.UnigramTokenizer.train(z, "text", vocabSize = 4000,
        maxWords = 50000, minCount = 2L, seedSize = 1 << 14)
      graft.pipeline.UnigramTokenizer.tokenCount(z, "text", um)
        .agg(sum("n_unigram_tokens")).head()
      z.unpersist()
    }

    val qPts = Seq(nBig / 10, nBig).map { n =>
      val d = corpus(n); d.count()
      var model: graft.pipeline.QualityClassifier.Model = null
      val tTrain = timeIt {
        model = graft.pipeline.QualityClassifier.train(d, "text", "label",
          hashDim = 1 << 18, iters = iters, lr = 10.0)
        1L
      }
      // agg over the score column — a bare count() would let Catalyst
      // prune the UDF projection and time an empty scan
      val tScore = timeIt {
        graft.pipeline.QualityClassifier.withQualityScore(d, "text", model)
          .agg(sum("quality_prob")).head()
        1L
      }
      // separation check: mean P(1) gap between classes (a degenerate
      // model would make the timing table meaningless)
      val gap = graft.pipeline.QualityClassifier
        .withQualityScore(d, "text", model)
        .groupBy("label").agg(avg("quality_prob").as("p"))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sep = gap(1.0) - gap(0.0)
      d.unpersist()
      println(f"[train-scale] quality n=$n%,d train($iters)=$tTrain%.2f s " +
        f"(per-iter ${tTrain / iters}%.2f s) score=$tScore%.2f s sep=$sep%.3f")
      Q(n, tTrain, tTrain / iters, tScore, sep)
    }

    val uPts = Seq(nBig / 10, nBig).map { n =>
      val d = zipfCorpus(n); d.count()
      var hist: Seq[(String, Long)] = null
      val tHist = timeIt {
        hist = graft.pipeline.BpeTokenizer.wordHistogram(d, "text", 50000, 2L)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        1L
      }
      var model: graft.pipeline.UnigramTokenizer.Model = null
      val tEm = timeIt {
        model = graft.pipeline.UnigramTokenizer.trainFromHistogram(
          hist, vocabSize = 4000, seedSize = 1 << 14)
        1L
      }
      // agg over the token-count column — count() would prune the UDF
      val tApply = timeIt {
        graft.pipeline.UnigramTokenizer.tokenCount(d, "text", model)
          .agg(sum("n_unigram_tokens")).head()
        1L
      }
      d.unpersist()
      println(f"[train-scale] unigram n=$n%,d hist=$tHist%.2f s em=$tEm%.2f s " +
        f"apply=$tApply%.2f s vocab=${model.logProbs.size}%,d")
      U(n, tHist, tEm, tApply, model.logProbs.size)
    }

    val scaleMd = java.nio.file.Paths.get("SCALE.md")
    if (java.nio.file.Files.exists(scaleMd)) {
      val sb = new StringBuilder
      sb.append("\n## Trained-model operators at 10x data (graft.tools.TrainScale)\n\n")
      sb.append("Two-class zipf-mix corpus, ~40 tokens/doc; warm JVM.\n\n")
      sb.append(s"Quality classifier (hashDim 2^18, $iters GD iterations — each\n")
      sb.append("ONE treeAggregate pass over cached sparse features; the driver\n")
      sb.append("holds only the weight vector):\n\n")
      sb.append("| n docs | train | per-iteration | score (broadcast) | class sep |\n|---|---|---|---|---|\n")
      qPts.foreach(p => sb.append(
        f"| ${p.n}%,d | ${p.train}%.2f s | ${p.perIter}%.2f s | ${p.score}%.2f s | ${p.auc}%.3f |\n"))
      sb.append("\n(The sep column is the 10-iteration DIRECTIONAL gap — a\n")
      sb.append("timing guard, not the converged quality; QualityClassifierSpec\n")
      sb.append("pins >=0.95 held-out accuracy at the 150-iteration budget.)\n")
      val (qg, qs) = (qPts.last, qPts.head)
      sb.append(f"\nGrowth at 10x: train ${qg.train / qs.train}%.1fx (per-pass scan law), score\n")
      sb.append(f"${qg.score / qs.score}%.1fx (row-local) — no super-linear term; at 100 TB the\n")
      sb.append("sampleFraction knob trains on a slice at unchanged per-pass cost\n")
      sb.append("while the broadcast model still scores everything.\n")
      sb.append("\nUnigram-LM tokenizer (maxWords=50k histogram cap, vocab 4000,\n")
      sb.append("seed 2^14 — EM runs driver-side on the CAPPED histogram):\n\n")
      sb.append("| n docs | histogram | EM train | apply (Viterbi) | vocab |\n|---|---|---|---|---|\n")
      uPts.foreach(p => sb.append(
        f"| ${p.n}%,d | ${p.hist}%.2f s | ${p.em}%.2f s | ${p.apply}%.2f s | ${p.vocab}%,d |\n"))
      val (ug, us) = (uPts.last, uPts.head)
      sb.append(f"\nGrowth at 10x: histogram ${ug.hist / us.hist}%.1fx (scan), EM ${ug.em / us.em}%.1fx\n")
      sb.append("(FLAT — the lattice work is a function of the histogram cap, so a\n")
      sb.append("100 TB corpus hands the trainer the same input as a 1 GB one),\n")
      sb.append(f"apply ${ug.apply / us.apply}%.1fx (row-local scan with per-task memo).\n")
      java.nio.file.Files.writeString(scaleMd, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("[train-scale] appended to SCALE.md")
    }
    spark.stop()
  }
}
