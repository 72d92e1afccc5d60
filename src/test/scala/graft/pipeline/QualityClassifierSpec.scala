package graft.pipeline

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {

  /** Separable fixture: "quality" docs draw from a curated vocabulary,
    * "junk" docs from a spam one, with shared filler in both. */
  private def fixture(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val curated = Vector("analysis", "method", "result", "theory", "study",
      "evidence", "chapter", "journal")
    val junk = Vector("click", "winner", "free", "casino", "pills",
      "subscribe", "deal", "prize")
    val filler = Vector("the", "a", "of", "to", "and", "in")
    Seq.tabulate(n) { i =>
      val label = i % 2
      val vocab = if (label == 1) curated else junk
      val words = Seq.fill(20)(
        if (rnd.nextInt(3) == 0) filler(rnd.nextInt(filler.size))
        else vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "), label)
    }.toDF("doc_id", "text", "label")
  }

  test("featurize: L1-normalized hashed uni+bi-grams, sorted unique indices") {
    val (idx, v) = QualityClassifier.featurize("good Good text", 1 << 12)
    // tokens: good good text → unigrams good(2) text(1), bigrams
    // "good good"(1) "good text"(1) → total mass 5
    assert(math.abs(v.sum - 1.0) < 1e-12, s"L1 mass ${v.sum}")
    assert(idx.toSeq == idx.toSeq.sorted && idx.distinct.length == idx.length)
    assert(v.max == 0.4, "repeated unigram carries 2/5 of the mass")
    assert(QualityClassifier.featurize("", 16)._1.isEmpty)
    assert(QualityClassifier.featurize("...!!!", 16)._1.isEmpty)
  }

  test("train separates a curated-vs-junk corpus; held-out accuracy >= 0.95") {
    val train = fixture(300, seed = 1)
    val test = fixture(200, seed = 2)
    val model = QualityClassifier.train(train, "text", "label",
      hashDim = 1 << 14, iters = 150, lr = 10.0)
    val scored = QualityClassifier.withQualityScore(test, "text", model)
      .select("label", "quality_prob").collect()
    val acc = scored.count(r =>
      (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)).toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // scores are calibrated in direction: mean curated > mean junk by a
    // margin (L1-normalized features make logits grow ~lr·iters/‖doc‖, so
    // confidence needs the larger budget above, not just sign agreement)
    val mq = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val mj = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(mq.sum / mq.length > mj.sum / mj.length + 0.3,
      s"margin ${mq.sum / mq.length - mj.sum / mj.length}")
  }

  test("training is partitioning-stable (double accumulators)") {
    val data = fixture(200, seed = 3)
    val m1 = QualityClassifier.train(data, "text", "label",
      hashDim = 1 << 12, iters = 10)
    val m2 = QualityClassifier.train(data.repartition(17), "text", "label",
      hashDim = 1 << 12, iters = 10)
    // pure function of the data up to cross-partition double summation
    // order — scores must agree to far tighter than any decision bar
    val texts = fixture(50, seed = 4).select("text").collect().map(_.getString(0))
    for (t <- texts)
      assert(math.abs(m1.score(t) - m2.score(t)) < 1e-9,
        s"partitioning drift on '$t'")
  }

  test("sampled training still separates; null text scores at the bias") {
    val train = fixture(400, seed = 5)
    val model = QualityClassifier.train(train, "text", "label",
      hashDim = 1 << 14, iters = 40, sampleFraction = 0.5)
    val test = fixture(100, seed = 6)
    val scored = QualityClassifier.withQualityScore(test, "text", model)
      .select("label", "quality_prob").collect()
    val acc = scored.count(r =>
      (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)).toDouble / scored.length
    assert(acc >= 0.9, s"sampled-training accuracy $acc")
    assert(model.score(null) == 1.0 / (1.0 + math.exp(-model.bias)))
  }

  test("pinned md5 model replays the oracle arithmetic bit-for-bit") {
    // reference values computed independently (python hashlib/math) from
    // the documented formula: bucket = first 15 md5 hex chars mod 64,
    // w(h) = ((h mod 17) - 8)/10, bias 0.1, ascending-bucket fold
    assert(QualityClassifier.md5Bucket("the", 64) == 45)
    assert(QualityClassifier.md5Bucket("quick brown", 64) == 4)
    val m = QualityClassifier.pinnedMd5Model(hashDim = 64)
    assert(m.hashFamily == "md5")
    // reference doubles computed in python; Math.exp is specified only
    // to 1 ulp and differs across JDKs/CPUs, so compare with a tolerance
    // far under the oracle's round(6) and far over any ulp drift
    assert(math.abs(m.score("The quick brown fox jumps over the lazy dog")
      - 0.5337720301152894) < 1e-12)
    // tokenless text scores sigmoid(bias) — the oracle's LEFT-JOIN branch
    assert(math.abs(m.score("!!!") - 0.52497918747894) < 1e-12)
    assert(m.score(null) == 1.0 / (1.0 + math.exp(-0.1)))
  }
}
