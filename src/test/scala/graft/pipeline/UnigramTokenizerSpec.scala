package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for [[UnigramTokenizer]]: Viterbi optimality vs exhaustive
  * segmentation, EM behavior on a constructed corpus (frequent multi-char
  * units survive pruning and win segmentations), vocab-size and
  * determinism/partitioning invariance, unseen-character fallback, and
  * the null/empty row contract shared with BPE. */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def allSegmentations(w: String): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to w.length).flatMap(i =>
      allSegmentations(w.drop(i)).map(w.take(i) +: _))

  test("Viterbi segmentation is the exhaustive-best segmentation") {
    val lp = Map("a" -> -3.0, "b" -> -3.5, "c" -> -4.0, "ab" -> -2.0,
      "bc" -> -2.5, "abc" -> -6.5, "cab" -> -1.5)
    val m = UnigramTokenizer.Model(lp)
    for (w <- Seq("abc", "abcab", "cababc", "aaab", "b")) {
      val best = allSegmentations(w)
        .filter(_.forall(lp.contains))
        .maxBy(segs => segs.map(lp).sum)
      val bestScore = best.map(lp).sum
      val got = m.tokenizeWord(w)
      assert(got.map(lp).sum === bestScore,
        s"$w: got $got (${got.map(lp).sum}), best $best ($bestScore)")
    }
  }

  test("training keeps frequent multi-char pieces and uses them") {
    // 'ing' and 'walk'/'talk' stems dominate; chars alone segment worse
    val hist = Seq(("walking", 500L), ("talking", 400L), ("walk", 300L),
      ("talk", 250L), ("sing", 200L), ("wing", 150L), ("zeb", 2L))
    val m = UnigramTokenizer.trainFromHistogram(hist, vocabSize = 24,
      seedSize = 4096)
    assert(m.logProbs.size <= 24 + 0) // chars can push past target only if chars > target
    assert(m.logProbs.keySet.exists(p => p.length >= 3),
      s"no multi-char piece survived: ${m.logProbs.keys.toSeq.sorted}")
    val toks = m.tokenizeWord("walking")
    assert(toks.mkString("") == "walking")
    assert(toks.length < "walking".length,
      s"walking segmented to chars only: $toks")
  }

  test("every single character of the training alphabet stays segmentable") {
    val hist = Seq(("abcde", 100L), ("edcba", 90L), ("aabb", 50L))
    val m = UnigramTokenizer.trainFromHistogram(hist, vocabSize = 6,
      seedSize = 1024)
    for (ch <- "abcde")
      assert(m.logProbs.contains(ch.toString), s"char $ch pruned")
    assert(m.tokenizeWord("edbca").mkString("") == "edbca")
  }

  test("unseen characters fall back to floor-prob single-char pieces") {
    val m = UnigramTokenizer.trainFromHistogram(
      Seq(("abab", 10L)), vocabSize = 4, seedSize = 64)
    val toks = m.tokenizeWord("abxq")
    assert(toks.mkString("") == "abxq")
    assert(toks.contains("x") && toks.contains("q"))
  }

  test("training is deterministic and histogram-order independent") {
    val hist = Seq(("walking", 500L), ("talking", 400L), ("walk", 300L),
      ("talk", 250L), ("sing", 200L))
    val m1 = UnigramTokenizer.trainFromHistogram(hist, 20, seedSize = 2048)
    val m2 = UnigramTokenizer.trainFromHistogram(hist.reverse, 20, seedSize = 2048)
    assert(m1.logProbs.keySet == m2.logProbs.keySet)
    m1.logProbs.foreach { case (p, l) =>
      assert(math.abs(l - m2.logProbs(p)) < 1e-9, p)
    }
  }

  test("end-to-end over a DataFrame matches driver-side training; null/empty contract") {
    val docs = Seq(
      (1L, "walking and talking"), (2L, "walking walking sing"),
      (3L, null.asInstanceOf[String]), (4L, ""), (5L, "talk sing wing"))
      .toDF("doc_id", "text")
    val m = UnigramTokenizer.train(docs, "text", vocabSize = 30)
    val counts = UnigramTokenizer.tokenCount(docs, "text", m)
      .select("doc_id", "n_unigram_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(3L) == 0L && counts(4L) == 0L)
    assert(counts(1L) > 0L && counts(1L) <= "walkingandtalking".length)
    // repartitioned input trains the identical model
    val m2 = UnigramTokenizer.train(docs.repartition(7), "text", vocabSize = 30)
    assert(m.logProbs.keySet == m2.logProbs.keySet)
  }
}
