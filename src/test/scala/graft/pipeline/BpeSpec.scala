package graft.pipeline

import graft.SparkSpec
import graft.pipeline.BpeTokenizer.{EndOfWord => W}

class BpeSpec extends SparkSpec {

  /** Brute-force reference trainer: full pair recount every step — the
    * textbook algorithm, O(steps · corpus), used only to validate the
    * incremental trainer. */
  private def refTrain(hist: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = hist.map { case (w, c) => (w.map(_.toString).toVector :+ W, c) }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += best._1 + best._2; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        step += 1
      }
    }
    merges.result()
  }

  test("trainFromHistogram: first merges on the classic subword fixture") {
    // HF-course-style fixture: ("hug",10) ("pug",5) ("pun",12) ("bun",4)
    // ("hugs",5). Pair counts: (u,g)=20, (u,n)=16, (h,u)=15, (p,u)=17 ...
    // → first merge must be (u,g)
    val hist = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val m = BpeTokenizer.trainFromHistogram(hist, 3)
    assert(m.merges.head == ("u", "g"), s"first merge ${m.merges.head}")
    // after (u,g): (h,ug)=15 (ug,</w>)=15 (p,ug)=5 (ug,s)=5 (p,u)=12
    // (u,n)=16 (n,</w>)=16 (b,u)=4 (s,</w>)=5 → tie at 16 breaks
    // lexicographically: (n,</w>) < (u,n)
    assert(m.merges(1) == ("n", W), s"second merge ${m.merges(1)}")
  }

  test("incremental trainer equals the brute-force reference on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val alphabet = "abcd"
      val hist = (0 until 60).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString, (1 + rnd.nextInt(20)).toLong)
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      val got = BpeTokenizer.trainFromHistogram(hist, 25).merges
      val want = refTrain(hist, 25)
      assert(got == want, s"trial $trial: incremental $got vs reference $want")
    }
  }

  test("tokenizeWord: merges apply in rank order; concatenation round-trips") {
    val hist = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val m = BpeTokenizer.trainFromHistogram(hist, 10)
    for (w <- Seq("hug", "pugs", "bug", "mug", "un", "hugshugs", "x", "")) {
      val toks = m.tokenizeWord(w)
      assert(toks.mkString.stripSuffix(W).replace(W, "") == w,
        s"round-trip failed for '$w': $toks")
      if (w.nonEmpty) assert(toks.last.endsWith(W), s"'$w' must end with marker")
    }
    // a fully-merged training word tokenizes to ONE unit once its merges
    // all exist (10 merges cover the 5-word corpus's closure)
    assert(m.tokenizeWord("pun") == Seq("pun" + W), m.tokenizeWord("pun").toString)
    // unseen characters stay singletons
    assert(m.tokenizeWord("zz") == Seq("z", "z", W))
  }

  test("exhaustion: trainer stops early when every word is a single symbol") {
    val m = BpeTokenizer.trainFromHistogram(Seq(("ab", 5L)), 100)
    // "ab</w>" closure: (a,b)→ab, (ab,</w>)→ab</w> — exactly 2 merges
    assert(m.merges.length == 2, m.merges.toString)
  }

  test("wordHistogram: distributed count matches a local count; caps honored") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The CAT ate, the rat!"),
      (3L, "cat cat cat")
    ).toDF("doc_id", "text")
    val hist = BpeTokenizer.wordHistogram(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hist.head == ("cat", 5L), hist.head.toString)
    assert(hist.toMap == Map("the" -> 4L, "cat" -> 5L, "sat" -> 1L, "on" -> 1L,
      "mat" -> 1L, "ate" -> 1L, "rat" -> 1L))
    // (cnt DESC, word) ordering is total → deterministic histogram
    assert(hist.toSeq == hist.toSeq.sortBy { case (w, c) => (-c, w) })
    val capped = BpeTokenizer.wordHistogram(docs, "text", maxWords = 2).collect()
    assert(capped.length == 2 && capped.head.getString(0) == "cat")
    val floored = BpeTokenizer.wordHistogram(docs, "text", minCount = 2).collect()
    assert(floored.map(_.getString(0)).toSet == Set("cat", "the"))
  }

  test("train + tokenize end-to-end on a DataFrame; determinism across repartition") {
    import spark.implicits._
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, s"spark scan shuffles data but spark sort spills batch ${i % 7}"))
      .toDF("doc_id", "text")
    val m1 = BpeTokenizer.train(docs, "text", numMerges = 30)
    val m2 = BpeTokenizer.train(docs.repartition(7), "text", numMerges = 30)
    assert(m1.merges == m2.merges, "training must be partitioning-invariant")
    val counted = BpeTokenizer.tokenCount(docs, "text", m1)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every repeated word is in the merge closure → one token per word+digit
    val local = docs.collect().map(r => r.getLong(0) ->
      m1.tokenize(r.getString(1)).length.toLong).toMap
    assert(counted == local, "distributed tokenize must equal local model")
    assert(counted.values.forall(n => n >= 9 && n <= 30))
    // null text contributes zero tokens, no NPE
    val withNull = Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(BpeTokenizer.tokenCount(withNull, "text", m1)
      .select("n_bpe_tokens").collect()(0).getLong(0) == 0L)
  }
}
