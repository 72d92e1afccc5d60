package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo, ACL 2018 — "Subword
  * Regularization"; the algorithm behind SentencePiece's default model
  * and the Llama/T5 tokenizers), sharing [[BpeTokenizer]]'s two-phase
  * corpus shape:
  *
  *  1. ONE distributed pass reduces the corpus to the bounded
  *     word-frequency histogram ([[BpeTokenizer.wordHistogram]] — same
  *     pre-tokenization, same zipf-bound argument: the trainer's input
  *     is the same size at 1 GB and 100 TB, and the corpus never
  *     shuffles again).
  *  2. driver-side training over the histogram: seed the vocabulary
  *     with the most frequent substrings (all single characters are
  *     kept unconditionally so every word stays segmentable), then
  *     alternate EM over the segmentation lattice (forward–backward in
  *     log space, expected piece counts weighted by word frequency)
  *     with pruning rounds that drop the lowest-expected-count
  *     multi-char pieces until `vocabSize` remains. Pruning by expected
  *     count is the standard simplification of SentencePiece's
  *     loss-delta rule (the delta is dominated by the count term); the
  *     EM itself is the paper's algorithm.
  *  3. apply is embarrassingly parallel: the (piece → log-prob) table
  *     broadcasts with the task closure and each pre-token segments
  *     locally by Viterbi (max-sum over the lattice), with the same
  *     per-partition word→tokens memo as BPE.
  *
  * Determinism: the histogram arrives sorted `(count DESC, word)`; all
  * EM arithmetic is fixed-order double summation over that sorting, and
  * pruning ties break `(expected count ASC, piece DESC)` — the learned
  * vocabulary is a pure function of (histogram, hyperparameters),
  * invariant to partitioning.
  *
  * Characters never seen at train time segment as single-char pieces at
  * a floor log-prob (the `unk` convention), so tokenize totals are
  * defined on any input.
  */
object UnigramTokenizer {

  /** Max substring length considered for the seed vocabulary. */
  val MaxPieceLen = 8

  final case class Model(logProbs: Map[String, Double]) extends Serializable {
    /** Floor for unseen single characters: below every trained piece. */
    @transient lazy val unkLogProb: Double =
      if (logProbs.isEmpty) -1e3 else logProbs.values.min - 10.0
    @transient lazy val maxLen: Int =
      if (logProbs.isEmpty) 1 else logProbs.keysIterator.map(_.length).max

    /** Viterbi best segmentation (max total log-prob; leftmost-longest
      * on exact ties via strict `>` on a left-to-right scan). */
    def tokenizeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      val n = word.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = new Array[Int](n + 1)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          if (best(j) > Double.NegativeInfinity) {
            val piece = word.substring(j, i)
            val lp = logProbs.getOrElse(piece,
              if (i - j == 1) unkLogProb else Double.NegativeInfinity)
            val cand = best(j) + lp
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
          j += 1
        }
        i += 1
      }
      val out = List.newBuilder[String]
      val stack = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { stack += word.substring(back(p), p); p = back(p) }
      stack.reverseIterator.foreach(out += _)
      out.result()
    }
  }

  /** Expected piece counts for one word via forward–backward over the
    * segmentation lattice, in log space; accumulates `count * P(piece
    * used)` into `acc` and returns the word's log-likelihood. */
  private def addExpectedCounts(word: String, count: Long,
                                logProbs: java.util.HashMap[String, Double],
                                maxLen: Int,
                                acc: java.util.HashMap[String, Double]): Double = {
    val n = word.length
    def lp(j: Int, i: Int): Double = {
      val v = logProbs.get(word.substring(j, i))
      if (v != null) v
      else if (i - j == 1) -1e2 // unseen char inside training: hard floor
      else Double.NegativeInfinity
    }
    def logAdd(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val fwd = Array.fill(n + 1)(Double.NegativeInfinity)
    val bwd = Array.fill(n + 1)(Double.NegativeInfinity)
    fwd(0) = 0.0; bwd(n) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val l = lp(j, i)
        if (l != Double.NegativeInfinity && fwd(j) != Double.NegativeInfinity)
          fwd(i) = logAdd(fwd(i), fwd(j) + l)
        j += 1
      }
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      var k = math.min(n, i + maxLen)
      while (k > i) {
        val l = lp(i, k)
        if (l != Double.NegativeInfinity && bwd(k) != Double.NegativeInfinity)
          bwd(i) = logAdd(bwd(i), bwd(k) + l)
        k -= 1
      }
      i -= 1
    }
    val total = fwd(n)
    if (total == Double.NegativeInfinity) return 0.0 // unsegmentable: skip
    var j = 0
    while (j < n) {
      var k = j + 1
      val kMax = math.min(n, j + maxLen)
      while (k <= kMax) {
        val l = lp(j, k)
        if (l != Double.NegativeInfinity &&
            fwd(j) != Double.NegativeInfinity &&
            bwd(k) != Double.NegativeInfinity) {
          val post = math.exp(fwd(j) + l + bwd(k) - total)
          if (post > 1e-12) {
            val piece = word.substring(j, k)
            acc.merge(piece, count * post, _ + _)
          }
        }
        k += 1
      }
      j += 1
    }
    count * total
  }

  /** Driver-side training over a bounded `(word, count)` histogram. */
  def trainFromHistogram(hist: Seq[(String, Long)], vocabSize: Int,
                         seedSize: Int = 1 << 16, emIters: Int = 2,
                         shrinkFactor: Double = 0.75): Model = {
    require(vocabSize > 0 && seedSize >= vocabSize && emIters > 0)
    require(shrinkFactor > 0 && shrinkFactor < 1)
    // ---- seed: frequent substrings (count-weighted), all chars kept ----
    val subCounts = new java.util.HashMap[String, Double]()
    hist.foreach { case (w, c) =>
      var j = 0
      while (j < w.length) {
        var k = j + 1
        val kMax = math.min(w.length, j + MaxPieceLen)
        while (k <= kMax) {
          subCounts.merge(w.substring(j, k), c.toDouble, _ + _)
          k += 1
        }
        j += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val (chars, multi) = subCounts.asScala.toSeq.partition(_._1.length == 1)
    val seed = chars.sortBy(_._1) ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.size))
    var logProbs = {
      val totalLog = math.log(seed.iterator.map(_._2).sum)
      new java.util.HashMap[String, Double](
        seed.map { case (p, c) => p -> (math.log(c) - totalLog) }.toMap.asJava)
    }

    // ---- EM + prune rounds until the target size ----
    def emPass(lp: java.util.HashMap[String, Double], maxLen: Int)
        : java.util.HashMap[String, Double] = {
      val acc = new java.util.HashMap[String, Double]()
      hist.foreach { case (w, c) => addExpectedCounts(w, c, lp, maxLen, acc) }
      // fixed-order summation: HashMap iteration order must not leak into
      // the normalizer (prune ties near the cutoff would go nondeterministic)
      val totalLog = math.log(math.max(
        acc.asScala.toSeq.sortBy(_._1).iterator.map(_._2).sum, 1e-300))
      val out = new java.util.HashMap[String, Double]()
      // keep every CURRENT piece (chars unconditionally; a multi-char
      // piece with no expected mass gets the floor, pruning drops it next)
      lp.keySet().asScala.foreach { p =>
        val e = acc.getOrDefault(p, 0.0)
        out.put(p, if (e > 0) math.log(e) - totalLog else -1e2)
      }
      out
    }
    var curMaxLen = MaxPieceLen
    var guard = 0
    while (logProbs.size > vocabSize && guard < 100) {
      var it = 0
      while (it < emIters) { logProbs = emPass(logProbs, curMaxLen); it += 1 }
      // prune lowest-probability multi-char pieces
      val pieces = logProbs.asScala.toSeq
      val (chars2, multi2) = pieces.partition(_._1.length == 1)
      val targetMulti =
        math.max(vocabSize - chars2.size,
          (multi2.size * shrinkFactor).toInt.min(multi2.size - 1))
      val kept = multi2.sortBy { case (p, l) => (-l, p) }.take(math.max(0, targetMulti))
      logProbs = new java.util.HashMap[String, Double](
        (chars2 ++ kept).toMap.asJava)
      guard += 1
    }
    // final EM at the target size so probs reflect the final vocab
    logProbs = emPass(logProbs, curMaxLen)
    Model(logProbs.asScala.toMap)
  }

  /** End-to-end: bounded histogram → EM training. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxWords: Int = 1 << 20, minCount: Long = 1L,
            seedSize: Int = 1 << 16): Model = {
    val hist = BpeTokenizer.wordHistogram(df, textCol, maxWords, minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromHistogram(hist, vocabSize, seedSize)
  }

  /** Viterbi subword tokens per row (broadcast model, per-task memo). */
  def tokenizeUdf(model: Model): UserDefinedFunction = {
    udf(new (String => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Seq[String]]()
      @transient private lazy val pat =
        java.util.regex.Pattern.compile("[a-z0-9]+")
      override def apply(text: String): Seq[String] = {
        if (text == null) return Seq.empty
        val m = pat.matcher(text.toLowerCase(java.util.Locale.ROOT))
        val out = Seq.newBuilder[String]
        while (m.find()) {
          val w = m.group()
          var toks = memo.get(w)
          if (toks == null) {
            toks = model.tokenizeWord(w)
            if (memo.size < 262144) memo.put(w, toks)
          }
          out ++= toks
        }
        out.result()
      }
    })
  }

  def tokenize(df: DataFrame, textCol: String, model: Model,
               outCol: String = "unigram_tokens"): DataFrame =
    df.withColumn(outCol, coalesce(tokenizeUdf(model)(col(textCol)),
      typedLit(Seq.empty[String])))

  def tokenCount(df: DataFrame, textCol: String, model: Model,
                 outCol: String = "n_unigram_tokens"): DataFrame =
    df.withColumn(outCol, coalesce(
      size(tokenizeUdf(model)(col(textCol))).cast("long"), lit(0L)))
}
