package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016
  * — "Neural Machine Translation of Rare Words with Subword Units"), the
  * way production tokenizer pipelines actually run it at corpus scale
  * (SentencePiece / HF tokenizers have the same two-phase shape):
  *
  *  1. ONE distributed pass reduces the corpus to a word-frequency
  *     histogram — pre-tokenize each document (runs of `[a-z0-9]+` after
  *     lowercasing, the same alphabet as
  *     [[TextAnalysis.wordTokenCount]]), explode, count, and keep the
  *     top-`maxWords` rows by `(count DESC, word)`. The histogram is
  *     BOUNDED BY CONSTRUCTION (zipf: top 1M words cover ~99.9% of
  *     running text), so a 100 TB corpus and a 1 GB corpus hand the
  *     trainer the same-sized input — the corpus never shuffles again
  *     and the merge loop's cost is independent of corpus size.
  *  2. the merge loop runs driver-side on that histogram with the
  *     INCREMENTAL pair-count maintenance of the reference BPE
  *     implementation (only words containing the winning pair are
  *     touched per merge — O(affected · len), not a full recount).
  *     Ties break deterministically: `(count DESC, pair lexicographic)`,
  *     so the learned merge table is reproducible across runs and
  *     partitionings.
  *  3. apply is embarrassingly parallel: the merge-rank table broadcasts
  *     (numMerges entries) and each row tokenizes locally — per-partition
  *     word→tokens memoization exploits the same zipf skew, so hot words
  *     tokenize once per task, not once per occurrence.
  *
  * Words carry the `</w>` end-of-word marker (the original formulation),
  * so merges can learn suffix units ("ing</w>") distinct from infix runs.
  */
object BpeTokenizer {

  /** End-of-word marker appended to each pre-token's symbol sequence. */
  val EndOfWord = "</w>"

  private val PreTokenPattern = "[a-z0-9]+"

  /** An ordered BPE merge table. `merges(i)` was learned at step i; lower
    * rank = applied first (exactly the reference algorithm's priority). */
  final case class Model(merges: Seq[(String, String)]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Tokenize one pre-token (greedy lowest-rank merge loop). */
    def tokenizeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms = word.map(_.toString).toVector :+ EndOfWord
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) done = true
        else {
          // merge EVERY occurrence of the winning pair left-to-right (the
          // reference implementation's behavior), not just the first
          val merged = Vector.newBuilder[String]
          val a = syms(bestAt); val b = syms(bestAt + 1)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              merged += a + b; j += 2
            } else { merged += syms(j); j += 1 }
          }
          syms = merged.result()
        }
      }
      syms
    }

    /** Tokenize a text: pre-tokenize, then subword-split each word. */
    def tokenize(text: String): Seq[String] = {
      val m = java.util.regex.Pattern.compile(PreTokenPattern)
        .matcher(text.toLowerCase(java.util.Locale.ROOT))
      val out = Seq.newBuilder[String]
      // per-call memo would thrash; the UDF wraps this with a per-partition
      // cache keyed on the word (see tokenizeUdf)
      while (m.find()) out ++= tokenizeWord(m.group())
      out.result()
    }
  }

  /** Phase 1: the corpus→histogram reduction. One partial-aggregated
    * explode+count (map-side combine keeps the shuffle at distinct-words
    * volume, not token volume) + a global top-`maxWords` cut.
    * Returns (word, cnt) ordered by `(cnt DESC, word)`. */
  def wordHistogram(df: DataFrame, textCol: String,
                    maxWords: Int = 1 << 20, minCount: Long = 1L): DataFrame =
    df.select(explode(
        expr(s"regexp_extract_all(lower($textCol), '$PreTokenPattern', 0)"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /** Phase 2: the driver-side merge loop over a bounded histogram.
    * Incremental maintenance: pairCounts and the pair→words index are
    * updated only for words containing the winning pair. */
  def trainFromHistogram(hist: Seq[(String, Long)], numMerges: Int): Model = {
    val words: Array[Array[String]] =
      hist.map { case (w, _) => (w.map(_.toString) :+ EndOfWord).toArray }.toArray
    val counts: Array[Long] = hist.map(_._2).toArray

    val pairCounts = new java.util.HashMap[(String, String), Long]()
    val pairWords = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()

    def addPairs(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val next = pairCounts.getOrDefault(p, 0L) + sign * counts(wi)
        if (next == 0L) pairCounts.remove(p) else pairCounts.put(p, next)
        if (sign > 0)
          pairWords.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(wi)
        i += 1
      }
      // stale pairWords entries are tolerated (checked against the live
      // symbol seq on use) — rebuilding the index per merge would defeat
      // the incremental update
    }

    var wi = 0
    while (wi < words.length) { addPairs(wi, +1L); wi += 1 }

    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // argmax with the deterministic (count DESC, pair ASC) tie-break
      var best: (String, String) = null
      var bestCnt = 0L
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestCnt || (c == bestCnt && best != null && {
          val p = e.getKey
          p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)
        })) { best = e.getKey; bestCnt = c }
      }
      if (best == null || bestCnt <= 0L) exhausted = true
      else {
        merges += best
        val affected = pairWords.remove(best)
        if (affected != null) {
          val ai = affected.iterator()
          while (ai.hasNext) {
            val w = ai.next().intValue()
            val s = words(w)
            var contains = false
            var i = 0
            while (i < s.length - 1 && !contains) {
              if (s(i) == best._1 && s(i + 1) == best._2) contains = true
              i += 1
            }
            if (contains) { // skip stale index entries
              addPairs(w, -1L)
              val mergedB = Array.newBuilder[String]
              var j = 0
              while (j < s.length) {
                if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
                  mergedB += best._1 + best._2; j += 2
                } else { mergedB += s(j); j += 1 }
              }
              words(w) = mergedB.result()
              addPairs(w, +1L)
            }
          }
        }
        pairCounts.remove(best)
        step += 1
      }
    }
    Model(merges.result())
  }

  /** End-to-end train: histogram pass (distributed) + merge loop (driver,
    * bounded). The driver share is O(maxWords · avg word len) at ANY
    * corpus size — the scale contract. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1 << 20, minCount: Long = 1L): Model = {
    val hist = wordHistogram(df, textCol, maxWords, minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromHistogram(hist, numMerges)
  }

  /** Subword tokens of a text column. The model broadcasts with the task
    * closure (numMerges entries); a per-partition word→tokens memo makes
    * the per-occurrence cost a hash probe for every word the zipf head
    * repeats. */
  def tokenizeUdf(model: Model): UserDefinedFunction = {
    udf(new (String => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Seq[String]]()
      override def apply(text: String): Seq[String] = {
        if (text == null) return Seq.empty
        val m = java.util.regex.Pattern.compile(PreTokenPattern)
          .matcher(text.toLowerCase(java.util.Locale.ROOT))
        val out = Seq.newBuilder[String]
        while (m.find()) {
          val w = m.group()
          var toks = memo.get(w)
          if (toks == null) {
            toks = model.tokenizeWord(w)
            if (memo.size < 262144) memo.put(w, toks) // bound the task memo
          }
          out ++= toks
        }
        out.result()
      }
    })
  }

  def tokenize(df: DataFrame, textCol: String, model: Model,
               outCol: String = "bpe_tokens"): DataFrame =
    // a null text yields ZERO tokens, not a null row (Spark skips the UDF
    // call on null input — coalesce restores the empty-seq contract)
    df.withColumn(outCol, coalesce(tokenizeUdf(model)(col(textCol)),
      typedLit(Seq.empty[String])))

  /** Per-row subword token count — the budget/packing input the corpus
    * pipeline consumes (vs the ws/word approximations in
    * [[TextAnalysis]]). */
  def tokenCount(df: DataFrame, textCol: String, model: Model,
                 outCol: String = "n_bpe_tokens"): DataFrame =
    df.withColumn(outCol, coalesce(
      size(tokenizeUdf(model)(col(textCol))).cast("long"), lit(0L)))
}
