package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extension beyond the reference surface, BASELINE.json).
  *
  * Everything here is row-local: no shuffles, no driver state. The
  * heuristics stay inside whole-stage codegen where expressible
  * (token/char stats, language scores); only the rolling fingerprint is a
  * Scala UDF (tight per-row loop over the string, no allocation per char).
  */
object TextAnalysis {

  // ---- token counting ----

  /** Whitespace token count: chars - chars-without-spaces + 1. Identical
    * arithmetic is mirrored in the DuckDB oracle. */
  def wsTokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** BPE-ish word-token count: runs of [a-z0-9] after lowercasing — a cheap
    * stand-in for subword tokenization that both engines compute identically. */
  def wordTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))).cast("long")

  def withTokenStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_ws_tokens", wsTokenCount(col(textCol)))
      .withColumn("n_word_tokens", wordTokenCount(col(textCol)))

  // ---- language ID (n-gram/stopword heuristic) ----

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour", "des", "du"),
    "es" -> Seq("el", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con"))

  /** Stopword-hit score for one language: distinct stopwords present. */
  private def langScore(tokens: Column, lang: String): Column =
    size(array_intersect(tokens, typedLit(stopwords(lang))))

  /** Fraction of CJK codepoints — decides zh before the stopword vote. */
  def cjkRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Heuristic language ID over {en, de, fr, es, zh}; "und" when nothing
    * matches. Deterministic ties: fixed language priority order. */
  def langId(text: Column): Column = {
    val tokens = split(lower(text), "\\s+")
    val s = Seq("en", "de", "fr", "es").map(l => l -> langScore(tokens, l))
    val best = s.map(_._2).reduce((a, b) => greatest(a, b))
    // chained when(): earlier languages win ties (fixed priority order)
    val voteOrdered = s.foldLeft(Option.empty[Column]) {
      case (None, (l, sc)) => Some(when(sc === best && best > 0, lit(l)))
      case (Some(c), (l, sc)) => Some(c.when(sc === best && best > 0, lit(l)))
    }.get.otherwise(lit("und"))
    when(cjkRatio(text) > 0.3, lit("zh")).otherwise(voteOrdered)
  }

  /** Column-decomposed form of [[langId]]: the token split and per-
    * language scores materialize as intermediate projected columns, so
    * each evaluates ONCE per row. The single-Column form embeds a copy of
    * the split subtree in every score/tie-break reference (~12 copies) and
    * physical-level subexpression elimination does not recover them inside
    * the when() chain — measured 2.6x slower on the sf0.1 corpus.
    * CollapseProject keeps the temps materialized because each alias is
    * referenced more than once. Same expressions, same tie-break order,
    * same oracle. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val langs = Seq("en", "de", "fr", "es")
    val base = df.withColumn("__li_toks", split(lower(col(textCol)), "\\s+"))
    val scored = langs.foldLeft(base)((d, l) =>
      d.withColumn(s"__li_s_$l", langScore(col("__li_toks"), l)))
    val best = langs.map(l => col(s"__li_s_$l")).reduce(greatest(_, _))
    val vote = langs.foldLeft(Option.empty[Column]) {
      case (None, l) => Some(when(col(s"__li_s_$l") === best && best > 0, lit(l)))
      case (Some(c), l) => Some(c.when(col(s"__li_s_$l") === best && best > 0, lit(l)))
    }.get.otherwise(lit("und"))
    scored.withColumn("lang_pred",
        when(cjkRatio(col(textCol)) > 0.3, lit("zh")).otherwise(vote))
      .drop("__li_toks" +: langs.map(l => s"__li_s_$l"): _*)
  }

  // ---- quality scoring ----

  /** Composite [0,1] quality score from length / stopword density /
    * alphabetic ratio / mean token length — the standard cheap filters in
    * web-scale corpus cleaning. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val tokens = split(lower(text), "\\s+")
    val nTokens = greatest(size(tokens), lit(1)).cast("double")
    val lenScore = least(nChars / 500.0, lit(1.0))
    val stopHits = Seq("en", "de", "fr", "es")
      .map(l => size(array_intersect(tokens, typedLit(stopwords(l)))))
      .reduce(_ + _).cast("double")
    val stopScore = least(stopHits / 5.0, lit(1.0))
    val alphaRatio = length(regexp_replace(lower(text), "[^a-z\\x{4e00}-\\x{9fff}]", ""))
      .cast("double") / greatest(nChars, lit(1.0))
    val meanTokLen = nChars / nTokens
    val tokLenScore = when(meanTokLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    // +1e-9 before round(4): the nice-decimal weights put some scores
    // EXACTLY on the 4th-decimal .5 boundary (e.g. 0.49925), where rounding
    // implementations legitimately disagree (BigDecimal HALF_UP on the
    // binary value vs multiply-then-round). The epsilon shifts the boundary
    // off the representable point; the oracle applies the same nudge.
    round(lenScore * 0.3 + stopScore * 0.2 + alphaRatio * 0.3 + tokLenScore * 0.2
      + 1e-9, 4)
  }

  /** Column-decomposed form of [[qualityScore]] (same rationale as
    * [[withLangId]]): tokens materialize once instead of once per
    * stopword-intersect reference. Identical arithmetic and rounding. */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val base = df.withColumn("__qs_toks", split(lower(text), "\\s+"))
    val nChars = length(text).cast("double")
    val nTokens = greatest(size(col("__qs_toks")), lit(1)).cast("double")
    val stopHits = Seq("en", "de", "fr", "es")
      .map(l => size(array_intersect(col("__qs_toks"), typedLit(stopwords(l)))))
      .reduce(_ + _).cast("double")
    val alphaRatio = length(regexp_replace(lower(text), "[^a-z\\x{4e00}-\\x{9fff}]", ""))
      .cast("double") / greatest(nChars, lit(1.0))
    val tokLenScore = when((nChars / nTokens).between(3.0, 12.0), 1.0).otherwise(0.3)
    base.withColumn("quality_score",
        round(least(nChars / 500.0, lit(1.0)) * 0.3
          + least(stopHits / 5.0, lit(1.0)) * 0.2
          + alphaRatio * 0.3 + tokLenScore * 0.2 + 1e-9, 4))
      .drop("__qs_toks")
  }

  // ---- repetition (Gopher-style duplicate n-gram fraction) ----

  /** Intra-document repetition: `1 − distinct/total` word n-grams — the
    * duplicate-n-gram fraction of the Gopher quality filters (Rae et al.
    * 2021, §A1.1). High values flag boilerplate/spam/looping generations.
    * Row-local array built-ins (NON-distinct gram list, unlike the dedup
    * shingles), SQL-mirrorable bit-for-bit. */
  /** The NAMED rule packs of web-corpus filtering, as per-rule boolean
    * columns: the Gopher quality rules (Rae et al. 2021, Appendix A) and
    * the doc-level C4 signals (Raffel et al. 2020). All codegen'd Column
    * arithmetic over one tokenize + one line split — no UDFs — and every
    * definition is SQL-replayable, so the whole rule table has a strict
    * oracle. Use downstream as `filter(col("gopher_pass"))` or inspect
    * per-rule to tune; the composite [[qualityScore]] is the soft-score
    * sibling.
    *
    * Added columns (BOOLEAN unless noted):
    *   gopher_word_count      — 50 <= words <= 100,000
    *   gopher_mean_word_len   — 3 <= mean word length <= 10
    *   gopher_symbol_ratio    — '#' / words <= 0.1 AND '...' / words <= 0.1
    *                            (each symbol thresholded separately, per
    *                            the paper's "either ... or" wording)
    *   gopher_bullet_lines    — <= 90% of lines start with a bullet
    *   gopher_ellipsis_lines  — <= 30% of lines end with ... / ellipsis
    *   gopher_alpha_words     — >= 80% of words contain a letter
    *   gopher_stop_words      — >= 2 distinct of the 8 Gopher stop words
    *                            (case-insensitive)
    *   gopher_pass            — AND of the seven
    *   c4_terminal_punct_frac — DOUBLE, fraction of lines ending . ! ? "
    *   c4_has_brace           — text contains '{' (code/markup signal)
    *   c4_has_lorem_ipsum     — lowercase text contains 'lorem ipsum'
    *
    * Empty documents (no words / no non-blank lines) fail every gopher
    * rule and score 0 terminal punctuation. */
  def withQualityRules(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val base = df
      .withColumn("__qr_ws", filter(split(t, "\\s+"), w => length(w) > 0))
      .withColumn("__qr_lines", // \r?\n: CRLF web text must not leave \r tails
        filter(transform(split(t, "\r?\n"), l => trim(l)), l => length(l) > 0))
    val ws = col("__qr_ws")
    val lines = col("__qr_lines")
    val nWords = size(ws).cast("long")
    val nLines = size(lines).cast("long")
    val sumWordLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val meanWordLen = sumWordLen.cast("double") / nWords.cast("double")
    val hashes = (length(t) - length(translate(t, "#", ""))).cast("long")
    val ellipses = ((length(t) -
      length(call_function("replace", t, lit("..."), lit("")))) / 3).cast("long")
    // Rae et al. threshold EACH symbol's ratio separately ("either the
    // hash symbol or the ellipsis"), not their sum
    val hashRatio = hashes.cast("double") / nWords.cast("double")
    val ellipsisRatio = ellipses.cast("double") / nWords.cast("double")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("double") / nLines.cast("double")
    val ellipsisFrac = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…")))
      .cast("double") / nLines.cast("double")
    val alphaFrac = size(filter(ws, w => w.rlike("[A-Za-z]")))
      .cast("double") / nWords.cast("double")
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    // case-insensitive: sentence-initial "The"/"That" must count
    val stopHits = size(array_intersect(
      transform(ws, w => lower(w)), typedLit(gopherStops)))
    // NULL text makes nWords/nLines NULL (size(null) is null), so guard
    // isNull explicitly — otherwise `when(nWords === 0L, …)` falls through
    // and every rule comes out NULL instead of the documented false/0.0.
    val termFrac = when(nLines.isNull || nLines === 0L, 0.0).otherwise(
      size(filter(lines, l => l.endsWith(".") || l.endsWith("!") ||
        l.endsWith("?") || l.endsWith("\"")))
        .cast("double") / nLines.cast("double"))
    def rule(c: Column): Column =
      when(nWords.isNull || nWords === 0L, lit(false)).otherwise(c)
    val out = base
      .withColumn("gopher_word_count", rule(nWords.between(50L, 100000L)))
      .withColumn("gopher_mean_word_len", rule(meanWordLen.between(3.0, 10.0)))
      .withColumn("gopher_symbol_ratio",
        rule(hashRatio <= 0.1 && ellipsisRatio <= 0.1))
      .withColumn("gopher_bullet_lines", rule(bulletFrac <= 0.9))
      .withColumn("gopher_ellipsis_lines", rule(ellipsisFrac <= 0.3))
      .withColumn("gopher_alpha_words", rule(alphaFrac >= 0.8))
      .withColumn("gopher_stop_words", rule(stopHits >= 2))
      .withColumn("c4_terminal_punct_frac", termFrac)
      .withColumn("c4_has_brace", coalesce(t.contains("{"), lit(false)))
      .withColumn("c4_has_lorem_ipsum",
        coalesce(lower(t).contains("lorem ipsum"), lit(false)))
    out.withColumn("gopher_pass",
        col("gopher_word_count") && col("gopher_mean_word_len") &&
        col("gopher_symbol_ratio") && col("gopher_bullet_lines") &&
        col("gopher_ellipsis_lines") && col("gopher_alpha_words") &&
        col("gopher_stop_words"))
      .drop("__qr_ws", "__qr_lines")
  }

  /** The C4 line-level cleaner (Raffel et al. 2020 §2.2) — the REWRITE
    * sibling of the scoring packs: keep only lines that (a) end in a
    * terminal punctuation mark (. ! ? "), (b) carry at least
    * `minWordsPerLine` words, (c) mention neither "javascript" nor
    * "lorem ipsum" (case-insensitive), and (d) contain no '{'. Returns
    * `(input columns…, text_clean, n_lines, n_lines_kept, doc_keep)` where
    * `text_clean` is the kept lines re-joined with newlines and `doc_keep`
    * applies the doc-level floor (`minLinesPerDoc` kept lines — C4's
    * five-sentence floor, line-approximated). Entirely row-local Column
    * HOFs over one line split — codegen end-to-end, no explode, no UDF,
    * nothing shuffles. */
  def c4CleanLines(df: DataFrame, textCol: String, minWordsPerLine: Int = 3,
                   minLinesPerDoc: Int = 5): DataFrame = {
    val t = col(textCol)
    val lines = filter(transform(split(t, "\r?\n"), l => trim(l)),
      l => length(l) > 0)
    val kept = filter(lines, l => {
      val low = lower(l)
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWordsPerLine &&
        !low.contains("javascript") && !low.contains("lorem ipsum") &&
        !l.contains("{")
    })
    df.withColumn("__c4_lines", lines)
      .withColumn("__c4_kept", kept)
      .withColumn("text_clean", array_join(col("__c4_kept"), "\n"))
      .withColumn("n_lines", size(col("__c4_lines")).cast("long"))
      .withColumn("n_lines_kept", size(col("__c4_kept")).cast("long"))
      .withColumn("doc_keep", col("n_lines_kept") >= minLinesPerDoc)
      .drop("__c4_lines", "__c4_kept")
  }

  /** The Gopher REPETITION rule pack (Rae et al. 2021, Appendix A — the
    * within-document half; [[withQualityRules]] is the quality half), the
    * filter set Dolma/RefinedWeb run in production. Thirteen fractions per
    * document plus the composite boolean:
    *
    *   rep_dup_line_frac       <= 0.30  lines that repeat an earlier line
    *   rep_dup_line_char_frac  <= 0.20  chars in those repeat occurrences
    *   rep_dup_para_frac       <= 0.30  same, paragraph granularity
    *   rep_dup_para_char_frac  <= 0.20
    *   rep_top_{2,3,4}gram_frac<= 0.20/0.18/0.16  word-chars covered by the
    *                                    most frequent REPEATED word n-gram
    *                                    (count >= 2; 0 when nothing
    *                                    repeats — a unique doc's top gram
    *                                    trivially covers len/total)
    *   rep_dup_{5..10}gram_frac<= 0.15/0.14/0.13/0.12/0.11/0.10  word-chars
    *                                    covered by ALL n-grams occurring
    *                                    twice+ (overlap-agnostic sum, capped
    *                                    at 1 — the RefinedWeb practical
    *                                    definition)
    *   gopher_repetition_pass  = AND of the thirteen (false for empty docs)
    *
    * Definitions pinned for cross-engine replay: a "duplicate" unit is any
    * occurrence beyond a unit's first (frac = (n_units - n_distinct) /
    * n_units; char frac = chars of those occurrences / total unit chars);
    * n-gram coverage counts WORD chars (gram string length minus its n-1
    * separator spaces) over the doc's total word chars.
    *
    * Shape (r18 optimization): ROW-LOCAL end-to-end — every one of the
    * thirteen fractions is a per-document function, so they all compute
    * in ONE fused per-doc pass (a single UDF returning the integer stats
    * struct) over a single scan: no shuffles, no joins, no windows. The
    * r17 relational shape paid 22 Exchanges (2 unit explodes × 2
    * groupBys, a full word-stream window + stack + two gram groupBys +
    * pivot, 4 joins back) to move per-doc token streams around the
    * cluster; at 100 TB the token stream IS the corpus — this shape never
    * shuffles it (measured: 2.73 s → see OPTIMIZATION_r18.md; a pure
    * Column-HOF row-local formulation was also tried and REJECTED at
    * 7.5 s — interpreted lambda folds allocate a struct per gram). The
    * UDF mirrors Spark expression semantics exactly: split = Java regex
    * with limit −1, trim = the ' '-only StringTrim, length = code points
    * (UTF8String.numChars); gram winners use the identical packed
    * (count·10^10 + count·coverage) long key the old max_by shuffle
    * used. Every fraction remains a ratio of exact integers so booleans
    * and doubles replay bit-for-bit in SQL (oracle unchanged,
    * hash-verified). */
  def withRepetitionRules(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val t = col(textCol)

    def frac(num: Column, den: Column): Column =
      when(den.isNull || den === 0L, 0.0)
        .otherwise(num.cast("double") / den.cast("double"))

    val withStats = df.withColumn("__rep", repStatsUdf(t))
    val out = withStats
      .withColumn("rep_dup_line_frac",
        frac(col("__rep.ln.n") - col("__rep.ln.d"), col("__rep.ln.n")))
      .withColumn("rep_dup_line_char_frac",
        frac(col("__rep.ln.dupch"), col("__rep.ln.totch")))
      .withColumn("rep_dup_para_frac",
        frac(col("__rep.pr.n") - col("__rep.pr.d"), col("__rep.pr.n")))
      .withColumn("rep_dup_para_char_frac",
        frac(col("__rep.pr.dupch"), col("__rep.pr.totch")))
    val withTops = (2 to 4).foldLeft(out) { (acc, n) =>
      acc.withColumn(s"rep_top_${n}gram_frac",
        frac(col("__rep.grams")(n - 2)("topch"), col("__rep.wchars")))
    }
    val withDups = (5 to 10).foldLeft(withTops) { (acc, n) =>
      acc.withColumn(s"rep_dup_${n}gram_frac",
        least(lit(1.0), frac(col("__rep.grams")(n - 2)("dupch"),
          col("__rep.wchars"))))
    }
    val thresholds = Seq(
      "rep_dup_line_frac" -> 0.30, "rep_dup_line_char_frac" -> 0.20,
      "rep_dup_para_frac" -> 0.30, "rep_dup_para_char_frac" -> 0.20,
      "rep_top_2gram_frac" -> 0.20, "rep_top_3gram_frac" -> 0.18,
      "rep_top_4gram_frac" -> 0.16, "rep_dup_5gram_frac" -> 0.15,
      "rep_dup_6gram_frac" -> 0.14, "rep_dup_7gram_frac" -> 0.13,
      "rep_dup_8gram_frac" -> 0.12, "rep_dup_9gram_frac" -> 0.11,
      "rep_dup_10gram_frac" -> 0.10)
    val pass = thresholds.map { case (c, thr) => col(c) <= thr }
      .reduce(_ && _) && coalesce(col("__rep.wchars"), lit(0L)) > 0L
    withDups.withColumn("gopher_repetition_pass", pass)
      .drop("__rep")
  }

  /** Per-unit duplicate stats: n units, d distinct, dupch = chars of
    * occurrences beyond each unit's first, totch = total unit chars.
    * Char counts are CODE POINTS (Spark `length` semantics). */
  final case class RepUnitStats(n: Long, d: Long, dupch: Long, totch: Long)

  /** Per-n gram stats: topch = the most frequent REPEATED gram's coverage
    * (count·word-chars; ties by the packed key resolve to the same
    * value), dupch = Σ count·word-chars over grams with count ≥ 2. */
  final case class RepGramStats(topch: Long, dupch: Long)

  /** All integer inputs of the thirteen Gopher repetition fractions,
    * computed in one pass over the document (grams index 0..8 ⇔ n=2..10). */
  final case class RepStats(ln: RepUnitStats, pr: RepUnitStats,
                            wchars: Long, grams: Seq[RepGramStats])

  private val EmptyRepStats = RepStats(RepUnitStats(0L, 0L, 0L, 0L),
    RepUnitStats(0L, 0L, 0L, 0L), 0L,
    Seq.fill(9)(RepGramStats(0L, 0L)))

  private val LineRe = java.util.regex.Pattern.compile("\r?\n")
  private val ParaRe = java.util.regex.Pattern.compile("(\r?\n){2,}")
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim` semantics: the ' ' character only (NOT Java trim's
    * all-controls ≤ 0x20), so results match the old trim() expression. */
  private def sparkTrim(s: String): String = {
    var from = 0; var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  /** Spark `length` semantics on strings: code points, not UTF-16 units. */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  private def unitStatsOf(units: Array[String]): RepUnitStats = {
    // single pass: count + total chars overall, first-seen chars per
    // distinct unit (dupch = totch − Σ first-seen lens)
    val seen = new java.util.HashMap[String, Object]()
    var n = 0L; var totch = 0L; var firstch = 0L
    var i = 0
    while (i < units.length) {
      val u = units(i)
      if (u.nonEmpty) {
        val len = cpLen(u)
        n += 1; totch += len
        if (seen.put(u, java.lang.Boolean.TRUE) == null) firstch += len
      }
      i += 1
    }
    RepUnitStats(n, seen.size.toLong, totch - firstch, totch)
  }

  private def repStatsOf(text: String): RepStats = {
    if (text == null) return EmptyRepStats
    val lines = LineRe.split(text, -1).map(sparkTrim)
    val paras = ParaRe.split(text, -1).map(sparkTrim)
    val words = WsRe.split(text, -1).filter(_.nonEmpty)
    val w = words.length
    // prefix code-point lengths: gram word-chars = plen(i+n) − plen(i)
    val plen = new Array[Long](w + 1)
    var i = 0
    while (i < w) { plen(i + 1) = plen(i) + cpLen(words(i)); i += 1 }
    val grams = (2 to 10).map { n =>
      if (w < n) RepGramStats(0L, 0L)
      else {
        // count per gram CONTENT (exact — HashMap compares on collision);
        // value = (count, word-chars), word-chars identical for equal
        // content so any instance's value serves
        val counts = new java.util.HashMap[String, Array[Long]]((w - n + 1) * 2)
        val sb = new java.lang.StringBuilder(64)
        var p = 0
        while (p <= w - n) {
          sb.setLength(0)
          var j = p
          while (j < p + n) {
            if (j > p) sb.append(' ')
            sb.append(words(j))
            j += 1
          }
          val g = sb.toString
          val e = counts.get(g)
          if (e == null) counts.put(g, Array(1L, plen(p + n) - plen(p)))
          else e(0) += 1L
          p += 1
        }
        // winner by the packed (count, coverage) key — the exact long the
        // relational max_by used, so equal keys give the equal coverage
        var topkey = 0L; var topch = 0L; var dupch = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e(0)
          if (c >= 2L) {
            val cov = c * e(1)
            dupch += cov
            val key = c * 10000000000L + cov
            if (key > topkey) { topkey = key; topch = cov }
          }
        }
        RepGramStats(topch, dupch)
      }
    }
    RepStats(unitStatsOf(lines), unitStatsOf(paras), plen(w), grams)
  }

  /** One fused per-doc pass behind [[withRepetitionRules]] — see its
    * docstring for why this beats both the relational (22-Exchange) and
    * the Column-HOF formulations. */
  private val repStatsUdf =
    udf((text: String) => repStatsOf(text))

  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val toksExpr = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    // token array hoisted into a lambda variable (see Dedup.sqlShingles):
    // a direct reference inside the per-gram lambda would re-tokenize once
    // per gram
    val grams = flatten(transform(array(toksExpr), toks =>
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))))
    // +1e-9 before round(4): same boundary nudge as qualityScore
    round(lit(1.0) - size(array_distinct(grams)).cast("double")
      / greatest(size(grams), lit(1)).cast("double") + lit(1e-9), 4)
  }

  def withRepetition(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("repetition_ratio", repetitionRatio(col(textCol), n))

  // ---- PII redaction ----

  /** PII patterns, deliberately inside the RE2-compatible subset (no
    * lookarounds, ASCII classes) so the DuckDB oracle runs the IDENTICAL
    * pattern strings. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{3,4}"

  /** Redact emails / IPv4 addresses / international phone numbers and keep
    * per-category match counts — the audit trail a compliance scrub of a
    * training corpus needs. Row-local codegen'd regex work: no shuffle, no
    * UDF, scales linearly with the corpus.
    *
    * Counts are taken on the ORIGINAL text; scrub order is
    * email → ip → phone, and the replacement tokens contain no digits or
    * '@', so one category's replacement can never manufacture (or destroy)
    * a later category's match. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(t,
          EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>"))
  }

  // ---- distributional quality signals ----

  /** Shannon entropy (bits per character) of the document's codepoint
    * distribution — low entropy flags repetitive boilerplate, padding, or
    * degenerate generations; a standard cheap quality cut alongside the
    * heuristic score. Row-local by necessity (per-row histogram is not
    * expressible in builtins without a per-character shuffle); double
    * arithmetic, summation-order differences vs an oracle are absorbed by
    * the +1e-9 round(4) both sides apply (error ~1e-12 against a 5e-5
    * rounding boundary). Codepoints, not UTF-16 units, so CJK text counts
    * the way a SQL engine's character split does. */
  val charEntropyUdf = udf { text: String =>
    if (text == null || text.isEmpty) 0.0
    else {
      val counts = new scala.collection.mutable.HashMap[Int, Int]()
      val it = text.codePoints().iterator()
      var n = 0
      while (it.hasNext) {
        val cp = it.next()
        counts.update(cp, counts.getOrElse(cp, 0) + 1)
        n += 1
      }
      var h = 0.0
      counts.valuesIterator.foreach { c =>
        val p = c.toDouble / n
        h -= p * math.log(p)
      }
      h / math.log(2.0)
    }
  }

  def withCharEntropy(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("char_entropy",
      round(charEntropyUdf(col(textCol)) + 1e-9, 4))

  /** DEFLATE compression ratio (compressed/raw bytes, level 6, raw
    * stream): the Dolma/RedPajama-style repetition signal — highly
    * repetitive documents compress far below prose. Deterministic for a
    * given JDK zlib. The KERNEL is not SQL-mirrorable (no SQL zlib), but
    * the row-level mapping is strictly verifiable by inlining driver-
    * computed expected ratios into the oracle (TextQueries.text_deflate);
    * determinism + repetition ordering contracted in PipelineSpec. */
  def deflateRatio(text: String): Double =
    if (text == null || text.isEmpty) 1.0
    else {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      total.toDouble / bytes.length
    }

  val deflateRatioUdf = udf(deflateRatio _)

  def withDeflateRatio(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("deflate_ratio",
      round(deflateRatioUdf(col(textCol)) + 1e-9, 4))

  // ---- fingerprints ----

  /** Canonical-form md5: lowercase, collapse whitespace, trim. SQL-mirrored
    * in the DuckDB oracle. */
  def fingerprintMd5(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Rolling (Karp-Rabin) content fingerprint: minimum 64-bit hash over
    * all w-char windows of the normalized text — winnowing-style, robust to
    * local edits. Deterministic across runs/JVMs. */
  val rollingFingerprint: (String, Int) => Long = (text: String, w: Int) => {
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    val B = 1099511628211L // FNV-ish odd multiplier, mod 2^64 arithmetic
    if (s.length <= w) {
      var h = 0L; var i = 0
      while (i < s.length) { h = h * B + s.charAt(i); i += 1 }
      h
    } else {
      var pow = 1L
      var j = 0
      while (j < w - 1) { pow *= B; j += 1 }
      var h = 0L; var i = 0
      while (i < w) { h = h * B + s.charAt(i); i += 1 }
      var min = h
      while (i < s.length) {
        h = (h - s.charAt(i - w) * pow) * B + s.charAt(i)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  // ---- corpus-likelihood quality (CCNet-style LM scoring) ----

  /** Normalized text shared by the trigram model and its oracle. */
  private def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Char-trigram corpus log-loss: score each document by the average
    * negative log-likelihood of its character trigrams under a
    * unigram-of-trigrams model fit on the corpus itself — the cheap
    * analogue of CCNet's KenLM-perplexity quality signal (docs that look
    * unlike the corpus — junk, wrong charset, boilerplate-free noise —
    * score high). Adds `n_trigrams` and `trigram_logloss` (nats,
    * round(4); null when the normalized text has < 3 chars).
    *
    * Scale shape: trigram counts are one explode + hash aggregate
    * (map-side partials); the model is collected driver-side and
    * broadcast — vocabulary is charset-bounded, enforced by `maxVocab`
    * (fail fast rather than silently truncate: a blowup means the corpus
    * needs charset cleaning first, and a silent cap would bias scores).
    * Scoring is then row-local.
    *
    * Determinism (what makes a strict oracle possible for a float
    * aggregate): each doc's fold runs in TEXT ORDER inside one row-local
    * pass, so the double summation order is fixed — the oracle replays
    * the same left-to-right fold and lands on the identical double. */
  def withTrigramLogLoss(df: DataFrame, textCol: String,
                         maxVocab: Int = 1 << 22): DataFrame = {
    val spark = df.sparkSession
    val grams = df.select(explode(trigramsUdf(normText(col(textCol)))).as("g"))
      .groupBy("g").count()
      // persisted across the guard + collect pair below: without it the
      // corpus-wide explode+groupBy would be COMPUTED TWICE (once for the
      // count job, once for the collect)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = try {
      // enforce maxVocab DISTRIBUTED, before any driver materialization:
      // the guard must fire before the OOM risk it exists to prevent, so
      // count the distinct vocabulary as a job and only then collect
      val vocabSize = grams.count()
      require(vocabSize <= maxVocab,
        s"trigram vocabulary $vocabSize exceeds maxVocab=$maxVocab — " +
          "clean the corpus charset (or raise the bound) before LM scoring")
      grams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    } finally grams.unpersist(false)
    val total = model.valuesIterator.sum.toDouble
    require(total > 0.0,
      "trigram model is empty (no document has >= 3 normalized chars) — " +
        "an all-null scoring column would be silent garbage, fail instead")
    val bc = spark.sparkContext.broadcast(model)
    val score = udf { text: String =>
      if (text == null || text.length < 3) null
      else {
        val m = bc.value
        var s = 0.0
        var i = 0
        val ng = text.length - 2
        while (i < ng) {
          s += -math.log(m.getOrElse(text.substring(i, i + 3), 1L) / total)
          i += 1
        }
        java.lang.Double.valueOf(s / ng)
      }
    }
    df.withColumn("n_trigrams",
        greatest(length(normText(col(textCol))) - 2, lit(0)).cast("long"))
      // +1e-9 before round(4): same boundary nudge as qualityScore
      .withColumn("trigram_logloss",
        round(score(normText(col(textCol))) + lit(1e-9), 4))
  }

  /** All char trigrams of a (pre-normalized) string, with multiplicity. */
  private val trigramsUdf = udf { s: String =>
    if (s == null || s.length < 3) Seq.empty[String]
    else (0 to s.length - 3).map(i => s.substring(i, i + 3))
  }

  def withFingerprints(df: DataFrame, textCol: String, window: Int = 16): DataFrame = {
    val fpRolling = udf((t: String) => rollingFingerprint(t, window))
    df.withColumn("fp_md5", fingerprintMd5(col(textCol)))
      .withColumn("fp_rolling", fpRolling(col(textCol)))
  }
}
