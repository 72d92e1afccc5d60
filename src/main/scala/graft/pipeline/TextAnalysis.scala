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
    * Shape: relational end-to-end — one line explode, one paragraph
    * explode, ONE word explode whose window (partition id, order pos)
    * builds all nine gram sizes via lead() in a single pass, one
    * (id, n, gram) count shuffle, bounded per-doc aggregates joined back.
    * No UDFs, no per-doc collects; every fraction is a ratio of exact
    * integers so the booleans and doubles replay bit-for-bit in SQL.
    *
    * NOTE the input relation is traversed ~5 times (line, paragraph, and
    * two word-side consumers plus the final join): fine over a parquet
    * scan; persist/localCheckpoint a COMPUTED upstream relation before
    * calling, or the upstream plan executes once per traversal. */
  def withRepetitionRules(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col(textCol)
    val id = col(idCol)

    def unitStats(units: Column, name: String): DataFrame =
      df.select(id, explode(units).as("__u"))
        .groupBy(id, col("__u"))
        .agg(count(lit(1)).as("__c"), length(col("__u")).as("__len"))
        .groupBy(id).agg(
          sum(col("__c")).as(s"__${name}_n"),
          count(lit(1)).as(s"__${name}_d"),
          sum((col("__c") - 1) * col("__len")).as(s"__${name}_dupch"),
          sum(col("__c") * col("__len")).as(s"__${name}_totch"))

    val lineUnits = filter(transform(split(t, "\r?\n"), l => trim(l)),
      l => length(l) > 0)
    val paraUnits = filter(transform(split(t, "(\r?\n){2,}"), p => trim(p)),
      p => length(p) > 0)
    val lineStats = unitStats(lineUnits, "ln")
    val paraStats = unitStats(paraUnits, "pr")

    val ws = filter(split(t, "\\s+"), w => length(w) > 0)
    val words = df.select(id, posexplode(ws).as(Seq("__pos", "__w")))
    val wordChars = words.groupBy(id)
      .agg(sum(length(col("__w"))).as("__wchars"))
    val win = Window.partitionBy(id).orderBy("__pos")
    val withLeads = (1 to 9).foldLeft(words) { (acc, k) =>
      acc.withColumn(s"__l$k", lead(col("__w"), k).over(win))
    }
    val gramCols = (2 to 10).map { n =>
      val parts = col("__w") +: (1 until n).map(k => col(s"__l$k"))
      // null lead ⇒ window runs past the doc end ⇒ no gram at this pos
      when(col(s"__l${n - 1}").isNotNull, concat_ws(" ", parts: _*))
        .as(s"__g$n")
    }
    val grams = withLeads.select((id +: gramCols): _*)
      .select(id, expr(
        "stack(9, " + (2 to 10).map(n => s"$n, __g$n").mkString(", ") +
          ") as (__n, __g)"))
      .filter(col("__g").isNotNull)
    val gramStats = grams.groupBy(id, col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__gch", (length(col("__g")) - (col("__n") - 1)))
      .groupBy(id, col("__n")).agg(
        // the MOST FREQUENT gram's coverage (the Gopher definition) —
        // max count wins, coverage breaks ties; and only REPEATED grams
        // count as repetition: a unique doc's most frequent gram occurs
        // once and covers len/total of it trivially, which would fail
        // every short clean document. The composite (count, coverage)
        // order key packs into one long so the DuckDB oracle's arg_max
        // replays it exactly.
        max_by(when(col("__c") >= 2, col("__c") * col("__gch")).otherwise(0L),
          when(col("__c") >= 2,
            col("__c") * lit(10000000000L) + col("__c") * col("__gch"))
            .otherwise(0L)).as("__topch"),
        sum(when(col("__c") >= 2, col("__c") * col("__gch"))
          .otherwise(0L)).as("__dupch"))
    // wide: one row per doc with per-n columns
    val gramWide = gramStats.groupBy(id).pivot("__n", (2 to 10).map(Integer.valueOf))
      .agg(first("__topch").as("topch"), first("__dupch").as("dupch"))

    def frac(num: Column, den: Column): Column =
      when(den.isNull || den === 0L, 0.0)
        .otherwise(num.cast("double") / den.cast("double"))

    val joined = df
      .join(lineStats, Seq(idCol), "left")
      .join(paraStats, Seq(idCol), "left")
      .join(wordChars, Seq(idCol), "left")
      .join(gramWide, Seq(idCol), "left")
    val out = joined
      .withColumn("rep_dup_line_frac",
        frac(col("__ln_n") - col("__ln_d"), col("__ln_n")))
      .withColumn("rep_dup_line_char_frac",
        frac(col("__ln_dupch"), col("__ln_totch")))
      .withColumn("rep_dup_para_frac",
        frac(col("__pr_n") - col("__pr_d"), col("__pr_n")))
      .withColumn("rep_dup_para_char_frac",
        frac(col("__pr_dupch"), col("__pr_totch")))
    val withTops = (2 to 4).foldLeft(out) { (acc, n) =>
      acc.withColumn(s"rep_top_${n}gram_frac",
        frac(coalesce(col(s"${n}_topch"), lit(0L)), col("__wchars")))
    }
    val withDups = (5 to 10).foldLeft(withTops) { (acc, n) =>
      acc.withColumn(s"rep_dup_${n}gram_frac",
        least(lit(1.0), frac(coalesce(col(s"${n}_dupch"), lit(0L)),
          col("__wchars"))))
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
      .reduce(_ && _) && coalesce(col("__wchars"), lit(0L)) > 0L
    withDups.withColumn("gopher_repetition_pass", pass)
      .drop((Seq("__ln_n", "__ln_d", "__ln_dupch", "__ln_totch",
        "__pr_n", "__pr_d", "__pr_dupch", "__pr_totch", "__wchars") ++
        (2 to 10).flatMap(n => Seq(s"${n}_topch", s"${n}_dupch"))): _*)
  }

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
