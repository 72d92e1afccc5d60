package graft.pipeline

import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {

  private def rules(rows: Seq[(Long, String)]): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    TextAnalysis.withQualityRules(rows.toDF("id", "text"), "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private val goodBody = // 60 words, letters, 3 distinct gopher stop words
    (Seq.fill(12)("the cat sat with that") :+ "").mkString(" ").trim

  test("a clean document passes every gopher rule") {
    val r = rules(Seq(1L -> goodBody))(1L)
    for (c <- Seq("gopher_word_count", "gopher_mean_word_len",
      "gopher_symbol_ratio", "gopher_bullet_lines", "gopher_ellipsis_lines",
      "gopher_alpha_words", "gopher_stop_words", "gopher_pass"))
      assert(r.getAs[Boolean](c), c)
    assert(!r.getAs[Boolean]("c4_has_brace"))
    assert(!r.getAs[Boolean]("c4_has_lorem_ipsum"))
  }

  test("each rule fails on its targeted pathology, others keep passing") {
    val bullets = (1 to 10).map(i => s"- item $i of the list with that thing here").mkString("\n")
    val ellipses = (1 to 10).map(i => s"the line $i with that trailing dots here ...").mkString("\n")
    val symbols = goodBody + " " + Seq.fill(10)("###").mkString(" ")
    val numbers = (Seq.fill(30)("12345 67890") :+ "the with that").mkString(" ")
    val short = "the cat with that"
    val r = rules(Seq(1L -> bullets, 2L -> ellipses, 3L -> symbols,
      4L -> numbers, 5L -> short))
    assert(!r(1L).getAs[Boolean]("gopher_bullet_lines")) // 100% bullet lines
    assert(r(1L).getAs[Boolean]("gopher_alpha_words"))
    assert(!r(2L).getAs[Boolean]("gopher_ellipsis_lines")) // 100% ... lines
    assert(!r(3L).getAs[Boolean]("gopher_symbol_ratio")) // 30 hashes / 70 words
    assert(!r(4L).getAs[Boolean]("gopher_alpha_words")) // 60/63 numeric words
    assert(!r(5L).getAs[Boolean]("gopher_word_count")) // 4 words < 50
    assert(r.values.forall(!_.getAs[Boolean]("gopher_pass")))
  }

  test("c4 signals: terminal punctuation fraction, braces, lorem ipsum") {
    val r = rules(Seq(
      1L -> "First line ends well.\nsecond does not\nThird asks?",
      2L -> "function f() { return 1 }",
      3L -> "Classic filler Lorem Ipsum dolor sit amet."))
    assert(math.abs(r(1L).getAs[Double]("c4_terminal_punct_frac") - 2.0 / 3) < 1e-12)
    assert(r(2L).getAs[Boolean]("c4_has_brace"))
    assert(r(3L).getAs[Boolean]("c4_has_lorem_ipsum"))
  }

  test("c4CleanLines keeps exactly the compliant lines and applies the doc floor") {
    import spark.implicits._
    val text = Seq(
      "This proper sentence stays right here.",
      "no punct so dropped",
      "Too short.",
      "Sneaky JavaScript line gets removed here.",
      "A lorem ipsum line is also removed now.",
      "Braces { disqualify this whole line too.",
      "Ends with a question properly asked, yes?").mkString("\n")
    val got = TextAnalysis.c4CleanLines(
        Seq((1L, text)).toDF("id", "text"), "text", minWordsPerLine = 3,
        minLinesPerDoc = 2)
      .select("text_clean", "n_lines", "n_lines_kept", "doc_keep").head()
    assert(got.getString(0) ==
      "This proper sentence stays right here.\nEnds with a question properly asked, yes?")
    assert(got.getLong(1) == 7L && got.getLong(2) == 2L)
    assert(got.getBoolean(3))
    val strict = TextAnalysis.c4CleanLines(
        Seq((1L, text)).toDF("id", "text"), "text", minLinesPerDoc = 5)
      .select("doc_keep").head()
    assert(!strict.getBoolean(0)) // 2 kept < 5
  }

  test("CRLF line endings behave exactly like LF (no \\r tails)") {
    val lf = "First line ends well.\nsecond does not\nThird asks?"
    val crlf = lf.replace("\n", "\r\n")
    val r = rules(Seq(1L -> lf, 2L -> crlf))
    assert(r(1L).getAs[Double]("c4_terminal_punct_frac") ==
      r(2L).getAs[Double]("c4_terminal_punct_frac"))
    val gotLf = TextAnalysis.c4CleanLines(
      { import spark.implicits._; Seq((1L, lf)).toDF("id", "text") }, "text",
      minWordsPerLine = 3, minLinesPerDoc = 1).select("text_clean").head().getString(0)
    val gotCrlf = TextAnalysis.c4CleanLines(
      { import spark.implicits._; Seq((1L, crlf)).toDF("id", "text") }, "text",
      minWordsPerLine = 3, minLinesPerDoc = 1).select("text_clean").head().getString(0)
    assert(gotLf == gotCrlf && gotLf.nonEmpty)
  }

  test("title-case stop words count; symbol ratios threshold separately") {
    // 'The'/'That'/'With' only capitalized — must still satisfy the floor
    val caps = (Seq.fill(12)("The Cat Sat With That") :+ "").mkString(" ").trim
    assert(rules(Seq(1L -> caps))(1L).getAs[Boolean]("gopher_stop_words"))
    // 60 words + 4 hashes + 4 ellipses: each ratio 4/68 ~ 0.059 <= 0.1 —
    // the paper thresholds each symbol separately, the sum (0.118) must
    // NOT fail the rule
    val sym = goodBody + " " + "# # # # ... ... ... ..."
    assert(rules(Seq(1L -> sym))(1L).getAs[Boolean]("gopher_symbol_ratio"))
  }

  test("empty and null documents get FALSE (not NULL) on every rule and 0.0 punct") {
    import spark.implicits._
    val df = Seq((1L, Some("")), (2L, None), (3L, Some("   \n  ")))
      .toDF("id", "text")
    val got = TextAnalysis.withQualityRules(df, "text").collect()
    val boolCols = Seq("gopher_word_count", "gopher_mean_word_len",
      "gopher_symbol_ratio", "gopher_bullet_lines", "gopher_ellipsis_lines",
      "gopher_alpha_words", "gopher_stop_words", "gopher_pass",
      "c4_has_brace", "c4_has_lorem_ipsum")
    got.foreach { r =>
      for (c <- boolCols) {
        assert(!r.isNullAt(r.fieldIndex(c)), s"id=${r.getLong(0)} $c is NULL")
        assert(!r.getAs[Boolean](c), s"id=${r.getLong(0)} $c")
      }
      assert(!r.isNullAt(r.fieldIndex("c4_terminal_punct_frac")))
      assert(r.getAs[Double]("c4_terminal_punct_frac") == 0.0)
    }
  }
}
