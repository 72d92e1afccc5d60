package graft.pipeline

import graft.SparkSpec

class RepetitionRulesSpec extends SparkSpec {

  private def rules(rows: Seq[(Long, String)]): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    TextAnalysis.withRepetitionRules(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("duplicate line and paragraph fractions match hand computation") {
    val text = "alpha beta\ngamma delta\nalpha beta\nunique line here"
    val r = rules(Seq(1L -> text))(1L)
    assert(math.abs(r.getAs[Double]("rep_dup_line_frac") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("rep_dup_line_char_frac") - 10.0 / 47) < 1e-12)
    val ptext = "para one\n\npara one\n\npara two"
    val p = rules(Seq(2L -> ptext))(2L)
    assert(math.abs(p.getAs[Double]("rep_dup_para_frac") - 1.0 / 3) < 1e-12)
    assert(math.abs(p.getAs[Double]("rep_dup_para_char_frac") - 8.0 / 24) < 1e-12)
  }

  test("n-gram coverage: top-2gram and capped dup-5gram on a cyclic doc") {
    val r = rules(Seq(1L -> "w1 w2 w3 w1 w2 w3 w1 w2 w3 filler"))(1L)
    // top 2-gram "w1 w2" (or "w2 w3"): 3 occurrences x 4 word-chars = 12
    // over 24 total word chars
    assert(math.abs(r.getAs[Double]("rep_top_2gram_frac") - 12.0 / 24) < 1e-12)
    // two duplicated 5-grams x 2 occurrences x 10 chars = 40 > 24 -> cap 1
    assert(r.getAs[Double]("rep_dup_5gram_frac") == 1.0)
    assert(!r.getAs[Boolean]("gopher_repetition_pass"))
  }

  test("top-gram takes the MOST FREQUENT repeated gram, not the max coverage") {
    // "a b" occurs 5x (5*2=10 word-chars); "commonwealth jurisdiction"
    // occurs 2x (2*25=50): the most frequent 2-gram is "a b", so the
    // fraction is 10/total, not 50/total
    val text = Seq.fill(5)("a b").mkString(" x1 ", " x2 ", " x3 ")
      .replace("x3 ", "x3 commonwealth jurisdiction y1 commonwealth jurisdiction")
    val r = rules(Seq(1L -> text))(1L)
    val wchars = text.split("\\s+").filter(_.nonEmpty).map(_.length).sum
    assert(math.abs(r.getAs[Double]("rep_top_2gram_frac") - 10.0 / wchars) < 1e-12,
      s"got ${r.getAs[Double]("rep_top_2gram_frac")} want ${10.0 / wchars}")
  }

  test("a benign unique document passes; empty document fails") {
    val r = rules(Seq(
      1L -> "the quick brown fox jumps over lazy dogs swiftly today",
      2L -> "",
      3L -> "one\ntwo\nthree\n\nfour five six"))
    assert(r(1L).getAs[Boolean]("gopher_repetition_pass"))
    (2 to 10).foreach { n =>
      val c = if (n <= 4) s"rep_top_${n}gram_frac" else s"rep_dup_${n}gram_frac"
      if (r(1L).schema.fieldNames.contains(c))
        assert(r(1L).getAs[Double](c) == 0.0, c)
    }
    assert(!r(2L).getAs[Boolean]("gopher_repetition_pass"))
    assert(r(3L).getAs[Boolean]("gopher_repetition_pass"))
    assert(r(3L).getAs[Double]("rep_dup_line_frac") == 0.0)
  }

  test("partitioning invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 50L).map(i =>
      (i, Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def run(parts: Int) = TextAnalysis.withRepetitionRules(
        docs.toDF("id", "text").repartition(parts), "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("rep_top_2gram_frac")),
        r.getDouble(r.fieldIndex("rep_dup_7gram_frac")),
        r.getBoolean(r.fieldIndex("gopher_repetition_pass")))).toSeq
    assert(run(1) == run(13))
  }
}
