package graft.pipeline

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    Dedup.dedupParagraphs(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("shared paragraph survives only in its first (id, position) occurrence") {
    val got = run(Seq(
      (1L, "unique alpha\nSHARED TERMS\nunique beta"),
      (2L, "SHARED TERMS\nunique gamma"),
      (3L, "unique delta\nSHARED TERMS")))
    assert(got(1L) == (("unique alpha\nSHARED TERMS\nunique beta", 3L, 3L)))
    assert(got(2L) == (("unique gamma", 2L, 1L)))
    assert(got(3L) == (("unique delta", 2L, 1L)))
  }

  test("within-document repeats collapse to the first position") {
    val got = run(Seq((5L, "same line\nother\nsame line")))
    assert(got(5L) == (("same line\nother", 3L, 2L)))
  }

  test("matching is byte-exact and case-sensitive") {
    val got = run(Seq((1L, "Foo Bar"), (2L, "foo bar"), (3L, "Foo Bar")))
    assert(got(1L)._1 == "Foo Bar")
    assert(got(2L)._1 == "foo bar")
    assert(got(3L) == (("", 1L, 0L)), "exact repeat must fully empty doc 3")
  }

  test("empty and null texts yield empty output with zero counts") {
    val got = run(Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "\n\n")))
    Seq(1L, 2L, 3L).foreach(id => assert(got(id) == (("", 0L, 0L))))
  }

  test("multi-newline separators normalize to single newlines in the rewrite") {
    val got = run(Seq((9L, "a b\n\n\nc d")))
    assert(got(9L) == (("a b\nc d", 2L, 2L)))
  }

  test("document-level dedup cannot see sub-document boilerplate; this does") {
    val rows = Seq.tabulate(10)(i =>
      (i.toLong, s"body text of document number $i\ncommon footer all rights reserved"))
    val docLevel = Dedup.dropExactDuplicates(rows.toDF("doc_id", "text"),
      "doc_id", "text").count()
    assert(docLevel == 10, "whole-doc dedup keeps all 10 (texts differ)")
    val got = run(rows)
    assert(got.values.count(_._1.contains("common footer")) == 1)
    assert(got.values.forall(_._1.contains("body text")))
  }
}
