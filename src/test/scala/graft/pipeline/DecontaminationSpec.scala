package graft.pipeline

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {

  // 4-gram shingles over small fixtures keep overlaps hand-checkable
  private val N = 4

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains the benchmark run
      (2L, "one two three four five six seven"), // disjoint
      (3L, "alpha beta gamma delta"), // exactly the benchmark 4-gram
      (4L, "zeta alpha beta gamma delta"), // shifted — two overlapping 4-grams
      (5L, "short text") // below shingle size → whole-text shingle
    ).toDF("doc_id", "text")
  }

  private def benchmark = {
    import spark.implicits._
    Seq((100L, "alpha beta gamma delta epsilon")).toDF("bid", "btext")
  }

  test("contaminationHits counts distinct shared n-grams per corpus doc") {
    val hits = Dedup.contaminationHits(corpus, "doc_id", "text",
        benchmark, "btext", shingleSize = N)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // benchmark shingles: {alpha beta gamma delta, beta gamma delta epsilon}
    assert(hits == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("minOverlap raises the contamination bar") {
    val hits = Dedup.contaminationHits(corpus, "doc_id", "text",
        benchmark, "btext", shingleSize = N, minOverlap = 2)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L))
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val clean = Dedup.decontaminate(corpus, "doc_id", "text",
        benchmark, "btext", shingleSize = N)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 5L))
  }

  test("a benchmark shorter than the shingle size matches whole-text only") {
    import spark.implicits._
    val bench = Seq((1L, "short text")).toDF("bid", "btext")
    val hits = Dedup.contaminationHits(corpus, "doc_id", "text",
        bench, "btext", shingleSize = N)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(5L)) // doc 5's whole-text shingle == the benchmark's
  }
}
