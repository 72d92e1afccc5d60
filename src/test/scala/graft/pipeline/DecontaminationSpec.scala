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

  test("shinglesLocal mirrors sqlShingles bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq("alpha beta gamma delta epsilon", "short text", "",
      "  Mixed   CASE  spacing\ttabs  ", "one one one one one", "solo")
    for (n <- Seq(2, 4, 8)) {
      val viaSql = texts.toDF("text")
        .select(Dedup.sqlShinglesPublic(n)(col("text")).as("sh"))
        .collect().map(_.getSeq[String](0).toSeq)
      for ((t, got) <- texts.zip(viaSql))
        assert(Dedup.shinglesLocal(t, n) == got, s"n=$n text='$t'")
    }
  }

  test("BloomFilter: no false negatives, FPR near target, partitioning-invariant build") {
    import spark.implicits._
    val elems = (0 until 5000).map(i => s"elem $i payload")
    val bf = BloomFilter.build(elems.toDS(), expectedN = 5000, fpp = 1e-3)
    assert(elems.forall(bf.mightContain), "a Bloom filter can NEVER false-negative")
    val probes = (0 until 20000).map(i => s"absent $i probe")
    val fps = probes.count(bf.mightContain)
    assert(fps <= 60, s"$fps false positives in 20k probes at fpp=1e-3")
    // pure function of the element set: partition layout cannot matter
    val bf2 = BloomFilter.build(elems.toDS().repartition(13),
      expectedN = 5000, fpp = 1e-3)
    assert(java.util.Arrays.equals(bf.bits, bf2.bits) && bf.numHashes == bf2.numHashes)
    // an empty element set yields an all-clear filter, not an error
    val bfe = BloomFilter.build(Seq.empty[String].toDS(), 100, 1e-3)
    assert(!bfe.mightContain("anything"))
  }

  test("Bloom decontamination equals the exact path on the fixture (zero-shuffle plan)") {
    val bloom = Dedup.benchmarkShingleBloom(benchmark, "btext", shingleSize = N)
    val hits = Dedup.contaminationHitsBloom(corpus, "doc_id", "text",
        bloom, shingleSize = N)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives → superset with per-doc counts >= exact; at
    // fpp=1e-7 over tens of probes the fixture result is exact equality
    assert(hits == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
    val clean = Dedup.decontaminateBloom(corpus, "doc_id", "text",
        bloom, shingleSize = N)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 5L))
    // minOverlap bar behaves identically
    val strict = Dedup.decontaminateBloom(corpus, "doc_id", "text",
        bloom, shingleSize = N, minOverlap = 2)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(2L, 3L, 4L, 5L))
    // the cleaning plan must contain no shuffle: one filter over the scan
    val plan = Dedup.decontaminateBloom(corpus, "doc_id", "text",
      bloom, shingleSize = N).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bloom decontaminate plan shuffles:\n$plan")
  }

  test("Bloom path keeps null-text rows (no shingles, zero hits)") {
    import spark.implicits._
    val withNull = Seq((10L, "alpha beta gamma delta"), (11L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bloom = Dedup.benchmarkShingleBloom(benchmark, "btext", shingleSize = N)
    val clean = Dedup.decontaminateBloom(withNull, "doc_id", "text",
        bloom, shingleSize = N)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(11L), "null text must survive, contaminated row must drop")
  }

  test("cross-snapshot dedup: prior wins on exact text, exact == Bloom, zero-shuffle plan") {
    import spark.implicits._
    val prior = Seq((1L, "seen before"), (2L, "also seen"), (3L, "unrelated"))
      .toDF("pid", "ptext")
    val fresh = Seq(
      (10L, "seen before"),     // dup of prior → drops
      (11L, "brand new text"),  // survives
      (12L, "also seen"),       // dup of prior → drops
      (13L, null.asInstanceOf[String])) // null text → survives
      .toDF("doc_id", "text")
    val exact = Dedup.dedupAgainstCorpus(fresh, "doc_id", "text", prior, "ptext")
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(11L, 13L))
    val bloom = Dedup.corpusTextBloom(prior, "ptext")
    val viaBloom = Dedup.dedupAgainstCorpusBloom(fresh, "doc_id", "text", bloom)
    assert(viaBloom.collect().map(_.getLong(0)).toSet == exact)
    // the Bloom serving plan reads the new corpus once, no shuffle
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bloom incremental dedup shuffles:\n$plan")
  }

  test("semantic contamination: max-cosine audit with argmax bench id; anti-join cleans") {
    import spark.implicits._
    // corpus: two rows near bench directions, one orthogonal, one
    // zero-norm (NaN cosine must never flag)
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),      // = bench 100 exactly
      (2L, Array(0.9f, 0.1f, 0f, 0f)),  // near bench 100
      (3L, Array(0f, 0f, 1f, 0f)),      // orthogonal to both benches
      (4L, Array(0f, 0f, 0f, 0f)),      // zero-norm -> NaN -> never flags
      (5L, Array(0f, 1f, 0f, 0f))       // = bench 200 exactly
    ).toDF("id", "vec")
    val bench = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (200L, Array(0f, 1f, 0f, 0f))
    ).toDF("bid", "bvec")
    val hits = Dedup.semanticContaminationHits(corpus, "id", "vec",
        bench, "bid", "bvec", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((1L, 100L), (2L, 100L), (5L, 200L)),
      s"unexpected hit set: ${hits.toSeq}")
    assert(hits.find(_._1 == 1L).get._3 == 1.0)
    // argmax tie-break: a row equidistant to two benches takes the
    // SMALLER bench id (the documented total order)
    val tied = Seq((9L, Array(1f, 1f, 0f, 0f))).toDF("id", "vec")
    val tiedHit = Dedup.semanticContaminationHits(tied, "id", "vec",
        bench, "bid", "bvec", threshold = 0.5).collect()
    assert(tiedHit.length == 1 && tiedHit(0).getLong(1) == 100L)
    // cleaning: exactly the unflagged rows survive
    val clean = Dedup.decontaminateSemantic(corpus, "id", "vec",
        bench, "bid", "bvec", threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L, 4L))
    // scale posture: the corpus side joins the BROADCAST benchmark with
    // no corpus-sized exchange (the only window runs over the hit set)
    val plan = Dedup.semanticContaminationHits(corpus, "id", "vec",
        bench, "bid", "bvec", threshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side is not broadcast:\n$plan")
  }

  test("ANN-backed semantic contamination equals the broadcast form at exhaustive probes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val corpus = Seq.tabulate(120)(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("cid", "vec")
    val bench = corpus.filter($"cid" % 11 === 0)
      .select($"cid".as("bid"), $"vec".as("bvec"))
    val direct = Dedup.semanticContaminationHits(corpus, "cid", "vec",
        bench, "bid", "bvec", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaAnn = Dedup.semanticContaminationHitsAnn(corpus, "cid", "vec",
        bench, "bid", "bvec", threshold = 0.4, nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAnn == direct,
      s"index path diverged: only-direct=${direct -- viaAnn} only-ann=${viaAnn -- direct}")
    assert(direct.nonEmpty, "fixture produced no contamination (self-matches expected)")
  }
}
