package graft.streaming

import graft.SparkSpec
import graft.operators.HybridSearch

import java.nio.file.Files

class TextMaintenanceSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_textmaint_spec").toString

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private def docRow(i: Long, seed: Int): (Long, String) = {
    val r = new scala.util.Random(seed * 1000 + i)
    (i, Seq.fill(4 + r.nextInt(10))(vocab(r.nextInt(vocab.size))).mkString(" "))
  }

  private def bm25Top(ti: HybridSearch.TextIndex, terms: Seq[String], k: Int) =
    HybridSearch.bm25(ti, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("append equals a fresh build over the concatenated corpus") {
    import spark.implicits._
    val a = (1L to 30L).map(docRow(_, 1))
    val b = (31L to 55L).map(docRow(_, 2))
    val m = new TextIndexMaintenance(a.toDF("doc_id", "text"), "doc_id", "text")
    m.append(b.toDF("doc_id", "text"), batchId = 0L)
    val fresh = HybridSearch.buildTextIndex((a ++ b).toDF("doc_id", "text"),
      "doc_id", "text")
    val cur = m.current
    assert(cur.numDocs == fresh.numDocs)
    assert(math.abs(cur.avgDl - fresh.avgDl) < 1e-9)
    for (q <- Seq(Seq("alpha", "eps"), Seq("theta"), Seq("kappa", "beta", "zeta"))) {
      val got = bm25Top(cur, q, 10)
      val want = bm25Top(fresh, q, 10)
      assert(got.map(_._1) == want.map(_._1), s"query $q ids")
      // scores equal up to avg() summation-order ULPs (documented)
      got.zip(want).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"query $q score")
      }
    }
    m.release()
  }

  test("replayed batch ids are skipped (session-scoped exactly-once)") {
    import spark.implicits._
    val a = (1L to 10L).map(docRow(_, 3))
    val b = (11L to 15L).map(docRow(_, 4))
    val m = new TextIndexMaintenance(a.toDF("doc_id", "text"), "doc_id", "text")
    m.append(b.toDF("doc_id", "text"), batchId = 7L)
    val n1 = m.current.numDocs
    m.append(b.toDF("doc_id", "text"), batchId = 7L) // replay — must skip
    assert(m.current.numDocs == n1 && n1 == 15L)
    m.release()
  }

  test("compaction folds segments, rebuilds HeadDf exactly, keeps results") {
    import spark.implicits._
    val a = (1L to 20L).map(docRow(_, 5))
    val m = new TextIndexMaintenance(a.toDF("doc_id", "text"), "doc_id", "text",
      compactEvery = 2)
    m.append((21L to 30L).map(docRow(_, 6)).toDF("doc_id", "text"), 0L)
    assert(m.segmentCount == 2)
    // floors ADD across segments before compaction (looser, still an
    // upper bound)
    assert(m.current.headDf.get.floor == 128)
    val before = bm25Top(m.current, Seq("alpha", "gamma"), 10)
    m.append((31L to 40L).map(docRow(_, 7)).toDF("doc_id", "text"), 1L)
    // third segment crossed compactEvery → auto-compacted back to 1
    assert(m.segmentCount == 1)
    assert(m.current.headDf.get.floor == 64) // exact rebuild
    val fresh = HybridSearch.buildTextIndex(
      ((1L to 40L).map(i => docRow(i, if (i <= 20) 5 else if (i <= 30) 6 else 7)))
        .toDF("doc_id", "text"), "doc_id", "text")
    val got = bm25Top(m.current, Seq("alpha", "gamma"), 10)
    val want = bm25Top(fresh, Seq("alpha", "gamma"), 10)
    assert(got.map(_._1) == want.map(_._1))
    assert(before.nonEmpty && got.nonEmpty)
    m.release()
  }

  test("HeadDf merge prices terms absent from one side at that side's floor") {
    import spark.implicits._
    // segment A: "zz" in 70 docs → df 70 > floor 64 → in A's head map.
    // segment B: "zz" in only 10 of 70 docs → absent from B's head map.
    // The merged bound must price B's unknown df at B's floor (64), not 0:
    // 70 + 64 = 134 >= true merged df 80. Pricing absent at 0 gives 70 < 80
    // — no longer an upper bound, and the volume gate under-prices.
    val segA = (1L to 70L).map(i => (i, s"zz fillerA$i")).toDF("doc_id", "text")
    val segB = (71L to 140L).map(i =>
      (i, if (i <= 80L) s"zz fillerB$i" else s"yy fillerB$i"))
      .toDF("doc_id", "text")
    val m = new TextIndexMaintenance(segA, "doc_id", "text")
    m.append(segB, 0L)
    val h = m.current.headDf.get
    assert(h.floor == 128L) // floors add
    assert(h.df("zz") == 134L) // 70 (A head) + 64 (B floor)
    assert(h.df("zz") >= 80L) // stays a true upper bound on merged df
    m.release()
  }

  test("max-score pruning stays rank-safe on a maintained (multi-segment) index") {
    import spark.implicits._
    import graft.index.AnnIndexManager
    // zipf-ish: "the" everywhere (head), r{i} unique, m{j} mid — split
    // across TWO segments so pruning runs against merged HeadDf + unioned
    // postings
    val rnd = new scala.util.Random(11)
    def seg(ids: Range) = ids.map(i =>
      (i.toLong, s"the r$i r$i m${i % 15}", Array.fill(4)(rnd.nextFloat())))
    val s1 = seg(1 to 120); val s2 = seg(121 to 240)
    val all = s1 ++ s2
    val docsDf = all.toDF("doc_id", "text", "embedding")
    val m = new TextIndexMaintenance(
      s1.toDF("doc_id", "text", "embedding"), "doc_id", "text")
    m.append(s2.toDF("doc_id", "text", "embedding"), 0L)
    val idx = AnnIndexManager.create(spark, "tm_flat", docsDf,
      "doc_id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/tm_flat")
    val qs = Seq((0, "the r5 m3", Array(0.5f, 0.5f, 0f, 0f)),
                 (1, "m7 m11", Array(0f, 0.5f, 0.5f, 0f)))
      .toDF("query_idx", "qtext", "qvec")
    def run(): Seq[String] = HybridSearch.hybridSearchTable(docsDf, "doc_id",
        m.current, idx, qs, "query_idx", "qtext", "qvec", k = 7,
        bm25Candidates = 5)
      .select("query_idx", "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank")
      .collect().map(_.toString).toSeq
    spark.conf.set("spark.ann.bm25MaxScorePrune", "true")
    spark.conf.set("spark.ann.bm25PruneMinPostings", "0")
    val pruned = try run() finally {
      spark.conf.unset("spark.ann.bm25MaxScorePrune")
      spark.conf.unset("spark.ann.bm25PruneMinPostings")
    }
    assert(pruned == run(), "pruned vs exact on the maintained index")
    m.release()
  }

  test("delete is exact: scores equal a fresh build over the survivors; update re-serves new contents") {
    import spark.implicits._
    val a = (1L to 30L).map(docRow(_, 12))
    val m = new TextIndexMaintenance(a.toDF("doc_id", "text"), "doc_id", "text")
    m.delete(Seq(3L, 7L, 19L, 999L)) // 999 unknown — inert
    val fresh = HybridSearch.buildTextIndex(
      a.filterNot(d => Set(3L, 7L, 19L).contains(d._1)).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(m.current.numDocs == 27L && fresh.numDocs == 27L)
    assert(math.abs(m.current.avgDl - fresh.avgDl) < 1e-9)
    for (q <- Seq(Seq("alpha", "beta"), Seq("iota"))) {
      val got = bm25Top(m.current, q, 30)
      val want = bm25Top(fresh, q, 30)
      assert(got.map(_._1) == want.map(_._1), s"query $q ids")
      assert(got.map(_._1).intersect(Seq(3L, 7L, 19L)).isEmpty)
      got.zip(want).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"query $q score") }
    }
    // update: deleted id re-appended with NEW contents serves the new text
    m.update(Seq((5L, "zzzuniquetoken zzzuniquetoken")).toDF("doc_id", "text"), 1L)
    val hits = bm25Top(m.current, Seq("zzzuniquetoken"), 5)
    assert(hits.map(_._1) == Seq(5L))
    assert(m.current.numDocs == 27L) // 27 survivors - 1 deleted + 1 re-added
    m.release()
  }

  test("deletes count toward compaction; post-compaction mask is physical and exact") {
    import spark.implicits._
    val a = (1L to 25L).map(docRow(_, 13))
    val m = new TextIndexMaintenance(a.toDF("doc_id", "text"), "doc_id", "text",
      compactEvery = 2)
    m.delete(Seq(2L)) // segments 2
    m.delete(Seq(4L)) // segments 3 > 2 → compacts back to 1
    assert(m.segmentCount == 1)
    val fresh = HybridSearch.buildTextIndex(
      a.filterNot(d => Set(2L, 4L).contains(d._1)).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = bm25Top(m.current, Seq("gamma", "delta"), 25)
    val want = bm25Top(fresh, Seq("gamma", "delta"), 25)
    assert(got.map(_._1) == want.map(_._1))
    // compacted HeadDf rebuilt over the SURVIVORS (exact, not overstated)
    assert(m.current.headDf.get.floor == 64)
    m.release()
  }

  test("streaming attach: micro-batches extend the served index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val a = (1L to 10L).map(docRow(_, 8))
    val m = new TextIndexMaintenance(a.toDF("doc_id", "text"), "doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = m.attach(ms.toDF().toDF("doc_id", "text"), s"$tmp/ckpt_text",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    try {
      ms.addData((11L to 20L).map(docRow(_, 9)): _*)
      q.processAllAvailable()
      assert(m.current.numDocs == 20L)
      ms.addData((21L to 25L).map(docRow(_, 10)): _*)
      q.processAllAvailable()
      assert(m.current.numDocs == 25L)
      // the maintained index actually serves the streamed docs
      val hit = bm25Top(m.current, Seq("alpha"), 25).map(_._1).toSet
      val freshHit = bm25Top(HybridSearch.buildTextIndex(
        ((1L to 10L).map(docRow(_, 8)) ++ (11L to 20L).map(docRow(_, 9)) ++
          (21L to 25L).map(docRow(_, 10))).toDF("doc_id", "text"),
        "doc_id", "text"), Seq("alpha"), 25).map(_._1).toSet
      assert(hit == freshHit)
    } finally { q.stop(); m.release() }
  }
}
