package graft.streaming

import graft.SparkSpec
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_stream_spec").toString

  test("windowed ingest stats: watermark closes hourly windows per language (append mode)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val en = "the cat and the dog sat with a book for a while it was good"
    val de = "der hund und die katze sind nicht mit der maus zu dem haus"
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    val out = StreamingPipeline.windowedIngestStats(
      ms.toDF().toDF("ts", "text"), "ts", "text",
      windowLen = "1 hour", watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("ingest_stats")
      .outputMode("append").start()
    try {
      // hour-10 window: 2 en + 1 de; hour-11: 1 en
      ms.addData((ts(10, 5), en), (ts(10, 20), en), (ts(10, 40), de), (ts(11, 10), en))
      q.processAllAvailable()
      // nothing emitted yet: watermark (max 11:10 - 1h = 10:10) hasn't
      // passed the hour-10 window end
      assert(spark.table("ingest_stats").isEmpty)
      // late-ish doc INSIDE the horizon still lands in hour 10; then an
      // event at 13:00 advances the watermark past both windows
      ms.addData((ts(10, 55), en))
      q.processAllAvailable()
      ms.addData((ts(13, 0), en))
      q.processAllAvailable()
      val rows = spark.table("ingest_stats")
        .selectExpr("window.start AS ws", "lang", "n_docs", "n_chars").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(rows(("2026-01-01 10:00:00.0", "en")) == ((3L, en.length * 3L)))
      assert(rows(("2026-01-01 10:00:00.0", "de")) == ((1L, de.length.toLong)))
      assert(rows(("2026-01-01 11:00:00.0", "en")) == ((1L, en.length.toLong)))
    } finally q.stop()
  }

  test("chunkDocuments composes into a streaming query (stateless, append)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = graft.pipeline.CorpusPipeline.chunkDocuments(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      chunkTokens = 4, stride = 3)
    val q = out.writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    try {
      ms.addData((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      q.processAllAvailable()
      val rows = spark.table("stream_chunks")
        .select("doc_id", "chunk_id", "chunk_text").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      assert(rows((1L, 0L)) == "t1 t2 t3 t4" && rows((1L, 2L)) == "t7 t8 t9 t10")
      assert(rows((2L, 0L)) == "a b")
      // a later batch chunks independently — no state, no watermark needed
      ms.addData((3L, "x y z w v"))
      q.processAllAvailable()
      assert(spark.table("stream_chunks").filter("doc_id = 3").count() == 2L)
    } finally q.stop()
  }

  test("streaming DSIR filter: frozen model scores micro-batches identically to batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = (Seq.tabulate(10)(i => (i.toLong, s"spark shuffle plan $i")) ++
      Seq.tabulate(10)(i => ((50 + i).toLong, s"meadow violin poem $i")))
      .toDF("doc_id", "text")
    val target = Seq.tabulate(8)(i => (i.toLong, s"spark shuffle catalyst plan $i"))
      .toDF("doc_id", "text")
    val model = graft.pipeline.Dsir.fitLogRatios(raw, target, "text")
    // threshold between the two populations, read off the batch weights
    val w = graft.pipeline.Dsir.withImportanceWeight(raw, "text", model)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    val cut = (Seq.tabulate(10)(i => w(i.toLong)).min +
      Seq.tabulate(10)(i => w((50 + i).toLong)).max) / 2

    val ms = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingPipeline.streamingDsirFilter(
      ms.toDF().toDF("doc_id", "text"), "text", model, cut)
    val q = out.writeStream.format("memory").queryName("stream_dsir")
      .outputMode("append").start()
    try {
      ms.addData((1L, "spark shuffle plan 1"), (51L, "meadow violin poem 1"))
      q.processAllAvailable()
      // stateless: a second batch scores independently with the same model
      ms.addData((2L, "spark shuffle plan 2"), (52L, "meadow violin poem 2"))
      q.processAllAvailable()
      val kept = spark.table("stream_dsir").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L), s"only target-like docs pass the filter: $kept")
      val sw = spark.table("stream_dsir")
        .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
      assert(sw(1L) == w(1L) && sw(2L) == w(2L),
        "streaming weights must equal the batch scorer's bit-for-bit")
    } finally q.stop()
  }

  test("streaming grouped heavy hitters: anytime MG bounds hold per group across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def batch(seed: Int): Seq[(String, String)] = {
      val r = new scala.util.Random(seed)
      (1 to 400).map(_ => ("big", s"b${math.min(49, (math.pow(r.nextDouble(), 3) * 50).toInt)}")) ++
        (1 to 60).map(_ => ("small", s"s${r.nextInt(4)}"))
    }
    val batches = (1 to 4).map(batch)
    val truth = batches.flatten.groupBy(_._1).map { case (g, rs) =>
      g -> rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    }
    val ms = MemoryStream[(String, String)]
    val phi = 0.05 // k = 20
    val out = graft.streaming.StreamingPipeline.streamingGroupedHeavyHitters(
      ms.toDS(), phi, maxIdle = None)
    val q = out.writeStream.format("memory").queryName("stream_hh")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // the FINAL trigger's rows carry group_n == the group's full total
      // (totals strictly increase per batch); within one trigger each
      // (key, item) appears at most once
      val all = spark.table("stream_hh")
        .select("key", "item", "est_low", "est_high", "group_n")
        .as[(String, String, Long, Long, Long)].collect()
      val finalRows = all.filter { case (g, _, _, _, gn) =>
        gn == truth(g).values.sum }
      assert(finalRows.nonEmpty)
      // bounds bracket the truth for every finally-reported candidate
      finalRows.foreach { case (g, item, lo, hi, _) =>
        val t = truth(g).getOrElse(item, 0L)
        assert(lo <= t && t <= hi, s"$g/$item lo=$lo true=$t hi=$hi")
      }
      // certified superset: every TRUE heavy hitter of each group appears
      // among that group's final-trigger reports
      for ((g, counts) <- truth) {
        val n = counts.values.sum
        val thr = math.max(1L, math.ceil(phi * n).toLong)
        val trueHH = counts.filter(_._2 >= thr).keySet
        val reported = finalRows.filter(_._1 == g).map(_._2).toSet
        assert(trueHH.subsetOf(reported), s"$g missing ${trueHH -- reported}")
      }
    } finally q.stop()
  }

  test("streamed candidates + exact recount equal the batch grouped operator") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def batch(seed: Int): Seq[(String, String)] = {
      val r = new scala.util.Random(seed * 31 + 5)
      (1 to 300).map(_ => ("big", s"b${math.min(39, (math.pow(r.nextDouble(), 3) * 40).toInt)}")) ++
        (1 to 50).map(_ => ("small", s"s${r.nextInt(5)}"))
    }
    val batches = (1 to 4).map(batch)
    val all = batches.flatten
    val ms = MemoryStream[(String, String)]
    val phi = 0.04
    val out = graft.streaming.StreamingPipeline.streamingGroupedHeavyHitters(
      ms.toDS(), phi, maxIdle = None)
    val q = out.writeStream.format("memory").queryName("stream_hh_recount")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // the accumulated emissions are a certified SUPERSET of the final
      // heavy hitters (the final trigger's certified set is included);
      // recounting them against the retained corpus restores exactness
      val candidates = spark.table("stream_hh_recount").select("key", "item")
      val retained = all.toDF("grp", "item")
      val recounted = graft.pipeline.HeavyHitters.recountGroupedCandidates(
          retained, "grp", "item", phi, candidates,
          candGroupCol = "key", candItemCol = "item")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batchExact = graft.pipeline.HeavyHitters.frequentItemsByGroup(
          retained, "grp", "item", phi)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(recounted == batchExact,
        s"streamed+recounted ${recounted.size} vs batch ${batchExact.size}")
      assert(recounted.nonEmpty)
      // the one-call wrapper (emission schema pre-wired) gives the same map
      val oneCall = graft.streaming.StreamingPipeline.exactGroupedHeavyHitters(
          retained, "grp", "item", phi, spark.table("stream_hh_recount"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(oneCall == batchExact)
    } finally q.stop()
  }

  test("streaming grouped heavy hitters: null keys and null items are dropped, matching batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipeline.streamingGroupedHeavyHitters(
      ms.toDS(), phi = 0.5, maxIdle = None)
    val q = out.writeStream.format("memory").queryName("stream_hh_nulls")
      .outputMode("update").start()
    try {
      ms.addData(("g", "a"), ("g", "a"), ("g", null), (null, "b"), ("g", "a"))
      q.processAllAvailable()
      val rows = spark.table("stream_hh_nulls")
        .select("key", "item", "group_n")
        .as[(String, String, Long)].collect()
      assert(rows.nonEmpty)
      assert(rows.forall { case (k, i, _) => k != null && i != null },
        s"null leaked: ${rows.mkString(",")}")
      // group_n counts only the 3 non-null 'g' rows — the null item and the
      // null key never entered the state
      assert(rows.collect { case ("g", _, n) => n }.max == 3L)
    } finally q.stop()
  }

  test("streaming minhash near-dup: cross-batch and in-batch collisions emit candidates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val other = "completely different content about spark distributed query planning internals"

    val out = StreamingPipeline.streamingMinhashCandidates(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.9)
    val q = out.writeStream.format("memory").queryName("minhash_cands")
      .outputMode("append").start()
    try {
      ms.addData((1L, base), (2L, other))
      q.processAllAvailable()
      assert(spark.table("minhash_cands").isEmpty) // nothing similar yet

      // batch 2: an exact copy of doc 1 (est = 1.0 in every band) plus an
      // in-batch duplicate pair (5, 6)
      ms.addData((3L, base), (5L, other), (6L, other))
      q.processAllAvailable()
      val rows = spark.table("minhash_cands")
        .select("id", "match_id", "est_jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.contains((3L, 1L, 1.0)), s"cross-batch pair missing: ${rows.toSeq}")
      assert(rows.contains((5L, 2L, 1.0)), s"cross-batch pair missing: ${rows.toSeq}")
      assert(rows.contains((6L, 5L, 1.0)), s"in-batch pair missing: ${rows.toSeq}")
      // the two text groups {1,3} and {2,5,6} never cross-pair
      val baseGroup = Set(1L, 3L)
      assert(!rows.exists { case (a, b, _) => baseGroup(a) != baseGroup(b) },
        s"dissimilar docs paired: ${rows.toSeq}")

      // re-sending an already-seen id is ignored (no self-pair, no dup state)
      ms.addData((3L, base))
      q.processAllAvailable()
      val again = spark.table("minhash_cands")
        .filter("id = 3 AND match_id = 3").count()
      assert(again == 0L)
    } finally q.stop()
  }

  test("streaming sessionization: session_window merges within the gap, splits across it") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val out = StreamingPipeline.sessionStats(
      ms.toDF().toDF("ts", "user_id"), "user_id", "ts",
      gap = "30 minutes", watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("session_stats")
      .outputMode("append").start()
    try {
      // user 1: 10:00, 10:20 (same session), 11:30 (new session — 70 min gap)
      // user 2: 10:05 alone
      ms.addData((ts(10, 0), 1L), (ts(10, 20), 1L), (ts(11, 30), 1L), (ts(10, 5), 2L))
      q.processAllAvailable()
      ms.addData((ts(14, 0), 9L)) // advance watermark past every session end
      q.processAllAvailable()
      val rows = spark.table("session_stats")
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getLong(2)).toMap
      assert(rows((1L, "2026-01-01 10:00:00.0")) == 2L, s"$rows")
      assert(rows((1L, "2026-01-01 11:30:00.0")) == 1L)
      assert(rows((2L, "2026-01-01 10:05:00.0")) == 1L)
    } finally q.stop()
  }

  test("streaming exact dedup drops in-horizon duplicate fingerprints, state watermark-bounded") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")

    val out = StreamingPipeline.streamingExactDedup(
      ms.toDF().toDF("ts", "doc_id", "text"), "ts", "text",
      watermarkDelay = "2 hours")
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      // doc 2 is an exact dup of doc 1 (same batch); doc 4 a ws/case variant
      // dup of doc 1 in a LATER batch — both dropped by in-horizon state
      ms.addData((ts(10), 1L, "a good document"), (ts(10), 2L, "a good document"),
        (ts(10), 3L, "another document"))
      q.processAllAvailable()
      ms.addData((ts(11), 4L, "A  GOOD document"), (ts(11), 5L, "fresh content"))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("streaming URL dedup: normalized-url variants drop across batches; non-URLs drop") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val out = StreamingPipeline.streamingUrlDedup(
      ms.toDF().toDF("ts", "doc_id", "url"), "ts", "url",
      watermarkDelay = "2 hours")
    val q = out.writeStream.format("memory").queryName("stream_url_dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        (ts(10), 1L, "https://A.com/x?utm_source=t#f"),
        (ts(10), 2L, "https://a.com/x"), // same page, same batch — drop
        (ts(10), 3L, "not a url")) // unparseable — drop
      q.processAllAvailable()
      ms.addData(
        (ts(11), 4L, "HTTPS://a.com:443/x"), // same page, later batch — drop
        (ts(11), 5L, "https://a.com/y")) // new page — keep
      q.processAllAvailable()
      val ids = spark.table("stream_url_dedup")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("streaming per-domain cap: first `cap` docs per registered domain pass across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingPipeline.streamingDomainCap(
      ms.toDF().toDF("doc_id", "url"), "url", cap = 2, maxIdle = None)
    val q = out.writeStream.format("memory").queryName("stream_dom_cap")
      .outputMode("append").start()
    try {
      ms.addData(
        (1L, "https://a.site.com/1"), (2L, "https://b.site.com/2"), // site.com ×2
        (3L, "https://other.org/1"),
        (4L, "no url")) // no domain — drops
      q.processAllAvailable()
      ms.addData(
        (5L, "https://c.site.com/3"), // site.com over cap — drops
        (6L, "https://other.org/2"), // other.org #2 — passes
        (7L, "https://other.org/3")) // over cap — drops
      q.processAllAvailable()
      val ids = spark.table("stream_dom_cap").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L, 6L), s"got $ids")
    } finally q.stop()
  }

  test("streaming URL dedup replay equals batch dedupByUrl when arrival order is the orderCol") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 480 docs over 120 pages, each page fetched 4x under different mess
    // (utm param / host case / fragment / port), one fetch per trigger —
    // ids increase with trigger, so streamed "first arrival" and batch
    // "min doc_id" MUST pick the same survivors
    def mess(id: Long): String = {
      val page = id % 120
      (id / 120) % 4 match {
        case 0 => s"https://www.d$page.com/p?utm_source=x"
        case 1 => s"https://WWW.D$page.com/p"
        case 2 => s"https://www.d$page.com/p#frag"
        case _ => s"https://www.d$page.com:443/p"
      }
    }
    val rows = (0L until 480L).map(i => (java.sql.Timestamp.valueOf(
      f"2026-01-01 ${10 + i / 120}%02d:00:00"), i, mess(i)))
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = StreamingPipeline.streamingUrlDedup(
      ms.toDF().toDF("ts", "doc_id", "url"), "ts", "url",
      watermarkDelay = "24 hours")
    val q = out.writeStream.format("memory").queryName("url_dedup_replay")
      .outputMode("append").start()
    try {
      rows.grouped(120).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("url_dedup_replay")
        .select("doc_id").as[Long].collect().toSet
      val batch = graft.pipeline.UrlOps.dedupByUrl(
          rows.toDF("ts", "doc_id", "url"), "url", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed == (0L until 120L).toSet) // first fetch of each page
      // arrival-order semantics: under a SHUFFLED feed the representatives
      // may differ, but the normalized-url KEY SET must still equal the
      // batch operator's — one survivor per page either way
      val ms2 = MemoryStream[(java.sql.Timestamp, Long, String)]
      val out2 = StreamingPipeline.streamingUrlDedup(
        ms2.toDF().toDF("ts", "doc_id", "url"), "ts", "url",
        watermarkDelay = "24 hours")
      val q2 = out2.writeStream.format("memory").queryName("url_dedup_shuffled")
        .outputMode("append").start()
      try {
        val shuffled = new scala.util.Random(7).shuffle(rows)
        shuffled.grouped(160).foreach { b => ms2.addData(b: _*); q2.processAllAvailable() }
        val keyStrs = spark.table("url_dedup_shuffled")
          .select(graft.pipeline.UrlOps.normalizeUrl(col("url")))
          .as[String].collect().toSet
        val batchKeys = graft.pipeline.UrlOps.dedupByUrl(
            rows.toDF("ts", "doc_id", "url"), "url", "doc_id")
          .select(graft.pipeline.UrlOps.normalizeUrl(col("url")))
          .as[String].collect().toSet
        assert(keyStrs == batchKeys)
        assert(spark.table("url_dedup_shuffled").count() == 120L)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming domain cap under SuffixRules keys like the batch rules sibling") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rules = graft.pipeline.UrlOps.SuffixRules.bundledSample
    val rows = Seq( // two distinct PSL sites under com.pl + one repeat
      (1L, "https://a.shop.com.pl/x"), (2L, "https://b.other.com.pl/y"),
      (3L, "https://c.shop.com.pl/z"))
    val ms = MemoryStream[(Long, String)]
    val out = StreamingPipeline.streamingDomainCap(
      ms.toDF().toDF("doc_id", "url"), "url", cap = 1, maxIdle = None,
      rules = rules)
    val q = out.writeStream.format("memory").queryName("dom_cap_psl")
      .outputMode("append").start()
    try {
      // the repeat site arrives in a LATER trigger so first-arrival is
      // deterministic (within-trigger group order is not)
      ms.addData(rows.take(2): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("dom_cap_psl")
        .select("doc_id").as[Long].collect().toSet
      val batch = graft.pipeline.UrlOps.capPerDomain(
          rows.toDF("doc_id", "url"), "url", cap = 1, orderCol = "doc_id",
          rules = rules)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch && streamed == Set(1L, 2L), s"got $streamed")
    } finally q.stop()
  }

  test("streaming domain cap replay equals batch capPerDomain; saturation holds across triggers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 40 domains × one url per trigger over 6 triggers, ids increase with
    // trigger → streamed first-cap-arrivals == batch min-id cut exactly
    val rows = (0L until 240L).map { i =>
      (i, s"https://sub${i}.site${i % 40}.com/p$i")
    }
    val cap = 3
    val ms = MemoryStream[(Long, String)]
    val out = StreamingPipeline.streamingDomainCap(
      ms.toDF().toDF("doc_id", "url"), "url", cap = cap, maxIdle = None)
    val q = out.writeStream.format("memory").queryName("dom_cap_replay")
      .outputMode("append").start()
    try {
      rows.grouped(40).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("dom_cap_replay")
        .select("doc_id").as[Long].collect().toSet
      val batch = graft.pipeline.UrlOps.capPerDomain(
          rows.toDF("doc_id", "url"), "url", cap = cap, orderCol = "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(streamed == (0L until 120L).toSet) // first 3 triggers' rows
      // saturation: a flood of one domain in a LATER trigger cannot re-open
      // its budget, and a fresh domain still gets exactly `cap`
      ms.addData((1000L to 1019L).map(i => (i, s"https://x$i.site0.com/p")) :+
        ((2000L, "https://a.newdom.com/1")) :+ ((2001L, "https://b.newdom.com/2")) :+
        ((2002L, "https://c.newdom.com/3")) :+ ((2003L, "https://d.newdom.com/4")): _*)
      q.processAllAvailable()
      val after = spark.table("dom_cap_replay")
        .select("doc_id").as[Long].collect().toSet
      assert(after.intersect((1000L to 1019L).toSet).isEmpty,
        "saturated domain re-opened")
      assert(after.count(_ >= 2000L) == cap, "fresh domain must pass exactly cap")
    } finally q.stop()
  }

  test("running corpus stats: flatMapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]

    // NoTimeout → no perpetual timeout batches → processAllAvailable works
    val out = StreamingPipeline.runningCorpusStats(ms.toDS(), maxIdle = None)
    val q = out.writeStream.format("memory").queryName("corpus_stats")
      .outputMode("update").start()
    try {
      ms.addData(("web", 100L, 0.8), ("web", 300L, 0.6), ("books", 1000L, 0.9))
      q.processAllAvailable()
      ms.addData(("web", 200L, 0.7))
      q.processAllAvailable()
      // memory sink in update mode appends update rows; the LAST row per
      // key is the current running state
      val last = spark.table("corpus_stats").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, v) => k -> v.last._2 }
      assert(last("web") == ((3L, 600L, (0.8 + 0.6 + 0.7) / 3)))
      assert(last("books") == ((1L, 1000L, 0.9)))
    } finally q.stop()
  }

  test("running corpus stats: idle keys are EVICTED under ProcessingTimeTimeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]

    // timeout queries run no-data batches forever (to fire evictions), so
    // processAllAvailable would hang — pace with a trigger and POLL the sink
    val out = StreamingPipeline.runningCorpusStats(ms.toDS(), maxIdle = Some("1 second"))
    val q = out.writeStream.format("memory").queryName("corpus_evict")
      .outputMode("update").trigger(Trigger.ProcessingTime("250 milliseconds")).start()

    def rowsFor(key: String): Seq[Long] =
      spark.table("corpus_evict").filter(col("key") === key)
        .select("nDocs").as[Long].collect().toSeq
    def awaitUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
      val end = System.currentTimeMillis() + deadlineMs
      while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
      cond
    }

    try {
      ms.addData(("web", 100L, 0.8), ("web", 300L, 0.6))
      assert(awaitUntil(30000)(rowsFor("web") == Seq(2L)))
      Thread.sleep(3000) // > maxIdle → the web key's state is evicted
      ms.addData(("web", 200L, 0.7))
      // a fresh count of 1 (not 3) proves the state machine restarted
      assert(awaitUntil(30000)(rowsFor("web") == Seq(2L, 1L)))
    } finally q.stop()
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("embedding", ArrayType(FloatType))))

  private def writeBatch(dir: String, rows: Seq[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    rows.toDF("id", "embedding").coalesce(1).write.mode("append").parquet(dir)
  }

  test("streaming ANN enrichment: each micro-batch gets top-k neighbors from the index") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val base = Seq.tabulate(60)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
    val idx = AnnIndexManager.create(spark, "enrich_idx", base.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/enrich_idx")

    val srcDir = s"$tmp/enrich_src"
    // two incoming docs: one exactly equals base row 7 → its top hit
    Seq((1000L, base(7)._2), (1001L, Array.fill(4)(rnd.nextFloat())))
      .toDF("doc_id", "embedding").coalesce(1).write.mode("append").parquet(srcDir)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .parquet(srcDir)
    val q = StreamingPipeline.attachAnnEnrich(stream, idx, "embedding", "doc_id",
      k = 3, s"$tmp/enrich_ckpt", out => collected.synchronized {
        collected ++= out.collect().map(r =>
          (r.getAs[Long]("doc_id"), r.getAs[Long]("id"), r.getAs[Double]("_distance")))
      })
    q.awaitTermination(60000)
    val byDoc = collected.groupBy(_._1)
    assert(byDoc.keySet == Set(1000L, 1001L))
    assert(byDoc(1000L).size == 3 && byDoc(1001L).size == 3)
    // the exact duplicate's nearest neighbor is base id 7 at distance 0
    val best = byDoc(1000L).minBy(t => (t._3, t._2))
    assert(best._2 == 7L && best._3 == 0.0)
  }

  test("incremental append maintenance via foreachBatch (§2.8)") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(50)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_idx", initial.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/st_idx")

    val srcDir = s"$tmp/stream_src"
    val next = Seq.tabulate(30)(i => ((100 + i).toLong, vec()))
    writeBatch(srcDir, next)

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val query = IndexMaintenance.attachAppend(stream, idx, "id", "embedding",
      s"$tmp/ckpt1")
    query.awaitTermination(60000)
    assert(idx.meta.numVectors == 80)
    // new ids are searchable
    val hit = idx.scan(next.head._2, 1).head()
    assert(hit.getLong(0) == 100L)
  }

  test("CDC maintenance: inserts append, deletes tombstone") {
    import spark.implicits._
    val rnd = new scala.util.Random(22)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(20)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_cdc", initial.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/st_cdc")

    val srcDir = s"$tmp/cdc_src"
    val cdcSchema = schema.add("op", StringType)
    initial.take(5).map { case (id, v) => (id, v, "delete") }
      .toDF("id", "embedding", "op").coalesce(1).write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(cdcSchema).parquet(srcDir)
    val query = IndexMaintenance.attachCdc(stream, idx, "id", "embedding", "op",
      s"$tmp/ckpt2")
    query.awaitTermination(60000)
    assert(idx.meta.numDeleted == 5)
    val ids = idx.scan(initial.head._2, 20).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(0L, 1L, 2L, 3L, 4L)).isEmpty)
    assert(ids.size == 15)
  }

  test("autoCompact bounds live shard count under a long append stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(31)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(60)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_autoc", initial.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      s"$tmp/st_autoc")

    val ms = MemoryStream[(Long, Array[Float])]
    val inserted = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    // a continuous trigger: AvailableNow would stop after draining the
    // first addData, silently dropping the later batches
    val q = IndexMaintenance.attachAppend(
      ms.toDF().toDF("id", "embedding"), idx, "id", "embedding",
      s"$tmp/ckpt_autoc",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      autoCompact = Some(4))
    try {
      for (b <- 0 until 6) { // 6 delta shards without compaction
        val batch = Seq.tabulate(5)(i => ((1000 + b * 5 + i).toLong, vec()))
        inserted ++= batch
        ms.addData(batch: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // without autoCompact: 2 base + 6 deltas = 8 live shards; the cap held
    assert(idx.meta.param("shards", 0) <= 4,
      s"live shards ${idx.meta.param("shards", 0)} exceeded the cap")
    assert(idx.meta.numVectors == 90)
    // exhaustive search still finds every streamed row exactly once
    val all = idx.scan(Array(0.5f, 0.5f, 0.5f, 0.5f), 90, searchParam = 100000)
      .collect().map(_.getLong(0))
    assert(all.length == 90 && all.toSet.size == 90)
    assert(inserted.map(_._1).forall(all.toSet))
  }

  test("online insert keeps the live shard set EXACTLY flat under a CDC stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(37)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(60)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_online", initial.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      s"$tmp/st_online")

    val ms = MemoryStream[(Long, Array[Float], String)]
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    val q = IndexMaintenance.attachCdc(
      ms.toDF().toDF("id", "embedding", "op"), idx, "id", "embedding", "op",
      s"$tmp/ckpt_online",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      for (b <- 0 until 4) {
        val batch = Seq.tabulate(5)(i =>
          ((2000 + b * 5 + i).toLong, vec(), "insert"))
        ms.addData(batch: _*)
        q.processAllAvailable()
      }
      // delete + re-insert of a streamed id IN LATER BATCHES: the online
      // rewrite mixes epochs inside a live shard and the re-inserted row
      // must win its tombstone (per-label epoch masking end-to-end)
      ms.addData((2000L, vec(), "delete"))
      q.processAllAvailable()
      val moved = Array(0.9f, 0.9f, 0.9f, 0.9f)
      ms.addData((2000L, moved, "insert"))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
    }

    // no delta shards EVER opened: the create-time set is the live set
    assert(idx.meta.param("shards", 0) == 2,
      s"online CDC stream fragmented the shard set: ${idx.meta.params("live_shards")}")
    // physical rows: 60 + 20 + 1 re-insert = 81, minus 2000's dead old
    // copy IF the re-insert rewrite happened to touch its shard and
    // consolidated it out — either way at most one inert row remains
    assert(idx.meta.numVectors == 80 || idx.meta.numVectors == 81,
      s"numVectors=${idx.meta.numVectors}")
    val hit = idx.scan(Array(0.9f, 0.9f, 0.9f, 0.9f), 1, searchParam = 100000)
      .head().getLong(0)
    assert(hit == 2000L, "re-inserted id must be live at its new epoch")
    // every streamed row searchable exactly once: 80 distinct live ids
    // (2000's dead copy is masked or already consolidated away)
    val all = idx.scan(Array(0.5f, 0.5f, 0.5f, 0.5f), 100, searchParam = 100000)
      .collect().map(_.getLong(0))
    assert(all.length == 80 && all.toSet.size == 80)
  }

  test("replayed micro-batch is skipped: numVectors and results unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(40)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_replay", initial.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/st_replay")

    val batch = Seq.tabulate(10)(i => ((200 + i).toLong, vec())).toDF("id", "embedding")
    IndexMaintenance.applyAppendBatch(idx, batch, batchId = 0, "id", "embedding")
    assert(idx.meta.numVectors == 50)
    assert(idx.lastAppliedBatch() == 0)
    val q = initial.head._2
    val resBefore = idx.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // replay the same micro-batch (failure-recovery redelivery)
    IndexMaintenance.applyAppendBatch(idx, batch, batchId = 0, "id", "embedding")
    assert(idx.meta.numVectors == 50, "replayed batch must not double-insert")
    val resAfter = idx.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(resAfter == resBefore)

    // a replayed CDC batch is skipped the same way
    val cdc = initial.take(3).map { case (id, v) => (id, v, "delete") }
      .toDF("id", "embedding", "op")
    IndexMaintenance.applyCdcBatch(idx, cdc, batchId = 1, "id", "embedding", "op")
    assert(idx.meta.numDeleted == 3 && idx.lastAppliedBatch() == 1)
    IndexMaintenance.applyCdcBatch(idx, cdc, batchId = 1, "id", "embedding", "op")
    assert(idx.meta.numDeleted == 3, "replayed CDC batch must not double-count deletes")

    // restart with the SAME checkpoint source: a fresh index handle reloaded
    // from disk still sees the watermark
    val reloaded = AnnIndexManager.load(spark, s"$tmp/st_replay")
    assert(reloaded.lastAppliedBatch() == 1)
  }

  test("CDC update (delete+insert of one id in ONE batch) leaves the new row visible") {
    import spark.implicits._
    val rnd = new scala.util.Random(24)
    def vec() = Array.fill(4)(rnd.nextFloat())
    for (engine <- Seq("FLAT", "DISKANN")) {
      val initial = Seq.tabulate(20)(i => (i.toLong, vec()))
      val idx = AnnIndexManager.create(spark, s"st_upd_$engine",
        initial.toDF("id", "embedding"), "id", "embedding", engine,
        Map("metric" -> "l2"), s"$tmp/st_upd_$engine")
      // update id=7 to a brand-new vector via the standard CDC encoding
      val newVec = Array(9f, 9f, 9f, 9f)
      val batch = Seq((7L, initial(7)._2, "delete"), (7L, newVec, "insert"))
        .toDF("id", "embedding", "op")
      IndexMaintenance.applyCdcBatch(idx, batch, batchId = 0, "id", "embedding", "op")
      // the new row must be found (nearest to its own vector), not masked
      // by the same-batch tombstone
      val hit = idx.scan(newVec, 1, searchParam = 100000).head()
      assert(hit.getLong(0) == 7L, s"$engine: updated row must be visible")
      // and the OLD row is masked: searching near the old vector must not
      // return a distance-0 hit for id 7
      val old = idx.scan(initial(7)._2, 20, searchParam = 100000).collect()
        .filter(_.getLong(0) == 7L)
      assert(old.length == 1 && old.head.getDouble(1) > 1e-6,
        s"$engine: old row must be tombstone-masked")
      // vacuum keeps the updated row
      idx.vacuum()
      assert(idx.scan(newVec, 1, searchParam = 100000).head().getLong(0) == 7L,
        s"$engine: update must survive vacuum")
    }
  }

  test("watermarks are scoped per stream: a second stream's batch 0 is not masked") {
    import spark.implicits._
    val rnd = new scala.util.Random(25)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(10)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_two",
      initial.toDF("id", "embedding"), "id", "embedding", "FLAT",
      Map("metric" -> "l2"), s"$tmp/st_two")
    val a = Seq.tabulate(5)(i => ((100 + i).toLong, vec())).toDF("id", "embedding")
    val b = Seq.tabulate(5)(i => ((200 + i).toLong, vec())).toDF("id", "embedding")
    // stream A applies batches 0..3; stream B then starts at ITS OWN batch 0
    IndexMaintenance.applyAppendBatch(idx, a, batchId = 3, "id", "embedding", streamId = "a")
    IndexMaintenance.applyAppendBatch(idx, b, batchId = 0, "id", "embedding", streamId = "b")
    assert(idx.meta.numVectors == 20, "stream b's batch must not be masked by stream a")
    assert(idx.lastAppliedBatch("a") == 3 && idx.lastAppliedBatch("b") == 0)
    // replay within each stream is still skipped
    IndexMaintenance.applyAppendBatch(idx, b, batchId = 0, "id", "embedding", streamId = "b")
    assert(idx.meta.numVectors == 20)
  }

  test("streaming windowed aggregation over events (engine capability demo)") {
    import spark.implicits._
    // nanos ts as long, matching the driver events table shape
    val srcDir = s"$tmp/ev_src"
    val base = 1700000000000000000L
    Seq.tabulate(100)(i => (i.toLong, base + i.toLong * 60L * 1000000000L, i % 3))
      .map { case (id, ts, t) => (id, ts, s"type_$t", 1.0) }
      .toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val agg = spark.readStream.schema(evSchema).parquet(srcDir)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_agg")
      .option("checkpointLocation", s"$tmp/ckpt3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT * FROM ev_agg").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum == 100)
  }

  test("stream-stream interval join matches within the delay horizon only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    // left: document ingests; right: quality-check events on the same doc
    val ingests = MemoryStream[(Long, java.sql.Timestamp, String)]
    val checks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = StreamingPipeline.intervalJoin(
      ingests.toDF().toDF("doc_id", "ingest_ts", "source"),
      checks.toDF().toDF("doc_id", "check_ts", "verdict"),
      key = "doc_id", leftTs = "ingest_ts", rightTs = "check_ts",
      maxDelay = "10 minutes", watermarkDelay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      ingests.addData((1L, ts(10, 0), "web"), (2L, ts(10, 0), "pdf"))
      checks.addData(
        (1L, ts(10, 5), "pass"),   // in horizon → match
        (2L, ts(10, 20), "late"),  // 20 min after ingest → outside horizon
        (3L, ts(10, 5), "orphan")) // no ingest → no match
      q.processAllAvailable()
      val rows = spark.table("ivj")
        .select("doc_id", "source", "verdict").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set((1L, "web", "pass")))

      // a second check inside the horizon still matches (inner join emits
      // per matching pair, not first-only)
      checks.addData((2L, ts(10, 8), "pass2"))
      q.processAllAvailable()
      val rows2 = spark.table("ivj")
        .select("doc_id", "verdict").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows2 == Set((1L, "pass"), (2L, "pass2")))

      // output schema: single doc_id column (right side's dropped)
      assert(spark.table("ivj").columns.count(_ == "doc_id") == 1)
    } finally q.stop()
  }

  test("interval join rejects a watermark shorter than the join horizon") {
    import spark.implicits._
    // watermarkDelay < maxDelay would silently evict in-horizon right rows
    // as late data (missed joins, not an error) — must fail fast instead
    val l = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "a"))
      .toDF("doc_id", "ingest_ts", "source")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), "ok"))
      .toDF("doc_id", "check_ts", "verdict")
    val e = intercept[IllegalArgumentException] {
      StreamingPipeline.intervalJoin(l, r, key = "doc_id",
        leftTs = "ingest_ts", rightTs = "check_ts",
        maxDelay = "2 hours", watermarkDelay = "30 minutes")
    }
    assert(e.getMessage.contains("watermarkDelay"))
    // boundary: equal horizons are allowed (including mixed units)
    StreamingPipeline.intervalJoin(l, r, key = "doc_id",
      leftTs = "ingest_ts", rightTs = "check_ts",
      maxDelay = "90 minutes", watermarkDelay = "1 hour 30 minutes")
  }

  test("streaming as-of join: event-time correctness under out-of-order arrival") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    def ms(h: Int, m: Int) = ts(h, m).getTime

    val lStream = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val rStream = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = StreamingPipeline.streamingAsofJoin(
      lStream.toDF().toDF("lts", "key", "lid"),
      rStream.toDF().toDF("rts", "key", "rid"),
      "key", "lts", "rts", "lid", "rid", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    def rows = spark.table("asof_stream").as[(Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(t => t._2 -> (t._4, t._5)).toMap
    try {
      // r100@10:00 then l1@10:05 — watermark (10:05-5m=10:00) has not
      // passed l1's event time, so nothing emits yet
      rStream.addData((ts(10, 0), 1L, 100L))
      lStream.addData((ts(10, 5), 1L, 1L))
      q.processAllAvailable()
      assert(spark.table("asof_stream").isEmpty)

      // r101@10:03 arrives OUT OF ORDER but inside the horizon; r102@10:20
      // advances the watermark to 10:15 > l1 — l1 must certify against the
      // COMPLETE buffer and pick r101 (10:03), not r100 (10:00)
      rStream.addData((ts(10, 3), 1L, 101L), (ts(10, 20), 1L, 102L))
      q.processAllAvailable()
      assert(rows(1L) == ((Some(101L), Some(ms(10, 3)))))

      // late left l2@10:02 (< watermark 10:15) is dropped as late data;
      // l4@10:30 with out-of-order r103@10:25 lands AFTER r102 — l4 must
      // pick r103; key-3 left with no rights emits None (left-outer)
      lStream.addData((ts(10, 2), 1L, 2L), (ts(10, 30), 1L, 4L),
        (ts(10, 50), 3L, 9L))
      rStream.addData((ts(10, 25), 1L, 103L))
      q.processAllAvailable()
      // advance the (global) watermark past every pending left
      rStream.addData((ts(11, 30), 2L, 900L))
      q.processAllAvailable()
      val got = rows
      assert(!got.contains(2L), "late left must be dropped, not joined")
      assert(got(4L) == ((Some(103L), Some(ms(10, 25)))))
      assert(got(9L) == ((None, None)))

      // equivalence with the batch operator on the in-horizon rows
      val lBatch = Seq((ms(10, 5), 1L, 1L), (ms(10, 30), 1L, 4L),
        (ms(10, 50), 3L, 9L)).toDF("lts", "key", "lid")
      val rBatch = Seq((ms(10, 0), 1L, 100L), (ms(10, 3), 1L, 101L),
        (ms(10, 20), 1L, 102L), (ms(10, 25), 1L, 103L),
        (ms(11, 30), 2L, 900L)).toDF("rts", "key", "rid")
      val batch = graft.operators.AsofJoin.join(lBatch, rBatch, Seq("key"),
          "lts", "rts", joinType = "left", rightTieBreak = Some("rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got.view.mapValues(_._1).toMap == batch)
    } finally q.stop()
  }

  test("streaming as-of join: duplicate right timestamps resolve to max rid") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val lStream = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val rStream = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = StreamingPipeline.streamingAsofJoin(
      lStream.toDF().toDF("lts", "key", "lid"),
      rStream.toDF().toDF("rts", "key", "rid"),
      "key", "lts", "rts", "lid", "rid", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("asof_ties")
      .outputMode("append").start()
    try {
      rStream.addData((ts(10, 0), 1L, 7L), (ts(10, 0), 1L, 12L), (ts(10, 0), 1L, 3L))
      lStream.addData((ts(10, 1), 1L, 1L))
      q.processAllAvailable()
      rStream.addData((ts(10, 30), 2L, 0L)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("asof_ties")
        .selectExpr("left_id", "right_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(1L) == 12L)
    } finally q.stop()
  }
}
