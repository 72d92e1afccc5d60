package graft.operators

import graft.SparkSpec
import graft.functions.VectorKernels
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._

import java.nio.file.Files

class OperatorSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_op_spec").toString

  private lazy val vecs: Seq[(Long, Int, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(300)(i => (i.toLong, i % 5, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
  }

  private lazy val vecsDf = {
    import spark.implicits._
    vecs.toDF("id", "tag", "vec")
  }

  private lazy val flat = AnnIndexManager.create(spark, "op_flat", vecsDf,
    "id", "vec", "FLAT", Map("metric" -> "l2"), s"$tmp/op_flat")

  private lazy val ivf = AnnIndexManager.create(spark, "op_ivf", vecsDf,
    "id", "vec", "IVF", Map("metric" -> "l2", "nlist" -> "6", "nprobe" -> "6"),
    s"$tmp/op_ivf")

  private def brute(q: Array[Float], k: Int, pred: ((Long, Int, Array[Float])) => Boolean = _ => true): Seq[Long] =
    vecs.filter(pred)
      .map { case (id, _, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("searchTable (F8): VALUES-style input with passthrough columns") {
    import spark.implicits._
    val queries = Seq(
      ("near_first", vecs(0)._3),
      ("near_last", vecs(299)._3)
    ).toDF("qname", "qvec")
    val res = AnnSearch.searchTable(flat, queries, k = 3, queryIdCol = Some("qname"))
    val byName = res.collect().groupBy(_.getAs[String]("qname"))
    assert(byName.keySet == Set("near_first", "near_last"))
    for ((name, rows) <- byName) {
      assert(rows.length == 3)
      val ids = rows.sortBy(r => (r.getAs[Double]("_distance"), r.getAs[Long]("id")))
        .map(_.getAs[Long]("id")).toSeq
      val q = if (name == "near_first") vecs(0)._3 else vecs(299)._3
      assert(ids == brute(q, 3), name)
      assert(ids.head == (if (name == "near_first") 0L else 299L)) // self at distance 0
    }
  }

  test("rangeTable: per-query results equal scalar rangeScan (FLAT + pruned IVF)") {
    import spark.implicits._
    val qs = Seq((0L, vecs(0)._3), (1L, vecs(150)._3), (2L, vecs(299)._3))
    val queries = qs.toDF("qid", "qvec")
    val radius = 2.5
    for (idx <- Seq(flat, ivf)) {
      val batch = AnnSearch.rangeTable(idx, queries, radius,
          queryVecCol = Some("qvec"), queryIdCol = Some("qid"))
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq.sorted).toMap
      for ((qid, q) <- qs) {
        val scalar = idx.rangeScan(q, radius).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
        assert(scalar.nonEmpty, s"fixture radius too small for qid=$qid")
        assert(batch.getOrElse(qid, Nil) == scalar, s"engine=${idx.meta.engine} qid=$qid")
      }
    }
    // whole-null query vector drops; null ELEMENT yields NaN distances that
    // never pass the radius filter — both edge rows vanish from the output
    val edge = Seq((9L, null.asInstanceOf[Array[Float]]))
      .toDF("qid", "qvec")
      .union(Seq(0).toDF("x").select(lit(10L).as("qid"),
        array(lit(null.asInstanceOf[java.lang.Float]), lit(0f), lit(0f), lit(0f),
          lit(0f), lit(0f), lit(0f), lit(0f)).cast("array<float>").as("qvec")))
    assert(AnnSearch.rangeTable(flat, edge, radius,
      queryVecCol = Some("qvec"), queryIdCol = Some("qid")).count() == 0)
  }

  test("searchTable over IVF with auto-detected vector column and generated qid") {
    import spark.implicits._
    val queries = Seq.tabulate(5)(i => Tuple1(vecs(i * 50)._3)).toDF("anon_vec")
    val res = AnnSearch.searchTable(ivf, queries, k = 4, nprobe = 6)
    assert(res.count() == 20)
    // every query's best hit is itself at distance 0
    val zero = res.filter(col("_distance") === 0.0).count()
    assert(zero == 5)
  }

  private lazy val diskann = AnnIndexManager.create(spark, "op_vam", vecsDf,
    "id", "vec", "DISKANN", Map("metric" -> "l2", "shards" -> "2"), s"$tmp/op_vam")

  private lazy val hnsw = AnnIndexManager.create(spark, "op_hnsw", vecsDf,
    "id", "vec", "HNSW", Map("metric" -> "l2", "shards" -> "2"), s"$tmp/op_hnsw")

  test("searchTable routes graph engines through the batch kernel (S5, DISKANN)") {
    import spark.implicits._
    val queries = Seq(
      ("near_first", vecs(0)._3),
      ("near_last", vecs(299)._3)
    ).toDF("qname", "qvec")
    // exhaustive beam (l >= n) → exact results on a connected graph
    val res = AnnSearch.searchTable(diskann, queries, k = 3, nprobe = 100000,
      queryIdCol = Some("qname"))
    val byName = res.collect().groupBy(_.getAs[String]("qname"))
    assert(byName.keySet == Set("near_first", "near_last"))
    for ((name, rows) <- byName) {
      val ids = rows.sortBy(r => (r.getAs[Double]("_distance"), r.getAs[Long]("id")))
        .map(_.getAs[Long]("id")).toSeq
      val q = if (name == "near_first") vecs(0)._3 else vecs(299)._3
      assert(ids == brute(q, 3), name)
    }
  }

  test("searchTable routes graph engines through the batch kernel (S5, HNSW)") {
    import spark.implicits._
    val queries = Seq.tabulate(3)(i => Tuple1(vecs(i * 90)._3)).toDF("qvec")
    val res = AnnSearch.searchTable(hnsw, queries, k = 4, nprobe = 100000)
    assert(res.count() == 12)
    assert(res.filter(col("_distance") === 0.0).count() == 3) // self-hits
  }

  test("searchFiltered cosine fallback ranks raw (non-unit) base vectors correctly") {
    val cosIdx = AnnIndexManager.create(spark, "op_cos", vecsDf,
      "id", "vec", "FLAT", Map("metric" -> "cosine"), s"$tmp/op_cos")
    val q = vecs(42)._3
    // predicate matches only 6 rows < k=8 → exact fallback always fires
    val pred = col("tag") === 2 && col("id") > 270
    val res = AnnSearch.searchFiltered(cosIdx, vecsDf, "id", q, 8, predicate = pred)
    val got = res.collect().map(_.getAs[Long]("id")).toSeq
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val expect = vecs.filter(t => t._2 == 2 && t._1 > 270)
      .map { case (id, _, v) => (id, 1.0 - cos(q, v)) }
      .sortBy { case (id, d) => (d, id) }.map(_._1)
    assert(got == expect)
  }

  test("searchTable errors when no numeric array column exists (F8 error case)") {
    import spark.implicits._
    val bad = Seq(("a", 1)).toDF("s", "i")
    val e = intercept[IllegalArgumentException] {
      AnnSearch.searchTable(flat, bad, k = 3)
    }
    assert(e.getMessage.contains("no numeric array column"))
  }

  test("vectorDistances appends _distance without reordering (S6)") {
    val q = vecs(10)._3
    val res = AnnSearch.vectorDistances(vecsDf, "vec", q).collect()
    assert(res.length == 300)
    val m = res.map(r => r.getAs[Long]("id") -> r.getAs[Double]("_distance")).toMap
    assert(m(10L) == 0.0)
    assert(math.abs(m(11L) - VectorKernels.l2Sq(q, vecs(11)._3)) < 1e-9)
  }

  test("searchFiltered: overfetch path and exact fallback agree with brute force") {
    val q = vecs(42)._3
    // selective predicate (1/5 of rows): overfetch 3k+100 covers it at n=300
    val res = AnnSearch.searchFiltered(flat, vecsDf, "id", q, 5,
      predicate = col("tag") === 2)
    val got = res.collect().map(_.getAs[Long]("id")).toSeq
    assert(got == brute(q, 5, t => t._2 == 2))
  }

  test("searchTable graph strategies: auto crosses the collect bound by going distributed") {
    import spark.implicits._
    val graph = AnnIndexManager.create(spark, "op_guard", vecsDf,
      "id", "vec", "DISKANN", Map("metric" -> "l2"), s"$tmp/op_guard")
    val queries = vecs.take(10).map { case (id, _, v) => (id, v) }.toDF("qid", "qvec")
    spark.conf.set("spark.ann.maxCollectedQueries", "5")
    try {
      // strategy=collect keeps the hard bound (the explicit opt-in contract)
      spark.conf.set("spark.ann.graphTableStrategy", "collect")
      val e = intercept[IllegalArgumentException] {
        AnnSearch.searchTable(graph, queries, k = 3)
      }
      assert(e.getMessage.contains("maxCollectedQueries"))
      // auto (default): 10 queries > bound 5 → distributed path, no error,
      // and with an exhaustive beam the results are the exact brute-force
      // top-k — value-identical to what the collect path would return
      spark.conf.set("spark.ann.graphTableStrategy", "auto")
      val res = AnnSearch.searchTable(graph, queries, k = 3, nprobe = 100000,
        queryIdCol = Some("qid")).collect()
      assert(res.length == 30)
      for ((qid, rows) <- res.groupBy(_.getAs[Long]("qid"))) {
        val ids = rows.sortBy(r => (r.getAs[Double]("_distance"), r.getAs[Long]("id")))
          .map(_.getAs[Long]("id")).toSeq
        assert(ids == brute(vecs(qid.toInt)._3, 3), s"qid=$qid")
      }
    } finally {
      spark.conf.unset("spark.ann.maxCollectedQueries")
      spark.conf.unset("spark.ann.graphTableStrategy")
    }
  }

  test("distributed table search equals collect exactly (DISKANN + HNSW), incl. tombstones") {
    import spark.implicits._
    val queries = vecs.take(8).map { case (id, _, v) => (id, v) }.toDF("qid", "qvec")
    def run(idx: graft.index.AnnIndex, strategy: String): Seq[(Long, Long, Double)] = {
      spark.conf.set("spark.ann.graphTableStrategy", strategy)
      try AnnSearch.searchTable(idx, queries, k = 5, nprobe = 100000,
          queryIdCol = Some("qid"))
        .select(col("qid"), col("id"), round(col("_distance"), 6).as("d"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
      finally spark.conf.unset("spark.ann.graphTableStrategy")
    }
    assert(run(diskann, "distributed") == run(diskann, "collect"))
    assert(run(hnsw, "distributed") == run(hnsw, "collect"))

    // tombstone masking flows through the distributed path's seg column:
    // delete two ids and verify neither strategy ever returns them
    val delIdx = AnnIndexManager.create(spark, "op_dist_del", vecsDf,
      "id", "vec", "DISKANN", Map("metric" -> "l2", "shards" -> "2"),
      s"$tmp/op_dist_del")
    delIdx.delete(Seq(0L, 1L))
    val a = run(delIdx, "distributed")
    assert(a == run(delIdx, "collect"))
    assert(!a.exists(t => t._2 == 0L || t._2 == 1L))
    // the deleted queries' own top hits shift to the next-nearest live rows
    assert(a.count(_._1 == 0L) == 5)
  }

  test("pinned distributed table search: zip path is value-identical and moves no graph bytes") {
    import spark.implicits._
    val queries = vecs.take(8).map { case (id, _, v) => (id, v) }.toDF("qid", "qvec")
    val idx = AnnIndexManager.create(spark, "op_zip", vecsDf,
      "id", "vec", "DISKANN", Map("metric" -> "l2", "shards" -> "4"), s"$tmp/op_zip")

    // total shuffle-write bytes across every job an action triggers;
    // listener events are async, so spin until the sum stabilizes
    def shuffleBytes(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        f
        var prev = -1L
        var spins = 0
        while (acc.get != prev && spins < 40) {
          prev = acc.get; spins += 1; Thread.sleep(250)
        }
        acc.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    def run(): Seq[(Long, Long, Double)] = {
      spark.conf.set("spark.ann.graphTableStrategy", "distributed")
      try AnnSearch.searchTable(idx, queries, k = 5, nprobe = 100000,
          queryIdCol = Some("qid"))
        .select(col("qid"), col("id"), round(col("_distance"), 6).as("d"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
      finally spark.conf.unset("spark.ann.graphTableStrategy")
    }

    // unpinned → cogroup (shuffles the whole graph); pinned → zip path
    var cogroupRes: Seq[(Long, Long, Double)] = null
    var zipRes: Seq[(Long, Long, Double)] = null
    val cogroupBytes = shuffleBytes { cogroupRes = run() }
    idx.persist()
    try {
      val zipBytes = shuffleBytes { zipRes = run() }
      assert(zipRes == cogroupRes, "zip path must be value-identical to cogroup")
      // repeat call (the standing-workload shape) stays identical AND takes
      // the layout fast path (serves queries without re-scanning the
      // cached graph partitions — at least one partition must report it)
      val fastBefore = graft.index.GraphShardCache.zipFastPathHits.get()
      assert(run() == cogroupRes)
      assert(graft.index.GraphShardCache.zipFastPathHits.get() > fastBefore,
        "repeat zip call should be served from the recorded shard layout")
      // the zip path's shuffles carry only routed queries + top-k
      // candidates — a small fraction of the cogroup's full-graph exchange
      assert(zipBytes * 3 < cogroupBytes,
        s"zip path should move far fewer bytes: zip=$zipBytes cogroup=$cogroupBytes")
    } finally idx.unpersist()
  }

  test("searchFiltered honors spark.ann.overfetchMultiplier (extension-option analogue)") {
    val q = vecs(42)._3
    spark.conf.set("spark.ann.overfetchMultiplier", "1")
    try {
      val res = AnnSearch.searchFiltered(flat, vecsDf, "id", q, 5,
        predicate = col("tag") === 2)
      // correctness must be invariant to the multiplier (fallback covers
      // whatever the overfetch misses)
      assert(res.collect().map(_.getAs[Long]("id")).toSeq == brute(q, 5, t => t._2 == 2))
    } finally spark.conf.unset("spark.ann.overfetchMultiplier")
  }

  test("TopK.grouped equals window-based top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(5000)(i => (i % 7, i.toLong, rnd.nextDouble()))
    val df = rows.toDF("g", "id", "d").repartition(8)
    val got = TopK.grouped(df, "g", "d", "id", 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (r._3, r._2)).take(10).map(r => (g, r._2))
    }.toSet
    assert(got == expect)
  }

  test("TopK.grouped stays exact when the buffer cap forces multiple heap flushes") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.ann.topkMaxBufferedRows")
    spark.conf.set("spark.ann.topkMaxBufferedRows", "100")
    try {
      val rnd = new scala.util.Random(41)
      // 60 groups × k=10 ≫ 100 buffered rows → every partition flushes
      // its heap map many times; phase 2 must still reduce exactly
      val rows = Seq.tabulate(20000)(i => (i % 60, i.toLong, rnd.nextDouble()))
      val df = rows.toDF("g", "id", "d").repartition(4)
      val got = TopK.grouped(df, "g", "d", "id", 10)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(10).map(r => (g, r._2))
      }.toSet
      assert(got == expect)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.ann.topkMaxBufferedRows", v)
        case None => spark.conf.unset("spark.ann.topkMaxBufferedRows")
      }
    }
  }

  test("TopK.grouped treats -0.0 and 0.0 as equal (id tie-break, matching SQL)") {
    import spark.implicits._
    // phase-1 heap must not keep -0.0 over 0.0 when SQL would tie-break to
    // the smaller id (ip metric emits -0.0 for an exactly-zero dot)
    val df = Seq((0, 5L, -0.0), (0, 3L, 0.0), (0, 7L, 1.0)).toDF("g", "id", "d")
      .repartition(1)
    val got = TopK.grouped(df, "g", "d", "id", 1).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L)
  }

  test("searchTableFetch: query column named 'id' and shared base names survive; missing base ids keep hits") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val vecs = Seq.tabulate(40)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
    val idx = AnnIndexManager.create(spark, "fetch_idx", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"),
      s"${Files.createTempDirectory("graft_fetch")}/idx")
    // query relation uses the hostile names: its OWN id + an embedding col
    val queries = Seq((900L, vecs(3)._2)).toDF("id", "embedding")
    // base drops row 3 (a guaranteed hit: the query IS vector 3)
    val base = vecs.filter(_._1 != 3L)
      .map { case (i, v) => (i, s"t$i", v) }.toDF("id", "tag", "embedding")
    val out = AnnSearch.searchTableFetch(idx, queries, base, "id", k = 3,
      queryVecCol = Some("embedding"), queryIdCol = Some("id"))
    val rows = out.collect()
    assert(rows.length == 3) // left join: the missing base id keeps its hit row
    // caller's own id column intact; colliding base columns prefixed
    assert(out.columns.count(_ == "id") == 1 && rows.forall(_.getAs[Long]("id") == 900L))
    assert(out.columns.contains("base_id") && out.columns.contains("base_embedding"))
    val missing = rows.filter(_.isNullAt(out.columns.indexOf("base_id")))
    assert(missing.length == 1 && missing.head.getAs[Double]("_distance") == 0.0)
  }

  test("searchTableFetch rerank: coarse-PQ candidates refine to the exact top-k per query") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val vecs = Seq.tabulate(120)(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("id", "embedding")
    // deliberately coarse PQ (m=2): raw ADC ranking is visibly lossy
    val idx = AnnIndexManager.create(spark, "fetch_rr_idx", df,
      "id", "embedding", "FLAT",
      Map("metric" -> "l2", "quantization" -> "pq", "pq_m" -> "2"),
      s"${Files.createTempDirectory("graft_fetch_rr")}/idx")
    val queries = Seq((900L, vecs(7)._2), (901L, vecs(90)._2)).toDF("qid", "qvec")
    // oversample 12 → 5*12 = 60 candidates... not the full corpus; use 24 → 120 = all
    val out = AnnSearch.searchTableFetch(idx, queries, df, "id", k = 5,
      queryVecCol = Some("qvec"), queryIdCol = Some("qid"),
      oversample = 24, rerank = true)
    val got = out.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"), r.getAs[Double]("_distance")))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._2)).map(_._2).toSeq).toMap
    for ((qid, q) <- Seq((900L, vecs(7)._2), (901L, vecs(90)._2))) {
      val exact = vecs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
      assert(got(qid) == exact, s"query $qid: ${got(qid)} vs $exact")
    }
    // rerank without a query key must fail fast, not mis-group
    val e = intercept[IllegalArgumentException] {
      AnnSearch.searchTableFetch(idx, queries, df, "id", k = 5,
        queryVecCol = Some("qvec"), rerank = true)
    }
    assert(e.getMessage.contains("queryIdCol"))
  }

  test("searchTable: a query row with a null vector ELEMENT drops out instead of crashing") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val base = Seq.tabulate(50)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
    val idx = AnnIndexManager.create(spark, "nullq_idx", base.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"),
      s"${Files.createTempDirectory("graft_nullq")}/idx")
    val queries = Seq(
      (10L, Seq[java.lang.Float](0.5f, 0.5f, 0.5f, 0.5f)),
      (20L, Seq[java.lang.Float](0.5f, null, 0.5f, 0.5f))
    ).toDF("qid", "qvec")
    val out = AnnSearch.searchTable(idx, queries, k = 3,
      queryVecCol = Some("qvec"), queryIdCol = Some("qid")).collect()
    // the good query returns k hits; the null-element query's NaN
    // distances sort last — it still returns rows but all-NaN distances
    val good = out.filter(_.getAs[Long]("qid") == 10L)
    assert(good.length == 3 && good.forall(!_.getAs[Double]("_distance").isNaN))
    assert(out.filter(_.getAs[Long]("qid") == 20L)
      .forall(_.getAs[Double]("_distance").isNaN))

    // a WHOLE-null vector (null array, not null element) drops out at the
    // operator edge instead of NPE-ing inside a task
    val withNullRow = Seq(
      (10L, Seq[java.lang.Float](0.5f, 0.5f, 0.5f, 0.5f)),
      (30L, null.asInstanceOf[Seq[java.lang.Float]])
    ).toDF("qid", "qvec")
    val out2 = AnnSearch.searchTable(idx, withNullRow, k = 3,
      queryVecCol = Some("qvec"), queryIdCol = Some("qid")).collect()
    assert(out2.count(_.getAs[Long]("qid") == 10L) == 3)
    assert(!out2.exists(_.getAs[Long]("qid") == 30L))
  }
}
