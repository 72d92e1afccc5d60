package graft.index

import graft.SparkSpec
import graft.functions.VectorKernels

import java.nio.file.Files

/** Online graph insert: Vamana.insertIntoShard (the per-point Algorithm 3
  * step on an existing shard) and the AnnIndex copy-on-write shard rewrite
  * behind `spark.ann.onlineInsertMaxRows`. */
class OnlineInsertSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_online_spec").toString

  private val dim = 8
  private def vecs(n: Int, seed: Int, from: Long = 0L): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (from + i, Array.fill(dim)(rnd.nextFloat() * 10f)))
  }

  private def bruteTopK(data: Seq[(Long, Array[Float])], q: Array[Float],
                        k: Int): Seq[Long] =
    data.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  private val params = Vamana.Params(maxDegree = 16, buildComplexity = 64, alpha = 1.2)

  // ---- kernel level ----

  test("insertIntoShard extends the graph without touching the input shard") {
    val base = vecs(100, 1)
    val extra = vecs(20, 2, from = 100L)
    val sh0 = Vamana.buildShard(base.map(_._1).toArray,
      base.map(_._2).toArray, params, "l2")
    val snapshot = sh0.neighbors.map(_.clone())
    val sh = Vamana.insertIntoShard(sh0, extra.map(_._1).toArray,
      extra.map(_._2).toArray, params, "l2")

    // input shard not mutated (copy-on-write spine, wholesale list swaps)
    assert(sh0.ids.length == 100 && sh0.neighbors.length == 100)
    sh0.neighbors.zip(snapshot).foreach { case (now, before) =>
      assert(now.sameElements(before))
    }
    // old labels keep their positions; entry preserved
    assert(sh.ids.length == 120)
    assert(sh.ids.take(100).sameElements(sh0.ids))
    assert(sh.entry == sh0.entry)
    // structural invariants: degree bound, label range
    sh.neighbors.foreach { nb =>
      assert(nb.length <= params.maxDegree)
      nb.foreach(l => assert(l >= 0 && l < 120))
    }
    // exhaustive beam over the grown graph is exact on the union —
    // every new point must be reachable
    val all = base ++ extra
    for (q <- Seq(extra(3)._2, base(7)._2, Array.fill(dim)(5f))) {
      val got = Vamana.beamSearch(sh, q, l = 200,
          VectorKernels.orderingDistance("l2") _)
        .sortBy { case (l, d) => (d, sh.ids(l)) }.take(10).map(p => sh.ids(p._1))
      assert(got == bruteTopK(all, q, 10),
        "exhaustive beam after online insert must be exact")
    }
  }

  test("insertIntoShard into an empty shard builds from scratch") {
    val pts = vecs(30, 3)
    val empty = Vamana.Shard(Array.empty, Array.empty, Array.empty, 0)
    val sh = Vamana.insertIntoShard(empty, pts.map(_._1).toArray,
      pts.map(_._2).toArray, params, "l2")
    assert(sh.ids.length == 30)
    val q = pts(11)._2
    val got = Vamana.beamSearch(sh, q, l = 64,
        VectorKernels.orderingDistance("l2") _)
      .sortBy { case (l, d) => (d, sh.ids(l)) }.take(5).map(p => sh.ids(p._1))
    assert(got == bruteTopK(pts, q, 5))
  }

  test("online-grown graph holds from-scratch recall at a realistic beam") {
    val all = vecs(800, 70)
    val (base, extra) = all.splitAt(600)
    val dist = graft.functions.VectorKernels.orderingDistance("l2") _
    val scratch = Vamana.buildShard(all.map(_._1).toArray,
      all.map(_._2).toArray, params, "l2")
    val grown = Vamana.insertIntoShard(
      Vamana.buildShard(base.map(_._1).toArray, base.map(_._2).toArray,
        params, "l2"),
      extra.map(_._1).toArray, extra.map(_._2).toArray, params, "l2")
    def recall(sh: Vamana.Shard): Double = {
      val qs = Seq.tabulate(25)(i => vecs(1, 200 + i).head._2)
      qs.map { q =>
        val got = Vamana.beamSearch(sh, q, l = 64, dist)
          .sortBy { case (l, d) => (d, sh.ids(l)) }.take(10)
          .map(p => sh.ids(p._1)).toSet
        bruteTopK(all, q, 10).count(got).toDouble / 10
      }.sum / qs.size
    }
    val rs = recall(scratch)
    val rg = recall(grown)
    // the same ≥70% contract VamanaSpec pins for the from-scratch build,
    // plus parity: growing 25% of the graph online must not degrade it
    // beyond run-shape noise vs building the union at once
    assert(rg >= 0.7, s"online-grown recall $rg below the floor")
    assert(rg >= rs - 0.1, s"online-grown $rg vs from-scratch $rs")
  }

  test("removeFromShard: absorb + compact keeps the live graph exact (both engines)") {
    val pts = vecs(100, 50)
    val dead = Array.tabulate(100)(i => i % 5 == 1) // 20 dead, entry may die
    val live = pts.zipWithIndex.collect { case (p, i) if !dead(i) => p }

    val v0 = Vamana.buildShard(pts.map(_._1).toArray, pts.map(_._2).toArray,
      params, "l2")
    val (v, vmap) = Vamana.removeFromShard(v0, dead, params, "l2")
    assert(v.ids.length == 80 && !v.ids.exists(id => dead(id.toInt)))
    assert(vmap.count(_ == -1) == 20)
    assert(v.entry >= 0 && v.entry < 80)
    v.neighbors.foreach { nb =>
      assert(nb.length <= params.maxDegree)
      nb.foreach(l => assert(l >= 0 && l < 80))
    }
    for (q <- Seq(pts(1)._2, pts(42)._2)) { // q near a DEAD point too
      val got = Vamana.beamSearch(v, q, l = 200,
          graft.functions.VectorKernels.orderingDistance("l2") _)
        .sortBy { case (l, d) => (d, v.ids(l)) }.take(10).map(p => v.ids(p._1))
      assert(got == bruteTopK(live, q, 10),
        "consolidated graph must stay exact under an exhaustive beam")
    }

    val hp = Hnsw.Params(m = 8, efConstruction = 64)
    val h0 = Hnsw.buildShard(pts.map(_._1).toArray, pts.map(_._2).toArray, hp, "l2")
    val (h, hmap) = Hnsw.removeFromShard(h0, dead, hp, "l2")
    assert(h.ids.length == 80 && hmap.count(_ == -1) == 20)
    assert(h.levels(h.entry) == h.maxLevel)
    h.neighbors.zipWithIndex.foreach { case (byLevel, i) =>
      assert(byLevel.length == h.levels(i) + 1)
      byLevel.foreach(_.foreach(l => assert(l >= 0 && l < 80)))
    }
    for (q <- Seq(pts(6)._2, pts(77)._2)) {
      val got = Hnsw.search(h, q, 10, 100000,
          graft.functions.VectorKernels.orderingDistance("l2") _)
        .sortBy { case (l, d) => (d, h.ids(l)) }.take(10).map(p => h.ids(p._1))
      assert(got.toSeq == bruteTopK(live, q, 10))
    }
  }

  // ---- index level ----

  test("online insert rewrites shards copy-on-write; shard count stays flat") {
    import spark.implicits._
    val base = vecs(200, 4)
    val idx = AnnIndexManager.create(spark, "t_online",
      base.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2"),
      s"$tmp/t_online")
    assert(idx.meta.param("shards", 0) == 2)
    val liveBefore = idx.meta.params("live_shards")

    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    // grace 0 = reclaim swapped dirs at publish (this test pins the
    // no-leak property; the grace-deferred default is pinned in
    // ManifestSpec's standing-reader case)
    spark.conf.set("spark.ann.reclaimGraceMs", "0")
    try {
      var all = base
      for (b <- 0 until 3) {
        val batch = vecs(10, 10 + b, from = 1000L + b * 10)
        idx.insert(batch.toDF("id", "embedding"), "id", "embedding")
        all = all ++ batch
      }
      // no delta shards accumulated — the r13 append model would be at 5
      assert(idx.meta.param("shards", 0) == 2,
        s"online insert must not open delta shards: ${idx.meta.params("live_shards")}")
      // but the LIVE IDS moved (fresh dirs per rewrite — crash safety)
      assert(idx.meta.params("live_shards") != liveBefore)
      assert(idx.meta.numVectors == 230)
      // swapped-out pre-rewrite dirs are reclaimed after each publish —
      // a steady online stream must not leak one dead dir per batch
      val onDisk = IndexMeta.listShardDirs(s"$tmp/t_online/data").toSet
      val manifested = idx.meta.params("live_shards")
        .split(",").map(_.toInt).toSet
      assert(onDisk == manifested,
        s"unreclaimed shard dirs: ${onDisk -- manifested}")

      // exhaustive search exact over the union, new rows included
      val q = all(215)._2
      val got = idx.scan(q, 10, searchParam = 100000)
        .collect().map(_.getLong(0)).toSeq
      assert(got == bruteTopK(all, q, 10))

      // old rows keep their insert epoch (seg 0) through the rewrite;
      // new rows carry the batch epoch
      val segs = idx.data.selectExpr("id", "seg").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(segs(base(0)._1) == 0L)
      assert(segs(1000L) == 1L && segs(1010L) == 2L && segs(1020L) == 3L)

      // delete + online re-insert of the same id: the fresh epoch wins
      // (the CDC update encoding the epoch tombstones exist for)
      idx.delete(Seq(1000L))
      assert(!idx.scan(all(0)._2, 230, searchParam = 100000)
        .collect().map(_.getLong(0)).contains(1000L))
      idx.insert(Seq((1000L, Array.fill(dim)(0.5f))).toDF("id", "embedding"),
        "id", "embedding")
      assert(idx.meta.param("shards", 0) == 2)
      val near = idx.scan(Array.fill(dim)(0.5f), 1, searchParam = 100000)
        .collect().map(_.getLong(0)).toSeq
      assert(near == Seq(1000L), "re-inserted id must be live at the new epoch")
    } finally {
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
      spark.conf.unset("spark.ann.reclaimGraceMs")
    }
  }

  test("HNSW online insert: layered extension, flat shard count, exact exhaustive") {
    import spark.implicits._
    val base = vecs(200, 30)
    val idx = AnnIndexManager.create(spark, "t_online_hnsw",
      base.toDF("id", "embedding"), "id", "embedding", "HNSW",
      Map("metric" -> "l2", "hnsw_m" -> "16", "shards" -> "2"),
      s"$tmp/t_online_hnsw")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      var all = base
      for (b <- 0 until 3) {
        val batch = vecs(10, 40 + b, from = 2000L + b * 10)
        idx.insert(batch.toDF("id", "embedding"), "id", "embedding")
        all = all ++ batch
      }
      assert(idx.meta.param("shards", 0) == 2,
        "HNSW online insert must not open delta shards")
      val q = all(225)._2
      val got = idx.scan(q, 10, searchParam = 100000)
        .collect().map(_.getLong(0)).toSeq
      assert(got == bruteTopK(all, q, 10),
        "exhaustive ef after HNSW online insert must be exact")
      // delete + online re-insert of the same id at a moved vector
      idx.delete(Seq(2000L))
      idx.insert(Seq((2000L, Array.fill(dim)(0.75f))).toDF("id", "embedding"),
        "id", "embedding")
      val near = idx.scan(Array.fill(dim)(0.75f), 1, searchParam = 100000)
        .collect().map(_.getLong(0)).toSeq
      assert(near == Seq(2000L))
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }

  test("pinned table search resolves mixed-epoch shards, fast path included") {
    import spark.implicits._
    val base = vecs(150, 20)
    val idx = AnnIndexManager.create(spark, "t_online_zip",
      base.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2"),
      s"$tmp/t_online_zip")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      // delete + online re-insert: the rewritten shard now mixes epochs,
      // and the hit for the re-inserted id must carry ITS row's epoch
      // through the zip layout cache, not the shard head's
      idx.insert(vecs(5, 21, from = 900L).toDF("id", "embedding"), "id", "embedding")
      idx.delete(Seq(900L))
      idx.insert(Seq((900L, Array.fill(dim)(0.25f))).toDF("id", "embedding"),
        "id", "embedding")
      idx.persist()
      val qs = Seq((1, Array.fill(dim)(0.25f)), (2, base(3)._2))
        .toDF("__qid", "__qvec")
      def top(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
        df.collect().groupBy(_.getInt(0))
          .map { case (q, rs) => q -> rs.minBy(_.getDouble(2)).getLong(1) }
      val first = top(idx.scanGraphTable(qs, 3, 100000))
      assert(first(1) == 900L, "re-inserted id must surface on the zip path")
      val hits0 = GraphShardCache.zipFastPathHits.get()
      val second = top(idx.scanGraphTable(qs, 3, 100000))
      assert(second == first)
      assert(GraphShardCache.zipFastPathHits.get() > hits0,
        "repeat call must serve from the recorded layout (per-label epochs)")
      idx.unpersist()
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }

  test("pinned BROADCAST search: repeat calls serve from the batch layout cache, mixed epochs exact") {
    import spark.implicits._
    val base = vecs(150, 25)
    val idx = AnnIndexManager.create(spark, "t_online_bfast",
      base.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2"),
      s"$tmp/t_online_bfast")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      // delete + online re-insert → a mixed-epoch shard; the fast path
      // must carry per-LABEL epochs, not a shard constant
      idx.insert(vecs(5, 26, from = 950L).toDF("id", "embedding"), "id", "embedding")
      idx.delete(Seq(950L))
      idx.insert(Seq((950L, Array.fill(dim)(0.35f))).toDF("id", "embedding"),
        "id", "embedding")
      idx.persist()
      val qs = Seq(Array.fill(dim)(0.35f), base(3)._2)
      def top(): Seq[(Int, Long)] =
        idx.searchBatch(qs, 3, searchParam = 100000).collect()
          .groupBy(_.getInt(0)).toSeq
          .map { case (q, rs) => q -> rs.minBy(_.getDouble(2)).getLong(1) }
          .sortBy(_._1)
      val first = top() // full scan: records the batch layout
      assert(first.head._2 == 950L, "re-inserted id must surface")
      val hits0 = GraphShardCache.batchFastPathHits.get()
      val second = top()
      assert(second == first)
      assert(GraphShardCache.batchFastPathHits.get() > hits0,
        "pinned repeat searchBatch must serve from the recorded layout")
      // a mutation rotates the meta version: the stale layout is
      // structurally unreachable and results stay exact
      idx.insert(vecs(3, 27, from = 980L).toDF("id", "embedding"), "id", "embedding")
      val third = idx.searchBatch(Seq(base(3)._2), 150, searchParam = 100000)
        .collect().map(_.getLong(1)).toSet
      assert(third.contains(980L) && third.contains(950L) && !third.contains(-1L))
      idx.unpersist()
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }

  test("online rewrite consolidates tombstoned rows out of the touched shards") {
    import spark.implicits._
    val base = vecs(200, 60)
    val idx = AnnIndexManager.create(spark, "t_online_cons",
      base.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2"),
      s"$tmp/t_online_cons")
    val deletedIds = (0L until 30L).toSeq
    idx.delete(deletedIds)
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      // two micro-batches → least-recently-rewritten targeting touches
      // BOTH shards, so every tombstoned row is physically consolidated
      idx.insert(vecs(5, 61, from = 3000L).toDF("id", "embedding"), "id", "embedding")
      idx.insert(vecs(5, 62, from = 3100L).toDF("id", "embedding"), "id", "embedding")
      assert(idx.meta.param("shards", 0) == 2)
      // dead rows are GONE from the dataset, not just masked
      val physical = idx.data.select("id").collect().map(_.getLong(0)).toSet
      assert(deletedIds.forall(id => !physical.contains(id)),
        "consolidation must drop tombstoned rows from rewritten shards")
      // numVectors tracks the physical row count through the drop
      assert(idx.meta.numVectors == 200 - 30 + 10)
      // the masked-row bound deflates with the drop, and once it reaches
      // zero the now-inert tombstone log is removed — searches stop
      // paying overfetch beam width for rows that no longer exist
      assert(idx.meta.numDeleted == 0,
        s"numDeleted=${idx.meta.numDeleted} must deflate as dead rows drop")
      assert(!idx.hasDeletes, "inert tombstone log must be dropped")
      // and the consolidated graph is still exact
      val live = base.filter(_._1 >= 30)
      val q = live(100)._2
      val got = idx.scan(q, 10, searchParam = 100000)
        .collect().map(_.getLong(0)).toSeq
      val extra = (vecs(5, 61, from = 3000L) ++ vecs(5, 62, from = 3100L))
      assert(got == bruteTopK(live ++ extra, q, 10))
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }

  test("same-batch CDC update (delete+insert of one id) through the online path") {
    import spark.implicits._
    val base = vecs(120, 80)
    val idx = AnnIndexManager.create(spark, "t_online_cdcup",
      base.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2"),
      s"$tmp/t_online_cdcup")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      // the CDC update encoding: tombstone at the pre-batch epoch, insert
      // at the next — in ONE applyCdc. The online rewrite sees the fresh
      // tombstone, consolidates the OLD copy of id 7 out of its shard,
      // and the new copy (seg > tombstone) must stay visible.
      idx.applyCdc(Seq(7L).toDF("id"),
        Seq((7L, Array.fill(dim)(0.33f))).toDF("id", "embedding"),
        "id", "embedding")
      assert(idx.meta.param("shards", 0) == 2)
      val near = idx.scan(Array.fill(dim)(0.33f), 1, searchParam = 100000)
        .collect().map(_.getLong(0)).toSeq
      assert(near == Seq(7L), "updated row must be live at the new epoch")
      // exactly one physical copy of id 7 remains IF its shard was the
      // rewrite target; never more than two, and never zero
      val copies = idx.data.where("id = 7").count()
      assert(copies >= 1 && copies <= 2)
      // the old vector is gone from search results either way
      val all = idx.scan(base(7)._2, 200, searchParam = 100000)
        .collect().filter(_.getLong(0) == 7L)
      assert(all.length == 1)
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }

  test("sq8 online insert: old codes byte-identical through the rewrite; exhaustive top-k equals the delta path") {
    import spark.implicits._
    val base = vecs(200, 90)
    val batch = vecs(20, 91, from = 3000L)
    def mk(name: String) = AnnIndexManager.create(spark, name,
      base.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2", "quantization" -> "sq8"),
      s"$tmp/$name")
    val idxO = mk("t_sq8_online")
    val idxD = mk("t_sq8_delta")
    def codesById(idx: AnnIndex): Map[Long, Array[Byte]] =
      idx.data.select("id", "codes").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val before = codesById(idxO)

    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try idxO.insert(batch.toDF("id", "embedding"), "id", "embedding")
    finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
    // the online path engaged (no delta shard opened)
    assert(idxO.meta.param("shards", 0) == 2,
      s"sq8 online insert fell back to delta: ${idxO.meta.params("live_shards")}")
    idxD.insert(batch.toDF("id", "embedding"), "id", "embedding") // delta path
    assert(idxD.meta.param("shards", 0) == 3)

    // OLD rows' stored codes are BIT-identical across the rewrite — the
    // online path must never decode+re-encode an existing row
    val after = codesById(idxO)
    base.foreach { case (id, _) =>
      assert(java.util.Arrays.equals(before(id), after(id)),
        s"stored codes for id $id changed through the online rewrite")
    }
    // new rows encode with the build-time params — identical bytes to
    // what the delta path wrote for the same floats
    val deltaCodes = codesById(idxD)
    batch.foreach { case (id, _) =>
      assert(java.util.Arrays.equals(after(id), deltaCodes(id)),
        s"online-encoded codes for new id $id differ from the delta path's")
    }
    // exhaustive beam over identical stored codes → identical top-k
    for (q <- Seq(batch(7)._2, base(13)._2)) {
      val o = idxO.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSeq
      val d = idxD.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSeq
      assert(o == d, s"online vs delta exhaustive top-k diverged: $o vs $d")
    }
  }

  test("fp16 online insert engages and stays exact vs the delta path") {
    import spark.implicits._
    val base = vecs(150, 95)
    val batch = vecs(15, 96, from = 4000L)
    def mk(name: String) = AnnIndexManager.create(spark, name,
      base.toDF("id", "embedding"), "id", "embedding", "HNSW",
      Map("metric" -> "l2", "hnsw_m" -> "16", "shards" -> "2",
        "quantization" -> "fp16"),
      s"$tmp/$name")
    val idxO = mk("t_fp16_online")
    val idxD = mk("t_fp16_delta")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try idxO.insert(batch.toDF("id", "embedding"), "id", "embedding")
    finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
    assert(idxO.meta.param("shards", 0) == 2, "fp16 online insert fell back to delta")
    idxD.insert(batch.toDF("id", "embedding"), "id", "embedding")
    val q = batch(3)._2
    val o = idxO.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSeq
    val d = idxD.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSeq
    assert(o == d)
  }

  test("batches above the cap and non-eligible engines fall back to delta shards") {
    import spark.implicits._
    spark.conf.set("spark.ann.onlineInsertMaxRows", "5")
    try {
      val idx = AnnIndexManager.create(spark, "t_online_fb",
        vecs(100, 5).toDF("id", "embedding"), "id", "embedding", "DISKANN",
        Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
          "shards" -> "2"),
        s"$tmp/t_online_fb")
      // 20 rows > cap of 5 → delta path, shard count grows
      idx.insert(vecs(20, 6, from = 500L).toDF("id", "embedding"), "id", "embedding")
      assert(idx.meta.param("shards", 0) == 3)

      // lossy-decode storage (pq/bq/rabitq): online path must not fire
      // (decoded codebook/sign vectors would steer graph edge selection
      // away from the build-on-floats contract) — delta shard instead.
      // sq8/fp16 are online-eligible since r15 (codes carried verbatim).
      val pq = AnnIndexManager.create(spark, "t_online_pq",
        vecs(100, 7).toDF("id", "embedding"), "id", "embedding", "DISKANN",
        Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
          "quantization" -> "pq", "pq_m" -> "4", "shards" -> "2"),
        s"$tmp/t_online_pq")
      pq.insert(vecs(3, 8, from = 600L).toDF("id", "embedding"), "id", "embedding")
      assert(pq.meta.param("shards", 0) == 3)
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }
}
