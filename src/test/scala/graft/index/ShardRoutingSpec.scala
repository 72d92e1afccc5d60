package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Shard-routed graph search (`spark.ann.shardProbes` + ShardSummaries):
  * per-shard centroid summaries maintained alongside the manifest, a
  * coarse top-s shard probe per query (the SPANN posting-selection idea
  * applied between shards), and walk-all fallback whenever coverage is
  * stale — routing may cost recall, never correctness. */
class ShardRoutingSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_routing_spec").toString
  import scala.jdk.CollectionConverters._

  private val dim = 8

  /** Clustered corpus: `perCluster` points around each of `nc` well-
    * separated centers — shard routing only has signal when geometry has
    * structure (uniform noise makes every staged filter read as broken). */
  private def clustered(nc: Int, perCluster: Int): Seq[(Long, Array[Float])] =
    Seq.tabulate(nc * perCluster) { i =>
      val c = i % nc
      val rc = new scala.util.Random(c * 7919 + 3)
      val rd = new scala.util.Random(i * 2654435761L + 11)
      val center = Array.fill(dim)(rc.nextFloat() * 100f)
      (i.toLong, center.map(x => x + rd.nextFloat().toFloat))
    }

  private def df(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("id", "vec")
  }

  private var n = 0
  private def create(rows: Seq[(Long, Array[Float])], engine: String,
                     params: Map[String, String]): AnnIndex = {
    n += 1
    AnnIndexManager.create(spark, s"routing_$n", df(rows), "id", "vec",
      engine, params, s"$tmp/idx$n")
  }

  private def ids(dfr: org.apache.spark.sql.DataFrame): Seq[Long] =
    dfr.collect().map(_.getAs[Long]("id")).toSeq

  private def withProbes[T](s: Int)(f: => T): T = {
    spark.conf.set("spark.ann.shardProbes", s.toString)
    try f finally spark.conf.unset("spark.ann.shardProbes")
  }

  private val queries = Seq.tabulate(12) { i =>
    val rc = new scala.util.Random((i % 6) * 7919 + 3)
    val rd = new scala.util.Random(i * 104729L + 5)
    Array.fill(dim)(rc.nextFloat() * 100f).map(x => x + rd.nextFloat().toFloat)
  }

  test("spatial create writes summaries covering exactly the manifest; hash create skips (opt-in via refresh)") {
    val idx = create(clustered(6, 120), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "6", "shard_assign" -> "spatial"))
    val sums = ShardSummaries.read(idx.path).get
    assert(sums.map(_.shard).toSeq == idx.meta.liveShards.get.sorted)
    assert(sums.forall(_.centroid.length == dim))
    assert(sums.map(_.nrows).sum == 720L)
    // hash-sharded: no summaries at create (their centroids carry no
    // routing signal — the pass would be pure build overhead), but the
    // explicit refresh opts in and later mutations then maintain coverage
    val hidx = create(clustered(4, 60), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "4"))
    assert(ShardSummaries.read(hidx.path).isEmpty)
    assert(hidx.refreshShardSummaries() == hidx.meta.liveShards.get.size)
    hidx.insert(df(clustered(1, 30).map { case (id, v) => (id + 50000L, v) }),
      "id", "vec")
    val hsums = ShardSummaries.read(hidx.path).get
    assert(hsums.map(_.shard).toSeq.sorted == hidx.meta.liveShards.get.sorted)
  }

  test("routed search: s >= shards is value-identical; s < shards holds a recall floor") {
    // spatial shard assignment — hash-by-id shards all span the whole
    // space (their centroids are the global mean) and carry no routing
    // signal; spatial is the mode the routing tier exists for
    val idx = create(clustered(6, 120), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "6", "shard_assign" -> "spatial"))
    val walkAll = queries.map(q => ids(idx.scan(q, 5)))
    // s >= live shard count: the routing gate stands down, results identical
    val wide = withProbes(100) { queries.map(q => ids(idx.scan(q, 5))) }
    assert(wide == walkAll)
    // s = 2 of 6 on well-separated clusters: near-total overlap
    val routed = withProbes(2) { queries.map(q => ids(idx.scan(q, 5))) }
    val overlap = walkAll.zip(routed).map { case (w, r) =>
      w.toSet.intersect(r.toSet).size.toDouble / w.size }.sum / walkAll.size
    assert(overlap >= 0.95, s"routed overlap $overlap below floor")
  }

  test("stale or missing summaries fall back to walk-all (never wrong, never throws)") {
    val idx = create(clustered(4, 100), "HNSW",
      Map("metric" -> "l2", "hnsw_m" -> "8", "shards" -> "4",
        "shard_assign" -> "spatial"))
    val walkAll = queries.take(4).map(q => ids(idx.scan(q, 5)))
    ShardSummaries.delete(idx.path)
    idx.invalidateSummaries()
    val routed = withProbes(1) { queries.take(4).map(q => ids(idx.scan(q, 5))) }
    assert(routed == walkAll) // fallback = walk-all, exact same answer
    // refresh restores coverage, routing engages again
    assert(idx.refreshShardSummaries() == idx.meta.liveShards.get.size)
    val afterRefresh = withProbes(1) { queries.take(4).map(q => ids(idx.scan(q, 5))) }
    afterRefresh.zip(walkAll).foreach { case (r, w) =>
      assert(r.nonEmpty && r.size == w.size)
    }
  }

  test("mutations maintain coverage: delta insert, online insert, compact, vacuum") {
    val idx = create(clustered(4, 100), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "4", "shard_assign" -> "spatial"))
    def coverage(): Unit = {
      val sums = ShardSummaries.read(idx.path).get
      assert(sums.map(_.shard).toSeq.sorted == idx.meta.liveShards.get.sorted,
        s"summary ids ${sums.map(_.shard).toSeq} != manifest ${idx.meta.liveShards.get}")
    }
    coverage()
    // delta insert (above the online cap = default 0/off)
    idx.insert(df(clustered(2, 30).map { case (id, v) => (id + 10000L, v) }),
      "id", "vec")
    coverage()
    // online insert
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      idx.insert(df(Seq.tabulate(40) { i =>
        (20000L + i, Array.fill(dim)(new scala.util.Random(i + 77).nextFloat() * 100f))
      }), "id", "vec")
      coverage()
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
    // compact the accumulated small shards
    if (idx.compactShards() > 0) coverage()
    // delete + vacuum (id reuse → full recompute)
    idx.delete(Seq(1L, 2L, 3L))
    idx.vacuum()
    coverage()
    // routing stays engaged and exact-at-full-width after the whole cycle
    val walkAll = queries.take(4).map(q => ids(idx.scan(q, 5)))
    val wide = withProbes(1000) { queries.take(4).map(q => ids(idx.scan(q, 5))) }
    assert(wide == walkAll)
  }

  test("routing composes with online-rewritten shards and tombstones") {
    val rows = clustered(4, 100)
    val idx = create(rows, "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "4", "shard_assign" -> "spatial"))
    spark.conf.set("spark.ann.onlineInsertMaxRows", "200")
    try {
      idx.delete(Seq(0L, 4L, 8L)) // one id per early cluster
      idx.insert(df(Seq.tabulate(50) { i =>
        val c = i % 4
        val rc = new scala.util.Random(c * 7919 + 3)
        val rd = new scala.util.Random(i * 31L + 9)
        (30000L + i,
          Array.fill(dim)(rc.nextFloat() * 100f).map(_ + rd.nextFloat().toFloat))
      }), "id", "vec")
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
    // rewritten shards sit under fresh ids; coverage must have followed
    val sums = ShardSummaries.read(idx.path).get
    assert(sums.map(_.shard).toSeq.sorted == idx.meta.liveShards.get.sorted)
    // deleted ids stay masked on the routed path too
    val walkAll = queries.take(6).map(q => ids(idx.scan(q, 5)))
    val routed = withProbes(2) { queries.take(6).map(q => ids(idx.scan(q, 5))) }
    routed.flatten.foreach(id => assert(!Seq(0L, 4L, 8L).contains(id)))
    val overlap = walkAll.zip(routed).map { case (w, r) =>
      w.toSet.intersect(r.toSet).size.toDouble / w.size }.sum / walkAll.size
    assert(overlap >= 0.9, s"post-mutation routed overlap $overlap")
  }

  test("table path routes: distributed cogroup and pinned zip agree with walk-all at full width") {
    import spark.implicits._
    val idx = create(clustered(6, 120), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "6", "shard_assign" -> "spatial"))
    val qdf = queries.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("qid", "qvec")
    def tableIds(): Map[Long, Seq[Long]] =
      graft.operators.AnnSearch.searchTable(idx, qdf, 5,
          queryIdCol = Some("qid"))
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSeq.sorted }
    spark.conf.set("spark.ann.graphTableStrategy", "distributed")
    try {
      val walkAll = tableIds()
      val wide = withProbes(50) { tableIds() }
      assert(wide == walkAll) // full width = identical through the router
      val routed = withProbes(2) { tableIds() }
      val overlap = walkAll.keys.toSeq.map { q =>
        walkAll(q).toSet.intersect(routed(q).toSet).size.toDouble / walkAll(q).size
      }.sum / walkAll.size
      assert(overlap >= 0.95, s"table-path routed overlap $overlap")
      // pinned zip path: same contract
      idx.persist()
      try {
        val zipWide = withProbes(50) { tableIds() }
        assert(zipWide == walkAll)
        val zipRouted = withProbes(2) { tableIds() }
        val zo = walkAll.keys.toSeq.map { q =>
          walkAll(q).toSet.intersect(zipRouted(q).toSet).size.toDouble / walkAll(q).size
        }.sum / walkAll.size
        assert(zo >= 0.95, s"zip-path routed overlap $zo")
      } finally idx.unpersist()
    } finally spark.conf.unset("spark.ann.graphTableStrategy")
  }

  test("quantized graph summaries compute from decoded codes; cosine centroids normalize") {
    val idx = create(clustered(4, 100), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "4", "quantization" -> "sq8", "shard_assign" -> "spatial"))
    val sums = ShardSummaries.read(idx.path).get
    assert(sums.map(_.shard).toSeq == idx.meta.liveShards.get.sorted)
    // centroid of decoded sq8 codes lands near the true cluster scale
    assert(sums.forall(_.centroid.exists(v => v > 0f && v < 110f)))

    val cosRows = clustered(4, 80).map { case (id, v) => (id, v) }
    val cidx = create(cosRows, "HNSW",
      Map("metric" -> "cosine", "hnsw_m" -> "8", "shards" -> "4",
        "shard_assign" -> "spatial"))
    val csums = ShardSummaries.read(cidx.path).get
    csums.foreach { s =>
      val norm = math.sqrt(s.centroid.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"cosine centroid not unit: $norm")
    }
    // and routing on the cosine index at full width stays identical
    val qs = queries.take(4).map(graft.functions.VectorKernels.normalize)
    val walkAll = qs.map(q => ids(cidx.scan(q, 5)))
    val wide = withProbes(100) { qs.map(q => ids(cidx.scan(q, 5))) }
    assert(wide == walkAll)
  }

  test("skewed spatial cells hash-split to the per-task budget; search stays exact at full width") {
    // one dominant cluster (90% of rows) — k-means puts most mass in one
    // cell; unbounded assignment would make that cell one giant build
    // task (straggler/OOM at scale). Cluster sizes exceeding the real
    // d=8 budget are impossible at test scale, so exercise
    // spatialShardAssign directly with a tiny target, then the
    // end-to-end create path separately below.
    val rows = (Seq.tabulate(900) { i => // dominant cluster
      val rd = new scala.util.Random(i * 31L + 1)
      (i.toLong, Array.fill(dim)(50f + rd.nextFloat()))
    } ++ Seq.tabulate(100) { i => // small far cluster
      val rd = new scala.util.Random(i * 37L + 2)
      (900L + i, Array.fill(dim)(5f + rd.nextFloat()))
    })
    val prepared = graft.index.AnnIndexBuilder.prepare(
      df(rows), "id", "vec", "l2")
    val (asg, total) = graft.index.AnnIndexBuilder.spatialShardAssign(
      prepared, rows.size, 2, targetRows = 250, seed = 42L)
    // the ~900-row cell splits into ~ceil(900/250)=4 sub-shards (sample-
    // estimated sizes — the two clusters are 9:1, far outside the
    // estimate's error band); the small cell stays whole, and no
    // sub-shard lands far above the budget
    assert(total >= 4, s"dominant cell did not split (total=$total)")
    val counts = asg.groupBy("__sa").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keys.forall(s => s >= 0 && s < total))
    assert(counts.values.sum == 1000L)
    assert(counts.values.max <= 350L,
      s"a sub-shard exceeds the budget band: $counts")
    // end-to-end: a spatial index over the same skewed data searches
    // exactly at full width (summaries cover whatever split happened)
    val idx = create(rows, "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "2", "shard_assign" -> "spatial"))
    val sums = ShardSummaries.read(idx.path).get
    assert(sums.map(_.shard).toSeq.sorted == idx.meta.liveShards.get.sorted)
    val q = rows(13)._2
    val walkAll = ids(idx.scan(q, 5, searchParam = 100000))
    val wide = withProbes(1000) { ids(idx.scan(q, 5, searchParam = 100000)) }
    assert(wide == walkAll)
  }

  test("vacuum of a fully-deleted spatial index yields the empty index (no train crash)") {
    val rows = clustered(2, 40)
    val idx = create(rows, "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2", "shard_assign" -> "spatial"))
    idx.delete(rows.map(_._1))
    idx.vacuum() // purge lifecycle: spatial center training must not run on 0 rows
    assert(idx.meta.numVectors == 0 && idx.meta.numDeleted == 0)
    assert(idx.scan(queries.head, 5, searchParam = 100000).collect().isEmpty)
    // and the index accepts new rows again afterwards
    idx.insert(df(clustered(1, 20).map { case (id, v) => (id + 90000L, v) }),
      "id", "vec")
    assert(idx.scan(queries.head, 5, searchParam = 100000).collect().nonEmpty)
  }

  test("topShards is deterministic, bounded, and orders by centroid distance") {
    val shards = Array(10, 20, 30)
    val cents = Array(
      Array(0f, 0f), Array(10f, 0f), Array(20f, 0f))
    val got = ShardSummaries.topShards(Array(11f, 0f), shards, cents, 2, "l2")
    assert(got.toSeq == Seq(20, 30)) // 10f center nearest, then 20f
    assert(ShardSummaries.topShards(Array(1f, 0f), shards, cents, 5, "l2")
      .toSeq == Seq(10, 20, 30))
    // NaN query: still returns s valid shards (junk in, bounded junk out)
    val nan = ShardSummaries.topShards(Array(Float.NaN, 0f), shards, cents, 2, "l2")
    assert(nan.length == 2 && nan.forall(shards.contains))
    // a NaN CENTROID (poisoned shard) must never steal a probe slot —
    // the other shards rank normally
    val cents2 = Array(Array(Float.NaN, 0f), Array(10f, 0f), Array(20f, 0f))
    val skip = ShardSummaries.topShards(Array(11f, 0f), shards, cents2, 2, "l2")
    assert(skip.toSeq == Seq(20, 30), s"NaN centroid stole a slot: ${skip.toSeq}")
  }

  test("two-level Router: coarse level engages above the threshold, keeps the exact-compat contract") {
    // 1,000 synthetic shard centroids on a 2-d grid of 25 well-separated
    // cluster sites (40 shards each, σ=0.3 jitter — deterministic)
    val rnd = new scala.util.Random(7)
    val sites = for (x <- 0 until 5; y <- 0 until 5) yield (x * 10f, y * 10f)
    val sums = Array.tabulate(1000) { i =>
      val (sx, sy) = sites(i % 25)
      ShardSummaries.Summary(i, 100L,
        Array(sx + rnd.nextGaussian().toFloat * 0.3f,
              sy + rnd.nextGaussian().toFloat * 0.3f))
    }.sortBy(_.shard)

    // below threshold → one-level (no coarse structure)
    val flat = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 2000, overscan = 4)
    assert(flat.coarse.isEmpty)

    val routed = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 256, overscan = 4)
    assert(routed.coarse.isDefined)
    val co = routed.coarse.get
    // the centroid graph covers every (non-NaN) shard exactly once
    assert(co.graph.ids.length == 1000)
    assert(co.graphShards.sorted.toSeq == (0 until 1000))

    // deterministic: a second build routes identically
    val routed2 = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 256, overscan = 4)
    val probe = Array(31f, 12f)
    assert(routed.topShards(probe, 8).toSeq == routed2.topShards(probe, 8).toSeq)

    // full width bypasses the coarse level: identical to the flat ranking
    // over ALL shards (the ann_routed_exact contract)
    assert(routed.topShards(probe, 1000).toSeq == flat.topShards(probe, 1000).toSeq)
    assert(routed.topShards(probe, 5000).length == 1000)

    // narrow width: top-s through the coarse level agrees with the flat
    // scan on this well-separated layout (the cells ARE the clusters)
    for (q <- Seq(Array(0f, 0f), Array(20f, 20f), Array(41f, 3f), Array(17f, 38f))) {
      val viaCells = routed.topShards(q, 8).toSeq
      val viaFlat = flat.topShards(q, 8).toSeq
      assert(viaCells == viaFlat,
        s"coarse routing diverged at ${q.toSeq}: $viaCells vs $viaFlat")
    }
    // bounded output and no duplicates at intermediate widths
    val got = routed.topShards(probe, 40)
    assert(got.length == 40 && got.distinct.length == 40)
  }

  test("Router survives a Java serialization round-trip (the table-path broadcast contract)") {
    val rnd = new scala.util.Random(3)
    val sums = Array.tabulate(500)(i => ShardSummaries.Summary(i, 10L,
      Array.fill(4)((rnd.nextGaussian() * (i % 10)).toFloat)))
    val router = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 256, overscan = 4)
    assert(router.coarse.isDefined)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(router); oos.close(); bos.toByteArray
    }
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject()
      .asInstanceOf[ShardSummaries.Router]
    for (qi <- Seq(1, 7, 42); s <- Seq(4, 8, 500)) {
      val q = sums(qi * 9).centroid
      assert(back.topShards(q, s).toSeq == router.topShards(q, s).toSeq,
        s"round-trip diverged at q=$qi s=$s")
    }
    // shared-array dedup: the graph's vectors ARE the centroid arrays
    // (identity-shared refs), so Java serialization writes each centroid
    // once — the broadcast payload is O(shards×dim), not 2×
    assert(router.coarse.get.graph.vectors(0) eq router.centroids(0))
  }

  test("Router coarse graph persists to router.bin and is digest-validated") {
    val rnd = new scala.util.Random(19)
    def mkSums(shift: Float) = Array.tabulate(500)(i =>
      ShardSummaries.Summary(i, 10L,
        Array.fill(4)((rnd.nextGaussian() * (i % 10)).toFloat + shift)))
    val sums = mkSums(0f)
    val dir = Files.createTempDirectory("graft_router_cache").toString
    val cachePath = ShardSummaries.Router.cacheFilePath(dir)
    // first build writes the cache
    val r1 = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    assert(r1.coarse.isDefined && Files.exists(cachePath))
    val firstBytes = Files.readAllBytes(cachePath)
    // a fresh build (new driver) reads it back: identical routing, file
    // untouched (no rewrite on a hit)
    val r2 = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    for (qi <- Seq(2, 11, 47)) {
      val q = sums(qi * 7).centroid
      assert(r2.topShards(q, 8).toSeq == r1.topShards(q, 8).toSeq)
    }
    assert(java.util.Arrays.equals(firstBytes, Files.readAllBytes(cachePath)))
    // changed summaries (a mutation) -> digest mismatch -> rebuild + rewrite
    val moved = mkSums(5f)
    val r3 = ShardSummaries.Router.build(moved, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    assert(r3.coarse.isDefined)
    assert(!java.util.Arrays.equals(firstBytes, Files.readAllBytes(cachePath)),
      "mutated summaries must not serve the old cached graph")
    // corruption degrades to a rebuild, never a throw
    Files.write(cachePath, Array.fill[Byte](32)(7))
    val r4 = ShardSummaries.Router.build(moved, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    assert(r4.coarse.isDefined)
  }

  test("Router.patch reconciles a mutation incrementally: tombstones + inserts, no rebuild") {
    val rnd = new scala.util.Random(23)
    val sums0 = Array.tabulate(500)(i => ShardSummaries.Summary(i, 10L,
      Array.fill(4)((rnd.nextGaussian() * (1 + i % 10)).toFloat)))
    val r0 = ShardSummaries.Router.build(sums0, "l2",
      coarseThreshold = 256, overscan = 4)
    assert(r0.coarse.isDefined)
    // a typical online batch: 10 shards rewritten under fresh ids
    val removedIds = (0 until 10).map(_ * 37).toSet
    val fresh = Array.tabulate(10)(i => ShardSummaries.Summary(1000 + i, 12L,
      Array.fill(4)((rnd.nextGaussian() * 3).toFloat)))
    val sums1 = (sums0.filterNot(s => removedIds(s.shard)) ++ fresh).sortBy(_.shard)
    val r1 = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = 256, overscan = 4, base = Some(r0))
    val co1 = r1.coarse.get
    // patched, not rebuilt: the graph kept the old 500 nodes (10 now
    // tombstoned) and grew by the 10 inserts
    assert(co1.graphShards.length == 510,
      s"expected a patched 510-node graph, got ${co1.graphShards.length}")
    assert(co1.graphShards.count(_ == -1) == 10)
    assert(co1.liveCount == 500)
    // tombstoned ids never route; fresh ids do
    for (qi <- Seq(5, 60, 199)) {
      val got = r1.topShards(sums1(qi).centroid, 12)
      assert(got.forall(sid => !removedIds(sid)), s"tombstone routed: ${got.toSeq}")
      assert(got.length == 12 && got.distinct.length == 12)
    }
    val nearFresh = r1.topShards(fresh(3).centroid, 8)
    assert(nearFresh.contains(1003), s"fresh shard unreachable: ${nearFresh.toSeq}")
    // full width still bypasses the coarse level: exact-compat unchanged
    val flat1 = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = Int.MaxValue, overscan = 4)
    val q = sums1(123).centroid
    assert(r1.topShards(q, 5000).toSeq == flat1.topShards(q, 5000).toSeq)
    // narrow-width parity with a from-scratch rebuild of the same set
    val rebuilt = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = 256, overscan = 4)
    val agree = Seq(7, 77, 207, 307).map { qi =>
      val a = r1.topShards(sums1(qi).centroid, 8).toSet
      val b = rebuilt.topShards(sums1(qi).centroid, 8).toSet
      a.intersect(b).size.toDouble / 8
    }.sum / 4
    assert(agree >= 0.9, s"patched routing diverged from rebuild: $agree")
    // nrows-only drift (no centroid change) reuses the graph object outright
    val sums2 = sums1.map(s => s.copy(nrows = s.nrows + 1))
    val r2 = ShardSummaries.Router.build(sums2, "l2",
      coarseThreshold = 256, overscan = 4, base = Some(r1))
    assert(r2.coarse.get eq co1)
  }

  test("Router.patch stands down on large diffs and on tombstone dilution (compaction)") {
    val rnd = new scala.util.Random(29)
    def mk(id: Int) = ShardSummaries.Summary(id, 10L,
      Array.fill(4)((rnd.nextGaussian() * (1 + id % 7)).toFloat))
    val sums0 = Array.tabulate(500)(mk).sortBy(_.shard)
    val r0 = ShardSummaries.Router.build(sums0, "l2",
      coarseThreshold = 256, overscan = 4)
    // 100 changes > max(64, 500/8): a rebuild beats a serial patch
    val big = (sums0.drop(100) ++ Array.tabulate(100)(i => mk(2000 + i)))
      .sortBy(_.shard)
    val rBig = ShardSummaries.Router.build(big, "l2",
      coarseThreshold = 256, overscan = 4, base = Some(r0))
    assert(rBig.coarse.get.graphShards.length == 500 &&
      !rBig.coarse.get.graphShards.contains(-1),
      "oversized diff must trigger a full rebuild")
    // repeated small patches accumulate tombstones until the 25% ceiling
    // forces a compacting rebuild
    var cur = sums0
    var router = r0
    var rounds = 0
    var compacted = false
    while (!compacted && rounds < 12) {
      rounds += 1
      val drop = cur.take(30).map(_.shard).toSet
      val add = Array.tabulate(30)(i => mk(10000 + rounds * 100 + i))
      cur = (cur.filterNot(s => drop(s.shard)) ++ add).sortBy(_.shard)
      router = ShardSummaries.Router.build(cur, "l2",
        coarseThreshold = 256, overscan = 4, base = Some(router))
      val co = router.coarse.get
      compacted = !co.graphShards.contains(-1)
      // live count always tracks the covered set exactly
      assert(co.liveCount == 500)
    }
    assert(compacted && rounds >= 4,
      s"dilution ceiling never compacted (rounds=$rounds)")
  }

  test("cosine coarse build excludes zero-norm centroids (NaN under 1-dot can't steal beam slots)") {
    val rnd = new scala.util.Random(31)
    val sums = Array.tabulate(600) { i =>
      val c =
        if (i == 7 || i == 400) Array.fill(4)(0f) // all-zero shard means
        else graft.functions.VectorKernels.normalize(
          Array.fill(4)((rnd.nextGaussian() + math.cos(i % 20)).toFloat))
      ShardSummaries.Summary(i, 10L, c)
    }
    val routed = ShardSummaries.Router.build(sums, "cosine",
      coarseThreshold = 256, overscan = 4)
    val co = routed.coarse.get
    assert(!co.graphShards.contains(7) && !co.graphShards.contains(400),
      "zero-norm centroid entered the cosine coarse graph")
    assert(co.graphShards.length == 598)
    // and they never route at narrow width (parity with the flat scan's
    // per-query NaN filter)
    for (qi <- Seq(3, 111, 222)) {
      val got = routed.topShards(sums(qi).centroid, 8)
      assert(!got.contains(7) && !got.contains(400))
    }
  }

  test("buildShardParallel is deterministic and agrees with the serial build") {
    val rnd = new scala.util.Random(41)
    val n = 2000
    val vecs = Array.tabulate(n) { i =>
      val site = i % 40
      Array.tabulate(8)(k =>
        (math.sin(site * 0.7 + k) * 10 + rnd.nextGaussian() * 0.4).toFloat)
    }
    val ids = Array.tabulate(n)(_.toLong)
    val params = Vamana.Params(maxDegree = 32, buildComplexity = 64, alpha = 1.2)
    val serial = Vamana.buildShard(ids, vecs, params, "l2")
    val par1 = Vamana.buildShardParallel(ids, vecs, params, "l2")
    val par2 = Vamana.buildShardParallel(ids, vecs, params, "l2")
    // machine-independent determinism: two parallel builds are IDENTICAL
    assert(par1.entry == par2.entry)
    (0 until n).foreach { v =>
      assert(java.util.Arrays.equals(par1.neighbors(v), par2.neighbors(v)),
        s"parallel build nondeterministic at node $v")
    }
    // search agreement with the serial build: same top-8 neighborhoods
    val dist = graft.functions.VectorKernels.orderingDistance("l2") _
    val agree = (0 until 20).map { qi =>
      val q = vecs(qi * 97)
      val a = Vamana.beamSearch(serial, q, 48, dist).take(8).map(_._1).toSet
      val b = Vamana.beamSearch(par1, q, 48, dist).take(8).map(_._1).toSet
      a.intersect(b).size.toDouble / 8
    }.sum / 20
    assert(agree >= 0.95, s"parallel build agreement $agree below floor")
    // degree bound holds everywhere
    assert(par1.neighbors.forall(_.length <= params.maxDegree))
  }

  test("routed table path pins ONE Broadcast[Router] per summaries version") {
    import spark.implicits._
    val idx = create(clustered(6, 120), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "6", "shard_assign" -> "spatial"))
    val qdf = queries.take(6).zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("qid", "qvec")
    def tableSearch(): Unit =
      graft.operators.AnnSearch.searchTable(idx, qdf, 5,
        queryIdCol = Some("qid")).collect()
    spark.conf.set("spark.ann.graphTableStrategy", "distributed")
    try withProbes(2) {
      tableSearch()
      val v0 = idx.summariesVersionNow
      val id0 = idx.routerCacheEntry.flatMap(_.broadcastId)
      assert(id0.isDefined, "table search with probes must broadcast a router")
      // repeat calls on the same version reuse the SAME broadcast
      tableSearch(); tableSearch()
      assert(idx.routerCacheEntry.flatMap(_.broadcastId) == id0,
        "repeat table searches re-broadcast the router")
      assert(idx.summariesVersionNow == v0)
      // a mutation bumps the version; the next search ships a NEW broadcast
      idx.insert(df(clustered(1, 30).map { case (id, v) => (id + 70000L, v) }),
        "id", "vec")
      assert(idx.summariesVersionNow > v0)
      tableSearch()
      val id1 = idx.routerCacheEntry.flatMap(_.broadcastId)
      assert(id1.isDefined && id1 != id0,
        s"post-mutation search served the stale broadcast ($id1 vs $id0)")
    } finally spark.conf.unset("spark.ann.graphTableStrategy")
  }

  test("online insert targets the batch's spatial shard, not the rotation cursor") {
    // 4 well-separated clusters / 4 spatial shards. A batch drawn around
    // cluster 2 must rewrite the shard whose summary centroid is nearest
    // to the batch — NOT the least-recently-rewritten smallest id —
    // so online CDC stops bimodalizing unrelated shards (the r17 upkeep
    // arm measured routed recall drifting 1.000 → 0.988 in 20 rotation
    // batches). Rotation remains behind spark.ann.onlineSpatialTargets=false
    // and for unsummarized indexes.
    val rows = clustered(4, 100)
    val idx = create(rows, "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "4", "shard_assign" -> "spatial"))
    val c2 = {
      val rc = new scala.util.Random(2 * 7919 + 3)
      Array.fill(dim)(rc.nextFloat() * 100f)
    }
    val sums0 = ShardSummaries.read(idx.path).get
    val nearest0 = sums0.minBy(s =>
      graft.functions.VectorKernels.l2Sq(c2, s.centroid)).shard
    val liveBefore = idx.meta.liveShards.get.toSet
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      val batch = Seq.tabulate(40) { i =>
        val rd = new scala.util.Random(i * 131L + 7)
        (50000L + i, c2.map(x => x + rd.nextFloat()))
      }
      idx.insert(df(batch), "id", "vec")
      val removed = liveBefore -- idx.meta.liveShards.get.toSet
      assert(removed == Set(nearest0),
        s"online batch rewrote $removed, expected the spatial target $nearest0")
      // a fresh row is reachable through width-1 routing: querying its own
      // vector must find it (distance 0) — i.e. the routing decision sends
      // the query to the rewritten shard the row landed in
      val routedIds = withProbes(1)(
        ids(idx.scan(batch(7)._2, 10, searchParam = 100000)))
      assert(routedIds.contains(50007L),
        s"width-1 routing misses the fresh row's own shard: $routedIds")
      // escape hatch: rotation targeting still reachable by conf
      spark.conf.set("spark.ann.onlineSpatialTargets", "false")
      try {
        val live1 = idx.meta.liveShards.get
        idx.insert(df(Seq.tabulate(10) { i =>
          (60000L + i, c2.map(x => x + new scala.util.Random(i + 9).nextFloat()))
        }), "id", "vec")
        val removed2 = live1.toSet -- idx.meta.liveShards.get.toSet
        assert(removed2 == Set(live1.min),
          s"rotation fallback must target the smallest live id: $removed2")
      } finally spark.conf.unset("spark.ann.onlineSpatialTargets")
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
  }

  test("concurrent routed scans survive racing online mutations") {
    // the standing-workload + CDC regime end-to-end: searcher threads
    // hammer routed scans while the main thread lands online batches.
    // Every scan must return a full result set over SOME committed state
    // — never an exception (grace-deferred dir reclamation), never a
    // stale-router wrong answer (versioned cache; a racing bump wins).
    val idx = create(clustered(4, 100), "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "4", "shard_assign" -> "spatial"))
    spark.conf.set("spark.ann.shardProbes", "2")
    spark.conf.set("spark.ann.onlineInsertMaxRows", "200")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val v0 = idx.summariesVersionNow
    try {
      val searchers = (0 until 3).map { t =>
        new Thread(() => {
          try {
            for (i <- 0 until 10) {
              val got = ids(idx.scan(
                queries((t * 5 + i) % queries.size), 5, searchParam = 100000))
              if (got.size != 5)
                throw new IllegalStateException(s"short result: $got")
            }
          } catch { case e: Throwable => errors.add(e) }
        })
      }
      searchers.foreach(_.start())
      for (b <- 0 until 4) {
        idx.insert(df(Seq.tabulate(30) { i =>
          val c = i % 4
          val rc = new scala.util.Random(c * 7919 + 3)
          val rd = new scala.util.Random((b * 100 + i) * 17L + 3)
          (80000L + b * 100 + i,
            Array.fill(dim)(rc.nextFloat() * 100f).map(_ + rd.nextFloat()))
        }), "id", "vec")
      }
      searchers.foreach(_.join(120000))
      assert(errors.isEmpty, s"concurrent failure: ${errors.peek()}")
      assert(idx.summariesVersionNow >= v0 + 4, "every batch must bump the version")
      // the post-stream router serves the final summary set exactly:
      // full-width routed == true walk-all (probes OFF for the baseline —
      // the stress left probes=2 set)
      spark.conf.unset("spark.ann.shardProbes")
      val walkAll = queries.take(4).map(q => ids(idx.scan(q, 5)))
      val wide = withProbes(1000)(queries.take(4).map(q => ids(idx.scan(q, 5))))
      assert(wide == walkAll)
    } finally {
      spark.conf.unset("spark.ann.shardProbes")
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
    }
  }

  test("coarse floor self-validates: diffuse centroid sets keep the flat-scan agreement") {
    // pure-gaussian d=32 centroids — the DIFFUSE geometry where a fixed
    // beam floor silently lost 4-5% routing agreement at 4k shards (r17
    // upkeep arm). Build-time validation probes the finished graph with
    // its own centroids and widens the floor until >=0.98 agreement vs
    // the flat truth (or stands down), so the user-visible guarantee is
    // the agreement, not the width.
    val rnd = new scala.util.Random(53)
    val sums = Array.tabulate(4000)(i => ShardSummaries.Summary(i, 10L,
      Array.fill(32)(rnd.nextGaussian().toFloat)))
    val flat = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = Int.MaxValue, overscan = 4)
    val routed = ShardSummaries.Router.build(sums, "l2",
      coarseThreshold = 256, overscan = 4)
    val co = routed.coarse.get
    assert(co.floor >= 48 && co.agreement >= 0.90f,
      s"validated floor=${co.floor} agreement=${co.agreement}")
    val qs = Seq.tabulate(50)(i => sums(i * 79 % 4000).centroid)
    val agree = qs.map { q =>
      val a = routed.topShards(q, 8).toSet
      val b = flat.topShards(q, 8).toSet
      a.intersect(b).size.toDouble / b.size
    }.sum / qs.size
    assert(agree >= 0.95,
      s"routed agreement $agree below the validated guarantee " +
        s"(floor=${co.floor}, measured=${co.agreement})")
    // the validated floor and measured agreement persist through
    // router.bin (v2) — a fresh driver serves the same behavior
    val dir = Files.createTempDirectory("graft_router_floor").toString
    ShardSummaries.Router.build(sums, "l2", 256, 4, cachePath = Some(dir))
    val back = ShardSummaries.Router.build(sums, "l2", 256, 4,
      cachePath = Some(dir))
    assert(back.coarse.get.floor == co.floor &&
      back.coarse.get.agreement == co.agreement)
  }

  test("two-level Router routes by dot product on a cosine index") {
    // cosine summaries are L2-normalized at write time (ShardSummaries
    // contract); the coarse graph must rank by the same 1-dot ordering
    val rnd = new scala.util.Random(11)
    val sums = Array.tabulate(600) { i =>
      val raw = Array.tabulate(8)(k =>
        (math.cos(i % 24 * 0.26 + k) + rnd.nextGaussian() * 0.05).toFloat)
      ShardSummaries.Summary(i, 10L,
        graft.functions.VectorKernels.normalize(raw))
    }
    val flat = ShardSummaries.Router.build(sums, "cosine",
      coarseThreshold = Int.MaxValue, overscan = 4)
    val routed = ShardSummaries.Router.build(sums, "cosine",
      coarseThreshold = 256, overscan = 4)
    assert(routed.coarse.isDefined)
    for (qi <- Seq(3, 9, 17)) {
      val q = sums(qi * 20).centroid
      // full width bypass == flat ranking (exact-compat)
      assert(routed.topShards(q, 600).toSeq == flat.topShards(q, 600).toSeq)
      // serving width: high agreement with the flat dot-product ranking
      val want = flat.topShards(q, 8).toSet
      val got = routed.topShards(q, 8).toSet
      assert(want.intersect(got).size >= 7,
        s"cosine coarse routing diverged: $got vs $want")
    }
  }

  test("router.bin v5 rebinds live vectors from summaries and keeps tombstoned ones") {
    val rnd = new scala.util.Random(41)
    val sums0 = Array.tabulate(500)(i => ShardSummaries.Summary(i, 10L,
      Array.fill(4)((rnd.nextGaussian() * (1 + i % 10)).toFloat)))
    val dir = Files.createTempDirectory("graft_router_v4").toString
    val r0 = ShardSummaries.Router.build(sums0, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    assert(r0.coarse.isDefined)
    // a patch tombstones 5 nodes (their summaries disappear) and the
    // patched graph persists — the v4 file must carry ONLY those 5
    // nodes' vectors, everything else rebinds from the summary set
    val removedIds = (0 until 5).map(_ * 29).toSet
    val fresh = Array.tabulate(5)(i => ShardSummaries.Summary(2000 + i, 12L,
      Array.fill(4)((rnd.nextGaussian() * 3).toFloat)))
    val sums1 = (sums0.filterNot(s => removedIds(s.shard)) ++ fresh).sortBy(_.shard)
    val r1 = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir), base = Some(r0))
    val co1 = r1.coarse.get
    assert(co1.graphShards.count(_ == -1) == 5)
    // the size win only shows at real dims (304 MB → 14 MB at 100k×d768,
    // r18 arm); at d=4 just sanity-bound the structure-only payload
    val binBytes = Files.size(ShardSummaries.Router.cacheFilePath(dir))
    assert(binBytes < 200 * 1024, s"v4 file unexpectedly large: $binBytes B")
    // a fresh driver (cache read) reproduces the patched router exactly:
    // same graph shape, same vectors (live REBOUND, tombstoned READ)
    val r2 = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    val co2 = r2.coarse.get
    assert(co2.graphShards.toSeq == co1.graphShards.toSeq)
    assert(co2.floor == co1.floor && co2.agreement == co1.agreement &&
      co2.churn == co1.churn)
    for (i <- co1.graphShards.indices)
      assert(java.util.Arrays.equals(co2.graph.vectors(i), co1.graph.vectors(i)),
        s"vector mismatch at node $i (gs=${co1.graphShards(i)})")
    for (qi <- Seq(3, 111, 222)) {
      val q = sums1(qi).centroid
      assert(r2.topShards(q, 8).toSeq == r1.topShards(q, 8).toSeq)
    }
  }

  test("coldAgreement: set by full builds, carried by patches, persisted in v5, " +
      "and a drifted revalidation stands the patch down to a rebuild") {
    val rnd = new scala.util.Random(47)
    val sums0 = Array.tabulate(500)(i => ShardSummaries.Summary(i, 10L,
      Array.fill(4)((rnd.nextGaussian() * (1 + i % 10)).toFloat)))
    val dir = Files.createTempDirectory("graft_router_cold").toString
    val r0 = ShardSummaries.Router.build(sums0, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    val co0 = r0.coarse.get
    // a FULL build anchors the reference to its own measured agreement
    assert(co0.coldAgreement == co0.agreement && co0.coldAgreement > 0)

    // a small carried patch keeps the reference (and accrues churn)
    val fresh = Array.tabulate(3)(i => ShardSummaries.Summary(9000 + i, 12L,
      Array.fill(4)((rnd.nextGaussian() * 3).toFloat)))
    val removed = Set(0, 29, 58)
    val sums1 = (sums0.filterNot(s => removed(s.shard)) ++ fresh).sortBy(_.shard)
    val r1 = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir), base = Some(r0))
    val co1 = r1.coarse.get
    assert(co1.churn > 0, "expected a carried (or revalidated) patch")
    assert(co1.coldAgreement == co0.coldAgreement,
      "a patch must never move the full-build reference")
    // v5 round-trip preserves the reference (a dropped field would
    // silently disable the self-healing trigger on every fresh driver)
    val r2 = ShardSummaries.Router.build(sums1, "l2",
      coarseThreshold = 256, overscan = 4, cachePath = Some(dir))
    assert(r2.coarse.get.coldAgreement == co1.coldAgreement)
    assert(r2.coarse.get.churn == co1.churn)

    // the drift trigger, pinned deterministically through patch() itself:
    // a base whose reference is unreachably high forces ANY revalidation
    // to read RebuildDrift below it -> the patch stands down (None);
    // the same change set with an unknown reference (-1) keeps patching
    def patchArgs(sums: Array[ShardSummaries.Summary]) = {
      val shards = sums.map(_.shard)
      val cents = sums.map(_.centroid)
      val keep = sums.indices.toArray // fixture has no NaN/zero centroids
      (shards, cents, keep)
    }
    val fresh2 = Array.tabulate(3)(i => ShardSummaries.Summary(9100 + i, 12L,
      Array.fill(4)((rnd.nextGaussian() * 3).toFloat)))
    val removed2 = Set(7, 37, 67)
    val sums2 = (sums1.filterNot(s => removed2(s.shard)) ++ fresh2).sortBy(_.shard)
    val (sh2, ce2, keep2) = patchArgs(sums2)
    // churn at the cap forces the REVALIDATION path (not carried)
    def baseWith(coldAgreement: Float): ShardSummaries.Router =
      new ShardSummaries.Router(r1.shards, r1.centroids, "l2",
        Some(co1.copy(churn = 100000, coldAgreement = coldAgreement)),
        4, r1.sumsDigest)
    val drifted = ShardSummaries.Router.patch(
      baseWith(2.0f), sums2, keep2, sh2, ce2, "l2")
    assert(drifted.isEmpty,
      "a revalidation far under the full-build reference must stand down to a rebuild")
    val unknownRef = ShardSummaries.Router.patch(
      baseWith(-1f), sums2, keep2, sh2, ce2, "l2")
    assert(unknownRef.isDefined,
      "an unknown reference (legacy) must not block patching")
    assert(unknownRef.get.churn == 0, "cap crossing must revalidate")
  }

  test("churn-deferred revalidation: small patches carry the floor, the cap forces a ladder") {
    val rnd = new scala.util.Random(43)
    val sums0 = Array.tabulate(600)(i => ShardSummaries.Summary(i, 10L,
      Array.fill(4)((rnd.nextGaussian() * (1 + i % 10)).toFloat)))
    var router = ShardSummaries.Router.build(sums0, "l2",
      coarseThreshold = 256, overscan = 4)
    assert(router.coarse.exists(_.servable))
    var sums = sums0
    var nextId = 3000
    var sawCarry = false
    var sawReset = false
    // churnCap(600) = 32; 2-shard swaps accumulate churn 4 per patch —
    // several carried patches (churn grows, floor/agreement frozen),
    // then one crossing patch revalidates (churn back to 0)
    for (_ <- 0 until 12) {
      val victims = Seq(sums(rnd.nextInt(sums.length)).shard,
        sums(rnd.nextInt(sums.length)).shard).distinct.toSet
      val fresh = victims.toSeq.sorted.zipWithIndex.map { case (_, j) =>
        ShardSummaries.Summary(nextId + j, 12L,
          Array.fill(4)((rnd.nextGaussian() * 3).toFloat))
      }
      nextId += fresh.size
      sums = (sums.filterNot(s => victims(s.shard)) ++ fresh).sortBy(_.shard)
      val prevChurn = router.coarse.get.churn
      router = ShardSummaries.Router.build(sums, "l2",
        coarseThreshold = 256, overscan = 4, base = Some(router))
      val co = router.coarse.get
      if (co.churn > prevChurn) sawCarry = true
      if (co.churn == 0 && prevChurn > 0) sawReset = true
      assert(co.servable, "patched router lost servability on a tame geometry")
    }
    assert(sawCarry, "no patch ever deferred the ladder (churn never grew)")
    assert(sawReset, "the churn cap never forced a revalidation")
  }
}
