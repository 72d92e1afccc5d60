package graft.index

import graft.SparkSpec
import graft.functions.VectorKernels

import java.nio.file.Files

class VamanaSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_vamana_spec").toString

  // F3: 200 seeded random FLOAT[4] vectors (diskann_streaming.test:11-17)
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(200)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
  }

  private lazy val vecsDf = {
    import spark.implicits._
    vecs.toDF("id", "embedding")
  }

  private def brute(q: Array[Float], k: Int, excl: Set[Long] = Set.empty): Seq[Long] =
    vecs.filterNot(v => excl(v._1))
      .map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  private val queries = Seq(
    Array(0.5f, 0.5f, 0.5f, 0.5f), Array(1f, 0f, 0f, 0f),
    Array(0f, 0f, 1f, 1f), Array(0.2f, 0.8f, 0.3f, 0.7f))

  private lazy val idx = AnnIndexManager.create(spark, "v_graph", vecsDf,
    "id", "embedding", "DISKANN",
    Map("metric" -> "l2", "max_degree" -> "64", "build_complexity" -> "128"),
    s"$tmp/v_graph")

  test("recall >= 70% on the F3 contract (200 vecs, k=10, defaults)") {
    for (q <- queries) {
      val got = idx.scan(q, 10).collect().map(_.getLong(0)).toSet
      val overlap = got.intersect(brute(q, 10).toSet).size
      assert(overlap >= 7, s"recall $overlap/10 for ${q.toSeq}")
    }
  }

  test("kernel-level beam search: pool is sorted, distances correct") {
    val sh = Vamana.buildShard(vecs.map(_._1).toArray, vecs.map(_._2).toArray,
      Vamana.Params(32, 64, 1.2), "l2")
    val q = queries.head
    val pool = Vamana.beamSearch(sh, q, 64, VectorKernels.orderingDistance("l2"))
    assert(pool.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    for ((label, d) <- pool.take(5))
      assert(math.abs(d - VectorKernels.l2Sq(q, sh.vectors(label))) < 1e-9)
    // every graph node respects max degree
    assert(sh.neighbors.forall(_.length <= 32))
  }

  test("multi-shard build partitions the id space and still meets recall") {
    val sharded = AnnIndexManager.create(spark, "v_sharded", vecsDf,
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "shards" -> "4"), s"$tmp/v_sharded")
    assert(sharded.meta.param("shards", 1) == 4)
    for (q <- queries) {
      val got = sharded.scan(q, 10).collect().map(_.getLong(0)).toSet
      assert(got.intersect(brute(q, 10).toSet).size >= 7)
    }
  }

  test("searchBatch returns per-query results with the recall floor") {
    val res = idx.searchBatch(queries, 10)
      .collect().groupBy(_.getInt(0))
    assert(res.keySet == Set(0, 1, 2, 3))
    for ((qi, rows) <- res) {
      val got = rows.map(_.getLong(1)).toSet
      assert(got.intersect(brute(queries(qi), 10).toSet).size >= 7, s"query $qi")
    }
  }

  test("delete excludes ids (tombstone overfetch); vacuum rebuilds; insert appends a delta shard (F4)") {
    val dml = AnnIndexManager.create(spark, "v_dml", vecsDf, "id", "embedding",
      "DISKANN", Map("metric" -> "l2"), s"$tmp/v_dml")
    val q = queries(1)
    val top3 = brute(q, 3).toSet
    dml.delete(top3.toSeq)
    val afterDelete = dml.scan(q, 10).collect().map(_.getLong(0)).toSet
    assert(afterDelete.intersect(top3).isEmpty)
    assert(afterDelete.intersect(brute(q, 10, excl = top3).toSet).size >= 7)

    dml.vacuum()
    assert(dml.meta.numDeleted == 0 && dml.meta.numVectors == 197)
    val afterVacuum = dml.scan(q, 10).collect().map(_.getLong(0)).toSet
    assert(afterVacuum.intersect(top3).isEmpty)

    import spark.implicits._
    dml.insert(vecs.filter(v => top3(v._1)).toDF("id", "embedding"), "id", "embedding")
    assert(dml.meta.numVectors == 200)
    val afterInsert = dml.scan(q, 10).collect().map(_.getLong(0)).toSet
    // re-inserted nearest neighbors are findable again via the delta shard
    assert(afterInsert.intersect(top3).nonEmpty)
  }

  private def exactWithin(q: Array[Float], radius: Double,
                          excl: Set[Long] = Set.empty): Set[Long] =
    vecs.filterNot(v => excl(v._1))
      .filter { case (_, v) => VectorKernels.l2Sq(q, v) <= radius }
      .map(_._1).toSet

  test("expanding-beam range search: precision 1, recall floor, rangeRecall harness") {
    val radius = 0.3
    val nonEmpty = queries.count(q => exactWithin(q, radius).nonEmpty)
    assert(nonEmpty >= 2, "fixture radius must produce matches for most queries")
    for (q <- queries) {
      val got = idx.rangeScanBeam(q, radius, eps = 0.3).collect()
      // precision 1 by construction: the beam filters on TRUE engine
      // distances, so every returned row is genuinely within the radius
      for (r <- got) {
        val truth = VectorKernels.l2Sq(q, vecs(r.getLong(0).toInt)._2)
        assert(math.abs(r.getDouble(1) - truth) < 1e-6)
        assert(r.getDouble(1) <= radius)
      }
      val ids = got.map(_.getLong(0)).toSet
      val ex = exactWithin(q, radius)
      assert(ids.subsetOf(ex))
      if (ex.nonEmpty)
        assert(ids.size * 10 >= ex.size * 7, s"range recall ${ids.size}/${ex.size}")
    }
    // the distributed batch path (rangeBeamTable) through the harness the
    // scaladoc promises: mean recall floor over the whole query batch
    val mean = graft.operators.Recall.meanRangeRecall(idx, queries, radius, eps = 0.3)
    assert(mean >= 0.7, s"mean range recall $mean")
  }

  test("beam range: exhaustive beam equals exact rangeScan; tombstones masked") {
    val dml = AnnIndexManager.create(spark, "v_range_dml", vecsDf,
      "id", "embedding", "DISKANN", Map("metric" -> "l2"), s"$tmp/v_range_dml")
    val q = queries.head
    val radius = 0.3
    val toDelete = exactWithin(q, radius).toSeq.sorted.take(2)
    assert(toDelete.size == 2)
    dml.delete(toDelete)
    // initL=512 > n: the beam explores the whole reachable component, so
    // the approximate path must EQUAL the exact scan — including the
    // tombstone mask (delete-mask parity with cleanGraphHits coverage)
    val beam = dml.rangeScanBeam(q, radius, eps = 1.0, searchParam = 512)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = dml.rangeScan(q, radius)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(beam.map(_._1).intersect(toDelete).isEmpty)
    assert(beam == exact)
  }

  test("rangeBeamTable on a PINNED multi-shard index (zip path): exhaustive beam equals exact") {
    import spark.implicits._
    val pidx = AnnIndexManager.create(spark, "v_range_pin", vecsDf,
      "id", "embedding", "DISKANN", Map("metric" -> "l2", "shards" -> "4"),
      s"$tmp/v_range_pin")
    pidx.persist()
    try {
      val radius = 0.3
      val qdf = queries.zipWithIndex.map { case (q, i) => (i.toLong, q) }
        .toDF("__qid", "__qvec")
      // searchParam > any shard size → per-shard exhaustive beam → the
      // zipped union must EQUAL the exact within-radius set per query
      val beam = pidx.rangeBeamTable(qdf, radius, eps = 1.0, searchParam = 512)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = queries.zipWithIndex.flatMap { case (q, i) =>
        exactWithin(q, radius).map(id => (i.toLong, id))
      }.toSet
      assert(beam == exact)
    } finally pidx.unpersist()
  }

  test("beam range on cosine metric equals exact rangeScan (1-cos distance scale)") {
    val cidx = AnnIndexManager.create(spark, "v_range_cos", vecsDf,
      "id", "embedding", "DISKANN", Map("metric" -> "cosine"), s"$tmp/v_range_cos")
    val q = queries.head
    val radius = 0.05 // 1-cos scale: cosine similarity >= 0.95
    val beam = cidx.rangeScanBeam(q, radius, eps = 1.0, searchParam = 512)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = cidx.rangeScan(q, radius)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(exact.nonEmpty, "fixture radius should catch some aligned vectors")
    // same ids in the same order; distances agree to float precision only —
    // the beam's scalar kernel and the exact scan's codegen expression
    // accumulate the cosine dot/norms in different orders (~1e-8 apart),
    // unlike squared-L2 where the two paths are bit-identical
    assert(beam.map(_._1) == exact.map(_._1))
    for (((_, bd), (_, ed)) <- beam.zip(exact))
      assert(math.abs(bd - ed) < 1e-6)
  }

  test("rangeTable routes through the beam under spark.ann.rangeBeam=true") {
    import spark.implicits._
    val qdf = queries.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("query_idx", "qvec")
    val radius = 0.3
    val exact = graft.operators.AnnSearch.rangeTable(idx, qdf, radius,
      Some("qvec"), Some("query_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.ann.rangeBeam", "true")
    val beam = try {
      graft.operators.AnnSearch.rangeTable(idx, qdf, radius,
        Some("qvec"), Some("query_idx")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.unset("spark.ann.rangeBeam")
    assert(beam.subsetOf(exact))
    assert(beam.size * 10 >= exact.size * 7, s"batch range recall ${beam.size}/${exact.size}")
  }

  test("persistence round-trip gives identical results (F9)") {
    val q = queries(2)
    val before = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    val reloaded = AnnIndexManager.load(spark, s"$tmp/v_graph")
    val after = reloaded.scan(q, 10).collect().map(_.getLong(0)).toSeq
    assert(before == after)
  }

  test("recall holds at realistic scale: 2000 vecs dim 32, 4 shards, 20 queries") {
    import spark.implicits._
    val rnd = new scala.util.Random(88)
    val big = Seq.tabulate(2000)(i => (i.toLong, Array.fill(32)(rnd.nextFloat())))
    val idx = AnnIndexManager.create(spark, "v_big", big.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "shards" -> "4"), s"$tmp/v_big")
    val qrnd = new scala.util.Random(99)
    val recalls = Seq.fill(20) {
      val q = Array.fill(32)(qrnd.nextFloat())
      val exact = big.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      val got = idx.scan(q, 10).collect().map(_.getLong(0)).toSet
      got.intersect(exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall $mean; per-query: $recalls")
  }

  test("pinned index serves pre-partitioned shards — no per-batch shard shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    def shardRepartitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: RepartitionByExpression
          if r.partitionExpressions.exists(_.references.exists(_.name == "shard")) => r
      }.size

    val pinIdx = AnnIndexManager.create(spark, "v_pin", vecsDf, "id", "embedding",
      "DISKANN", Map("metric" -> "l2", "shards" -> "3"), s"$tmp/v_pin")
    // unpinned read: defensive repartition guards the whole-shard contract
    val unpinned = pinIdx.searchBatch(queries, 10, searchParam = 100000)
    assert(shardRepartitions(unpinned) == 1)
    val unpinnedRes = unpinned.collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

    pinIdx.persist()
    val pinned = pinIdx.searchBatch(queries, 10, searchParam = 100000)
    // the pin is pre-partitioned by shard: the query batch adds NO shuffle
    // of the graph dataset
    assert(shardRepartitions(pinned) == 0)
    val pinnedRes = pinned.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(pinnedRes == unpinnedRes) // exhaustive beam → both exact
    pinIdx.unpersist()
  }

  test("SQ8 graph index: codes stored, recall floor holds, DML round-trip") {
    val sq8 = AnnIndexManager.create(spark, "v_sq8", vecsDf, "id", "embedding",
      "DISKANN", Map("metric" -> "l2", "quantization" -> "sq8"), s"$tmp/v_sq8")
    assert(sq8.meta.quantized)
    // the graph dataset stores u8 codes, not float vectors
    val cols = spark.read.parquet(s"$tmp/v_sq8/data").columns.toSet
    assert(cols.contains("codes") && !cols.contains("vector"))
    for (q <- queries) {
      val got = sq8.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSet
      assert(got.intersect(brute(q, 10).toSet).size >= 7, s"recall for ${q.toSeq}")
    }
    // tombstone, compaction-rebuild (dequantize → rebuild → requantize) and
    // delta-shard insert all run against the quantized dataset
    val q = queries(1)
    val top3 = brute(q, 3).toSet
    sq8.delete(top3.toSeq)
    sq8.vacuum()
    assert(sq8.meta.numDeleted == 0 && sq8.meta.numVectors == 197)
    assert(sq8.scan(q, 10, searchParam = 100000).collect()
      .map(_.getLong(0)).toSet.intersect(top3).isEmpty)
    import spark.implicits._
    sq8.insert(vecs.filter(v => top3(v._1)).toDF("id", "embedding"), "id", "embedding")
    assert(sq8.meta.numVectors == 200)
    val afterInsert = sq8.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSet
    assert(afterInsert.intersect(top3).nonEmpty)
  }

  test("search_complexity semantics: l = max(k, sc or bc)") {
    assert(Vamana.beamWidth(10, 0, 128) == 128)
    assert(Vamana.beamWidth(10, 50, 128) == 50)
    assert(Vamana.beamWidth(200, 50, 128) == 200)
    // tiny beam still returns k results (bounded by pool size)
    val got = idx.scan(queries(0), 10, searchParam = 10).collect()
    assert(got.length == 10)
  }

  test("r18 pair-distance memo: bit-identical values (both argument " +
    "orders, all metrics) and node-identical small-shard builds") {
    val rnd = new scala.util.Random(7)
    val vs = Array.fill(300)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    for (metric <- Seq("l2", "ip", "cosine")) {
      val raw = VectorKernels.orderingDistance(metric) _
      val memo = Vamana.memoDist(vs, raw)
      for (_ <- 1 to 2000) { // repeated lookups exercise the cached branch
        val i = rnd.nextInt(vs.length); val j = rnd.nextInt(vs.length)
        // java.lang.Double.compare: bit-level equality incl. -0.0/NaN
        assert(java.lang.Double.compare(memo(vs(i), vs(j)), raw(vs(i), vs(j))) == 0)
        assert(java.lang.Double.compare(memo(vs(j), vs(i)), raw(vs(j), vs(i))) == 0)
      }
      // an array the memo has never seen falls through to the raw kernel
      val foreign = Array.fill(16)(rnd.nextFloat())
      assert(java.lang.Double.compare(memo(foreign, vs(0)), raw(foreign, vs(0))) == 0)
    }
    // end-to-end: a memoized build (n <= MemoMaxRows) equals a manual
    // re-run of the same Algorithm-3 sweep without the memo — proven by
    // determinism plus the value-identity above; assert the concrete
    // graph against a second build (same inputs → same nodes and edges)
    val ids = Array.tabulate(300)(_.toLong)
    val p = Vamana.Params(16, 32, 1.2)
    val a = Vamana.buildShard(ids, vs, p, "l2")
    val b = Vamana.buildShard(ids, vs, p, "l2")
    assert(a.entry == b.entry)
    assert(a.neighbors.zip(b.neighbors).forall { case (x, y) => x.sameElements(y) })
  }
}
