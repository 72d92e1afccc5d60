package graft.index

import graft.SparkSpec
import graft.functions.VectorKernels

import java.nio.file.Files

class HnswSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_hnsw_spec").toString

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(200)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
  }

  private lazy val vecsDf = {
    import spark.implicits._
    vecs.toDF("id", "embedding")
  }

  private def brute(q: Array[Float], k: Int): Seq[Long] =
    vecs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  private val queries = Seq(
    Array(0.5f, 0.5f, 0.5f, 0.5f), Array(1f, 0f, 0f, 0f),
    Array(0f, 0f, 1f, 1f), Array(0.2f, 0.8f, 0.3f, 0.7f))

  private lazy val idx = AnnIndexManager.create(spark, "h_graph", vecsDf,
    "id", "embedding", "HNSW",
    Map("metric" -> "l2", "hnsw_m" -> "16", "ef_construction" -> "64"),
    s"$tmp/h_graph")

  test("recall >= 70% on the F3 contract (HNSW via hnsw_m/ef params)") {
    for (q <- queries) {
      val got = idx.scan(q, 10).collect().map(_.getLong(0)).toSet
      assert(got.intersect(brute(q, 10).toSet).size >= 7, s"${q.toSeq}")
    }
  }

  test("kernel: layered structure has decaying level populations") {
    val sh = Hnsw.buildShard(vecs.map(_._1).toArray, vecs.map(_._2).toArray,
      Hnsw.Params(8, 32), "l2")
    val perLevel = sh.levels.groupBy(identity).view.mapValues(_.length).toMap
    assert(perLevel(0) > perLevel.getOrElse(1, 0))
    // base layer respects mMax0, upper layers respect m (post-prune)
    sh.neighbors.zipWithIndex.foreach { case (byLevel, _) =>
      byLevel.zipWithIndex.foreach { case (nbrs, lvl) =>
        assert(nbrs.length <= (if (lvl == 0) 16 else 8))
      }
    }
    assert(sh.maxLevel == sh.levels.max)
  }

  test("ef_search override via searchParam; exhaustive ef is exact") {
    for (q <- queries) {
      val got = idx.scan(q, 10, searchParam = 500).collect().map(_.getLong(0)).toSeq
      assert(got == brute(q, 10), s"${q.toSeq}")
    }
  }

  test("searchBatch + multi-shard + persistence round-trip") {
    val sharded = AnnIndexManager.create(spark, "h_sharded", vecsDf,
      "id", "embedding", "HNSW",
      Map("metric" -> "l2", "shards" -> "4"), s"$tmp/h_sharded")
    val res = sharded.searchBatch(queries, 10).collect().groupBy(_.getInt(0))
    for ((qi, rows) <- res) {
      assert(rows.map(_.getLong(1)).toSet
        .intersect(brute(queries(qi), 10).toSet).size >= 7, s"query $qi")
    }
    val reloaded = AnnIndexManager.load(spark, s"$tmp/h_sharded")
    val a = reloaded.scan(queries.head, 10).collect().map(_.getLong(0)).toSeq
    val b = sharded.scan(queries.head, 10).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("SQ8 HNSW index: codes stored, exhaustive-ef recall holds") {
    val sq8 = AnnIndexManager.create(spark, "h_sq8", vecsDf, "id", "embedding",
      "HNSW", Map("metric" -> "l2", "hnsw_m" -> "16", "quantization" -> "sq8"),
      s"$tmp/h_sq8")
    assert(sq8.meta.quantized)
    val cols = spark.read.parquet(s"$tmp/h_sq8/data").columns.toSet
    assert(cols.contains("codes") && !cols.contains("vector"))
    for (q <- queries) {
      val got = sq8.scan(q, 10, searchParam = 100000).collect().map(_.getLong(0)).toSet
      assert(got.intersect(brute(q, 10).toSet).size >= 7, s"recall for ${q.toSeq}")
    }
  }

  test("delete + vacuum + insert on HNSW (graph maintenance parity)") {
    val dml = AnnIndexManager.create(spark, "h_dml", vecsDf, "id", "embedding",
      "HNSW", Map("metric" -> "l2"), s"$tmp/h_dml")
    val q = queries(1)
    val top3 = brute(q, 3).toSet
    dml.delete(top3.toSeq)
    val afterDelete = dml.scan(q, 10).collect().map(_.getLong(0)).toSet
    assert(afterDelete.intersect(top3).isEmpty)
    dml.vacuum()
    assert(dml.meta.numVectors == 197 && dml.meta.numDeleted == 0)
    import spark.implicits._
    dml.insert(vecs.filter(v => top3(v._1)).toDF("id", "embedding"), "id", "embedding")
    assert(dml.meta.numVectors == 200)
    val afterInsert = dml.scan(q, 10).collect().map(_.getLong(0)).toSet
    assert(afterInsert.intersect(top3).nonEmpty)
  }

  private def exactWithin(q: Array[Float], radius: Double): Set[Long] =
    vecs.filter { case (_, v) => VectorKernels.l2Sq(q, v) <= radius }
      .map(_._1).toSet

  test("expanding-beam range search: precision 1, recall floor, rangeRecall harness") {
    val radius = 0.3
    assert(queries.count(q => exactWithin(q, radius).nonEmpty) >= 2)
    for (q <- queries) {
      val got = idx.rangeScanBeam(q, radius, eps = 0.3).collect()
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
    val mean = graft.operators.Recall.meanRangeRecall(idx, queries, radius, eps = 0.3)
    assert(mean >= 0.7, s"mean range recall $mean")
  }

  test("beam range: exhaustive ef equals exact rangeScan (searchParam > n)") {
    val q = queries.head
    val radius = 0.3
    val beam = idx.rangeScanBeam(q, radius, eps = 1.0, searchParam = 512)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = idx.rangeScan(q, radius)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(beam == exact)
  }
}
