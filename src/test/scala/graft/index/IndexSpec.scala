package graft.index

import graft.SparkSpec
import graft.functions.VectorKernels
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IndexSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_index_spec").toString

  // F3-style fixture: 200 seeded random FLOAT[4] vectors
  // (reference: diskann_streaming.test:11-17, setseed(0.42))
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(200)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
  }

  private lazy val vecsDf = {
    import spark.implicits._
    vecs.toDF("id", "embedding")
  }

  private def bruteTopK(q: Array[Float], k: Int,
                        excl: Set[Long] = Set.empty): Seq[Long] =
    vecs.filterNot(v => excl(v._1))
      .map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  private val queries = Seq(
    Array(0.5f, 0.5f, 0.5f, 0.5f), Array(1f, 0f, 0f, 0f),
    Array(0f, 0f, 1f, 1f), Array(0.2f, 0.8f, 0.3f, 0.7f))

  test("FLAT index scan is exact") {
    val idx = AnnIndexManager.create(spark, "t_flat", vecsDf, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/t_flat")
    for (q <- queries) {
      val got = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
      assert(got == bruteTopK(q, 10))
    }
  }

  test("IVF exhaustive probe is exact; partial probe recall >= 70% (F3)") {
    val idx = AnnIndexManager.create(spark, "t_ivf", vecsDf, "id", "embedding",
      "IVF", Map("metric" -> "l2", "nlist" -> "8", "nprobe" -> "8"), s"$tmp/t_ivf")
    for (q <- queries) {
      val exact = idx.scan(q, 10, searchParam = 8).collect().map(_.getLong(0)).toSeq
      assert(exact == bruteTopK(q, 10))
      // recall floor from the reference's statistical contract (>=7/10)
      val approx = idx.scan(q, 10, searchParam = 3).collect().map(_.getLong(0)).toSet
      assert(approx.intersect(bruteTopK(q, 10).toSet).size >= 7,
        s"recall too low for ${q.toSeq}")
    }
  }

  test("IVF train_mode=full: distributed-Lloyd cells stay exhaustive-exact; bad mode throws") {
    val idx = AnnIndexManager.create(spark, "t_ivf_full", vecsDf, "id", "embedding",
      "IVF", Map("metric" -> "l2", "nlist" -> "8", "nprobe" -> "8",
        "train_mode" -> "full"), s"$tmp/t_ivf_full")
    for (q <- queries) {
      val exact = idx.scan(q, 10, searchParam = 8).collect().map(_.getLong(0)).toSeq
      assert(exact == bruteTopK(q, 10))
    }
    // full-data refinement must not leave empty cells on this smooth
    // fixture (the balance rationale for the 100 TB path)
    val sizes = idx.live.groupBy("list_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.size == 8 && sizes.values.forall(_ > 0L), s"cells: $sizes")
    intercept[IllegalArgumentException] {
      AnnIndexManager.create(spark, "t_ivf_badmode", vecsDf, "id", "embedding",
        "IVF", Map("nlist" -> "8", "train_mode" -> "bogus"), s"$tmp/t_ivf_bad")
    }
  }

  test("persistence round-trip: reload from disk gives identical results (F9)") {
    val q = queries.head
    val before = AnnIndexManager.create(spark, "t_persist", vecsDf, "id", "embedding",
      "IVF", Map("metric" -> "l2", "nlist" -> "4", "nprobe" -> "4"), s"$tmp/t_persist")
      .scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reloaded = AnnIndexManager.load(spark, s"$tmp/t_persist")
    val after = reloaded.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before == after)
    assert(reloaded.meta.engine == "IVF" && reloaded.meta.dim == 4)
  }

  test("persist() is a standing request: mutations re-pin on next read") {
    import spark.implicits._
    val idx = AnnIndexManager.create(spark, "t_repin", vecsDf, "id", "embedding",
      "DISKANN", Map("metric" -> "l2", "max_degree" -> "16",
        "build_complexity" -> "32", "shards" -> "2"), s"$tmp/t_repin")
    idx.persist()
    assert(idx.isPinned)
    val q = queries.head
    idx.scan(q, 5, searchParam = 100000).collect()

    // mutation invalidates the pin, but the next search serves the
    // POST-mutation data AND restores the pin (no silent parquet serving)
    idx.insert(Seq((7777L, q)).toDF("id", "embedding"), "id", "embedding")
    assert(!idx.isPinned)
    val hits = idx.scan(q, 5, searchParam = 100000).collect().map(_.getLong(0))
    assert(hits.head == 7777L, "post-insert search must see the new row")
    assert(idx.isPinned, "serving read after a mutation must re-pin")

    // explicit unpersist ends the standing request: later mutations +
    // reads stay unpinned
    idx.unpersist()
    idx.insert(Seq((7778L, q.map(_ + 0.01f))).toDF("id", "embedding"),
      "id", "embedding")
    idx.scan(q, 5, searchParam = 100000).collect()
    assert(!idx.isPinned)
  }

  test("delete tombstones exclude ids; vacuum compacts; re-insert works (F4)") {
    val idx = AnnIndexManager.create(spark, "t_dml", vecsDf, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/t_dml")
    val q = queries(1)
    val victims = bruteTopK(q, 3).toSet
    idx.delete(victims.toSeq)
    val afterDelete = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    assert(afterDelete == bruteTopK(q, 10, excl = victims))
    assert(idx.meta.numDeleted == 3)

    idx.vacuum()
    assert(idx.meta.numDeleted == 0 && idx.meta.numVectors == 197)
    val afterVacuum = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    assert(afterVacuum == afterDelete)

    // re-insert the victims (reference: diskann_delete.test re-insert path)
    import spark.implicits._
    val reins = vecs.filter(v => victims(v._1)).toDF("id", "embedding")
    idx.insert(reins, "id", "embedding")
    val afterInsert = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    assert(afterInsert == bruteTopK(q, 10))
    assert(idx.meta.numVectors == 200)
  }

  test("mergeFrom pulls live vectors from the other index (§2.10)") {
    import spark.implicits._
    val left = vecs.take(100).toDF("id", "embedding")
    val right = vecs.drop(100).toDF("id", "embedding")
    val a = AnnIndexManager.create(spark, "t_merge_a", left, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/t_merge_a")
    val b = AnnIndexManager.create(spark, "t_merge_b", right, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/t_merge_b")
    a.mergeFrom(b)
    val q = queries(2)
    assert(a.scan(q, 10).collect().map(_.getLong(0)).toSeq == bruteTopK(q, 10))
    assert(a.meta.numVectors == 200)
  }

  test("IP metric orders by negated dot product (diskann_metric_ip)") {
    val idx = AnnIndexManager.create(spark, "t_ip", vecsDf, "id", "embedding",
      "FLAT", Map("metric" -> "ip"), s"$tmp/t_ip")
    val q = queries.head
    val got = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    val expect = vecs
      .map { case (id, v) => (id, -VectorKernels.dot(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(got == expect)
  }

  test("cosine metric normalizes at build and orders by 1-cos") {
    val idx = AnnIndexManager.create(spark, "t_cos", vecsDf, "id", "embedding",
      "FLAT", Map("metric" -> "cosine"), s"$tmp/t_cos")
    val q = queries(3)
    val got = idx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    val expect = vecs
      .map { case (id, v) => (id, 1.0 - VectorKernels.cosineSimilarity(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(got == expect)
  }

  test("searchBatch matches per-query exact results") {
    val idx = AnnIndexManager.create(spark, "t_batch", vecsDf, "id", "embedding",
      "IVF", Map("metric" -> "l2", "nlist" -> "4", "nprobe" -> "4"), s"$tmp/t_batch")
    val res = idx.searchBatch(queries, 5, searchParam = 4)
      .collect()
      .groupBy(_.getInt(0))
      .map { case (qi, rows) =>
        qi -> rows.sortBy(r => (r.getDouble(2), r.getLong(1))).map(_.getLong(1)).toSeq }
    for ((qi, q) <- queries.zipWithIndex.map(_.swap))
      assert(res(qi) == bruteTopK(q, 5), s"query $qi")
  }

  test("empty input rejected; k > n returns n rows (F6 edge cases)") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      AnnIndexManager.create(spark, "t_empty",
        Seq.empty[(Long, Array[Float])].toDF("id", "embedding"),
        "id", "embedding", "FLAT", Map(), s"$tmp/t_empty")
    }
    assert(e.getMessage.contains("empty"))

    val small = AnnIndexManager.create(spark, "t_small",
      vecs.take(2).toDF("id", "embedding"), "id", "embedding", "FLAT", Map(),
      s"$tmp/t_small")
    assert(small.scan(queries.head, 100).count() == 2)
  }

  test("rangeScan returns exactly the rows within the radius, minus tombstones") {
    def bruteRange(q: Array[Float], r: Double, excl: Set[Long] = Set.empty) =
      vecs.filterNot(v => excl(v._1))
        .map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
        .filter(_._2 <= r).sortBy { case (id, d) => (d, id) }.map(_._1)

    val q = queries.head
    val flat = AnnIndexManager.create(spark, "t_range_flat", vecsDf,
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/t_range_flat")
    val expected = bruteRange(q, 0.3)
    assert(expected.nonEmpty && expected.size < 200) // radius actually cuts
    assert(flat.rangeScan(q, 0.3).collect().map(_.getLong(0)).toSeq == expected)
    // every returned distance honors the bound
    assert(flat.rangeScan(q, 0.3).collect().forall(_.getDouble(1) <= 0.3))

    // tombstoned rows never come back
    flat.delete(expected.take(2))
    assert(flat.rangeScan(q, 0.3).collect().map(_.getLong(0)).toSeq ==
      bruteRange(q, 0.3, excl = expected.take(2).toSet))

    // graph engine: exhaustive filter = exact, same contract
    val vam = AnnIndexManager.create(spark, "t_range_vam", vecsDf,
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"), s"$tmp/t_range_vam")
    assert(vam.rangeScan(q, 0.3).collect().map(_.getLong(0)).toSeq == expected)

    // IVF default = EXACT via the triangle-inequality cell prune
    import spark.implicits._
    val ivf = AnnIndexManager.create(spark, "t_range_ivf", vecsDf,
      "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "8", "nprobe" -> "1"), s"$tmp/t_range_ivf")
    assert(ivf.rangeScan(q, 0.3).collect().map(_.getLong(0)).toSeq == expected)
    // ...and the prune really skips unreachable cells: from a far corner,
    // no cell is within reach at a tight radius (all data is in [0,1]^4)
    assert(ivf.rangeProbeLists(Array(3f, 3f, 3f, 3f), 0.02).isEmpty)
    assert(ivf.rangeScan(Array(3f, 3f, 3f, 3f), 0.02).count() == 0)
    // exhaustive probe also exact; explicit nprobe cap = approximate subset
    assert(ivf.rangeScan(q, 0.3, searchParam = 8).collect()
      .map(_.getLong(0)).toSeq == expected)
    assert(ivf.rangeScan(q, 0.3, searchParam = 1).collect()
      .map(_.getLong(0)).toSet.subsetOf(expected.toSet))

    // an insert that stretches a cell keeps that cell reachable: a far
    // outlier must be findable at a radius far below its cell's centroid
    // distance (stale radii would prune its cell and silently miss it)
    ivf.insert(Seq((999L, Array(3f, 3f, 3f, 3f))).toDF("id", "embedding"),
      "id", "embedding")
    val got = ivf.rangeScan(Array(3.05f, 3.05f, 3.05f, 3.05f), 0.05)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(999L))
  }
}
