package graft.index

import graft.SparkSpec
import graft.functions.VectorKernels
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Adaptive nprobe (distance-ratio cell pruning) and graph shard
  * compaction / size-aware delta shards. */
class CompactionSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_compact_spec").toString

  // ---- adaptive nprobe ----

  /** 4 tight, well-separated clusters → IVF nlist=4 learns one cell each. */
  private lazy val clustered: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(0f, 0f, 0f, 0f), Array(10f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    Seq.tabulate(200) { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(_ + rnd.nextFloat() * 0.1f))
    }
  }

  private def bruteTopK(data: Seq[(Long, Array[Float])], q: Array[Float],
                        k: Int): Seq[Long] =
    data.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  private lazy val adaptiveIdx: AnnIndex = {
    import spark.implicits._
    AnnIndexManager.create(spark, "t_adapt", clustered.toDF("id", "embedding"),
      "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "4", "nprobe" -> "1",
        "adaptive_nprobe" -> "true", "nprobe_ratio" -> "4.0"),
      s"$tmp/t_adapt")
  }

  test("adaptive nprobe probes one cell deep inside a cluster") {
    val q = Array(0.05f, 0.05f, 0.05f, 0.05f) // inside cluster 0
    assert(adaptiveIdx.probeLists(q, 1, allowAdaptive = true).size == 1)
  }

  test("adaptive nprobe widens for a boundary query and stays exact") {
    val q = Array(5f, 0.05f, 0.05f, 0f) // equidistant clusters 0 and 1
    val probes = adaptiveIdx.probeLists(q, 1, allowAdaptive = true)
    assert(probes.size >= 2, s"boundary query should fan out, got $probes")
    // with both candidate cells probed the top-k is exact
    val got = adaptiveIdx.scan(q, 10).collect().map(_.getLong(0)).toSeq
    assert(got == bruteTopK(clustered, q, 10))
  }

  test("adaptive nprobe respects floor, cap, and explicit searchParam") {
    val q = Array(5f, 5f, 5f, 0f) // far from all centers → everything within ratio
    val all = adaptiveIdx.probeLists(q, 1, allowAdaptive = true)
    assert(all.size == 4) // widened to every cell (no nprobe_max set)

    // nprobe_max caps the widening
    import spark.implicits._
    val capped = AnnIndexManager.create(spark, "t_adapt_cap",
      clustered.toDF("id", "embedding"), "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "4", "nprobe" -> "1",
        "adaptive_nprobe" -> "true", "nprobe_ratio" -> "4.0",
        "nprobe_max" -> "2"),
      s"$tmp/t_adapt_cap")
    assert(capped.probeLists(q, 1, allowAdaptive = true).size == 2)

    // floor: nprobe=3 keeps at least 3 cells even deep inside a cluster
    val deep = Array(0.05f, 0.05f, 0.05f, 0.05f)
    assert(adaptiveIdx.probeLists(deep, 3, allowAdaptive = true).size == 3)

    // explicit searchParam bypasses adaptivity entirely
    assert(adaptiveIdx.probeLists(deep, 2, allowAdaptive = false).size == 2)
  }

  test("adaptive probe order always starts at the nearest cell") {
    for (q <- Seq(Array(0.1f, 0f, 0f, 0f), Array(9.9f, 0.1f, 0f, 0f),
                  Array(0f, 0f, 9.8f, 0.1f))) {
      val nearest = adaptiveIdx.probeLists(q, 1, allowAdaptive = false).head
      assert(adaptiveIdx.probeLists(q, 1, allowAdaptive = true).head == nearest)
    }
  }

  // ---- graph shard compaction ----

  private lazy val baseVecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(200)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
  }

  private def exhaustive(idx: AnnIndex, q: Array[Float], k: Int): Seq[(Long, Double)] =
    idx.scan(q, k, searchParam = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("compactShards merges small delta shards; results unchanged; ids never collide") {
    import spark.implicits._
    val idx = AnnIndexManager.create(spark, "t_compact", baseVecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      s"$tmp/t_compact")
    val rnd = new scala.util.Random(99)
    for (b <- 0 until 3) {
      val batch = Seq.tabulate(10)(i => (1000L + b * 10 + i, Array.fill(4)(rnd.nextFloat())))
      idx.insert(batch.toDF("id", "embedding"), "id", "embedding")
    }
    assert(idx.meta.param("shards", 0) == 5) // 2 create + 3 deltas
    val q = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val before = exhaustive(idx, q, 20)

    // base shards hold ~100 rows each (hash-split of 200 — comfortably
    // above minRows → untouched); the three 10-row deltas merge into one
    val removed = idx.compactShards(minRows = 40)
    assert(removed == 3)
    assert(idx.meta.param("shards", 0) == 3) // 5 - 3 + 1
    val shardIds = idx.data.select("shard").distinct().collect().map(_.getInt(0)).toSet
    assert(shardIds.size == 3)
    assert(shardIds.intersect(Set(2, 3, 4)).isEmpty, s"old delta ids survived: $shardIds")
    assert(exhaustive(idx, q, 20) == before)

    // idempotent: a second pass finds at most the one merged shard → no-op
    assert(idx.compactShards(minRows = 40) == 0)

    // deletes inside the small shard are dropped by the next compaction
    idx.delete(Seq(1000L, 1001L, 1002L))
    val nBefore = idx.meta.numVectors
    // the merged 30-row shard + nothing else is below 50; a single small
    // shard is already compact, so force it together with another delta
    idx.insert(Seq((2000L, Array(0.9f, 0.9f, 0.9f, 0.9f))).toDF("id", "embedding"),
      "id", "embedding")
    assert(idx.meta.numDeleted == 3)
    assert(idx.compactShards(minRows = 40) == 2)
    assert(idx.meta.numVectors == nBefore + 1 - 3) // one insert, three dead dropped
    // the dropped rows' tombstones no longer mask anything: numDeleted is
    // recounted to 0 (search overfetch deflates) and the empty delete log
    // is removed rather than anti-joined forever
    assert(idx.meta.numDeleted == 0)
    assert(!idx.hasDeletes)
    val ids = idx.scan(q, 300, searchParam = 100000).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1000L) && !ids.contains(1001L) && !ids.contains(1002L))
    assert(ids.contains(2000L))

    // next insert allocates a fresh shard id — no collision with live dirs
    idx.insert(Seq((3000L, Array(0.1f, 0.2f, 0.3f, 0.4f))).toDF("id", "embedding"),
      "id", "embedding")
    val finalIds = idx.data.select("shard").distinct().collect().map(_.getInt(0))
    assert(finalIds.length == finalIds.toSet.size)
    assert(finalIds.length == idx.meta.param("shards", 0))
    val res = idx.scan(Array(0.1f, 0.2f, 0.3f, 0.4f), 1, searchParam = 100000)
      .collect().map(_.getLong(0)).toSeq
    assert(res == Seq(3000L))
  }

  test("autoCompactMinShards bounds shard count across CDC micro-batches") {
    import spark.implicits._
    val idx = AnnIndexManager.create(spark, "t_autocompact",
      baseVecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      s"$tmp/t_autocompact")
    val rnd = new scala.util.Random(123)
    spark.conf.set("spark.ann.autoCompactMinShards", "4")
    try {
      // 6 micro-batches through BOTH mutation paths; un-compacted this
      // would end at 2 + 6 = 8 shards
      for (b <- 0 until 6) {
        val batch = Seq.tabulate(5)(i => (5000L + b * 5 + i, Array.fill(4)(rnd.nextFloat())))
          .toDF("id", "embedding")
        if (b % 2 == 0) idx.insert(batch, "id", "embedding")
        else idx.applyCdc(spark.emptyDataFrame.selectExpr("CAST(1 AS BIGINT) AS id").limit(0),
          batch, "id", "embedding")
      }
      // every mutation that reached >= 4 live shards folded the deltas:
      // the count stays bounded instead of growing one per batch
      assert(idx.meta.param("shards", 0) <= 4,
        s"auto-compaction left ${idx.meta.param("shards", 0)} shards")
      // nothing lost: all 30 inserted ids and the base rows still serve
      val got = idx.scan(Array(0.5f, 0.5f, 0.5f, 0.5f), 230, searchParam = 100000)
        .collect().map(_.getLong(0)).toSet
      assert((5000L until 5030L).forall(got.contains))
      assert(got.size == 230)
    } finally spark.conf.unset("spark.ann.autoCompactMinShards")

    // conf unset (default 0): mutations never auto-compact
    val before = idx.meta.param("shards", 0)
    idx.insert(Seq((9000L, Array(0.2f, 0.2f, 0.2f, 0.2f))).toDF("id", "embedding"),
      "id", "embedding")
    assert(idx.meta.param("shards", 0) == before + 1)
  }

  test("bulk insert splits into budget-sized delta shards (arithmetic)") {
    // the per-shard cell budget drives both create and insert sizing
    assert(AnnIndexBuilder.defaultGraphShards(10000000L, 128) == 100)
    assert(AnnIndexBuilder.defaultGraphShards(100L, 4) == 1)
    assert(AnnIndexBuilder.targetShardRows(128) == 100000L)
    // an insert of ~2 budgets of rows must produce 2 delta shards, never 1
    val n = 2L * AnnIndexBuilder.targetShardRows(768)
    assert(AnnIndexBuilder.defaultGraphShards(n, 768) == 2)
  }

  test("compaction preserves SQ8 storage and tombstone masking") {
    import spark.implicits._
    val idx = AnnIndexManager.create(spark, "t_compact_sq8", baseVecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2", "quantization" -> "sq8"),
      s"$tmp/t_compact_sq8")
    val rnd = new scala.util.Random(5)
    for (b <- 0 until 2) {
      val batch = Seq.tabulate(5)(i => (5000L + b * 5 + i, Array.fill(4)(rnd.nextFloat())))
      idx.insert(batch.toDF("id", "embedding"), "id", "embedding")
    }
    val q = Array(0.3f, 0.3f, 0.3f, 0.3f)
    val before = exhaustive(idx, q, 15)
    assert(idx.compactShards(minRows = 50) == 2)
    assert(exhaustive(idx, q, 15) == before) // codes round-trip bit-stable
    assert(idx.data.columns.contains("codes") && !idx.data.columns.contains("vector"))
  }
}
