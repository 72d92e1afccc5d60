package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Shard-manifest commit protocol: readers see only manifested shard dirs,
  * so a crashed writer's half-published segments are invisible instead of
  * duplicated, and orphaned shard ids are reclaimed on the next allocation
  * (IndexMeta.liveShards, AnnIndex.readData). */
class ManifestSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_manifest_spec").toString

  private lazy val baseVecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(120)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
  }

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def exhaustive(idx: AnnIndex, q: Array[Float], k: Int): Seq[(Long, Double)] =
    idx.scan(q, k, searchParam = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("create publishes a manifest naming exactly the written shard dirs") {
    import spark.implicits._
    val idx = AnnIndexManager.create(spark, "t_mf_create", baseVecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      s"$tmp/t_mf_create")
    val live = idx.meta.liveShards.getOrElse(fail("no manifest on a fresh index"))
    assert(live == IndexMeta.listShardDirs(s"$tmp/t_mf_create/data"))
    assert(idx.meta.param("shards", 0) == live.size)
  }

  test("an unmanifested orphan shard dir is invisible to reads and reclaimed on insert") {
    import spark.implicits._
    val path = s"$tmp/t_mf_orphan"
    val idx = AnnIndexManager.create(spark, "t_mf_orphan", baseVecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    val q = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val before = exhaustive(idx, q, 120)
    assert(before.size == 120)

    // Simulate a writer that crashed after its data append but before the
    // meta publish: a full copy of shard 0's graph parked at the next
    // unallocated id. Legacy layout would serve every row of it twice.
    val nextShard = idx.meta.param("next_shard", idx.meta.param("shards", 1))
    copyDir(Paths.get(path, "data", "shard=0"),
      Paths.get(path, "data", s"shard=$nextShard"))
    assert(IndexMeta.listShardDirs(s"$path/data").contains(nextShard))

    // invisible: same rows, same results, no duplicated-shard error
    assert(idx.data.count() == 120)
    assert(exhaustive(idx, q, 120) == before)

    // the next insert allocates that id, reclaims the junk dir, and the
    // fresh delta is served exactly once
    idx.insert(Seq((500L, Array(0.9f, 0.9f, 0.9f, 0.9f))).toDF("id", "embedding"),
      "id", "embedding")
    val after = idx.scan(q, 121, searchParam = 100000).collect().map(_.getLong(0))
    assert(after.length == 121)
    assert(after.count(_ == 500L) == 1)
    assert(idx.meta.liveShards.get.contains(nextShard))
  }

  test("a crash between compaction publish and dir deletes leaves readers on the new manifest") {
    import spark.implicits._
    val path = s"$tmp/t_mf_compact"
    val idx = AnnIndexManager.create(spark, "t_mf_compact", baseVecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    val rnd = new scala.util.Random(3)
    for (b <- 0 until 2) {
      val batch = Seq.tabulate(8)(i => (900L + b * 8 + i, Array.fill(4)(rnd.nextFloat())))
      idx.insert(batch.toDF("id", "embedding"), "id", "embedding")
    }
    val q = Array(0.4f, 0.4f, 0.4f, 0.4f)
    val before = exhaustive(idx, q, 136)

    // compact, then un-delete the small dirs (as if the process died after
    // the atomic publish but before space reclamation): a fresh reader of
    // the SAME on-disk state must not see the resurrected dirs
    val smallDirs = idx.meta.liveShards.get.filter(_ >= 2) // the two deltas
    val saved = Paths.get(s"$tmp/saved_small")
    Files.createDirectories(saved)
    smallDirs.foreach(s => copyDir(Paths.get(path, "data", s"shard=$s"),
      saved.resolve(s"shard=$s")))
    assert(idx.compactShards(minRows = 40) == 2)
    smallDirs.foreach(s => copyDir(saved.resolve(s"shard=$s"),
      Paths.get(path, "data", s"shard=$s")))

    val reader = AnnIndexManager.load(spark, path)
    assert(reader.data.count() == 136) // not 136 + 16 resurrected
    assert(exhaustive(reader, q, 136).toSet == before.toSet)
    assert(!reader.meta.liveShards.get.exists(smallDirs.contains))
  }

  test("grace-deferred reclamation: a pre-mutation plan survives an online rewrite") {
    import spark.implicits._
    val path = s"$tmp/t_mf_grace"
    val idx = AnnIndexManager.create(spark, "t_mf_grace",
      baseVecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    val q = Array(0.4f, 0.4f, 0.4f, 0.4f)
    // a standing reader: planned against the pre-mutation manifest, its
    // parquet file listing fixed at plan time
    val prePlan = idx.scan(q, 5, searchParam = 100000)
    assert(prePlan.count() == 5)
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      // two online batches rewrite BOTH shards copy-on-write; the old
      // immediate post-publish delete made the pre-mutation plan's
      // collect throw FAILED_READ_FILE.FILE_NOT_EXIST (measured r17)
      idx.insert(Seq.tabulate(5)(i => (9000L + i, Array.fill(4)(0.5f)))
        .toDF("id", "embedding"), "id", "embedding")
      idx.insert(Seq.tabulate(5)(i => (9100L + i, Array.fill(4)(0.6f)))
        .toDF("id", "embedding"), "id", "embedding")
      val got = prePlan.collect() // within the default 60 s grace
      assert(got.length == 5, "standing reader broke across an online rewrite")
      // the swapped dirs are bookkept, invisible to fresh readers, and on
      // disk pending their grace
      assert(idx.meta.params.contains("reclaim_pending"))
      val onDisk = IndexMeta.listShardDirs(s"$path/data").toSet
      val manifested = idx.meta.liveShards.get.toSet
      assert((onDisk -- manifested).nonEmpty, "pending dirs must survive the grace")
      assert(AnnIndexManager.load(spark, path).data.count() == 130)
      // grace 0 + the next publish reclaims the backlog (crash-safe: the
      // pending list rides the meta commit)
      spark.conf.set("spark.ann.reclaimGraceMs", "0")
      idx.insert(Seq.tabulate(5)(i => (9200L + i, Array.fill(4)(0.7f)))
        .toDF("id", "embedding"), "id", "embedding")
      val onDisk2 = IndexMeta.listShardDirs(s"$path/data").toSet
      assert(onDisk2 == idx.meta.liveShards.get.toSet,
        s"backlog not reclaimed: ${onDisk2 -- idx.meta.liveShards.get.toSet}")
      assert(!idx.meta.params.contains("reclaim_pending"))
    } finally {
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
      spark.conf.unset("spark.ann.reclaimGraceMs")
    }
  }

  test("vacuum drops the grace-pending backlog (id reuse must not grace-delete live dirs)") {
    import spark.implicits._
    val path = s"$tmp/t_mf_vacgrace"
    val idx = AnnIndexManager.create(spark, "t_mf_vacgrace",
      baseVecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      // an online rewrite leaves a grace-pending entry (default 60 s)
      idx.insert(Seq.tabulate(5)(i => (7000L + i, Array.fill(4)(0.3f)))
        .toDF("id", "embedding"), "id", "embedding")
      assert(idx.meta.params.contains("reclaim_pending"))
      // vacuum REUSES shard ids — carrying the pending list across it
      // would later grace-delete a now-LIVE dir (data loss)
      idx.delete(Seq(1L))
      idx.vacuum()
      assert(!idx.meta.params.contains("reclaim_pending"),
        "vacuum must drop the pending backlog before ids are reused")
      // a post-vacuum mutation past the grace must not touch live dirs
      spark.conf.set("spark.ann.reclaimGraceMs", "0")
      idx.insert(Seq.tabulate(5)(i => (7100L + i, Array.fill(4)(0.7f)))
        .toDF("id", "embedding"), "id", "embedding")
      val onDisk = IndexMeta.listShardDirs(s"$path/data").toSet
      assert(onDisk == idx.meta.liveShards.get.toSet)
      assert(idx.scan(Array(0.7f, 0.7f, 0.7f, 0.7f), 5, searchParam = 100000)
        .count() == 5)
    } finally {
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
      spark.conf.unset("spark.ann.reclaimGraceMs")
    }
  }

  test("gcOrphans removes exactly the unmanifested dirs") {
    import spark.implicits._
    val path = s"$tmp/t_mf_gc"
    val idx = AnnIndexManager.create(spark, "t_mf_gc", baseVecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    assert(idx.gcOrphans() == 0) // clean index: nothing to collect
    copyDir(Paths.get(path, "data", "shard=0"), Paths.get(path, "data", "shard=9"))
    copyDir(Paths.get(path, "data", "shard=1"), Paths.get(path, "data", "shard=12"))
    assert(idx.gcOrphans() == 2)
    assert(IndexMeta.listShardDirs(s"$path/data") == Seq(0, 1))
    assert(idx.data.count() == 120) // live dirs untouched
  }

  test("vacuum of a fully-deleted index publishes an empty manifest; scans return no rows") {
    import spark.implicits._
    val path = s"$tmp/t_mf_empty"
    val idx = AnnIndexManager.create(spark, "t_mf_empty",
      baseVecs.take(20).toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    idx.delete(baseVecs.take(20).map(_._1))
    idx.vacuum()
    assert(idx.meta.numVectors == 0)
    assert(idx.meta.liveShards.exists(_.isEmpty))
    assert(idx.data.count() == 0)
    assert(idx.scan(Array(0.1f, 0.1f, 0.1f, 0.1f), 5, searchParam = 1000).count() == 0)

    // and the index comes back to life on insert
    idx.insert(Seq((7L, Array(0.2f, 0.2f, 0.2f, 0.2f))).toDF("id", "embedding"),
      "id", "embedding")
    val ids = idx.scan(Array(0.2f, 0.2f, 0.2f, 0.2f), 1, searchParam = 1000)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(7L))
  }

  test("two writers on one path: one publishes, the stale one fails fast " +
      "without touching live dirs, and retries cleanly after resync") {
    import spark.implicits._
    val path = s"$tmp/t_mf_twowriter"
    val a = AnnIndexManager.create(spark, "t_mf_twowriter",
      baseVecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    a.delete(baseVecs.take(5).map(_._1)) // so the second writer's vacuum has work
    // "driver B": its own instance, synced at the current publish generation
    val b = new AnnIndex(spark, path)
    val genB = IndexMeta.publishGen(b.meta)

    // driver A publishes a mutation B has not seen
    a.insert(Seq((7000L, Array(0.9f, 0.9f, 0.9f, 0.9f))).toDF("id", "embedding"),
      "id", "embedding")
    assert(IndexMeta.publishGen(a.meta) == genB + 1)
    val manifested = a.meta.liveShards.get.toSet
    val q = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val winners = exhaustive(a, q, 121).toSet

    // B's vacuum is the dangerous interleaving: it destructively replaces
    // the dataset BEFORE its publish. The stale generation must fail it
    // fast — before replaceDir — leaving A's manifested dirs intact.
    intercept[IndexMeta.ConcurrentWriteException] { b.vacuum() }
    val onDisk = IndexMeta.listShardDirs(s"$path/data").toSet
    assert(manifested.subsetOf(onDisk),
      s"losing writer deleted live dirs: ${manifested -- onDisk}")
    assert(exhaustive(a, q, 121).toSet == winners,
      "winning writer's published state was damaged by the losing writer")

    // the loser resynced from disk on conflict: a retry on the fresh
    // state succeeds and is the next generation
    b.vacuum()
    assert(IndexMeta.publishGen(b.meta) == genB + 2)
    assert(b.meta.numDeleted == 0)
    assert(new AnnIndex(spark, path).data.count() == 116) // 120 - 5 + 1

    // insert-vs-insert: same contract, no destructive step either way
    val c = new AnnIndex(spark, path)
    b.insert(Seq((7100L, Array(0.8f, 0.8f, 0.8f, 0.8f))).toDF("id", "embedding"),
      "id", "embedding")
    intercept[IndexMeta.ConcurrentWriteException] {
      c.insert(Seq((7200L, Array(0.7f, 0.7f, 0.7f, 0.7f))).toDF("id", "embedding"),
        "id", "embedding")
    }
    c.insert(Seq((7200L, Array(0.7f, 0.7f, 0.7f, 0.7f))).toDF("id", "embedding"),
      "id", "embedding") // resynced retry
    assert(new AnnIndex(spark, path).data.count() == 118)
  }

  test("a pinned standing reader survives online batches past the reclaim " +
      "grace; unpinned dirs reclaim on schedule") {
    import spark.implicits._
    val path = s"$tmp/t_mf_pin"
    val idx = AnnIndexManager.create(spark, "t_mf_pin",
      baseVecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2"),
      path)
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    spark.conf.set("spark.ann.reclaimGraceMs", "1")
    try {
      // control arm: UNPINNED, grace 1 ms — the first batch's swapped
      // dirs are ripe by the second batch's publish and reclaimed
      idx.insert(Seq.tabulate(5)(i => (9000L + i, Array.fill(4)(0.5f)))
        .toDF("id", "embedding"), "id", "embedding")
      Thread.sleep(5)
      idx.insert(Seq.tabulate(5)(i => (9100L + i, Array.fill(4)(0.6f)))
        .toDF("id", "embedding"), "id", "embedding")
      Thread.sleep(5)
      idx.insert(Seq.tabulate(5)(i => (9150L + i, Array.fill(4)(0.55f)))
        .toDF("id", "embedding"), "id", "embedding")
      val unpinnedLeft =
        IndexMeta.listShardDirs(s"$path/data").toSet -- idx.meta.liveShards.get
      assert(unpinnedLeft.size <= 2, // at most the LAST batch's swaps pend
        s"unpinned dirs did not reclaim on schedule: $unpinnedLeft")

      // pinned arm: register the pin BEFORE planning, like a long scan
      val token = idx.pinScan()
      val prePlan = idx.scan(Array(0.4f, 0.4f, 0.4f, 0.4f), 5,
        searchParam = 100000)
      assert(prePlan.count() == 5)
      for (b <- 0 until 3) { // N online batches, every one past the grace
        idx.insert(Seq.tabulate(5)(i =>
            (9200L + b * 100 + i, Array.fill(4)(0.5f + 0.1f * b)))
          .toDF("id", "embedding"), "id", "embedding")
        Thread.sleep(5)
      }
      assert(idx.meta.params.contains("reclaim_pending"),
        "pin was not respected: nothing pending after 3 post-pin batches")
      val got = prePlan.collect()
      assert(got.length == 5,
        "pinned standing reader died across online batches")

      // release: the backlog reclaims at the next publish
      idx.unpinScan(token)
      Thread.sleep(5)
      idx.insert(Seq.tabulate(5)(i => (9900L + i, Array.fill(4)(0.45f)))
        .toDF("id", "embedding"), "id", "embedding")
      Thread.sleep(5)
      idx.insert(Seq.tabulate(5)(i => (9950L + i, Array.fill(4)(0.65f)))
        .toDF("id", "embedding"), "id", "embedding")
      val left =
        IndexMeta.listShardDirs(s"$path/data").toSet -- idx.meta.liveShards.get
      assert(left.size <= 2,
        s"backlog not reclaimed after unpin: $left")

      // an EXPIRED pin never blocks (crashed reader): TTL 1 ms
      idx.pinScan(ttlMs = 1)
      Thread.sleep(5)
      idx.insert(Seq.tabulate(5)(i => (9990L + i, Array.fill(4)(0.35f)))
        .toDF("id", "embedding"), "id", "embedding")
      Thread.sleep(5)
      idx.insert(Seq.tabulate(3)(i => (9995L + i, Array.fill(4)(0.25f)))
        .toDF("id", "embedding"), "id", "embedding")
      val left2 =
        IndexMeta.listShardDirs(s"$path/data").toSet -- idx.meta.liveShards.get
      assert(left2.size <= 2,
        s"an expired pin blocked reclamation: $left2")
    } finally {
      spark.conf.unset("spark.ann.onlineInsertMaxRows")
      spark.conf.unset("spark.ann.reclaimGraceMs")
    }
  }
}
