package graft.index

import graft.SparkSpec

import java.nio.file.Files

/** The writer contract across a REAL process boundary: the two-writer
  * ManifestSpec case serializes on the reentrant in-JVM lock, so only a
  * forked second JVM exercises the OS advisory `writer.lock` and the
  * cross-process CAS. The child (graft.tools.CrossProcChild) is
  * Spark-free — IndexMeta is pure java.nio — so the fork is cheap. */
class CrossProcessWriterSpec extends SparkSpec {

  test("a second PROCESS blocks on writer.lock, moves the generation, and " +
      "the stale parent fails fast then retries cleanly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_xproc_spec").toString
    val path = s"$tmp/idx"
    val rnd = new scala.util.Random(5)
    val vecs = Seq.tabulate(60)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
    val idx = AnnIndexManager.create(spark, "xproc_spec",
      vecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "8", "build_complexity" -> "16",
        "shards" -> "1"), path)
    val gen0 = IndexMeta.publishGen(idx.meta)

    val holdMs = 3000L
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.tools.CrossProcChild", path, holdMs.toString)
    pb.redirectErrorStream(true)
    val child = pb.start()
    try {
      // a reader thread timestamps the child's lifecycle lines, so the
      // blocking assertion below compares against the child's ACTUAL
      // release instead of a wall-clock guess (a slow parent reaching
      // the lock after the child already released would otherwise pass
      // vacuously via the CAS alone)
      @volatile var acquiredAt = 0L
      @volatile var publishedAt = 0L
      val reader = new Thread(() => {
        val childOut = new java.io.BufferedReader(
          new java.io.InputStreamReader(child.getInputStream))
        var line = childOut.readLine()
        while (line != null) {
          if (line.contains("lock-acquired")) acquiredAt = System.nanoTime()
          if (line.contains("published")) publishedAt = System.nanoTime()
          line = childOut.readLine()
        }
      })
      reader.setDaemon(true)
      reader.start()
      val deadline = System.nanoTime() + 60e9.toLong
      while (acquiredAt == 0L && System.nanoTime() < deadline) Thread.sleep(10)
      assert(acquiredAt != 0L, "child died before acquiring the lock")

      // the parent's mutation must BLOCK on the OS lock (proving the
      // advisory lock excludes across processes), then fail its CAS
      // (the child's publish moved the generation) without writing
      val t0 = System.nanoTime()
      intercept[IndexMeta.ConcurrentWriteException] { idx.delete(Seq(1L)) }
      val failedAt = System.nanoTime()
      child.waitFor()
      reader.join(10000)
      assert(publishedAt != 0L, "child never published")
      // the delete call SPANNED the child's publish: it entered while the
      // child still held most of its 3 s (nothing in delete() precedes
      // the lock acquisition but plain JVM work), and it could only
      // return once the child released — together that is observed
      // cross-process blocking, not a wall-clock guess
      assert(t0 < publishedAt - 1e9.toLong,
        "parent started too late to exercise the lock (host stall?)")
      assert(failedAt >= publishedAt,
        "parent's mutation completed BEFORE the child released the lock — " +
          "the advisory lock is not excluding across processes")
      assert(IndexMeta.publishGen(IndexMeta.read(path)) == gen0 + 1)
      assert(idx.meta.numDeleted == 0, "failed mutation must publish nothing")

      // conflict resynced the instance: retry succeeds, child's params
      // are visible, generation advances once more
      idx.delete(Seq(1L))
      assert(IndexMeta.publishGen(idx.meta) == gen0 + 2)
      assert(idx.meta.numDeleted == 1)
      assert(idx.meta.params.get("xproc_child").contains("1"))
    } finally child.destroyForcibly()
  }
}
