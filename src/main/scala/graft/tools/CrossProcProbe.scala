package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 cross-PROCESS writer-contract probe: the ManifestSpec two-writer
  * case proves the generation CAS inside ONE JVM (where the reentrant
  * JVM lock serializes); this probe forks a SECOND JVM that takes the OS
  * advisory `writer.lock`, holds it, and publishes a mutation — proving
  * on a real second process that (1) the parent's mutation BLOCKS on the
  * advisory lock for the hold duration, (2) the child's publish moves
  * the generation so the parent fails its CAS with
  * ConcurrentWriteException instead of interleaving, and (3) the
  * parent's instance resyncs and a retry succeeds.
  *
  * Run: sbt -batch "runMain graft.tools.CrossProcProbe"
  */
object CrossProcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_xproc").toString
    val path = s"$tmp/idx"
    val rnd = new scala.util.Random(5)
    val vecs = Seq.tabulate(60)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
    val idx = graft.index.AnnIndexManager.create(spark, "xproc", vecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "8", "build_complexity" -> "16",
        "shards" -> "1"), path)
    val gen0 = graft.index.IndexMeta.publishGen(idx.meta)

    val holdMs = 4000L
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.tools.CrossProcChild", path, holdMs.toString)
    pb.redirectErrorStream(true)
    val child = pb.start()
    val childOut = new java.io.BufferedReader(
      new java.io.InputStreamReader(child.getInputStream))
    // wait until the child holds the lock
    var line = childOut.readLine()
    while (line != null && !line.contains("lock-acquired")) line = childOut.readLine()
    require(line != null, "child died before acquiring the lock")
    println(s"[xproc] child holds writer.lock (pid ${child.pid()})")

    // the parent's mutation must BLOCK on the OS lock, then fail its CAS
    val t0 = System.nanoTime()
    val failed =
      try { idx.delete(Seq(1L)); false }
      catch { case _: graft.index.IndexMeta.ConcurrentWriteException => true }
    val waited = (System.nanoTime() - t0) / 1e9
    println(f"[xproc] parent mutation: blocked $waited%.2f s, " +
      s"ConcurrentWriteException=$failed")
    require(failed, "parent mutation did not fail its CAS after the child published")
    require(waited >= (holdMs - 700) / 1000.0,
      f"parent did not block on the advisory lock ($waited%.2f s < ~${holdMs / 1000.0} s " +
        "— the OS lock is not excluding across processes)")
    child.waitFor()
    val genAfterChild = graft.index.IndexMeta.publishGen(
      graft.index.IndexMeta.read(path))
    require(genAfterChild == gen0 + 1,
      s"child publish did not move the generation ($gen0 -> $genAfterChild)")

    // resynced retry succeeds and lands the NEXT generation
    idx.delete(Seq(1L))
    val genFinal = graft.index.IndexMeta.publishGen(idx.meta)
    require(genFinal == gen0 + 2, s"retry generation $genFinal != ${gen0 + 2}")
    require(idx.meta.params.get("xproc_child").contains("1"),
      "child's published params are not visible to the resynced parent")
    println(s"[xproc] PASS: cross-process block + CAS fail-fast + resynced retry " +
      s"(gen $gen0 -> $genAfterChild -> $genFinal)")
    spark.stop()
  }
}

/** The forked second writer: Spark-free (IndexMeta is pure java.nio) —
  * holds the OS advisory writer lock, then publishes a params-only
  * mutation, moving the generation under the parent. The hold is either
  * a fixed `holdMs` (the probe's original shape) or, when the argument
  * is `@<file>`, UNTIL the parent creates that signal file — the
  * handshake form CrossProcessWriterSpec uses so the test asserts on
  * lock-state EVENTS instead of wall-clock windows (a loaded host made
  * the fixed 3 s hold flaky in the r18 driver run). */
object CrossProcChild {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val hold = args(1)
    val meta = graft.index.IndexMeta.read(path)
    val gen = graft.index.IndexMeta.publishGen(meta)
    graft.index.IndexMeta.withWriter(path)(gen) {
      println("[child] lock-acquired")
      System.out.flush()
      if (hold.startsWith("@")) {
        val sig = java.nio.file.Paths.get(hold.drop(1))
        val deadline = System.nanoTime() + 120e9.toLong
        while (!java.nio.file.Files.exists(sig) &&
            System.nanoTime() < deadline)
          Thread.sleep(10)
      } else Thread.sleep(hold.toLong)
      graft.index.IndexMeta.publish(path,
        meta.copy(params = meta.params + ("xproc_child" -> "1")), gen)
    }
    println("[child] published")
  }
}
