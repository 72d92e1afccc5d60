package graft.index

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persistent index metadata — the Spark-native analogue of the reference's
  * serialized index header (reference: rust_lib/src/file_format.rs:30-80 —
  * magic/version/metric/max_degree/... and src/include/diskann_index.hpp:20-59
  * for the parameter set). Stored as meta.json next to the parquet index
  * dataset; the dataset replaces the binary blob, so the metadata carries
  * only scalars + the engine parameter map.
  */
case class IndexMeta(
    name: String,
    engine: String, // FLAT | IVF | DISKANN
    metric: String, // l2 | ip | cosine
    dim: Int,
    idCol: String,
    vecCol: String,
    numVectors: Long,
    numDeleted: Long,
    params: Map[String, String],
    version: Int = 1) {

  def param(key: String, default: Int): Int = params.get(key).map(_.toInt).getOrElse(default)
  def param(key: String, default: Double): Double = params.get(key).map(_.toDouble).getOrElse(default)

  /** In-memory size estimate (vectors + ids + graph edges if any), mirroring
    * GetInMemorySize (reference: src/diskann_index.cpp:643-653). */
  def memoryBytes: Long = {
    val vecBytes = params.get("quantization") match {
      case Some("sq8") => dim.toLong // u8 codes
      case Some("fp16") => 2L * dim // packed half floats
      case Some("pq") => param("pq_m", math.max(1, dim / 8)).toLong // m byte codes
      case Some("bq") => ((dim + 7) / 8).toLong // packed sign bits
      case Some("rabitq") => ((dim + 7) / 8 + 8).toLong // sign bits + (r, cf)
      case _ => 4L * dim
    }
    val perVec = vecBytes + 8 + 4 // vector + id + list/label
    val graph = if (engine == "DISKANN") param("max_degree", 64).toLong * 4 else 0L
    numVectors * (perVec + graph)
  }

  def quantized: Boolean =
    params.get("quantization").exists(graft.functions.VectorCodec.Supported)

  /** Graph-engine segment manifest: the shard ids readers may see.
    * Published atomically with the rest of the metadata (meta.json is
    * written tmp-then-rename), it is what makes index mutations
    * copy-on-write commits: writers lay down new shard dirs first and a
    * reader only ever observes dirs named by the manifest it read — a
    * crashed writer leaves invisible orphan dirs (reclaimed by the next
    * allocation of those ids, or by vacuum), never duplicate rows and
    * never a half-written shard. `None` = legacy layout (every dir under
    * data/ is live). */
  def liveShards: Option[Seq[Int]] =
    params.get("live_shards").map(s =>
      if (s.isEmpty) Seq.empty[Int] else s.split(',').map(_.toInt).toSeq)
}

object IndexMeta {
  import org.json4s._
  import org.json4s.jackson.Serialization
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  /** A second writer raced this one: the on-disk publish generation moved
    * past the generation this writer's instance last synced. The losing
    * mutation published NOTHING (its data dirs, if any, are unmanifested
    * orphans — invisible to readers, reclaimed at the next allocation or
    * gcOrphans); reload the index and retry on the fresh state. */
  final class ConcurrentWriteException(path: String, expected: Long, found: Long)
      extends IllegalStateException(
        s"concurrent writer on index at $path: this instance last synced " +
          s"publish generation $expected but disk is at $found — another " +
          "driver/process published a mutation in between. Nothing was " +
          "published by this writer; reload the index and retry.")

  /** Meta-param key of the monotonic publish generation — the cross-driver
    * single-writer enforcement token. Absent (legacy index) reads as 0. */
  private[index] val PublishGenKey = "publish_gen"

  def publishGen(meta: IndexMeta): Long =
    meta.params.get(PublishGenKey).map(_.toLong).getOrElse(0L)

  /** On-disk publish generation; 0 when meta.json is absent or unreadable
    * mid-swap (the atomic write makes the unreadable window ~nothing). */
  private def diskGen(path: String): Long =
    if (!exists(path)) 0L
    else scala.util.Try(publishGen(read(path))).getOrElse(0L)

  /** Per-path writer lock: a JVM ReentrantLock (same-driver threads
    * serialize instead of corrupting the shared instance) paired with an
    * OS advisory FileLock on `writer.lock` (cross-process writers
    * serialize; released by the OS if the holder crashes — no TTL lease
    * needed). On filesystems without advisory locking (object stores),
    * the FileLock degrades silently and the generation CAS at
    * [[publish]] remains the enforcement. */
  private final class WriterLock {
    val jvm = new java.util.concurrent.locks.ReentrantLock
    var channel: java.nio.channels.FileChannel = _
    var fileLock: java.nio.channels.FileLock = _
  }
  private val writerLocks =
    new java.util.concurrent.ConcurrentHashMap[String, WriterLock]

  /** Run `body` as THE writer for the index at `path` — the cross-driver
    * mutation contract. Acquires the per-path writer lock (reentrant:
    * nested mutations — auto-compact inside insert — re-enter freely),
    * then verifies the on-disk publish generation still equals
    * `expectedGen` (by-name: evaluated AFTER acquisition, so a
    * same-driver mutation queued behind another sees the refreshed
    * in-memory meta). A mismatch throws [[ConcurrentWriteException]]
    * BEFORE `body` runs — destructive steps (vacuum's dataset replace)
    * never start against a state another writer has already moved. */
  def withWriter[T](path: String)(expectedGen: => Long)(body: => T): T = {
    val key = Paths.get(path).toAbsolutePath.normalize.toString
    val wl = writerLocks.computeIfAbsent(key, _ => new WriterLock)
    wl.jvm.lock()
    val outermost = wl.jvm.getHoldCount == 1
    try {
      if (outermost) {
        try {
          Files.createDirectories(Paths.get(path))
          val ch = java.nio.channels.FileChannel.open(
            Paths.get(path, "writer.lock"),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE)
          wl.channel = ch
          wl.fileLock = ch.lock()
        } catch {
          // no advisory locking here (object store mount): generation CAS
          // at publish() is the remaining (documented) enforcement
          case scala.util.control.NonFatal(_) =>
            if (wl.channel != null) {
              try wl.channel.close()
              catch { case scala.util.control.NonFatal(_) => () }
              wl.channel = null
            }
            wl.fileLock = null
        }
      }
      val expected = expectedGen
      val found = diskGen(path)
      if (found != expected)
        throw new ConcurrentWriteException(path, expected, found)
      body
    } finally {
      if (outermost) {
        try {
          if (wl.fileLock != null) wl.fileLock.release()
          if (wl.channel != null) wl.channel.close()
        } catch { case scala.util.control.NonFatal(_) => () }
        wl.fileLock = null
        wl.channel = null
      }
      wl.jvm.unlock()
    }
  }

  /** Publish a mutation's metadata: re-verify the generation CAS (the
    * enforcement on lock-less filesystems; a no-op re-check under a held
    * [[withWriter]]), stamp `publish_gen = expected + 1`, and write
    * atomically. Returns the stamped meta — the caller's new in-memory
    * truth. */
  def publish(path: String, newMeta: IndexMeta, expectedGen: Long): IndexMeta =
    withWriter(path)(expectedGen) {
      val stamped = newMeta.copy(params =
        newMeta.params + (PublishGenKey -> (expectedGen + 1).toString))
      write(path, stamped)
      stamped
    }

  /** The on-disk publish generation right now — for CREATE/DROP flows,
    * which replace an index wholesale and therefore take the writer lock
    * for EXCLUSION (passing this as the expected gen makes the CAS
    * trivially true at acquisition) rather than for conflict detection. */
  private[index] def diskGenNow(path: String): Long = diskGen(path)

  /** Create/replace publish: CONTINUES the generation sequence past the
    * REPLACED index's generation (`priorGen + 1`, never a reset to 0 — a
    * reset would collide with a stale instance of the replaced index,
    * letting its next CAS pass and silently write into the new index).
    * `priorGen` must be captured BEFORE the destructive clear (the clear
    * deletes meta.json, so a read here would see 0), and the caller must
    * hold [[withWriter]] across capture→clear→publish — no CAS runs
    * here, the held lock IS the exclusion. */
  private[index] def publishReplace(path: String, newMeta: IndexMeta,
                                    priorGen: Long): IndexMeta = {
    val stamped = newMeta.copy(params =
      newMeta.params + (PublishGenKey -> (priorGen + 1).toString))
    write(path, stamped)
    stamped
  }

  /** Clear an index dir for in-place replacement WITHOUT deleting
    * `writer.lock`: create() holds the lock across its destructive
    * window, and deleting the lock file would hand a concurrent writer a
    * fresh inode to lock — two writers inside the window. Everything
    * else (meta, data, summaries, router.bin, pins) goes. */
  private[index] def clearDirForReplace(path: String): Unit = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) return
    val listing = Files.list(p)
    val children =
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        listing.forEach(f =>
          if (f.getFileName.toString != "writer.lock") buf += f)
        buf.toSeq
      } finally listing.close()
    children.foreach(c => deleteDir(c.toString))
  }

  def write(path: String, meta: IndexMeta): Unit = {
    Files.createDirectories(Paths.get(path))
    // atomic replace: write tmp then move over
    val tmp = Paths.get(path, "meta.json.tmp")
    Files.writeString(tmp, Serialization.write(meta))
    Files.move(tmp, Paths.get(path, "meta.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // same-process rewrites within the filesystem's mtime granularity
    // would otherwise serve stale cached metadata to the optimizer rule
    AnnIndexManager.invalidateMetaCache(path)
  }

  def read(path: String): IndexMeta =
    Serialization.read[IndexMeta](Files.readString(Paths.get(path, "meta.json")))

  def exists(path: String): Boolean = Files.exists(Paths.get(path, "meta.json"))

  def existsDir(path: String): Boolean = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) return false
    // a parquet dataset dir must contain at least one data file
    // (Files.list holds an fd until closed — never rely on GC)
    val listing = Files.list(p)
    try listing.anyMatch(f =>
      f.getFileName.toString.endsWith(".parquet") ||
        Files.isDirectory(f) && f.getFileName.toString.contains("="))
    finally listing.close()
  }

  def deleteDir(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }

  /** Atomic-ish local swap: delete target, move tmp into place. */
  def replaceDir(tmp: String, target: String): Unit = {
    deleteDir(target)
    Files.move(Paths.get(tmp), Paths.get(target))
  }

  /** Shard ids physically present under a graph index's data dir (the
    * `shard=K` hive dirs), sorted. Used right after a write to learn
    * which target partitions actually received rows (an empty task writes
    * no dir), and to migrate legacy manifests. One listing of one
    * directory — object-store-cheap even at thousands of shards. */
  def listShardDirs(dataPath: String): Seq[Int] = {
    val p = Paths.get(dataPath)
    if (!Files.isDirectory(p)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val listing = Files.list(p)
    try listing.forEach { f =>
      val n = f.getFileName.toString
      if (n.startsWith("shard=") && Files.isDirectory(f))
        scala.util.Try(n.stripPrefix("shard=").toInt).foreach(out += _)
    } finally listing.close()
    out.sorted.toSeq
  }
}
