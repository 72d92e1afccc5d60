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
    // a parquet dataset dir must contain at least one data file
    Files.isDirectory(p) && Files.list(p).anyMatch(f =>
      f.getFileName.toString.endsWith(".parquet") ||
        Files.isDirectory(f) && f.getFileName.toString.contains("="))
  }

  def deleteDir(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
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
    Files.list(p).forEach { f =>
      val n = f.getFileName.toString
      if (n.startsWith("shard=") && Files.isDirectory(f))
        scala.util.Try(n.stripPrefix("shard=").toInt).foreach(out += _)
    }
    out.sorted.toSeq
  }
}
