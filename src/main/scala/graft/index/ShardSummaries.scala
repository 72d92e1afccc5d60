package graft.index

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-shard routing summaries for the graph engines — the coarse stage
  * that makes table-scale graph search SUBLINEAR in shard count.
  *
  * Without routing, every query walks every live shard
  * ([[GraphTableSearch]] replicates queries across the whole manifest), so
  * per-query cost grows linearly with corpus size even though the walk
  * inside each shard is sublinear — the one scale wall graph search keeps
  * that IVF does not. The fix is the same coarse-quantization idea the
  * in-repo IVF engine already uses (centroids + nprobe,
  * [[AnnIndex.probeLists]]) and that SPANN (Chen et al., NeurIPS'21) and
  * distributed DiskANN deployments use between machines: keep one centroid
  * per shard, probe the `spark.ann.shardProbes` nearest shards per query,
  * walk only those.
  *
  * Storage: ONE driver-written binary file (`summaries.bin`) next to
  * meta.json — shards × dim floats is centroid-table-sized (a few MB at
  * thousands of shards), so it reads in one driver I/O with no Spark job
  * and publishes atomically (tmp + rename) like the metadata. It is
  * deliberately NOT part of the manifest commit: maintenance appends
  * summaries AFTER the meta publish, and the read side treats any
  * mismatch against `live_shards` (missing id, unknown id is fine, or a
  * crashed half-update) as "stale" and falls back to walking all shards —
  * routing can therefore never make a result WRONG, only a stale summary
  * set slower. [[AnnIndex.refreshShardSummaries]] rebuilds coverage on
  * demand.
  *
  * Copy-on-write makes per-id staleness impossible: every mutation
  * publishes rewritten shards under FRESH ids (see
  * [[AnnIndex.writeOnlineInsert]], compactShards), so a summary keyed by
  * shard id can only be missing or orphaned, never silently wrong —
  * except `vacuum()`, which reuses ids and therefore recomputes the whole
  * file.
  */
object ShardSummaries {

  /** One shard's routing summary: mean vector of its (stored) rows. For a
    * cosine-metric index the centroid is L2-normalized at WRITE time so
    * query ranking can use the same 1-dot ordering as row distances. */
  final case class Summary(shard: Int, nrows: Long, centroid: Array[Float])

  private val Magic = 0x4753554d // "GSUM"
  private val Version = 1

  def filePath(indexPath: String): java.nio.file.Path =
    java.nio.file.Paths.get(indexPath, "summaries.bin")

  def exists(indexPath: String): Boolean =
    java.nio.file.Files.exists(filePath(indexPath))

  def delete(indexPath: String): Unit =
    java.nio.file.Files.deleteIfExists(filePath(indexPath))

  /** Atomic publish (tmp + rename), mirroring IndexMeta.write. */
  def write(indexPath: String, summaries: Seq[Summary]): Unit = {
    val dir = java.nio.file.Paths.get(indexPath)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve("summaries.bin.tmp")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(tmp), 1 << 16))
    try {
      out.writeInt(Magic); out.writeInt(Version)
      out.writeInt(summaries.size)
      out.writeInt(summaries.headOption.map(_.centroid.length).getOrElse(0))
      summaries.foreach { s =>
        out.writeInt(s.shard); out.writeLong(s.nrows)
        var j = 0
        while (j < s.centroid.length) { out.writeFloat(s.centroid(j)); j += 1 }
      }
    } finally out.close()
    java.nio.file.Files.move(tmp, filePath(indexPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read the summary file; None when absent or unreadable (a corrupt or
    * foreign file must degrade to walk-all, never throw on the read path). */
  def read(indexPath: String): Option[Array[Summary]] = {
    val p = filePath(indexPath)
    if (!java.nio.file.Files.exists(p)) return None
    try {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(p), 1 << 16))
      try {
        if (in.readInt() != Magic || in.readInt() != Version) return None
        val n = in.readInt(); val d = in.readInt()
        val out = new Array[Summary](n)
        var i = 0
        while (i < n) {
          val sid = in.readInt(); val rows = in.readLong()
          val c = new Array[Float](d)
          var j = 0
          while (j < d) { c(j) = in.readFloat(); j += 1 }
          out(i) = Summary(sid, rows, c)
          i += 1
        }
        Some(out)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Compute summaries for the shards present in `graphRows` — one
    * columnar pass emitting per-partition partial sums (each partition
    * holds whole shards on every caller's layout, but correctness does not
    * depend on that: partials merge by shard id driver-side). Quantized
    * storage decodes row-locally; cosine centroids normalize at the end so
    * the routing ordering matches the engine's 1-dot row distances.
    *
    * @param graphRows any projection whose FIRST column is `shard` and
    *                  SECOND is the stored vector column (float array, or
    *                  codes when `codec` is set) */
  def compute(graphRows: DataFrame, codec: Option[graft.functions.VectorCodec],
              normalizeForCosine: Boolean): Seq[Summary] = {
    val out = StructType(Seq(
      StructField("shard", IntegerType, nullable = false),
      StructField("sums", ArrayType(DoubleType), nullable = false),
      StructField("cnt", LongType, nullable = false)))
    // per-partition partials, then a DISTRIBUTED by-shard merge before the
    // collect: on the standard whole-shards-per-partition layout this is a
    // near-no-op (one partial per shard), but on an arbitrary layout the
    // driver would otherwise receive O(partitions × shards × dim) — the
    // reduce caps the collect at exactly O(shards × dim), the same order
    // as summaries.bin itself (the designed driver-resident floor: one
    // centroid per shard is what lets routing decide without a Spark job).
    val partials = graphRows.mapPartitions { rows =>
      val acc = scala.collection.mutable.HashMap.empty[Int, (Array[Double], Array[Long])]
      rows.foreach { r =>
        val v: Array[Float] = codec match {
          case Some(c) => c.decode(r.getAs[Array[Byte]](1))
          case None =>
            val s = r.getSeq[Float](1); val a = new Array[Float](s.length)
            var j = 0; while (j < a.length) { a(j) = s(j); j += 1 }; a
        }
        val e = acc.getOrElseUpdate(r.getInt(0), (new Array[Double](v.length), new Array[Long](1)))
        val sums = e._1
        var j = 0
        while (j < v.length) { sums(j) += v(j); j += 1 }
        e._2(0) += 1L
      }
      acc.iterator.map { case (sid, (sums, cnt)) => Row(sid, sums.toSeq, cnt(0)) }
    }(Encoders.row(out))
      .rdd.map(r => (r.getInt(0), (r.getSeq[Double](1).toArray, r.getLong(2))))
      .reduceByKey { (a, b) =>
        val (sa, ca) = a; val (sb, cb) = b
        var j = 0
        while (j < sa.length) { sa(j) += sb(j); j += 1 }
        (sa, ca + cb)
      }.collect()

    partials.iterator.map { case (sid, (sums, cnt)) =>
      val d = sums.length
      val c = new Array[Float](d)
      var j = 0
      while (j < d) { c(j) = (sums(j) / math.max(1L, cnt)).toFloat; j += 1 }
      val cen =
        if (normalizeForCosine) graft.functions.VectorKernels.normalize(c) else c
      Summary(sid, cnt, cen)
    }.toSeq.sortBy(_.shard)
  }

  /** Merge an update into the stored file: drop `removed` ids, add/replace
    * `added`, keep everything else. Missing file starts empty. */
  def merge(indexPath: String, added: Seq[Summary], removed: Seq[Int]): Unit = {
    val removedSet = removed.toSet ++ added.map(_.shard)
    val kept = read(indexPath).map(_.filterNot(s => removedSet(s.shard)).toSeq)
      .getOrElse(Seq.empty)
    write(indexPath, (kept ++ added).sortBy(_.shard))
  }

  /** The s nearest shards for one query by centroid distance on the
    * engine's ordering scale — the routing decision, row-local and
    * serializable (rides UDF closures on the table path). Deterministic:
    * `shards`/`centroids` are parallel arrays sorted by shard id and the
    * bounded pool breaks distance ties by insertion (= id) order. NaN
    * distances are EXCLUDED before the pool (Pool's binary search would
    * otherwise rank NaN first — a shard whose rows contain a NaN would
    * permanently steal one probe slot from every query); a query whose
    * every centroid distance is NaN (null-element query vector) falls
    * back to the first s shards, keeping the walk-all contract that such
    * a query still produces its NaN-distance rows for top-k to drop. */
  def topShards(q: Array[Float], shards: Array[Int],
                centroids: Array[Array[Float]], s: Int,
                metric: String): Array[Int] = {
    val dist = graft.functions.VectorKernels.orderingDistance(metric) _
    // clamp: s at/above the shard count returns ALL shards (distance
    // order) — the exact-compat full-width probe — without allocating a
    // pool sized to a caller's "effectively infinite" width
    val cap = math.min(math.max(1, s), math.max(1, shards.length))
    val pool = new Vamana.Pool(cap)
    var i = 0
    while (i < shards.length) {
      val d = dist(q, centroids(i))
      if (!java.lang.Double.isNaN(d)) pool.insert(i, d)
      i += 1
    }
    if (pool.size == 0) return shards.take(cap)
    val out = new Array[Int](pool.size)
    var j = 0
    while (j < pool.size) { out(j) = shards(pool.labels(j)); j += 1 }
    out
  }

  /** Two-level shard router — the structure that keeps PER-QUERY routing
    * cost sublinear in shard count (the r15 design's remaining linear
    * wall: at the 100 TB shape an index has 100k+ shards, and scanning
    * every shard centroid per query — driver-side on the broadcast path,
    * row-local on the table path — is an O(shards × dim) fixed cost per
    * query).
    *
    * Below `coarseThreshold` live shards this is exactly the r15 one-level
    * scan (a flat pass over a few hundred centroids is already
    * microseconds — a coarse level would only add misrouting risk). Above
    * it, the coarse level is an in-memory Vamana graph over the shard
    * centroids themselves, searched with the repo's own greedy beam
    * kernel at width `overscan × s` — ANN over centroids. A k-means cell
    * hierarchy (SPANN's posting tree) was measured first and REJECTED:
    * when shard centroids are not crisply clustered (2,000 data modes
    * over 400 shards — each centroid a diffuse mean of ~5 modes), cell
    * means carry almost no ranking signal and routed recall fell 0.98 →
    * 0.82; the graph makes no cell-geometry assumption and the beam
    * recovers the one-level ranking (r16 SCALE arm). Per-query cost is
    * ~O(overscan·s·degree·dim) — independent of shard count — vs the
    * one-level O(shards × dim).
    *
    * Exact-compat contract preserved: a probe width at/above the live
    * count bypasses the coarse level entirely (full-width ranking over
    * all shards, same as r15), so `ann_routed_exact`-style full-width
    * calls stay value-identical to walk-all. Serializable: rides the
    * table path's broadcast + row-local UDF unchanged.
    */
  final class Router(
      val shards: Array[Int],
      val centroids: Array[Array[Float]],
      val metric: String,
      val coarse: Option[Router.Coarse],
      val overscan: Int,
      /** Digest of the summary set this router was built from — carried
        * so stats verbs ([[Router.cacheState]]) can compare router.bin
        * against the live set without rehashing O(shards×dim) of
        * resident centroids per call. */
      val sumsDigest: Long) extends Serializable {

    def topShards(q: Array[Float], s: Int): Array[Int] = coarse match {
      // the coarse path only pays off when the beam is NARROW relative to
      // the graph: a beam of width l evaluates ~degree(32)·l distances
      // plus O(l) pool maintenance per insert, vs the flat scan's n
      // distance evals with an s-sized pool — at l ≳ n/8 the graph walk
      // costs MORE than scanning everything (measured: s=4,000 of 40,000
      // read 11.8 s through the graph vs 0.41 s flat). Fixed serving
      // widths (s ≪ shards) are the shape the coarse level exists for.
      // liveCount (not raw graph size) is the flat alternative's cost, so
      // tombstone dilution from incremental patches narrows the guard.
      case Some(co) if co.servable && s < shards.length && !Router.hasNaN(q) &&
          math.max(s * math.max(1, overscan), co.floor) < co.liveCount / 8 =>
        // beam-search the centroid graph at width overscan×s, floored at
        // the graph's own VALIDATED beam floor (build-time
        // self-validation picked the narrowest width reaching ≥0.98
        // agreement against the flat truth on this graph's geometry —
        // see validatedCoarse), then keep the best s LIVE reachable
        // labels. Pool order is ascending distance — same output
        // contract as the flat scan.
        Router.coarseProbe(co, q, s,
          math.max(s * math.max(1, overscan), co.floor), metric)
      case _ =>
        ShardSummaries.topShards(q, shards, centroids, s, metric)
    }
  }

  object Router {
    /** Centroid graph: labels index `graphShards` (shard ids of the
      * routable centroids the graph was built over). A `-1` entry is a
      * TOMBSTONE — an incrementally removed shard whose node stays in the
      * graph for navigation but never routes (see [[Router.patch]]).
      *
      * `floor` is the graph's VALIDATED beam floor and `agreement` the
      * routing agreement it measured against the flat truth at build time
      * (see [[Router.validatedCoarse]]) — both content-derived, so they
      * persist in router.bin and survive driver restarts. A graph whose
      * best rung stayed under [[Router.StandDownBelow]] is retained but
      * NOT [[servable]]: it still rides the cache and the incremental
      * patch path (so a pathological geometry never becomes a
      * rebuild-the-ladder-per-mutation storm), while every query serves
      * from the flat scan. */
    final case class Coarse(graph: Vamana.Shard,
                            graphShards: Array[Int],
                            floor: Int,
                            agreement: Float,
                            /** Nodes changed since the last FULL floor
                              * validation — incremental patches defer the
                              * ladder (a spot-check guards drift) until
                              * churn crosses the revalidation cap; see
                              * [[Router.patch]]. */
                            churn: Int = 0,
                            /** Agreement measured at the last FULL
                              * build (never updated by patches): the
                              * self-healing reference — a revalidation
                              * reading more than [[Router.RebuildDrift]]
                              * below it means patch accumulation has
                              * degraded the GRAPH (r18 driftcheck arm:
                              * −0.04 serving agreement vs a rebuild
                              * after 20 patches on a near-tie
                              * geometry), and the patch stands down to
                              * a full rebuild. Negative = unknown
                              * (legacy). */
                            coldAgreement: Float = -1f) extends Serializable {
      /** Whether the validated agreement clears the serving bar. */
      def servable: Boolean = agreement >= Router.StandDownBelow
      /** Routable (non-tombstoned) node count — the engage guard's "what
        * the flat scan would cost" side. Recomputed after deserialization
        * (transient), O(n) once. */
      @transient lazy val liveCount: Int = {
        var c = 0; var i = 0
        while (i < graphShards.length) { if (graphShards(i) >= 0) c += 1; i += 1 }
        c
      }
    }

    private val CacheMagic = 0x47525452 // "GRTR"
    // v2 (r17): + validated beam floor and measured agreement after the
    // graphShards table. v3 (r17 review): the file may now carry an
    // UNSERVABLE graph (agreement under the serving bar, kept as a patch
    // base) — a v2 reader has no servable gate and would route through
    // it, so the semantic change bumps the version; older files mismatch
    // on the version int and degrade to a rebuild, never a misread.
    // v4 (r18): LIVE nodes' vectors are no longer stored — they are
    // bit-identical to the summary centroids the digest already pins, so
    // the reader REBINDS them from the covered set (only tombstoned
    // nodes, whose summaries are gone, keep their vectors in the file).
    // Measured at 100k×d768: 304 MB → ~14 MB, read 2.9 s → ~0.1 s, and
    // every per-patch cache write shrinks the same way. + churn counter.
    // v5 (r18): + coldAgreement (the last full build's agreement — the
    // self-healing reference for patch-accumulation drift).
    private val CacheVersion = 5

    def cacheFilePath(indexPath: String): java.nio.file.Path =
      java.nio.file.Paths.get(indexPath, "router.bin")

    /** Content digest (FNV-1a over shard ids, row counts, and centroid
      * bits) of the covered summary set a coarse graph was built from —
      * ANY membership or centroid change invalidates the cache. A stale
      * or corrupt cache can only cost a rebuild, never a wrong answer
      * (mismatch → rebuild; the exact-compat full-width path never
      * touches the coarse level at all). */
    def digest(sums: Array[Summary]): Long = {
      var h = 0xcbf29ce484222325L
      @inline def mix(x: Long): Unit = { h ^= x; h *= 0x100000001b3L }
      mix(sums.length.toLong)
      var i = 0
      while (i < sums.length) {
        val s = sums(i)
        mix(s.shard.toLong); mix(s.nrows)
        var j = 0
        while (j < s.centroid.length) {
          mix(java.lang.Float.floatToRawIntBits(s.centroid(j)).toLong & 0xffffffffL)
          j += 1
        }
        i += 1
      }
      h
    }

    /** Persist a built coarse graph next to summaries.bin (atomic tmp +
      * rename) so a FRESH DRIVER skips the single-threaded rebuild — at
      * the 100k×d768 shape that is minutes per driver restart, paid once
      * per summaries version instead. Best-effort: failure only costs the
      * amortization. */
    private[index] def writeCache(indexPath: String, dig: Long,
                                  coarse: Coarse): Unit = {
      val dir = java.nio.file.Paths.get(indexPath)
      if (!java.nio.file.Files.isDirectory(dir)) return
      val tmp = dir.resolve("router.bin.tmp")
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(tmp), 1 << 16))
      try {
        val g = coarse.graph
        val n = coarse.graphShards.length
        out.writeInt(CacheMagic); out.writeInt(CacheVersion)
        out.writeLong(dig)
        out.writeInt(coarse.floor)
        out.writeFloat(coarse.agreement)
        out.writeInt(coarse.churn)
        out.writeFloat(coarse.coldAgreement)
        out.writeInt(n)
        var i = 0
        while (i < n) { out.writeInt(coarse.graphShards(i)); i += 1 }
        out.writeInt(g.entry)
        out.writeInt(if (n > 0) g.vectors(0).length else 0)
        i = 0
        while (i < n) { out.writeLong(g.ids(i)); i += 1 }
        i = 0
        while (i < n) {
          val nb = g.neighbors(i)
          out.writeInt(nb.length)
          var j = 0
          while (j < nb.length) { out.writeInt(nb(j)); j += 1 }
          i += 1
        }
        // only TOMBSTONED nodes ship their vectors (their summaries are
        // gone); live nodes rebind to the digest-pinned summary centroids
        // at read — the O(shards × dim) payload stays in summaries.bin,
        // not duplicated here
        i = 0
        while (i < n) {
          if (coarse.graphShards(i) < 0) {
            val v = g.vectors(i)
            var j = 0
            while (j < v.length) { out.writeFloat(v(j)); j += 1 }
          }
          i += 1
        }
      } finally out.close()
      java.nio.file.Files.move(tmp, cacheFilePath(indexPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    /** Read the persisted coarse graph iff its digest matches the live
      * summary set; None on absence, mismatch, or corruption (→ rebuild).
      * `centOf` resolves a LIVE node's shard id to its summary centroid
      * (v4 stores no live vectors); an unresolvable id means the file
      * does not belong to this summary set after all → rebuild. */
    private[index] def readCache(indexPath: String, dig: Long,
                                 centOf: Int => Array[Float]): Option[Coarse] = {
      val p = cacheFilePath(indexPath)
      if (!java.nio.file.Files.exists(p)) return None
      try {
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          java.nio.file.Files.newInputStream(p), 1 << 16))
        try {
          if (in.readInt() != CacheMagic || in.readInt() != CacheVersion) return None
          if (in.readLong() != dig) return None
          val floor = in.readInt()
          val agreement = in.readFloat()
          val churn = in.readInt()
          val coldAgreement = in.readFloat()
          val n = in.readInt()
          val gs = new Array[Int](n)
          var i = 0
          while (i < n) { gs(i) = in.readInt(); i += 1 }
          val entry = in.readInt()
          val dim = in.readInt()
          val ids = new Array[Long](n)
          i = 0
          while (i < n) { ids(i) = in.readLong(); i += 1 }
          val neighbors = new Array[Array[Int]](n)
          i = 0
          while (i < n) {
            val len = in.readInt()
            val nb = new Array[Int](len)
            var j = 0
            while (j < len) { nb(j) = in.readInt(); j += 1 }
            neighbors(i) = nb
            i += 1
          }
          val vectors = new Array[Array[Float]](n)
          i = 0
          while (i < n) {
            if (gs(i) < 0) {
              val v = new Array[Float](dim)
              var j = 0
              while (j < dim) { v(j) = in.readFloat(); j += 1 }
              vectors(i) = v
            } else {
              val c = centOf(gs(i))
              if (c == null) return None // foreign file: rebuild
              vectors(i) = c
            }
            i += 1
          }
          Some(Coarse(Vamana.Shard(ids, vectors, neighbors, entry),
            gs, floor, agreement, churn, coldAgreement))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Persisted coarse-cache status vs a covered summary set — the ops
      * surface behind `ann_routing_info`'s `router_bin` column ("absent" |
      * "current" | "stale"). Header-only read (magic + version + digest,
      * 16 bytes): cheap enough for a stats verb; an unreadable header
      * reports "stale" (a rebuild is what it will cost, same as a
      * mismatch). A storm of "stale" readings across mutations is the
      * rebuild-storm signal the incremental patch exists to kill. */
    def cacheState(indexPath: String,
                   coveredDigest: Option[Long]): String = {
      val p = cacheFilePath(indexPath)
      if (!java.nio.file.Files.exists(p)) return "absent"
      val stored =
        try {
          val in = new java.io.DataInputStream(java.nio.file.Files.newInputStream(p))
          try {
            if (in.readInt() != CacheMagic || in.readInt() != CacheVersion) None
            else Some(in.readLong())
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      stored match {
        case Some(d) if coveredDigest.contains(d) => "current"
        case _ => "stale"
      }
    }

    private[index] def hasNaN(v: Array[Float]): Boolean = {
      var i = 0
      while (i < v.length) {
        if (java.lang.Float.isNaN(v(i))) return true
        i += 1
      }
      false
    }

    /** A centroid no query can rank: NaN components, or — under the
      * cosine metric only — zero norm (an all-zero shard mean, which
      * `normalize` passes through unchanged and `1 - dot/(|a||b|)`
      * turns into 0/0 = NaN for EVERY query). The flat scan drops such
      * shards per query via its NaN-distance filter; the graph must
      * exclude them at build, or Pool's binary search would rank their
      * NaN first and let them steal beam slots. */
    private[index] def unroutable(v: Array[Float], metric: String): Boolean = {
      if (hasNaN(v)) return true
      if (metric != "cosine") return false
      var i = 0
      while (i < v.length) {
        if (v(i) != 0.0f) return false
        i += 1
      }
      true
    }

    /** Build from covered summaries (sorted by shard id — read/refresh
      * guarantee order, so the build is deterministic: fixed insertion
      * order, fixed graph params). Unroutable centroids (NaN, zero-norm
      * under cosine) are excluded at build — they must never steal a
      * probe slot (the one-level scan's NaN discipline); a NaN QUERY
      * falls back to the one-level path, which keeps the first-s
      * deterministic junk-in/bounded-junk-out contract. Cost at N shards:
      * one batched-parallel Vamana build over N centroid rows (R=32,
      * L=64) plus floor validation — once per summaries version on a
      * cold cache; mutations reconcile incrementally via [[patch]]. */
    /** The smallest graph the engage guard (48 < live/8 under INTEGER
      * division → live ≥ 8·49) can ever use: below 392 shards EVERY query
      * would fall back to the flat scan, so building (and rebuilding, per
      * mutation) the graph would be pure wasted driver work. (beamFloor(n)
      * == 48 for every n this bound can see, so the coupling is exact; the
      * r17 review caught the off-by-a-band 8·48+1 that built-then-always-
      * rejected graphs for 385–391 live shards.) */
    private val MinUsableGraph = 8 * 49

    /** Harvest beam floor by GRAPH size: 48 through 8k nodes (measured
      * recall-complete at the 400–4,000-shard arms), +8 per doubling
      * beyond. Greedy path length grows ~log(n), and a fixed 48 that was
      * agreement-1.000 at 4k shards dropped one query's whole probe set
      * at 40k (its site sat just past the l=48 basin; l=64 recovered it —
      * r17 diagnostics). The floor's cost is per-query beam work, so the
      * log shape keeps routing effectively flat in shard count. */
    def beamFloor(n: Int): Int =
      if (n <= 8192) 48
      else 48 + 8 * (32 - Integer.numberOfLeadingZeros((n - 1) / 8192))

    /** Coarse-graph build parameters — fixed so builds and incremental
      * patches of the same summary history are reproducible. */
    private val CoarseParams =
      Vamana.Params(maxDegree = 32, buildComplexity = 64, alpha = 1.2)

    /** Dead-node ceiling: past this fraction of tombstones a patch gives
      * way to a full rebuild (compaction) — dead nodes still cost beam
      * work and degrade navigation quality. */
    private val MaxDeadFraction = 0.25

    /** Self-validation dials: the floor ladder must reach `ValidateTarget`
      * routing agreement against the flat truth before a rung is
      * accepted; a graph whose BEST rung stays under `StandDownBelow` is
      * judged unroutable for this geometry and the router serves the flat
      * scan instead (never a silent recall cliff). */
    private val ValidateTarget = 0.98
    private val StandDownBelow = 0.90
    private val ValidateQueries = 64
    private val ValidateK = 8
    /** Churn-deferred revalidation (r18): a patch re-runs the FULL floor
      * ladder only once accumulated churn crosses `max(32, live/100)`;
      * smaller patches pay a one-rung `SpotQueries`-query drift check at
      * the carried floor instead (full revalidate on a failed check).
      * The 1% cap is tighter than the drift the r17 upkeep arm measured
      * (0.04 agreement over ~2% churn), and the spot check catches a
      * geometry shift within one batch anyway. At 100k×d768 the
      * per-batch upkeep was 6.3 s with the unconditional ladder, ~0.1 s
      * with the spot check (r18 arm). */
    private val SpotQueries = 8
    private def churnCap(live: Int): Int = math.max(32, live / 100)
    private val SpotSlack = 0.02 // 8q×k8 = 64 probe hits → 1/64 granularity
    /** Patch-accumulation rebuild trigger (r18): a FULL revalidation
      * reading this far below the last full build's agreement means
      * tombstones + incremental inserts have degraded the graph itself
      * (driftcheck arm: −0.04 serving agreement vs a rebuild after 20
      * patches on a near-tie geometry) — the patch stands down and the
      * ~15 s rebuild (amortized over the hundreds of patches between
      * triggers) restores the cold quality. Above validation noise
      * (±0.01 at 64×k8) and below the measured decay. */
    private val RebuildDrift = 0.03

    /** One coarse probe: beam at width l, harvest the best s LIVE labels.
      * Tombstoned labels (incrementally removed shards) still navigate
      * but never route; NaN distances (a poisoned centroid inserted by a
      * patch, or Inf arithmetic) are dropped at harvest — the flat scan's
      * NaN discipline, kept at the pool boundary. Shared by the serving
      * path ([[Router.topShards]]) and build-time validation, so the
      * agreement the validator measures is the agreement serving gets. */
    private[index] def coarseProbe(co: Coarse, q: Array[Float], s: Int,
                                   l: Int, metric: String): Array[Int] = {
      val dist = graft.functions.VectorKernels.orderingDistance(metric) _
      val pool = Vamana.beamSearchPool(co.graph, q, l, dist)
      val out = new Array[Int](math.min(s, pool.size))
      var take = 0
      var j = 0
      while (j < pool.size && take < s) {
        val sid = co.graphShards(pool.labels(j))
        if (sid >= 0 && !java.lang.Double.isNaN(pool.dists(j))) {
          out(take) = sid; take += 1
        }
        j += 1
      }
      val got = if (take == out.length) out else java.util.Arrays.copyOf(out, take)
      if (take == s) got
      else {
        // under-filled pool (graph smaller than s after NaN-centroid
        // exclusion, or unreachable nodes): deterministically pad with
        // the lowest unrouted LIVE graph ids — graphShards excludes
        // NaN-poisoned centroids by construction, so the pad keeps the
        // flat scan's contract that such a shard never takes a probe
        // slot (the result may then be shorter than s, exactly like the
        // flat path's NaN exclusion)
        val seen = got.toSet
        (got.iterator ++ co.graphShards.iterator.filter(x => x >= 0 && !seen(x)))
          .take(s).toArray
      }
    }

    /** Build-time self-validation — "measure, don't guess" applied to the
      * coarse level's one free parameter. The builder HOLDS the flat
      * truth (the covered centroid table), so instead of trusting a fixed
      * beam floor it probes the finished graph with a deterministic
      * spread of its own live centroids, compares each top-8 against the
      * flat ranking, and walks a ×2 floor ladder from [[beamFloor]] until
      * agreement reaches [[ValidateTarget]] (or the engage cap live/8,
      * where the flat scan is cheaper anyway). Geometry decides the cost:
      * crisply clustered centroid sets validate at the base floor (no
      * change vs r16), DIFFUSE sets — the r17 upkeep arm measured 0.94 at
      * l=48 on 4k diffuse d=32 centroids where the synthetic grid read
      * 1.000 — pay a wider beam instead of silently losing recall, and a
      * set the graph cannot route at all (best < [[StandDownBelow]])
      * stands down to the flat scan. The chosen floor and measured
      * agreement persist in router.bin and surface in `ann_routing_info`.
      * Agreement VALUES are deterministic (fixed probes, fixed ladder;
      * the probe fan-out runs on the common pool, results are
      * order-independent). The r18 cost cap makes the CHOSEN floor
      * host-sensitive only near the measured cost crossover — two wall
      * samples decide where the climb stops; every floor it can pick is
      * a valid (agreement-measured) operating point, and the value
      * contract (probed-set quality) is unchanged. */
    private def validatedCoarse(graph: Vamana.Shard, gs: Array[Int],
                                shards: Array[Int],
                                cents: Array[Array[Float]],
                                metric: String,
                                startFloor: Int = 0): Coarse = {
      val liveLabels = gs.indices.filter(gs(_) >= 0).toArray
      val live = liveLabels.length
      val cap = live / 8
      val base = beamFloor(gs.length)
      // engage guard could never pass (unreachable after the
      // MinUsableGraph floor, kept as a safety): retain the graph as a
      // patch base, agreement 0 = unservable
      if (base >= cap) return Coarse(graph, gs, base, 0f)
      val nQ = math.min(ValidateQueries, live)
      val qs = Array.tabulate(nQ)(i =>
        graph.vectors(liveLabels((i.toLong * live / nQ).toInt)))
      val truth = new Array[Set[Int]](nQ)
      val t0 = System.nanoTime()
      java.util.stream.IntStream.range(0, nQ).parallel().forEach { i =>
        truth(i) =
          ShardSummaries.topShards(qs(i), shards, cents, ValidateK, metric).toSet
      }
      val flatNanos = System.nanoTime() - t0
      // the cost gate only bites where it is measurable AND matters: on
      // small fixtures (sub-20ms flat pass) wall noise would flip tiny
      // graphs to stand-down for nothing — there routing cost is
      // irrelevant either way
      val costGate = flatNanos >= 20e6.toLong
      var bestFloor = base
      var bestAgree = -1.0
      // a patch revalidation resumes NEAR the operating floor (one rung
      // below, so a post-compaction geometry can narrow again) instead of
      // re-climbing the whole ladder per mutation — at 100k×d768 the full
      // climb was ~6 s per online batch (r18 arm)
      var f = if (startFloor > base) math.max(base, startFloor / 2) else base
      var overCost = 0
      var firstProbed = true
      while (f < cap && overCost < 2) {
        val probe = Coarse(graph, gs, f, 0f)
        val hits = new java.util.concurrent.atomic.LongAdder()
        val r0 = System.nanoTime()
        java.util.stream.IntStream.range(0, nQ).parallel().forEach { i =>
          val got = coarseProbe(probe, qs(i), ValidateK, f, metric).toSet
          hits.add(truth(i).intersect(got).size.toLong)
        }
        val rungNanos = System.nanoTime() - r0
        val agree = hits.sum.toDouble / (nQ.toLong * ValidateK)
        // MEASURED cost cap (r18): a rung whose probe pass costs more
        // than the flat truth pass cannot beat the flat scan at serving
        // time no matter its agreement — climbing further is pure loss
        // (at 100k×d768 the old agreement-only ladder accepted floor
        // 10240, measured 1.5× SLOWER than flat at serve). Noise
        // robustness: a single wall sample can lie (JIT, GC), so (a) the
        // FIRST probed rung is always exempt — on a cold climb that is
        // the base rung (a beam-`base` walk genuinely costing more than
        // an n-centroid scan does not exist, so an over-flat reading
        // there is noise), and on a startFloor RESUME it is the rung
        // below the carried floor (already certified cost-acceptable by
        // the last full ladder) — exempting it guarantees bestAgree is
        // always seeded, so a noisy sample can never zero the agreement
        // and cascade into a per-batch rebuild storm via the patch
        // servability check; and (b) the climb stops only after TWO
        // consecutive over-cost rungs (cost is monotone in f; two
        // independent samples both reading over the crossover is
        // signal).
        val tooCostly = costGate && !firstProbed && rungNanos > flatNanos
        firstProbed = false
        if (!tooCostly) {
          overCost = 0
          if (agree >= ValidateTarget) return Coarse(graph, gs, f, agree.toFloat)
          if (agree > bestAgree) { bestAgree = agree; bestFloor = f }
        } else overCost += 1
        f *= 2
      }
      // best rung under the target: servable iff it clears StandDownBelow
      // (Coarse.servable); either way the graph stays cached and patchable
      Coarse(graph, gs, bestFloor, math.max(bestAgree, 0.0).toFloat)
    }

    /** Cheap drift tripwire for churn-deferred revalidation: agreement at
      * the CARRIED floor over `SpotQueries` fresh probe points (offset by
      * `salt` so successive patches sample different nodes). One rung,
      * ~1/8 the queries — ~2 orders cheaper than the full ladder. */
    private def spotAgreement(co: Coarse, shards: Array[Int],
                              cents: Array[Array[Float]],
                              metric: String, salt: Int): Double = {
      val liveLabels = co.graphShards.indices
        .filter(co.graphShards(_) >= 0).toArray
      val live = liveLabels.length
      if (live == 0) return 0.0
      val nQ = math.min(SpotQueries, live)
      val qs = Array.tabulate(nQ)(i =>
        co.graph.vectors(liveLabels(((i.toLong * live / nQ + salt) % live).toInt)))
      val hits = new java.util.concurrent.atomic.LongAdder()
      java.util.stream.IntStream.range(0, nQ).parallel().forEach { i =>
        val truth =
          ShardSummaries.topShards(qs(i), shards, cents, ValidateK, metric).toSet
        val got = coarseProbe(co, qs(i), ValidateK, co.floor, metric).toSet
        hits.add(truth.intersect(got).size.toLong)
      }
      hits.sum.toDouble / (nQ.toLong * ValidateK)
    }

    def build(sums: Array[Summary], metric: String,
              coarseThreshold: Int, overscan: Int,
              cachePath: Option[String] = None,
              base: Option[Router] = None): Router = {
      val shards = sums.map(_.shard)
      val cents = sums.map(_.centroid)
      val n = shards.length
      val threshold = math.max(MinUsableGraph, coarseThreshold)
      val dig = digest(sums)
      if (n < threshold)
        return new Router(shards, cents, metric, None, overscan, dig)
      val keep = (0 until n).filterNot(i => unroutable(cents(i), metric)).toArray
      if (keep.length < MinUsableGraph) // poisoned summary set: stay flat
        return new Router(shards, cents, metric, None, overscan, dig)
      val cached = cachePath.flatMap { p =>
        // v4 files rebind live vectors from the digest-pinned summaries:
        // resolve shard id → centroid once (O(n) map build, only when a
        // candidate file exists)
        if (!java.nio.file.Files.exists(cacheFilePath(p))) None
        else {
          val byShard = new java.util.HashMap[Integer, Array[Float]](n * 2)
          var i = 0
          while (i < n) { byShard.put(shards(i), cents(i)); i += 1 }
          readCache(p, dig, sid => byShard.get(Integer.valueOf(sid)))
        }
      }
      val coarse: Coarse = cached.getOrElse {
        // incremental path first: a mutation typically touches a handful
        // of shards out of tens of thousands — reconciling the PREVIOUS
        // version's graph (tombstone removed ids, insert new centroids)
        // costs O(changed × insert + validation), not a full O(n) rebuild
        // per batch
        val c = base.flatMap(b => patch(b, sums, keep, shards, cents, metric))
          .getOrElse {
            val graph = Vamana.buildShardParallel(
              keep.map(_.toLong), keep.map(cents), CoarseParams, metric)
            val v = validatedCoarse(graph, keep.map(shards), shards, cents, metric)
            // a FULL build's agreement is the self-healing reference
            // future patch revalidations are compared against
            v.copy(coldAgreement = v.agreement)
          }
        for (p <- cachePath)
          try writeCache(p, dig, c)
          catch { case scala.util.control.NonFatal(_) => () } // amortization only
        c
      }
      new Router(shards, cents, metric, Some(coarse), overscan, dig)
    }

    /** Reconcile a previously built coarse graph to a NEW summary set —
      * the router-lifecycle fix for the mutating (CDC/online-insert)
      * regime, where a full rebuild per online batch would dwarf the
      * insert it follows. Copy-on-write publishes rewritten shards under
      * fresh ids, so a batch's footprint on the summary set is a few
      * removed ids plus a few added ones; matching ids with unchanged
      * centroid bits keep their graph node, removed ones tombstone in
      * `graphShards` (the node stays for navigation, never routes), and
      * new centroids insert via the same Algorithm-3 step the per-shard
      * online path uses ([[Vamana.insertIntoShard]]). Deterministic:
      * `sums`/`keep` arrive sorted by shard id, so tombstone and insert
      * order are fixed.
      *
      * The patched graph re-validates its beam floor
      * ([[validatedCoarse]]) — mutation can shift the geometry (the r17
      * upkeep arm's rewritten shards pulled centroids toward the global
      * mean and cost the FIXED floor 0.04 agreement), and the floor must
      * answer for the graph as it now is, not as it was built.
      *
      * None (→ full rebuild) when: the base has no coarse level or a
      * different metric; the change set exceeds n/8 (a parallel rebuild
      * beats a serial patch well before half the set churns); or
      * tombstones would exceed [[MaxDeadFraction]] (compaction). A
      * re-validation that lands under the serving bar does NOT force a
      * rebuild — the patched graph is kept (unservable → flat scan) so a
      * pathological geometry never pays the ladder-plus-rebuild per
      * mutation. The base is never mutated — its spine is copied — so an
      * in-flight search holding the old Router is unaffected. */
    private[index] def patch(base: Router, sums: Array[Summary],
                             keep: Array[Int], shards: Array[Int],
                             cents: Array[Array[Float]],
                             metric: String): Option[Coarse] = {
      val co = base.coarse.orNull
      if (co == null || base.metric != metric) return None
      val n0 = co.graphShards.length
      // live shard id -> graph label
      val oldLabel = new java.util.HashMap[Integer, Integer](n0 * 2)
      var i = 0
      while (i < n0) {
        if (co.graphShards(i) >= 0) oldLabel.put(co.graphShards(i), i)
        i += 1
      }
      val matched = new java.util.BitSet(n0)
      val addIdx = new scala.collection.mutable.ArrayBuffer[Int]
      var ki = 0
      while (ki < keep.length) {
        val s = sums(keep(ki))
        val lbl = oldLabel.get(Integer.valueOf(s.shard))
        // bit-exact centroid match required: a vacuum reuses shard ids,
        // and routing to a node carrying the OLD centroid would silently
        // misrank (Arrays.equals compares float bits — NaN centroids
        // never reach keep)
        if (lbl != null &&
            java.util.Arrays.equals(co.graph.vectors(lbl.intValue()), s.centroid))
          matched.set(lbl.intValue())
        else addIdx += keep(ki)
        ki += 1
      }
      var removes = 0
      i = 0
      while (i < n0) {
        if (co.graphShards(i) >= 0 && !matched.get(i)) removes += 1
        i += 1
      }
      val changes = addIdx.length + removes
      if (changes == 0) return Some(co) // nrows-only drift: graph unchanged
      if (changes > math.max(64, keep.length / 8)) return None
      val prevDead = n0 - co.liveCount
      val nAfter = n0 + addIdx.length
      if (prevDead + removes > MaxDeadFraction * nAfter) return None
      val gs = java.util.Arrays.copyOf(co.graphShards, nAfter)
      i = 0
      while (i < n0) {
        if (gs(i) >= 0 && !matched.get(i)) gs(i) = -1
        i += 1
      }
      i = 0
      while (i < addIdx.length) {
        gs(n0 + i) = sums(addIdx(i)).shard
        i += 1
      }
      val graph = Vamana.insertIntoShard(co.graph,
        addIdx.iterator.map(x => sums(x).shard.toLong).toArray,
        addIdx.iterator.map(x => sums(x).centroid).toArray,
        CoarseParams, metric)
      // churn-deferred revalidation (r18): the full ladder re-runs only
      // once accumulated churn crosses churnCap — below it, a one-rung
      // spot check at the carried floor guards against drift (the r17
      // upkeep arm's geometry shift) at ~2 orders less cost than the
      // ladder, which at 100k×d768 was seconds PER ONLINE BATCH
      val newChurn = co.churn + changes
      def revalidated(): Coarse = {
        val v = validatedCoarse(graph, gs, shards, cents, metric,
          startFloor = co.floor)
        v.copy(coldAgreement = co.coldAgreement) // patches never move the reference
      }
      val validated =
        if (co.servable && newChurn < churnCap(keep.length)) {
          val carried = Coarse(graph, gs, co.floor, co.agreement, newChurn,
            co.coldAgreement)
          val spot = spotAgreement(carried, shards, cents, metric, salt = newChurn)
          if (spot >= math.min(ValidateTarget, co.agreement.toDouble) - SpotSlack)
            carried
          else revalidated() // drift tripped: pay the ladder now
        } else revalidated()
      // self-healing (r18): a revalidation (churn reset to 0) reading
      // RebuildDrift below the last FULL build's agreement means the
      // accumulated tombstones/inserts degraded the graph — stand down
      // to the full rebuild, which also resets the reference
      if (validated.churn == 0 && co.servable && co.coldAgreement > 0 &&
          validated.agreement < co.coldAgreement - RebuildDrift)
        return None
      // a patch that drags a SERVABLE graph under the serving bar returns
      // None so the full rebuild makes the final call (a fresh build of
      // the current centroids usually re-validates at target); once the
      // base itself is unservable the rebuild has already spoken for this
      // geometry — keep patching (no per-mutation rebuild storm) until
      // the churn caps force a natural retry
      if (!validated.servable && co.servable) None else Some(validated)
    }
  }
}
