package graft.operators

import graft.functions.VectorKernels
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}

/** Maximal Marginal Relevance (MMR, Carbonell & Goldstein SIGIR'98): re-rank
  * a candidate pool so results balance query relevance against redundancy —
  * the standard diversity pass over ANN hits before showing/sampling them
  * (near-identical corpus chunks otherwise fill the whole top-k).
  *
  * Division of labor at scale: candidate GENERATION is the distributed part
  * (any index search producing (id, vector, _distance)); the greedy
  * selection is inherently sequential in k and runs driver-side over the
  * collected pool — k·oversample rows, driver-tiny by construction, same
  * size class as every search result. `maxPool` fails fast if a caller
  * hands an unbounded relation.
  */
object Diversify {

  /** Greedy MMR over a candidate pool.
    *
    * @param candidates (idCol, vecCol, distCol) — distCol on the engine's
    *                   ascending `_distance` scale. Relevance is min-max
    *                   normalized to [0,1] WITHIN the pool, putting it on
    *                   the same scale as the cosine redundancy term —
    *                   without this, lambda's meaning would depend on the
    *                   metric's raw magnitudes (squared-L2 distances of
    *                   wide vectors dwarf cosine similarities).
    * @param lambda     1.0 = pure relevance (input order), 0.0 = pure
    *                   diversity. Redundancy = max cosine similarity to an
    *                   already-selected result.
    * @return (rank, id, mmr_score) — rank 1-based selection order. */
  def mmr(candidates: DataFrame, idCol: String, vecCol: String,
          distCol: String, k: Int, lambda: Double = 0.7,
          maxPool: Int = 65536): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    // id cast to long up front: callers hand int ids (e.g. a label column)
    // and getLong on an INT row value throws.
    val rows = candidates
      .select(col(idCol).cast("long"), col(vecCol), col(distCol).cast("double"))
      .limit(maxPool + 1).collect()
    require(rows.length <= maxPool,
      s"MMR pool exceeds $maxPool rows — bound the candidate set " +
        "(k*oversample search results), MMR is a re-rank, not a scan")
    val sel = mmrCore(rows.map(_.getLong(0)),
      rows.map(_.getSeq[Float](1).toArray),
      rows.map(_.getDouble(2)), k, lambda)
    toDf(spark, sel)
  }

  /** The greedy selection over one materialized pool — shared verbatim by
    * the scalar (driver-side) and per-query grouped (executor-side) forms,
    * so both produce bit-identical selections. */
  private def mmrCore(ids: Array[Long], vecs: Array[Array[Float]],
                      dists: Array[Double], k: Int,
                      lambda: Double): Seq[(Long, Double)] = {
    // NaN distances stay NaN through normalization (their scores then never
    // win a > comparison below, so they're skipped); min/max over finite
    // values only, else one NaN would degrade every rel to the 1.0 branch.
    val finite = dists.filter(d => !d.isNaN)
    val (dMin, dMax) = if (finite.isEmpty) (0.0, 0.0) else (finite.min, finite.max)
    val rel = dists.map(d =>
      if (d.isNaN) Double.NaN
      else if (dMax > dMin) (dMax - d) / (dMax - dMin) else 1.0)
    val n = ids.length
    val norms = vecs.map(v => math.sqrt(VectorKernels.dot(v, v)))
    def cos(i: Int, j: Int): Double = {
      val d = norms(i) * norms(j)
      if (d == 0.0) 0.0 else VectorKernels.dot(vecs(i), vecs(j)) / d
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val picked = new Array[Boolean](n)
    val maxSim = Array.fill(n)(Double.NegativeInfinity) // to selected set
    var exhausted = false
    while (!exhausted && selected.length < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val red = if (selected.isEmpty) 0.0 else maxSim(i)
          val score = lambda * rel(i) - (1.0 - lambda) * red
          // deterministic tie-break: higher relevance, then lower id.
          // NaN scores (NaN input distances) never win a > comparison —
          // those candidates are simply skipped.
          if (score > bestScore ||
              (score == bestScore && best >= 0 &&
                (rel(i) > rel(best) || (rel(i) == rel(best) && ids(i) < ids(best))))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      if (best < 0) { exhausted = true } // every remaining score was NaN
      else {
      picked(best) = true
      selected += ((best, bestScore))
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = cos(best, j)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      }
    }
    selected.toSeq.map { case (i, s) => (ids(i), s) }
  }

  /** Per-query grouped MMR: one bounded candidate pool per query id
    * (e.g. `ann_search_table` output joined to vectors), greedy-selected
    * INSIDE the executor task that owns the group — queries fan out across
    * the cluster, nothing collects to the driver. The per-pool selection
    * is [[mmrCore]], so each query's result equals the scalar [[mmr]] of
    * its pool exactly.
    *
    * @param candidates (qidCol, idCol, vecCol, distCol); qid and id must
    *                   cast to long
    * @return (qid, rank, id, mmr_score) — rank 1-based per query */
  def mmrTable(candidates: DataFrame, qidCol: String, idCol: String,
               vecCol: String, distCol: String, k: Int, lambda: Double = 0.7,
               maxPool: Int = 65536): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    // the grouping keys cast to long (getLong below); a NON-numeric id
    // (e.g. a string query id) must fail loudly — with ANSI off a plain
    // cast yields null and would silently merge every query into one
    // null-keyed pool. try_cast keeps the check ANSI-mode-independent.
    def longKey(name: String) = {
      val c = col(name)
      when(c.isNotNull && c.try_cast("long").isNull,
        raise_error(concat(lit(s"mmrTable: $name value '"), c.cast("string"),
          lit("' is not castable to long — query/row ids must be numeric"))))
        .otherwise(c.try_cast("long"))
    }
    candidates
      .select(longKey(qidCol), longKey(idCol),
        col(vecCol), col(distCol).cast("double"))
      .as[(Long, Long, Seq[Float], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float], Double)]
        while (it.hasNext) {
          require(buf.length < maxPool,
            s"MMR pool for query $qid exceeds $maxPool rows — bound the " +
              "candidate set (k*oversample search results) per query")
          val r = it.next()
          buf += ((r._2, r._3, r._4))
        }
        mmrCore(buf.map(_._1).toArray, buf.map(_._2.toArray).toArray,
            buf.map(_._3).toArray, k, lambda)
          .iterator.zipWithIndex
          .map { case ((id, s), r) => (qid, r + 1L, id, s) }
      }
      .toDF("qid", "rank", "id", "mmr_score")
  }

  private def toDf(spark: SparkSession, sel: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    sel.zipWithIndex
      .map { case ((id, s), r) => (r + 1L, id, s) }
      .toDF("rank", "id", "mmr_score")
  }
}
