package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.AnnFunctions._
import graft.index.AnnIndex

/** Whole-operator search shapes over an [[AnnIndex]].
  *
  * `searchTable` is the reference's flagship in-out operator
  * `ann_search_table` (reference: src/ann_search.cpp:397-691): query vectors
  * come from ANY relation, input columns pass through, output appends the
  * matched id + `_distance`. In the reference the index is one in-memory
  * object and input streams chunk-by-chunk; here the index is a partitioned
  * dataset, so the plan is genuinely distributed: probe assignment runs as a
  * broadcast join against the centroid table, candidate scoring joins
  * cell-pruned index partitions, and per-query top-k reduces map-side
  * before the only shuffle (TopK.grouped).
  */
object AnnSearch {

  /** First LIST/ARRAY-of-numeric column, mirroring the reference's
    * query-column auto-detection (src/ann_search.cpp:472-495). */
  def detectVectorCol(schema: StructType): String =
    schema.fields
      .collectFirst {
        case f if f.dataType.isInstanceOf[ArrayType] &&
          f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[NumericType] => f.name
      }
      .getOrElse(throw new IllegalArgumentException(
        "input has no numeric array column to use as query vector"))

  /** S5 `ann_search_table`: batch search with query vectors from a DataFrame.
    *
    * @param queryIdCol unique key of the query relation; if None an internal
    *                   id is generated (the input is then cached to keep the
    *                   two plan branches consistent).
    * @return input.* + `id` (matched index id) + `_distance`
    */
  def searchTable(idx: AnnIndex, queries: DataFrame, k: Int,
                  nprobe: Int = -1, queryVecCol: Option[String] = None,
                  queryIdCol: Option[String] = None): DataFrame = {
    val vecColName = queryVecCol.getOrElse(detectVectorCol(queries.schema))
    val np = if (nprobe > 0) nprobe else idx.defaultNprobe

    val (qin0, qidCol) = queryIdCol match {
      case Some(c) => (queries, c)
      case None => (queries.withColumn("__qid", monotonically_increasing_id()).cache(), "__qid")
    }
    // a WHOLE-null vector stays null through vector_nonnull (transform of a
    // null array is null) and would NPE inside every strategy's row decode —
    // drop such rows at the edge. NOTE the two null flavors are observably
    // DIFFERENT by contract: a null-ELEMENT query (handled below) still
    // emits its k rows with NaN distances, while a whole-null query has no
    // vector to search at all and its rows vanish from the output (callers
    // joining results back to the query relation see no rows for it) —
    // asserted for both flavors in OperatorSpec
    val qin = qin0.filter(col(vecColName).isNotNull)
    // narrow at the edge: a null ELEMENT becomes NaN, so the row's
    // distances sort last and it drops out of its own top-k — without this
    // the distance would be NULL and TopK's phase-1 getDouble would NPE
    val qvecRaw = vector_nonnull(col(vecColName))
    val qvec = if (idx.meta.metric == "cosine") normalize_vector(qvecRaw) else qvecRaw
    // bq: binarize each query ONCE here (one row per query), so the pair
    // kernel below is pure XOR+popcount (mirrors AnnIndex.searchBatch)
    val bqDim = idx.codec.collect { case graft.functions.BqCodec(d) => d }
    // rabitq: rotate each query ONCE here (one row per query), so the pair
    // kernel below is the O(dim) bit-test loop, not an O(dim²) per-pair
    // rotation (mirrors AnnIndex.searchBatch)
    val rabitqGeom = idx.codec.collect { case graft.functions.RabitqCodec(d, s) => (d, s) }
    val qkeys = (bqDim, rabitqGeom) match {
      case (Some(_), _) => qin.select(col(qidCol).as("__qid"), qvec.as("__qvec"),
        graft.functions.Bq.encodeUdf(qvec).as("__qbits"))
      case (_, Some((d, s))) => qin.select(col(qidCol).as("__qid"), qvec.as("__qvec"),
        graft.functions.Rabitq.rotateUdf(d, s)(qvec).as("__qrot"))
      case _ => qin.select(col(qidCol).as("__qid"), qvec.as("__qvec"))
    }

    val top =
      if (idx.isGraphEngine) {
        // graph engines (DISKANN/HNSW) have two plans:
        //  - "collect": the query batch is collected and broadcast, the
        //    shard-local batch kernel answers it against the (pinned)
        //    index with ZERO shuffle — the cheap plan for bounded batches
        //    (the reference's own shape: chunks streamed through one
        //    in-memory index, src/ann_search.cpp:397-691);
        //  - "distributed": queries stay a DataFrame end-to-end, cogrouped
        //    against whole shards (AnnIndex.scanGraphTable) — no driver
        //    collect anywhere, the plan that survives a table-scale query
        //    relation.
        // "auto" (default) probes up to the collect bound and switches to
        // distributed above it, so no query size ever errors or OOMs.
        val spark = queries.sparkSession
        val strategy = spark.conf.get("spark.ann.graphTableStrategy", "auto")
        val maxQ = spark.conf.get("spark.ann.maxCollectedQueries", "100000").toInt
        val qg = qkeys.select(col("__qid"), col("__qvec"))

        def collected(qrows: Array[org.apache.spark.sql.Row]): DataFrame = {
          val vecs = qrows.map(_.getSeq[Float](1).toArray).toSeq
          val hits = idx.searchBatch(vecs, k, nprobe) // (query_idx, id, _distance)
          val qidField = qkeys.schema("__qid")
          val mapping = spark.createDataFrame(
            java.util.Arrays.asList(qrows.zipWithIndex.map {
              case (r, i) => org.apache.spark.sql.Row(i, r.get(0))
            }: _*),
            StructType(Seq(StructField("query_idx", IntegerType, nullable = false),
              qidField.copy(name = "__qid"))))
          hits.join(broadcast(mapping), Seq("query_idx"))
            .select(col("__qid"), col("id"), col("_distance"))
        }

        strategy match {
          case "distributed" => idx.scanGraphTable(qg, k, nprobe)
          case "collect" =>
            val qrows = qg.limit(maxQ + 1).collect()
            require(qrows.length <= maxQ,
              s"searchTable(strategy=collect) got more than $maxQ query rows; " +
                "raise spark.ann.maxCollectedQueries or set " +
                "spark.ann.graphTableStrategy=auto|distributed (no collect bound)")
            collected(qrows)
          case "auto" =>
            // bounded probe: limit stops the scan at maxQ+1 rows, so the
            // decision costs one early-terminating pass over the queries
            val qrows = qg.limit(maxQ + 1).collect()
            if (qrows.length <= maxQ) collected(qrows)
            else idx.scanGraphTable(qg, k, nprobe)
          case other => throw new IllegalArgumentException(
            s"spark.ann.graphTableStrategy must be auto|collect|distributed, got: $other")
        }
      } else {
        val candidates =
          if (idx.meta.engine == "FLAT") {
            // brute force: every query visits every live row
            idx.live.crossJoin(broadcast(qkeys))
          } else {
            // distributed probe assignment: query × centroid (nlist rows —
            // tiny, broadcast), keep the np nearest cells per query, then
            // join the cell-pruned index partitions.
            val probeCols = Seq("__qid", "__qvec") ++
              (if (bqDim.isDefined) Seq("__qbits") else Nil) ++
              (if (rabitqGeom.isDefined) Seq("__qrot") else Nil) :+ "list_id"
            val probes = qkeys.crossJoin(broadcast(idx.centroidsDf))
              .withColumn("__cd", l2_distance_sq(col("__qvec"), col("centroid")))
              .withColumn("__cr", row_number().over(
                Window.partitionBy("__qid").orderBy(col("__cd"), col("list_id"))))
              .filter(col("__cr") <= np)
              .select(probeCols.map(col): _*)
            idx.live.join(broadcast(probes), Seq("list_id"))
          }

        val dist = (bqDim, rabitqGeom) match {
          case (Some(d), _) =>
            org.apache.spark.sql.GraftBridge.column(graft.functions.BqCodesDistance(
              org.apache.spark.sql.GraftBridge.expression(col(idx.dataVecCol)),
              org.apache.spark.sql.GraftBridge.expression(col("__qbits")),
              d, idx.meta.metric))
          case (_, Some((d, s))) =>
            org.apache.spark.sql.GraftBridge.column(graft.functions.RabitqDistance(
              org.apache.spark.sql.GraftBridge.expression(col(idx.dataVecCol)),
              org.apache.spark.sql.GraftBridge.expression(col("__qrot")),
              d, s, idx.meta.metric, preRotated = true))
          case _ => idx.distColumn(col(idx.dataVecCol), col("__qvec"))
        }
        val scored = candidates
          .withColumn("_distance", dist)
          .select(col("__qid"), col("id"), col("_distance"))

        TopK.grouped(scored, "__qid", "_distance", "id", k)
      }

    // replicate input rows per result (reference output shape: input cols +
    // matched row + _distance, src/ann_search.cpp:499-532)
    val out = qin.join(top, qin(qidCol) === top("__qid")).drop("__qid")
    if (queryIdCol.isEmpty) out.drop("__qid") else out
  }

  /** S5 with the reference's FULL output shape — `input.*, base.*,
    * _distance` (src/ann_search.cpp:499-532 fetches the matched base row,
    * not just its rowid).
    *
    * Semantics and scale notes:
    *  - LEFT join from the hit set: a hit whose id is missing from `base`
    *    keeps its row (base columns null) instead of silently shrinking
    *    below k — the reference's rowid fetch can never miss, a
    *    user-supplied base CAN. Duplicate base ids still multiply rows
    *    (as any SQL join would).
    *  - The hit `id` is matched positionally (searchTable appends it), so
    *    a query relation may itself carry an `id` column; base columns
    *    whose names collide with input columns are emitted as `base_<c>`.
    *  - No broadcast hint: the hit set is k × |queries| rows — small for
    *    bounded batches (AQE broadcasts it automatically) but unbounded
    *    for table-scale FLAT/IVF query sets, where a forced broadcast
    *    would OOM the driver. */
  def searchTableFetch(idx: AnnIndex, queries: DataFrame, base: DataFrame,
                       baseIdCol: String, k: Int, nprobe: Int = -1,
                       queryVecCol: Option[String] = None,
                       queryIdCol: Option[String] = None,
                       oversample: Int = 1,
                       rerank: Boolean = false): DataFrame = {
    require(!rerank || queryIdCol.isDefined,
      "searchTableFetch(rerank = true) needs queryIdCol: re-ranking re-cuts " +
        "top-k per QUERY, which requires the caller's unique query key")
    val fetchK = if (rerank) k * math.max(1, oversample) else k
    val raw = searchTable(idx, queries, fetchK, nprobe, queryVecCol, queryIdCol)
    // searchTable output is input.* ++ (id, _distance): rename the LAST
    // two positions so caller columns named id/_distance stay untouched
    val n = raw.columns.length
    val renamed = raw.columns.zipWithIndex.map {
      case (_, i) if i == n - 2 => "__hit_id"
      case (_, i) if i == n - 1 => "__hit_distance"
      case (c, _) => c
    }
    val hits = raw.toDF(renamed.toIndexedSeq: _*)
    val inputCols = hits.columns.dropRight(2)
    val baseOut = base.columns.map { c =>
      val name = if (inputCols.contains(c)) s"base_$c" else c
      base(c).as(name)
    }
    val joined = hits.join(base, hits("__hit_id") === base(baseIdCol), "left")
    if (!rerank)
      joined.select(inputCols.map(hits(_)) ++ baseOut
        :+ hits("__hit_distance").as("_distance"): _*)
    else {
      // re-score the k·oversample candidates EXACTLY from the fetched base
      // row's raw float vectors, then re-cut to k per query — the refine
      // step that makes quantized (sq8/fp16/pq/bq) candidate generation
      // end in the lossless ranking (same contract as search(rerank=true)).
      val baseVecName =
        if (inputCols.contains(idx.meta.vecCol)) s"base_${idx.meta.vecCol}"
        else idx.meta.vecCol
      require(base.columns.contains(idx.meta.vecCol),
        s"rerank needs the raw vector column '${idx.meta.vecCol}' in base")
      val qvecName = queryVecCol.getOrElse(detectVectorCol(queries.schema))
      // a LEFT-join miss has no base vector: NaN keeps the row (contract
      // above) but ranks it after every real candidate
      val exact = when(col(baseVecName).isNull, lit(Double.NaN))
        .otherwise(idx.rawDistColumn(
          vector_nonnull(col(baseVecName)), vector_nonnull(hits(qvecName))))
      val scored = joined
        .select((inputCols.map(hits(_)) :+ hits("__hit_id")) ++ baseOut: _*)
        .withColumn("_distance", exact)
      TopK.grouped(scored, queryIdCol.get, "_distance", "__hit_id", k)
        .drop("__hit_id")
    }
  }

  /** S6 `vector_distances`: brute-force distance of a query against every
    * candidate row — input.* + `_distance`, no top-k
    * (reference: src/ann_search.cpp:741-892; the GPU batch kernel's job is
    * done by whole-stage codegen over the scan). */
  def vectorDistances(candidates: DataFrame, vecCol: String, q: Array[Float],
                      metric: String = "l2"): DataFrame = {
    val v = col(vecCol)
    val lit_q = typedLit(q)
    val d: Column = metric match {
      case "l2"     => l2_distance_sq(v, lit_q)
      case "l2sqrt" => l2_distance(v, lit_q)
      case "ip"     => negate(inner_product(v, lit_q))
      case "cosine" => lit(1.0) - cosine_similarity(v, lit_q)
      case m        => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    candidates.withColumn("_distance", d)
  }

  /** Table-input range search — the batch form of [[AnnIndex.rangeScan]]:
    * for every query row, every index row within `radius` (engine distance
    * scale). Same query-edge contract as [[searchTable]] (whole-null query
    * vectors drop, null elements become NaN distances and thus never pass
    * the radius filter, cosine queries normalize); IVF/l2 prunes cells per
    * query via the broadcast centroid table (exact), other engines score
    * exhaustively.
    *
    * @return (queryIdCol, id, _distance) ordered by (query, distance, id) */
  def rangeTable(idx: AnnIndex, queries: DataFrame, radius: Double,
                 queryVecCol: Option[String] = None,
                 queryIdCol: Option[String] = None): DataFrame = {
    val vecColName = queryVecCol.getOrElse(detectVectorCol(queries.schema))
    val (qin0, qidCol) = queryIdCol match {
      case Some(c) => (queries, c)
      case None => (queries.withColumn("__qid", monotonically_increasing_id()), "__qid")
    }
    val qin = qin0.filter(col(vecColName).isNotNull)
    val qvecRaw = vector_nonnull(col(vecColName))
    val qvec = if (idx.meta.metric == "cosine") normalize_vector(qvecRaw) else qvecRaw
    val qkeys = qin.select(col(qidCol).as("__qid"), qvec.as("__qvec"))
    idx.rangeScanTable(qkeys, radius)
      .withColumnRenamed("__qid", qidCol)
      .orderBy(col(qidCol), col("_distance"), col("id"))
  }

  /** Filtered ANN search via overfetch-and-post-filter — the capability the
    * reference documents but never implements (README.md:164 "3x+100",
    * `ann_overfetch_multiplier` registered but unread,
    * src/ann_extension.cpp:57-60; its optimizer instead bails out on any
    * FILTER, src/ann_optimizer.cpp:479-481). Falls back to exact brute force
    * over the filtered base when the overfetched candidate set can't fill k.
    */
  def searchFiltered(idx: AnnIndex, base: DataFrame, baseIdCol: String,
                     q: Array[Float], k: Int, predicate: Column,
                     nprobe: Int = -1, overfetchMultiplier: Int = -1): DataFrame = {
    val spark = base.sparkSession
    // the reference registers `ann_overfetch_multiplier` as an extension
    // option (src/ann_extension.cpp:57-60, default 3 → "3x+100"); the Spark
    // analogue is a session conf, overridable per call via the parameter
    val mult =
      if (overfetchMultiplier > 0) overfetchMultiplier
      else spark.conf.get("spark.ann.overfetchMultiplier", "3").toInt
    val overfetch = k * mult + 100
    val exhaustive = overfetch >= idx.meta.numVectors && idx.meta.engine == "FLAT"
    val hits = idx.scan(q, overfetch, nprobe)
    val filtered = base.filter(predicate)
      .join(broadcast(hits), base(baseIdCol) === hits("id"))
      .drop(hits("id")) // keep the base's own key even when also named "id"
      .orderBy(col("_distance"), base(baseIdCol))
      .limit(k)
    // single pass: materialize the ≤ k overfetch survivors once (k rows —
    // driver-tiny at any scale) instead of running the pipeline for count()
    // and again for the result
    val survivors = filtered.collect()
    if (exhaustive || survivors.length >= k)
      spark.createDataFrame(java.util.Arrays.asList(survivors: _*), filtered.schema)
        .orderBy(col("_distance"), col(baseIdCol))
    else {
      // exact fallback: score the filtered base directly. rawDistColumn, not
      // floatDistColumn — base vectors are raw, not build-normalized.
      val qq = idx.prepQuery(q)
      base.filter(predicate)
        .withColumn("_distance",
          idx.rawDistColumn(col(idx.meta.vecCol).cast(ArrayType(FloatType)), typedLit(qq)))
        .orderBy(col("_distance"), col(baseIdCol))
        .limit(k)
    }
  }
}
