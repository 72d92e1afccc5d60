package graft.functions

import graft.SparkSpec
import graft.functions.VectorKernels
import graft.index.{AnnIndexManager, IndexMeta}

import java.nio.file.Files

class AnnSqlSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_sql_spec").toString

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(17)
    Seq.tabulate(100)(i => (i.toLong, Array.fill(3)(rnd.nextFloat())))
  }

  private lazy val idx = {
    import spark.implicits._
    AnnIndexManager.create(spark, "sql_idx", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/sql_idx")
  }

  test("SQL TVF ann_index_scan returns sorted (id, _distance)") {
    idx
    AnnSql.register(spark)
    val rows = spark.sql(
      "SELECT * FROM ann_index_scan('sql_idx', array(0.5, 0.5, 0.5), 5)").collect()
    assert(rows.length == 5)
    val expect = vecs
      .map { case (id, v) => (id, VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v)) }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(rows.map(_.getLong(0)).toSeq == expect)
    assert(rows.map(_.getDouble(1)).toSeq.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("SQL TVF ann_range_search returns every row within the radius") {
    idx
    AnnSql.register(spark)
    val q = Array(0.5f, 0.5f, 0.5f)
    val expect = vecs
      .map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .filter(_._2 <= 0.05).sortBy { case (id, d) => (d, id) }.map(_._1)
    val rows = spark.sql(
      "SELECT * FROM ann_range_search('sql_idx', array(0.5, 0.5, 0.5), 0.05)").collect()
    assert(rows.map(_.getLong(0)).toSeq == expect)
    assert(rows.forall(_.getDouble(1) <= 0.05))
  }

  test("SQL TVFs ann_list / ann_index_info / ann_engine_info") {
    idx
    AnnSql.register(spark)
    val names = spark.sql("SELECT name FROM ann_list()").collect().map(_.getString(0))
    assert(names.contains("sql_idx"))
    val info = spark.sql(
      "SELECT num_vectors FROM ann_index_info() WHERE name = 'sql_idx'").head()
    assert(info.getLong(0) == 100)
    assert(spark.sql("SELECT * FROM ann_engine_info()").count() == 1)
  }

  test("SQL TVF composes with plain SQL (join back to a view)") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_vecs")
    val joined = spark.sql(
      """SELECT v.id, s._distance FROM ann_index_scan('sql_idx', array(0.1, 0.2, 0.3), 3) s
        |JOIN sql_vecs v ON v.id = s.id ORDER BY s._distance, v.id""".stripMargin)
      .collect()
    assert(joined.length == 3)
  }

  test("shard routing drives the SQL surface via SET spark.ann.shardProbes") {
    import spark.implicits._
    AnnSql.register(spark)
    // clustered rows + spatial shards: the layout routing has signal on
    val rows = Seq.tabulate(200) { i =>
      val c = i % 4
      val rc = new scala.util.Random(c * 7919 + 3)
      val rd = new scala.util.Random(i * 31L + 9)
      (i.toLong, Array.fill(6)(rc.nextFloat() * 100f + rd.nextFloat()))
    }
    AnnIndexManager.create(spark, "sql_routed", rows.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "64",
        "shards" -> "4", "shard_assign" -> "spatial"), s"$tmp/sql_routed")
    val qSql = rows(7)._2.mkString("array(", ", ", ")")
    def scan(): Seq[Long] = spark.sql(
      s"SELECT id FROM ann_index_scan('sql_routed', $qSql, 5, 100000)")
      .collect().map(_.getLong(0)).toSeq
    val walkAll = scan()
    // a SQL-only user turns routing on with plain SET — full width through
    // the router is value-identical, narrow width stays plausible
    spark.sql("SET spark.ann.shardProbes=100")
    try {
      assert(scan() == walkAll)
      spark.sql("SET spark.ann.shardProbes=1")
      val routed = scan()
      assert(routed.size == 5 && routed.toSet.subsetOf(rows.map(_._1).toSet))
    } finally spark.sql("RESET spark.ann.shardProbes")
    assert(scan() == walkAll) // RESET restores walk-all
  }

  test("ann_index_scan errors: unknown index, non-literal vector") {
    AnnSql.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM ann_index_scan('nope_idx', array(1.0), 5)").collect()
    }
    assert(e.getMessage.contains("unknown ANN index") || e.getMessage.contains("nope_idx"))
  }

  test("SQL TVF ann_search fetches base rows; ann_search_batch tags query_idx") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_vecs")
    val rows = spark.sql(
      "SELECT id, _distance FROM ann_search('sql_vecs', 'sql_idx', array(0.5, 0.5, 0.5), 4)")
      .collect()
    assert(rows.length == 4)
    val expect = vecs
      .map { case (id, v) => (id, VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v)) }
      .sortBy { case (id, d) => (d, id) }.take(4).map(_._1)
    assert(rows.map(_.getLong(0)).toSeq == expect)

    val batch = spark.sql(
      """SELECT query_idx, id FROM ann_search_batch('sql_idx',
        |  array(array(0.1, 0.1, 0.1), array(0.9, 0.9, 0.9)), 3)""".stripMargin)
      .collect()
    assert(batch.map(_.getInt(0)).toSet == Set(0, 1))
    assert(batch.length == 6)
  }

  test("SQL TVF ann_search_filtered applies the predicate from SQL") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_filt_vecs")
    val rows = spark.sql(
      """SELECT id, _distance FROM ann_search_filtered('sql_filt_vecs', 'sql_idx',
        |  array(0.5, 0.5, 0.5), 3, 'id % 2 = 0')""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getLong(0) % 2 == 0), "predicate must filter hits")
    val expect = vecs.filter(_._1 % 2 == 0)
      .map { case (id, v) => (id, VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v)) }
      .sortBy { case (id, d) => (d, id) }.take(3).map(_._1)
    assert(rows.map(_.getLong(0)).toSeq == expect)
  }

  test("SQL TVF ann_mmr re-ranks for diversity from SQL") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_mmr_vecs")
    val rows = spark.sql(
      """SELECT rank, id, mmr_score FROM ann_mmr('sql_mmr_vecs', 'sql_idx',
        |  array(0.5, 0.5, 0.5), 3, 0.5)""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "1-based ranks")
    // rank 1 is always the most relevant candidate
    val nearest = vecs
      .map { case (id, v) => (id, VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v)) }
      .minBy { case (id, d) => (d, id) }._1
    assert(rows.head.getLong(1) == nearest)
  }

  test("SQL TVF ann_recall measures 1.0 for an exact index from SQL") {
    idx
    AnnSql.register(spark)
    val rows = spark.sql(
      """SELECT query_idx, hits, k, recall FROM ann_recall('sql_idx',
        |  array(array(0.1, 0.1, 0.1), array(0.9, 0.9, 0.9)), 3)""".stripMargin)
      .collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(1) == 3L && r.getDouble(3) == 1.0),
      s"FLAT index is exact → recall 1.0: ${rows.toSeq}")
  }

  test("SQL TVF ann_search_table takes a TABLE() argument with passthrough columns") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    Seq((100L, "first", Array(0.1f, 0.1f, 0.1f)),
        (200L, "second", Array(0.9f, 0.9f, 0.9f)))
      .toDF("qid", "tag", "qvec").createOrReplaceTempView("sql_queries")
    val rows = spark.sql(
      "SELECT qid, tag, id, _distance FROM ann_search_table(TABLE(sql_queries), 'sql_idx', 3)")
      .collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(1)).toSet == Set("first", "second")) // passthrough
    val brute = vecs
      .map { case (id, v) => (id, VectorKernels.l2Sq(Array(0.1f, 0.1f, 0.1f), v)) }
      .sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSet
    assert(rows.filter(_.getLong(0) == 100L).map(_.getLong(2)).toSet == brute)
  }

  test("SQL TVF ann_search_table with base_table fetches input.*, base.*, _distance") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.map { case (id, v) => (id, s"label_$id", v) }
      .toDF("id", "tag", "embedding").createOrReplaceTempView("sql_base")
    Seq((7L, Array(0.5f, 0.5f, 0.5f))).toDF("qid", "qvec")
      .createOrReplaceTempView("sql_fetch_q")
    val rows = spark.sql(
      """SELECT qid, id, tag, _distance FROM
        |ann_search_table(TABLE(sql_fetch_q), 'sql_idx', 3, 'sql_base')""".stripMargin)
      .collect()
    assert(rows.length == 3)
    // base columns really come from the base rows
    assert(rows.forall(r => r.getString(2) == s"label_${r.getLong(1)}"))
    assert(rows.forall(_.getLong(0) == 7L))
  }

  test("SQL TVF vector_distances appends _distance to every input row") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_vecs")
    val rows = spark.sql(
      "SELECT id, _distance FROM vector_distances(TABLE(sql_vecs), 'embedding', array(0.5, 0.5, 0.5))")
      .collect()
    assert(rows.length == vecs.length) // no top-k: one row per input
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, v) <- vecs.take(10))
      assert(math.abs(byId(id) - VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v)) < 1e-6)
  }

  test("SQL TVF hybrid_search fuses BM25 and vector ranks from SQL") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    // cover every indexed id: fused vector candidates must find their doc
    vecs.map { case (id, v) =>
      (id, s"document number $id about ${if (id % 2 == 0) "spark joins" else "cats"}", v)
    }.toDF("id", "text", "embedding").createOrReplaceTempView("sql_docs")
    val rows = spark.sql(
      """SELECT id, _bm25_rank, _vector_rank FROM hybrid_search(
        |  TABLE(sql_docs), 'id', 'text', 'sql_idx', 'spark joins',
        |  array(0.5, 0.5, 0.5), 5)""".stripMargin).collect()
    assert(rows.length == 5)
    // docs mentioning the query terms must hold the top BM25 ranks
    val bm25Ranked = rows.filter(_.getInt(1) > 0).map(_.getLong(0))
    assert(bm25Ranked.nonEmpty && bm25Ranked.forall(_ % 2 == 0))
  }

  test("SQL TVF hybrid_search_table fuses per query from a query relation") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.map { case (id, v) =>
      (id, s"document number $id about ${if (id % 2 == 0) "spark joins" else "cats"}", v)
    }.toDF("id", "text", "embedding").createOrReplaceTempView("sql_docs_b")
    Seq((0, "spark joins", Array(0.5f, 0.5f, 0.5f)),
        (1, "cats", Array(0.1f, 0.9f, 0.1f)))
      .toDF("qid", "qtext", "qvec").createOrReplaceTempView("sql_hq")
    val rows = spark.sql(
      """SELECT qid, id, _bm25_rank, _vector_rank FROM hybrid_search_table(
        |  TABLE(sql_docs_b), 'id', 'text', 'sql_idx',
        |  TABLE(sql_hq), 'qid', 'qtext', 'qvec', 5)""".stripMargin).collect()
    assert(rows.count(_.getInt(0) == 0) == 5 && rows.count(_.getInt(0) == 1) == 5)
    // per-query modality split: q0's bm25 hits are even ids, q1's odd
    assert(rows.filter(r => r.getInt(0) == 0 && r.getInt(2) > 0)
      .forall(_.getLong(1) % 2 == 0))
    assert(rows.filter(r => r.getInt(0) == 1 && r.getInt(2) > 0)
      .forall(_.getLong(1) % 2 == 1))
  }

  test("SQL TVF ann_range_search_table returns per-query radius matches") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    Seq((0L, Array(0.5f, 0.5f, 0.5f)), (1L, Array(-9f, -9f, -9f)))
      .toDF("qid", "qvec").createOrReplaceTempView("sql_range_q")
    val rows = spark.sql(
      """SELECT qid, id, _distance FROM ann_range_search_table(
        |  TABLE(sql_range_q), 'sql_idx', 0.1, 'qid', 'qvec')""".stripMargin).collect()
    // far-away query matches nothing; near query's matches obey the radius
    assert(rows.forall(_.getLong(0) == 0L))
    assert(rows.nonEmpty && rows.forall(_.getDouble(2) <= 0.1))
    val want = vecs.map { case (id, v) =>
      (id, VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v).toDouble) }
      .filter(_._2 <= 0.1).map(_._1).toSet
    assert(rows.map(_.getLong(1)).toSet == want)
  }

  test("SQL TVF ann_mmr_table re-ranks per query from a query relation") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_mmr_base")
    Seq((0L, Array(0.5f, 0.5f, 0.5f)), (1L, Array(0.9f, 0.1f, 0.0f)))
      .toDF("qid", "qvec").createOrReplaceTempView("sql_mmr_q")
    val rows = spark.sql(
      """SELECT qid, rank, id FROM ann_mmr_table(
        |  'sql_mmr_base', 'sql_idx', TABLE(sql_mmr_q), 'qid', 'qvec', 3, 1.0)
        |ORDER BY qid, rank""".stripMargin).collect()
    assert(rows.count(_.getLong(0) == 0L) == 3 && rows.count(_.getLong(0) == 1L) == 3)
    // lambda=1 = pure relevance: rank order equals ascending distance per query
    for ((qid, q) <- Seq(0L -> Array(0.5f, 0.5f, 0.5f), 1L -> Array(0.9f, 0.1f, 0.0f))) {
      val got = rows.filter(_.getLong(0) == qid).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      val want = vecs.sortBy { case (id, v) =>
        (VectorKernels.l2Sq(q, v), id) }.take(3).map(_._1).toSeq
      assert(got == want, s"qid=$qid")
    }
  }

  test("SQL TVF ann_mmr_table works when the query vector column shares the index vecCol name") {
    import spark.implicits._
    idx
    AnnSql.register(spark)
    vecs.toDF("id", "embedding").createOrReplaceTempView("sql_mmr_base2")
    // the query relation's vector column is ALSO named 'embedding' — the
    // join against base vectors must not hit an ambiguous-column error
    Seq((0L, Array(0.5f, 0.5f, 0.5f)))
      .toDF("qid", "embedding").createOrReplaceTempView("sql_mmr_q2")
    val rows = spark.sql(
      """SELECT qid, rank, id FROM ann_mmr_table(
        |  'sql_mmr_base2', 'sql_idx', TABLE(sql_mmr_q2), 'qid', 'embedding', 3, 1.0)
        |ORDER BY rank""".stripMargin).collect()
    val want = vecs.sortBy { case (id, v) =>
      (VectorKernels.l2Sq(Array(0.5f, 0.5f, 0.5f), v), id) }.take(3).map(_._1).toSeq
    assert(rows.map(_.getLong(2)).toSeq == want)
  }

  test("SQL TVF ann_drop_index removes the catalog entry and the dataset") {
    import spark.implicits._
    AnnSql.register(spark)
    val path = s"$tmp/drop_idx"
    AnnIndexManager.create(spark, "drop_me", vecs.take(20).toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), path)
    assert(spark.sql("SELECT name FROM ann_list()").collect()
      .exists(_.getString(0) == "drop_me"))
    val row = spark.sql("SELECT * FROM ann_drop_index('drop_me')").head()
    assert(row.getString(0) == "drop_me" && row.getBoolean(1))
    assert(!spark.sql("SELECT name FROM ann_list()").collect()
      .exists(_.getString(0) == "drop_me"))
    // dataset and metadata are gone; only the writer.lock anchor may
    // remain (deleting a held lock file would let two writers into a
    // destructive window — see AnnIndexManager.drop)
    assert(!IndexMeta.exists(path))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "data")))
    val residue = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      try { val b = scala.collection.mutable.ArrayBuffer.empty[String]
        l.forEach(p => b += p.getFileName.toString); b.toSeq }
      finally l.close()
    }
    assert(residue.forall(_ == "writer.lock"), s"unexpected residue: $residue")
    // dropping again reports false, not an error
    assert(!spark.sql("SELECT * FROM ann_drop_index('drop_me')").head().getBoolean(1))
  }

  test("SQL TVF ann_create_index builds, registers, and is queryable end-to-end") {
    import spark.implicits._
    // write a parquet table, create the index purely through SQL, scan it
    val tablePath = s"$tmp/sql_ci.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(tablePath)
    AnnSql.register(spark)
    val row = spark.sql(
      s"""SELECT * FROM ann_create_index('sql_ci', '$tablePath', 'id', 'embedding',
         |  'IVF', 'metric=l2,nlist=4,nprobe=4,quantization=pq,pq_m=3,pq_ksub=64',
         |  '$tmp/sql_ci_idx')""".stripMargin).head()
    assert(row.getString(0) == "sql_ci" && row.getString(1) == "IVF")
    assert(row.getLong(2) == 100 && row.getInt(3) == 3)
    // PQ params survived the CSV: the stored column is codes
    assert(AnnIndexManager.load(spark, s"$tmp/sql_ci_idx").meta.quantized)
    val hits = spark.sql(
      "SELECT * FROM ann_index_scan('sql_ci', array(0.5, 0.5, 0.5), 5)").collect()
    assert(hits.length == 5)
    // malformed params fail with guidance, not a silent default
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM ann_create_index('bad', '$tablePath', 'id', 'embedding', 'FLAT', 'metric')"))
    assert(e.getMessage.contains("key=value"))
    spark.sql("SELECT * FROM ann_drop_index('sql_ci')").collect()
  }

  test("SQL maintenance verbs: insert (online), delete, compact, vacuum") {
    import spark.implicits._
    AnnSql.register(spark)
    val tablePath = s"$tmp/sql_maint.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(tablePath)
    spark.sql(
      s"""SELECT * FROM ann_create_index('sql_mt', '$tablePath', 'id', 'embedding',
         |  'DISKANN', 'metric=l2,max_degree=16,build_complexity=32,shards=2',
         |  '$tmp/sql_mt_idx')""".stripMargin).collect()

    // insert through SQL, online path engaged via the session conf —
    // column names default to the index's create-time columns
    val extraPath = s"$tmp/sql_maint_extra.parquet"
    Seq.tabulate(10)(i => (500L + i, Array.fill(3)(0.9f)))
      .toDF("id", "embedding").write.mode("overwrite").parquet(extraPath)
    spark.conf.set("spark.ann.onlineInsertMaxRows", "100")
    try {
      val ins = spark.sql(s"SELECT * FROM ann_insert('sql_mt', '$extraPath')").head()
      assert(ins.getLong(1) == 10 && ins.getLong(2) == 110)
      assert(ins.getInt(3) == 2, "online path must not open a delta shard")
    } finally spark.conf.unset("spark.ann.onlineInsertMaxRows")
    assert(spark.sql(
      "SELECT * FROM ann_index_scan('sql_mt', array(0.9, 0.9, 0.9), 1, 100000)")
      .head().getLong(0) >= 500L)

    // delete through SQL: tombstoned ids vanish from scans
    val del = spark.sql("SELECT * FROM ann_delete('sql_mt', '500, 501')").head()
    assert(del.getLong(1) == 2 && del.getLong(2) == 2)
    val ids = spark.sql(
      "SELECT * FROM ann_index_scan('sql_mt', array(0.9, 0.9, 0.9), 200, 100000)")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(500L) && !ids.contains(501L) && ids.contains(502L))

    // compact through SQL: TWO delta-path inserts first (cap unset), so
    // two 5-row shards sit under min_rows=20 regardless of how the hash
    // split the ~50/50 base shards (a threshold of 50 would ride the
    // knife edge of that split)
    for (batch <- 0 until 2) {
      val extra2 = s"$tmp/sql_maint_extra2_$batch.parquet"
      Seq.tabulate(5)(i => (600L + batch * 10 + i, Array.fill(3)(0.1f)))
        .toDF("id", "embedding").write.mode("overwrite").parquet(extra2)
      spark.sql(s"SELECT * FROM ann_insert('sql_mt', '$extra2')").collect()
    }
    val comp = spark.sql("SELECT * FROM ann_compact('sql_mt', 20)").head()
    assert(comp.getLong(1) >= 2, "compact must fold the undersized delta shards")

    // refresh stats through SQL: the exact recount — the two tombstoned
    // rows still physically sit in base shards compact never folded, so
    // the bound stays exactly 2 (vacuum below is what zeroes it)
    val ref = spark.sql("SELECT * FROM ann_refresh_stats('sql_mt')").head()
    assert(ref.getLong(2) == 2, s"recount read num_deleted=${ref.getLong(2)}")

    // gc through SQL: plant a fake orphan dir (a crashed writer's
    // leftover at an unmanifested shard id), verify it is reclaimed
    val orphan = java.nio.file.Paths.get(s"$tmp/sql_mt_idx/data/shard=9999")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk"), Array[Byte](1))
    val gc = spark.sql("SELECT * FROM ann_gc('sql_mt')").head()
    assert(gc.getLong(1) >= 1 && !java.nio.file.Files.exists(orphan))

    // vacuum through SQL: tombstones gone for good
    val vac = spark.sql("SELECT * FROM ann_vacuum('sql_mt')").head()
    assert(vac.getLong(1) == 118 && vac.getLong(2) == 0) // 100+10+2x5-2
    spark.sql("SELECT * FROM ann_drop_index('sql_mt')").collect()

    // rebalance through SQL (IVF-only op): a skewed 2-cell index splits
    val rebPath = s"$tmp/sql_reb.parquet"
    Seq.tabulate(90)(i => (i.toLong, Array(0.01f * i, 0f, 0f)))
      .++(Seq.tabulate(10)(i => ((200 + i).toLong, Array(10f + 0.01f * i, 10f, 10f))))
      .toDF("id", "embedding").write.mode("overwrite").parquet(rebPath)
    spark.sql(
      s"""SELECT * FROM ann_create_index('sql_reb', '$rebPath', 'id',
         |  'embedding', 'IVF', 'metric=l2,nlist=2,nprobe=2', '$tmp/sql_reb_idx')"""
        .stripMargin).collect()
    val reb = spark.sql("SELECT * FROM ann_rebalance('sql_reb', 1.2)").head()
    assert(reb.getLong(1) >= 1, "the 90/10 skew must split at factor 1.2")
    spark.sql("SELECT * FROM ann_drop_index('sql_reb')").collect()
  }

  test("SQL TVF ann_create_index accepts a quoted factory description") {
    import spark.implicits._
    val tablePath = s"$tmp/sql_fact.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(tablePath)
    AnnSql.register(spark)
    // ''…'' escapes the quotes into the params CSV, which keeps the
    // factory string's inner comma intact: description='IVF4,PQ3'
    val row = spark.sql(
      s"""SELECT * FROM ann_create_index('sql_fact', '$tablePath', 'id',
         |  'embedding', 'FLAT', 'description=''IVF4,PQ3'',nprobe=4',
         |  '$tmp/sql_fact_idx')""".stripMargin).head()
    assert(row.getString(1) == "IVF")
    val idx = AnnIndexManager.load(spark, s"$tmp/sql_fact_idx")
    assert(idx.meta.quantized && idx.meta.param("pq_m", 0) == 3)
    assert(spark.sql(
      "SELECT * FROM ann_index_scan('sql_fact', array(0.5, 0.5, 0.5), 5)")
      .count() == 5)
    spark.sql("SELECT * FROM ann_drop_index('sql_fact')").collect()
  }

  test("params CSV: quoted values keep inner commas (factory descriptions)") {
    assert(AnnSql.parseParamsCsv("description='IVF16,PQ8',metric=l2") ==
      Map("description" -> "IVF16,PQ8", "metric" -> "l2"))
    // '' inside quotes is a literal quote; unquoted path unchanged
    assert(AnnSql.parseParamsCsv("a='x''y',b=2") == Map("a" -> "x'y", "b" -> "2"))
    assert(AnnSql.parseParamsCsv("metric=l2, nlist=4") ==
      Map("metric" -> "l2", "nlist" -> "4"))
    assert(AnnSql.parseParamsCsv("") == Map.empty[String, String])
    intercept[IllegalArgumentException](AnnSql.parseParamsCsv("a='open"))
  }

  test("SQL TVF diskann_streaming_build builds an index from a binary file") {
    val bin = s"$tmp/sql_sb.bin"
    val rnd = new scala.util.Random(3)
    graft.sources.BinaryVectorSource.write(bin,
      Seq.tabulate(64)(_ => Array.fill(4)(rnd.nextFloat())))
    AnnSql.register(spark)
    val row = spark.sql(
      s"SELECT * FROM diskann_streaming_build('$bin', '$tmp/sql_sb_idx', 'sql_sb_idx')")
      .head()
    assert(row.getLong(0) == 64 && row.getInt(1) == 4)
    // the built index is immediately queryable through the SQL surface
    val hits = spark.sql(
      "SELECT * FROM ann_index_scan('sql_sb_idx', array(0.5, 0.5, 0.5, 0.5), 3)").collect()
    assert(hits.length == 3)
  }

  test("SQL TVF ann_routing_info exposes coverage counts and probe width") {
    import spark.implicits._
    idx // ensure the FLAT 'sql_idx' fixture exists (used below)
    val tablePath = s"$tmp/sql_ri.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(tablePath)
    AnnSql.register(spark)
    spark.sql(
      s"""SELECT * FROM ann_create_index('sql_ri', '$tablePath', 'id',
         |  'embedding', 'DISKANN',
         |  'metric=l2,shards=2,shard_assign=spatial', '$tmp/sql_ri_idx')"""
        .stripMargin).collect()
    def info() = spark.sql(
      """SELECT covered, live_shards, summarized_shards, probe_width
        |FROM ann_routing_info('sql_ri')""".stripMargin).head()
    // spatial create maintains full coverage; probes off by default
    val r0 = info()
    assert(r0.getBoolean(0) && r0.getInt(1) == 2 && r0.getInt(2) == 2 &&
      r0.getInt(3) == 0)
    // probe_width echoes the live session conf
    spark.conf.set("spark.ann.shardProbes", "3")
    try assert(info().getInt(3) == 3)
    finally spark.conf.unset("spark.ann.shardProbes")
    // simulate a crash between the shard publish and the summary merge:
    // the counts now show HOW stale the index is, not just that it is
    // (routingStatus reads summaries.bin fresh — no driver-cache hazard)
    graft.index.ShardSummaries.delete(s"$tmp/sql_ri_idx")
    val r1 = info()
    assert(!r1.getBoolean(0) && r1.getInt(1) == 2 && r1.getInt(2) == 0)
    // repair restores coverage and the counts re-converge
    spark.sql("SELECT * FROM ann_refresh_stats('sql_ri')").collect()
    val r2 = info()
    assert(r2.getBoolean(0) && r2.getInt(2) == 2)
    // non-graph engines: routing not applicable — counts are zero
    val flatInfo = spark.sql(
      """SELECT covered, live_shards, summarized_shards
        |FROM ann_routing_info('sql_idx')""".stripMargin).head()
    assert(!flatInfo.getBoolean(0) && flatInfo.getInt(1) == 0 &&
      flatInfo.getInt(2) == 0)
    spark.sql("SELECT * FROM ann_drop_index('sql_ri')").collect()
  }

  test("SQL TVF ann_routing_info surfaces the coarse-router lifecycle") {
    import spark.implicits._
    AnnSql.register(spark)
    val tablePath = s"$tmp/sql_rs.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(tablePath)
    spark.sql(
      s"""SELECT * FROM ann_create_index('sql_rs', '$tablePath', 'id',
         |  'embedding', 'DISKANN',
         |  'metric=l2,shards=2,shard_assign=spatial', '$tmp/sql_rs_idx')"""
        .stripMargin).collect()
    def state() = spark.sql(
      """SELECT router_state, coarse_nodes, coarse_live, router_bin
        |FROM ann_routing_info('sql_rs')""".stripMargin).head()
    // fresh index, no routed search yet: nothing cached, nothing persisted
    val s0 = state()
    assert(s0.getString(0) == "none" && s0.getInt(1) == 0 &&
      s0.getString(3) == "absent", s"fresh: $s0")
    // one routed scan caches a router; 2 shards is far below the coarse
    // floor, so it is flat (no centroid graph, no router.bin)
    spark.conf.set("spark.ann.shardProbes", "1")
    try spark.sql(
      "SELECT * FROM ann_index_scan('sql_rs', array(0.5, 0.5, 0.5), 3)")
      .collect()
    finally spark.conf.unset("spark.ann.shardProbes")
    val s1 = state()
    assert(s1.getString(0) == "flat" && s1.getInt(1) == 0 &&
      s1.getInt(2) == 0 && s1.getString(3) == "absent", s"post-scan: $s1")
    // a shard-set mutation bumps the summaries version: the cached router
    // reads STALE until the next routed search reconciles it (a tombstone
    // delete alone leaves the shard set — and the router — untouched)
    spark.sql("SELECT * FROM ann_delete('sql_rs', '1')").collect()
    assert(state().getString(0) == "flat", "tombstones must not churn the router")
    val extraPath = s"$tmp/sql_rs_extra.parquet"
    (2000 until 2010).map(i => (i.toLong, Seq(0.9f, 0.1f, 0.5f)))
      .toDF("id", "embedding").write.mode("overwrite").parquet(extraPath)
    spark.sql(s"SELECT * FROM ann_insert('sql_rs', '$extraPath')").collect()
    assert(state().getString(0) == "stale")
    spark.conf.set("spark.ann.shardProbes", "1")
    try spark.sql(
      "SELECT * FROM ann_index_scan('sql_rs', array(0.5, 0.5, 0.5), 3)")
      .collect()
    finally spark.conf.unset("spark.ann.shardProbes")
    assert(state().getString(0) == "flat")
    spark.sql("SELECT * FROM ann_drop_index('sql_rs')").collect()
  }
}
