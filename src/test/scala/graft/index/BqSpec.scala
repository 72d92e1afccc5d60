package graft.index

import graft.SparkSpec
import graft.functions.{Bq, BqCodec, BqDistance, VectorKernels}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.{col, lit}

import java.nio.file.Files

class BqSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_bq_spec").toString

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  private def naiveHamming(a: Array[Float], b: Array[Float]): Int =
    a.indices.count(i => (a(i) > 0f) != (b(i) > 0f))

  test("kernel: packing geometry, padding bits, hamming vs naive") {
    assert(Bq.numBytes(8) == 1 && Bq.numBytes(9) == 2 && Bq.numBytes(64) == 8)
    val v = Array(1f, -1f, 0f, 2f, -0.5f) // dim 5 → 3 padding bits
    val c = Bq.encode(v)
    assert(c.length == 1)
    assert((c(0) & 0xff) == 0x09, "bits 0 and 3 set (zeros pack as 0)")
    // decode: unit vector of the stored signs (zero packed as negative)
    val d = Bq.decode(c, 5)
    val s = (1.0 / math.sqrt(5.0)).toFloat
    assert(d.toSeq == Seq(s, -s, -s, s, -s))
    assert(math.abs(VectorKernels.dot(d, d) - 1.0) < 1e-6, "decode is unit-norm")
    // hamming on packed codes equals the per-dim sign disagreement count
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 20; dim <- Seq(5, 8, 64, 130)) {
      val a = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val b = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      assert(Bq.hamming(Bq.encode(a), Bq.encode(b)) == naiveHamming(a, b),
        s"dim $dim")
    }
    // NaN packs as 0 deterministically
    assert((Bq.encode(Array(Float.NaN, 1f))(0) & 0xff) == 0x02)
  }

  test("cosineDistanceEstimate: endpoints and monotonicity on the _distance scale") {
    assert(Bq.cosineDistanceEstimate(0, 64) == 0.0)
    assert(math.abs(Bq.cosineDistanceEstimate(64, 64) - 2.0) < 1e-12)
    val ds = (0 to 64).map(Bq.cosineDistanceEstimate(_, 64))
    assert(ds.zip(ds.tail).forall { case (a, b) => a < b }, "strictly increasing in h")
  }

  test("BqDistance: constant-query and column-query codegen paths agree with the kernel") {
    import spark.implicits._
    val dim = 37 // deliberately not byte-aligned
    val vecs = randVecs(60, dim, seed = 7)
    val q = vecs(13)._2
    val df = vecs.map { case (id, v) => (id, Bq.encode(v)) }.toDF("id", "codes")
    for (metric <- Seq("cosine", "hamming")) {
      val gotConst = df.select(col("id"), GraftBridge.column(BqDistance(
        GraftBridge.expression(col("codes")),
        GraftBridge.expression(lit(q)), dim, metric)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val gotCol = df.withColumn("q", lit(q))
        .select(col("id"), GraftBridge.column(BqDistance(
          GraftBridge.expression(col("codes")),
          GraftBridge.expression(col("q")), dim, metric)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, v) <- vecs) {
        val h = naiveHamming(v, q)
        val expect = if (metric == "hamming") h.toDouble
                     else Bq.cosineDistanceEstimate(h, dim)
        assert(gotConst(id) == expect, s"$metric const for id $id")
        assert(gotCol(id) == gotConst(id), s"$metric paths must agree (id $id)")
      }
    }
  }

  test("BqDistance: a null query ELEMENT yields a null distance (both paths)") {
    import spark.implicits._
    val codes = Bq.encode(Array(1f, -1f, 1f, -1f))
    val df = Seq(
      (codes, Seq[java.lang.Float](0.5f, null, 0.5f, 0.5f)),
      (codes, Seq[java.lang.Float](0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("codes", "q")
    val rows = df.select(GraftBridge.column(BqDistance(
      GraftBridge.expression(col("codes")),
      GraftBridge.expression(col("q")), 4, "cosine")).as("d")).collect()
    assert(rows(0).isNullAt(0), "null element must propagate")
    assert(!rows(1).isNullAt(0))
    val cRows = df.select(GraftBridge.column(BqDistance(
      GraftBridge.expression(col("codes")),
      GraftBridge.expression(lit(null).cast("array<float>")), 4, "cosine")).as("d"))
      .collect()
    assert(cRows.forall(_.isNullAt(0)), "constant null query is constantly null")
  }

  test("create: bq requires the cosine metric (fail fast, never mis-rank)") {
    import spark.implicits._
    val df = randVecs(10, 8, seed = 1).toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      AnnIndexManager.create(spark, "bq_l2", df, "id", "embedding", "FLAT",
        Map("metric" -> "l2", "quantization" -> "bq"), s"$tmp/bq_l2")
    }
    assert(e.getMessage.contains("cosine"))
  }

  test("BQ FLAT index: 32x storage, Hamming ordering, self-query at distance 0") {
    import spark.implicits._
    val vecs = randVecs(200, 64, seed = 11)
    val idx = AnnIndexManager.create(spark, "bq_flat", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_flat")
    assert(idx.meta.quantized && idx.dataVecCol == "codes")
    assert(idx.codec.contains(BqCodec(64)))
    // 8 bytes/vector stored (64 dims / 8) + id/label overhead — the
    // accounting reflects the 32x vector-storage reduction
    assert(idx.meta.memoryBytes == 200L * (8 + 8 + 4))
    val q = vecs(9)._2
    val got = idx.scan(q, 5).collect()
    assert(got.head.getLong(0) == 9L, "self-query has hamming 0 → distance 0")
    assert(got.head.getDouble(1) == 0.0)
    // scan ordering IS hamming ordering (monotone transform)
    val hs = got.map(r => naiveHamming(vecs(r.getLong(0).toInt)._2, q))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
  }

  test("BQ + exact rerank: exhaustive oversample recovers the exact cosine top-k") {
    import spark.implicits._
    val vecs = randVecs(200, 64, seed = 19)
    val df = vecs.toDF("id", "embedding")
    val idx = AnnIndexManager.create(spark, "bq_rr", df, "id", "embedding",
      "FLAT", Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_rr")
    val q = vecs(77)._2
    def cosDist(v: Array[Float]): Double =
      1.0 - VectorKernels.dot(q, v) /
        (math.sqrt(VectorKernels.dot(q, q)) * math.sqrt(VectorKernels.dot(v, v)))
    val exact = vecs.map { case (id, v) => (id, cosDist(v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    // oversample 20 → k*oversample = 200 = full corpus → provably exact
    val got = idx.search(df, "id", q, 10, oversample = 20, rerank = true)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == exact, "exhaustive-oversample rerank must equal brute force")
    // moderate oversample: hamming candidates + refine keep decent recall
    val rr = idx.search(df, "id", q, 10, oversample = 4, rerank = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rr.intersect(exact.toSet).size >= 7,
      s"BQ rerank recall ${rr.intersect(exact.toSet).size}/10 below floor")
  }

  test("BqCodesDistance: codes-vs-codes agrees with codes-vs-float on every pair") {
    import spark.implicits._
    val dim = 37
    val vecs = randVecs(40, dim, seed = 29)
    val q = vecs(7)._2
    val df = vecs.map { case (id, v) => (id, Bq.encode(v)) }.toDF("id", "codes")
      .withColumn("qbits", lit(Bq.encode(q)))
    for (metric <- Seq("cosine", "hamming")) {
      val viaCodes = df.select(col("id"), GraftBridge.column(
        graft.functions.BqCodesDistance(
          GraftBridge.expression(col("codes")),
          GraftBridge.expression(col("qbits")), dim, metric)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaFloat = df.select(col("id"), GraftBridge.column(BqDistance(
        GraftBridge.expression(col("codes")),
        GraftBridge.expression(lit(q)), dim, metric)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, _) <- vecs)
        assert(viaCodes(id) == viaFloat(id), s"$metric mismatch for id $id")
    }
  }

  test("searchBatch on a bq index (popcount fast path) equals per-query scans") {
    import spark.implicits._
    val vecs = randVecs(150, 64, seed = 43)
    val idx = AnnIndexManager.create(spark, "bq_batch", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_batch")
    val qs = Seq(vecs(3)._2, vecs(88)._2, Array.fill(64)(0.5f))
    val batch = idx.searchBatch(qs, 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._2)).map(_._2).toSeq).toMap
    for ((q, i) <- qs.zipWithIndex) {
      val single = idx.scan(q, 5).collect().map(_.getLong(0)).toSeq
      assert(batch(i) == single, s"query $i: batch ${batch(i)} vs scan $single")
    }
  }

  test("BQ DISKANN: edges build on exact floats, shards decode sign vectors") {
    import spark.implicits._
    val vecs = randVecs(300, 64, seed = 47)
    val idx = AnnIndexManager.create(spark, "bq_vam", vecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "cosine", "max_degree" -> "32", "build_complexity" -> "64",
        "quantization" -> "bq", "shards" -> "2"), s"$tmp/bq_vam")
    assert(idx.meta.quantized && idx.codec.contains(BqCodec(64)))
    val q = vecs(42)._2
    // exhaustive beam over the decoded shards: ranking is by cosine of the
    // ±1/sqrt(d) sign reconstructions — monotone in Hamming, so the query's
    // own sign pattern (hamming 0) must surface
    val got = idx.scan(q, 5, searchParam = 100000).collect().map(_.getLong(0)).toSeq
    assert(got.size == 5)
    assert(got.contains(42L), s"self sign-pattern missing from $got")
    val exact = vecs.map { case (id, v) =>
      val d = 1.0 - VectorKernels.dot(q, v) /
        (math.sqrt(VectorKernels.dot(q, q)) * math.sqrt(VectorKernels.dot(v, v)))
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    assert(got.toSet.intersect(exact).size >= 2,
      s"bq graph overlap ${got.toSet.intersect(exact).size}/5")
  }

  test("searchTable on bq indexes (FLAT and IVF branches) matches per-query scans") {
    import spark.implicits._
    val vecs = randVecs(150, 64, seed = 67)
    val df = vecs.toDF("id", "embedding")
    val queries = Seq((100L, vecs(5)._2), (101L, vecs(60)._2)).toDF("qid", "qvec")
    def viaTable(idx: AnnIndex, np: Int): Map[Long, Seq[Long]] =
      graft.operators.AnnSearch.searchTable(idx, queries, 5, nprobe = np,
        queryVecCol = Some("qvec"), queryIdCol = Some("qid"))
        .select("qid", "id", "_distance").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._2)).map(_._2).toSeq).toMap
    val flat = AnnIndexManager.create(spark, "bq_st_flat", df, "id", "embedding",
      "FLAT", Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_st_flat")
    val ivf = AnnIndexManager.create(spark, "bq_st_ivf", df, "id", "embedding",
      "IVF", Map("metric" -> "cosine", "quantization" -> "bq",
        "nlist" -> "4", "nprobe" -> "4"), s"$tmp/bq_st_ivf")
    for ((idx, np) <- Seq((flat, -1), (ivf, 4))) {
      val got = viaTable(idx, np)
      for ((qid, q) <- Seq((100L, vecs(5)._2), (101L, vecs(60)._2))) {
        val single = idx.scan(q, 5, searchParam = np).collect().map(_.getLong(0)).toSeq
        assert(got(qid) == single,
          s"${idx.meta.engine} query $qid: ${got(qid)} vs $single")
      }
    }
  }

  test("BQ survives delete and vacuum (decode -> re-encode keeps every sign)") {
    import spark.implicits._
    val vecs = randVecs(120, 64, seed = 53)
    val idx = AnnIndexManager.create(spark, "bq_vac", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_vac")
    val q = vecs(30)._2
    val before = idx.scan(q, 120).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    idx.delete(Seq(30L, 31L))
    assert(!idx.scan(q, 5).collect().map(_.getLong(0)).contains(30L))
    idx.vacuum() // rewrites the dataset via decode -> re-encode
    assert(idx.meta.numVectors == 118 && idx.meta.numDeleted == 0)
    val after = idx.scan(q, 118).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after.keySet == before.keySet -- Set(30L, 31L))
    // sign packing is idempotent, so every surviving distance is unchanged
    assert(after.forall { case (id, d) => d == before(id) })
  }

  test("BQ edges: dim-1 vectors, k > n, and duplicate sign patterns") {
    import spark.implicits._
    val oneD = Seq((1L, Array(0.5f)), (2L, Array(-0.5f)), (3L, Array(0.9f)))
    val idx = AnnIndexManager.create(spark, "bq_edge", oneD.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_edge")
    // k > n returns all rows; ids 1 and 3 share the positive sign pattern
    // (hamming 0 to a positive query), id 2 is the full flip (distance 2)
    val got = idx.scan(Array(1f), 10).collect()
    assert(got.length == 3)
    assert(got.take(2).map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(got.take(2).forall(_.getDouble(1) == 0.0))
    assert(got(2).getLong(0) == 2L && math.abs(got(2).getDouble(1) - 2.0) < 1e-12)
  }

  test("BQ persistence round-trip and insert path") {
    import spark.implicits._
    val reloaded = AnnIndexManager.load(spark, s"$tmp/bq_flat")
    assert(reloaded.codec.contains(BqCodec(64)))
    val extra = Seq((500L, Array.fill(64)(0.3f)))
    reloaded.insert(extra.toDF("id", "embedding"), "id", "embedding")
    assert(reloaded.meta.numVectors == 201)
    // the inserted all-positive vector is its own sign pattern's nearest
    val got = reloaded.scan(extra.head._2, 1).collect()
    assert(got.head.getLong(0) == 500L && got.head.getDouble(1) == 0.0)
  }
}
