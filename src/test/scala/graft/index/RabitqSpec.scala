package graft.index

import graft.SparkSpec
import graft.functions.{Bq, Rabitq, RabitqCodec, RabitqDistance, VectorKernels}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.{col, lit}

import java.nio.file.Files

class RabitqSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_rabitq_spec").toString

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  private def norm(v: Array[Float]): Double = math.sqrt(VectorKernels.dot(v, v))
  private def cos(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.dot(a, b) / (norm(a) * norm(b))

  /** Reference estimator: the expression's math in plain Scala. */
  private def refDistance(codes: Array[Byte], q: Array[Float], dim: Int,
                          seed: Long, metric: String): Double = {
    val nb = (dim + 7) / 8
    val qrot = Rabitq.rotate(q, dim, seed)
    var s1 = 0.0; var sumQ = 0.0; var qq = 0.0
    var i = 0
    while (i < dim) {
      sumQ += qrot(i).toDouble; qq += qrot(i).toDouble * qrot(i).toDouble
      if (((codes(i >> 3) >> (i & 7)) & 1) == 1) s1 += qrot(i).toDouble
      i += 1
    }
    val r = Rabitq.getFloatLE(codes, nb).toDouble
    val cf = Rabitq.getFloatLE(codes, nb + 4).toDouble
    val est = if (cf > 0.0) (2.0 * s1 - sumQ) / math.sqrt(dim.toDouble) / cf else 0.0
    metric match {
      case "l2"     => r * r + qq - 2.0 * r * est
      case "ip"     => -(r * est)
      case "cosine" => 1.0 - est
    }
  }

  test("rotation: orthonormal, deterministic per (dim, seed), distinct per seed") {
    for (dim <- Seq(5, 16, 64)) {
      val p = Rabitq.rotation(dim, 42L)
      // Pᵀ·P = I within float precision
      for (a <- 0 until dim; b <- a until dim) {
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += p(a * dim + k).toDouble * p(b * dim + k).toDouble; k += 1 }
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-5, s"dim=$dim row $a · row $b = $dot")
      }
    }
    assert(Rabitq.rotation(16, 42L).toSeq == Rabitq.rotation(16, 42L).toSeq)
    assert(Rabitq.rotation(16, 42L).toSeq != Rabitq.rotation(16, 43L).toSeq)
    // rotate/rotateBack are inverses
    val v = randVecs(1, 33, 5).head._2
    val back = Rabitq.rotateBack(Rabitq.rotate(v, 33, 7L), 33, 7L)
    v.indices.foreach(i => assert(math.abs(back(i) - v(i)) < 1e-4))
  }

  test("encode geometry: trailers carry (r, cf); decode cosine EQUALS cf; zero vector") {
    val dim = 48
    val v = randVecs(1, dim, 11).head._2
    val c = Rabitq.encode(v, 42L)
    assert(c.length == Rabitq.numBytes(dim) && Rabitq.numBytes(dim) == dim / 8 + 8)
    val nb = dim / 8
    val r = Rabitq.getFloatLE(c, nb)
    val cf = Rabitq.getFloatLE(c, nb + 4)
    assert(math.abs(r - norm(v)) < 1e-4, "r trailer is the vector norm")
    assert(cf > 0f && cf <= 1f, s"cf=$cf must be in (0,1]")
    val dec = Rabitq.decode(c, dim, 42L)
    assert(math.abs(norm(dec) - r) < 1e-3, "decode preserves the stored norm")
    // cos(v, decode) = ⟨o', x̄⟩ = cf by construction — the correction factor
    // IS the reconstruction quality
    assert(math.abs(cos(v, dec) - cf) < 1e-4,
      s"cos(v, decode)=${cos(v, dec)} != cf=$cf")
    // zero vector: zeroed bits + r=0 + cf=0; decode returns the zero vector
    val z = Rabitq.encode(new Array[Float](dim), 42L)
    assert(z.forall(_ == 0) && Rabitq.decode(z, dim, 42L).forall(_ == 0f))
  }

  test("estimator: consistent for ⟨o,q⟩ with O(1/√d) error; self-query is exact") {
    val dim = 128
    val rnd = new scala.util.Random(3)
    val pairs = Seq.fill(200)((
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f),
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val errs = pairs.map { case (v, q) =>
      val c = Rabitq.encode(v, 42L)
      // ip distance = -(r·est) → est of ⟨o,q⟩ = -dist/r
      val est = -refDistance(c, q, dim, 42L, "ip") / norm(v)
      val truth = VectorKernels.dot(v, q) / norm(v)
      est - truth
    }
    val bias = errs.sum / errs.size
    val mae = errs.map(math.abs).sum / errs.size
    // RaBitQ Thm 3.2: error concentrates at O(1/√d); for d=128 and ‖q‖~√(d/3)
    // the absolute ⟨o,q⟩ error stays well under ‖q‖·0.2
    assert(math.abs(bias) < 0.05, s"estimator bias $bias — should be ~unbiased")
    assert(mae < 0.6, s"estimator MAE $mae too large for d=$dim")
    // self query: qrot = r·o' → dotRaw = r·cf → est = r exactly → l2 dist 0
    val v = pairs.head._1
    val d0 = refDistance(Rabitq.encode(v, 42L), v, dim, 42L, "l2")
    assert(math.abs(d0) < 1e-3, s"self-query l2 distance $d0 != 0")
  }

  test("RabitqDistance: const-query LUT, column, and preRotated codegen paths agree") {
    import spark.implicits._
    val dim = 37 // deliberately not byte-aligned
    val seed = 42L
    val vecs = randVecs(60, dim, seed = 7)
    val q = vecs(13)._2
    val df = vecs.map { case (id, v) => (id, Rabitq.encode(v, seed)) }.toDF("id", "codes")
    for (metric <- Seq("l2", "ip", "cosine")) {
      val gotConst = df.select(col("id"), GraftBridge.column(RabitqDistance(
        GraftBridge.expression(col("codes")),
        GraftBridge.expression(lit(q)), dim, seed, metric)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val gotCol = df.withColumn("q", lit(q))
        .select(col("id"), GraftBridge.column(RabitqDistance(
          GraftBridge.expression(col("codes")),
          GraftBridge.expression(col("q")), dim, seed, metric)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val qrot = Rabitq.rotate(q, dim, seed)
      val gotPre = df.withColumn("qrot", lit(qrot))
        .select(col("id"), GraftBridge.column(RabitqDistance(
          GraftBridge.expression(col("codes")),
          GraftBridge.expression(col("qrot")), dim, seed, metric,
          preRotated = true)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // 1e-6 tolerance: the LUT path associates the qrot sum per byte, the
      // column paths per dim — double rounding differs in association order
      for ((id, v) <- vecs) {
        val expect = refDistance(Rabitq.encode(v, seed), q, dim, seed, metric)
        assert(math.abs(gotConst(id) - expect) < 1e-6, s"$metric const id $id")
        assert(math.abs(gotCol(id) - gotConst(id)) < 1e-6, s"$metric col id $id")
        assert(math.abs(gotPre(id) - gotConst(id)) < 1e-6, s"$metric pre id $id")
      }
    }
  }

  test("RabitqDistance: a null query ELEMENT yields a null distance (both paths)") {
    import spark.implicits._
    val codes = Rabitq.encode(Array(1f, -1f, 1f, -1f), 42L)
    val df = Seq(
      (codes, Seq[java.lang.Float](0.5f, null, 0.5f, 0.5f)),
      (codes, Seq[java.lang.Float](0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("codes", "q")
    val rows = df.select(GraftBridge.column(RabitqDistance(
      GraftBridge.expression(col("codes")),
      GraftBridge.expression(col("q")), 4, 42L, "l2")).as("d")).collect()
    assert(rows(0).isNullAt(0), "null element must propagate")
    assert(!rows(1).isNullAt(0))
    val cRows = df.select(GraftBridge.column(RabitqDistance(
      GraftBridge.expression(col("codes")),
      GraftBridge.expression(lit(null).cast("array<float>")), 4, 42L, "l2")).as("d"))
      .collect()
    assert(cRows.forall(_.isNullAt(0)), "constant null query is constantly null")
  }

  test("headline: raw top-k recall beats naive BQ at the same ~1 bit/dim budget") {
    import spark.implicits._
    val dim = 64
    val n = 400
    // CLUSTERED fixture (docs per centroid + bounded noise — the structure
    // retrieval corpora have): on SMOOTH uniform data the top-score
    // spectrum is denser than ANY sub-bit estimator's noise, so raw 1-bit
    // recall reads as chance for rabitq AND bq alike — data property, not
    // operator (same lesson as the staged-MaxSim fixtures in SCALE.md)
    val rnd = new scala.util.Random(23)
    val centroids = Seq.fill(40)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val vecs = Seq.tabulate(n) { i =>
      val c = centroids(i % 40)
      (i.toLong, Array.tabulate(dim)(j => c(j) + (rnd.nextFloat() - 0.5f) * 0.5f))
    }
    val df = vecs.toDF("id", "embedding")
    val rq = AnnIndexManager.create(spark, "rq_rec", df, "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "rabitq"), s"$tmp/rq_rec")
    val bq = AnnIndexManager.create(spark, "bq_rec", df, "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "bq"), s"$tmp/bq_rec")
    val qrnd = new scala.util.Random(99)
    // queries = perturbed centroids (in-distribution retrieval)
    val queries = Seq.tabulate(15) { i =>
      val c = centroids(qrnd.nextInt(40))
      Array.tabulate(dim)(j => c(j) + (qrnd.nextFloat() - 0.5f) * 0.5f)
    }
    val k = 10
    def recall(idx: AnnIndex): Double = {
      val hits = queries.map { q =>
        val exact = vecs.map { case (id, v) => (id, 1.0 - cos(q, v)) }
          .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
        val got = idx.scan(q, k).collect().map(_.getLong(0)).toSet
        got.intersect(exact).size.toDouble / k
      }
      hits.sum / hits.size
    }
    val (rr, br) = (recall(rq), recall(bq))
    assert(rr >= br,
      f"rabitq recall@$k $rr%.3f must be >= bq $br%.3f (same bit budget)")
    assert(rr >= 0.7, f"rabitq raw recall@$k $rr%.3f below floor (bq: $br%.3f)")
  }

  test("L2 metric: rabitq ranks un-normalized vectors (bq cannot); rerank is exact") {
    import spark.implicits._
    val dim = 32
    // mixed magnitudes: direction-only codes would mis-rank these badly
    val rnd = new scala.util.Random(31)
    val vecs = Seq.tabulate(200) { i =>
      val scale = if (i % 3 == 0) 0.1f else if (i % 3 == 1) 1f else 8f
      (i.toLong, Array.fill(dim)((rnd.nextFloat() * 2f - 1f) * scale))
    }
    val df = vecs.toDF("id", "embedding")
    val idx = AnnIndexManager.create(spark, "rq_l2", df, "id", "embedding", "FLAT",
      Map("metric" -> "l2", "quantization" -> "rabitq"), s"$tmp/rq_l2")
    val q = vecs(50)._2
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val exact = vecs.map { case (id, v) => (id, l2sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    // self-query estimate is exact → the query's own row must rank first
    assert(idx.scan(q, 1).collect().head.getLong(0) == 50L,
      "self-query must rank first (estimator exact at q = v)")
    // exhaustive oversample + rerank = provably exact (IndexRefineFlat)
    val got = idx.search(df, "id", q, 10, oversample = 20, rerank = true)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == exact, "exhaustive-oversample rerank must equal brute force")
    // moderate oversample keeps a recall floor on magnitude-mixed data
    val rr = idx.search(df, "id", q, 10, oversample = 4, rerank = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rr.intersect(exact.toSet).size >= 7,
      s"rabitq l2 rerank recall ${rr.intersect(exact.toSet).size}/10 below floor")
  }

  test("searchBatch (pre-rotated fast path) equals per-query scans") {
    import spark.implicits._
    val vecs = randVecs(150, 64, seed = 43)
    val idx = AnnIndexManager.create(spark, "rq_batch", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "rabitq"), s"$tmp/rq_batch")
    val qs = Seq(vecs(3)._2, vecs(88)._2, Array.fill(64)(0.5f))
    val batch = idx.searchBatch(qs, 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._2)).map(_._2).toSeq).toMap
    for ((q, i) <- qs.zipWithIndex) {
      val single = idx.scan(q, 5).collect().map(_.getLong(0)).toSeq
      assert(batch(i) == single, s"query $i: batch ${batch(i)} vs scan $single")
    }
  }

  test("searchTable on rabitq indexes (FLAT and IVF branches) matches per-query scans") {
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
    val flat = AnnIndexManager.create(spark, "rq_st_flat", df, "id", "embedding",
      "FLAT", Map("metric" -> "cosine", "quantization" -> "rabitq"), s"$tmp/rq_st_flat")
    val ivf = AnnIndexManager.create(spark, "rq_st_ivf", df, "id", "embedding",
      "IVF", Map("metric" -> "l2", "quantization" -> "rabitq",
        "nlist" -> "4", "nprobe" -> "4"), s"$tmp/rq_st_ivf")
    for ((idx, np) <- Seq((flat, -1), (ivf, 4))) {
      val got = viaTable(idx, np)
      for ((qid, q) <- Seq((100L, vecs(5)._2), (101L, vecs(60)._2))) {
        val single = idx.scan(q, 5, searchParam = np).collect().map(_.getLong(0)).toSeq
        assert(got(qid) == single,
          s"${idx.meta.engine} query $qid: ${got(qid)} vs $single")
      }
    }
  }

  test("DISKANN graph: edges on exact floats, shards decode rabitq reconstructions") {
    import spark.implicits._
    val vecs = randVecs(300, 64, seed = 47)
    val idx = AnnIndexManager.create(spark, "rq_vam", vecs.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "cosine", "max_degree" -> "32", "build_complexity" -> "64",
        "quantization" -> "rabitq", "shards" -> "2"), s"$tmp/rq_vam")
    assert(idx.meta.quantized && idx.codec.contains(RabitqCodec(64, 42L)))
    val q = vecs(42)._2
    val got = idx.scan(q, 5, searchParam = 100000).collect().map(_.getLong(0)).toSeq
    assert(got.size == 5)
    assert(got.contains(42L), s"self reconstruction missing from $got")
  }

  test("FLAT vacuum copies codes losslessly; persistence + insert round-trip") {
    import spark.implicits._
    val vecs = randVecs(120, 64, seed = 53)
    val idx = AnnIndexManager.create(spark, "rq_vac", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "rabitq"), s"$tmp/rq_vac")
    val q = vecs(30)._2
    val before = idx.scan(q, 120).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    idx.delete(Seq(30L, 31L))
    idx.vacuum()
    assert(idx.meta.numVectors == 118 && idx.meta.numDeleted == 0)
    val after = idx.scan(q, 118).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after.keySet == before.keySet -- Set(30L, 31L))
    assert(after.forall { case (id, d) => d == before(id) },
      "FLAT vacuum must preserve every rabitq distance bit-for-bit")
    // reload keeps geometry + seed; insert encodes with the pinned seed
    val reloaded = AnnIndexManager.load(spark, s"$tmp/rq_vac")
    assert(reloaded.codec.contains(RabitqCodec(64, 42L)))
    val extra = Seq((500L, Array.fill(64)(0.3f)))
    reloaded.insert(extra.toDF("id", "embedding"), "id", "embedding")
    assert(reloaded.meta.numVectors == 119)
    assert(reloaded.scan(extra.head._2, 1).collect().head.getLong(0) == 500L,
      "self-query of the inserted vector must rank first (estimator exact)")
  }

  test("memory accounting reflects 1 bit/dim + 8 trailer bytes") {
    import spark.implicits._
    val vecs = randVecs(100, 64, seed = 71)
    val idx = AnnIndexManager.create(spark, "rq_mem", vecs.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "rabitq"), s"$tmp/rq_mem")
    // 64/8 = 8 sign bytes + 8 trailer bytes + id/label overhead per row
    assert(idx.meta.memoryBytes == 100L * (8 + 8 + 8 + 4))
  }
}
