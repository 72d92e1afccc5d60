package graft.functions

import graft.SparkSpec
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._

import java.nio.file.Files

class Fp16Spec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_fp16_spec").toString

  test("half-bits round-trip exactly for every non-NaN pattern") {
    var h = 0
    while (h < 65536) {
      val f = Fp16.halfBitsToFloat(h)
      if (!f.isNaN) {
        val back = Fp16.floatToHalfBits(f) & 0xffff
        assert(back == h, f"bits 0x$h%04x -> $f -> 0x$back%04x")
      } else {
        assert(Fp16.halfBitsToFloat(Fp16.floatToHalfBits(f) & 0xffff).isNaN)
      }
      h += 1
    }
  }

  test("encode rounds to nearest-even within half-precision tolerance") {
    // exactly representable values survive unchanged
    for (f <- Seq(0f, -0f, 1f, -1f, 0.5f, 0.25f, 1.5f, 2048f, 65504f))
      assert(Fp16.halfBitsToFloat(Fp16.floatToHalfBits(f) & 0xffff) == f)
    // overflow → inf; deep underflow → zero
    assert(Fp16.halfBitsToFloat(Fp16.floatToHalfBits(100000f) & 0xffff).isPosInfinity)
    assert(Fp16.halfBitsToFloat(Fp16.floatToHalfBits(-100000f) & 0xffff).isNegInfinity)
    assert(Fp16.halfBitsToFloat(Fp16.floatToHalfBits(1e-9f) & 0xffff) == 0f)
    // random values: relative error bounded by the 11-bit mantissa
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 20000) {
      val f = (rnd.nextFloat() - 0.5f) * 20f
      val d = Fp16.halfBitsToFloat(Fp16.floatToHalfBits(f) & 0xffff)
      assert(math.abs(d - f) <= math.max(math.abs(f) * 4.9e-4, 6.0e-8).toFloat,
        s"$f -> $d")
    }
    // subnormal half range round-trips within an absolute half-ulp (2^-25)
    for (_ <- 1 to 2000) {
      val f = rnd.nextFloat() * 6.1e-5f
      val d = Fp16.halfBitsToFloat(Fp16.floatToHalfBits(f) & 0xffff)
      assert(math.abs(d - f) <= 3.0e-8, s"$f -> $d")
    }
  }

  test("byte packing round-trips vectors") {
    val rnd = new scala.util.Random(11)
    val v = Array.fill(33)(rnd.nextFloat() * 4f - 2f)
    val decoded = Fp16.decode(Fp16.encode(v))
    assert(decoded.length == 33)
    v.indices.foreach { i =>
      assert(math.abs(decoded(i) - v(i)) <= math.abs(v(i)) * 4.9e-4 + 1e-7)
    }
    // encode(decode(bytes)) is bit-stable (codec idempotence under rebuild)
    val bytes = Fp16.encode(v)
    assert(Fp16.encode(Fp16.decode(bytes)).toSeq == bytes.toSeq)
  }

  /** Vectors exactly representable in fp16 (multiples of 1/256 in [0,2)):
    * fp16 storage is then lossless and results must be bit-identical. */
  private def representable(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(21)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextInt(512) / 256.0f)))
  }

  test("fp16 FLAT and DISKANN indexes are exact on representable data") {
    import spark.implicits._
    val data = representable(200, 8)
    val df = data.toDF("id", "embedding")
    val f32 = AnnIndexManager.create(spark, "t_fp16_base", df, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/base")
    val f16 = AnnIndexManager.create(spark, "t_fp16_flat", df, "id", "embedding",
      "FLAT", Map("metric" -> "l2", "quantization" -> "fp16"), s"$tmp/flat16")
    val g16 = AnnIndexManager.create(spark, "t_fp16_graph", df, "id", "embedding",
      "DISKANN", Map("metric" -> "l2", "max_degree" -> "16",
        "build_complexity" -> "32", "shards" -> "2",
        "quantization" -> "fp16"), s"$tmp/graph16")

    val q = Array(0.5f, 1.0f, 0.25f, 0.75f, 1.5f, 0.125f, 1.25f, 0.375f)
    val exact = f32.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(f16.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == exact)
    assert(g16.scan(q, 10, searchParam = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == exact)

    // stored as packed BINARY, not floats; memory accounting is halved
    assert(f16.data.columns.contains("codes") && !f16.data.columns.contains("vector"))
    assert(f16.meta.quantized && f16.meta.memoryBytes < f32.meta.memoryBytes)
  }

  test("fp16 survives insert, delete, vacuum, and compactShards") {
    import spark.implicits._
    val data = representable(150, 8)
    val idx = AnnIndexManager.create(spark, "t_fp16_dml", data.toDF("id", "embedding"),
      "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "16", "build_complexity" -> "32",
        "shards" -> "2", "quantization" -> "fp16"), s"$tmp/dml16")
    val extra = Seq((500L, Array.fill(8)(1.0f)), (501L, Array.fill(8)(0.5f)))
    idx.insert(extra.toDF("id", "embedding"), "id", "embedding")
    idx.insert(Seq((502L, Array.fill(8)(0.25f))).toDF("id", "embedding"),
      "id", "embedding")
    idx.delete(Seq(500L))
    val q = Array.fill(8)(0.9f)
    def ids() = idx.scan(q, 200, searchParam = 100000).collect().map(_.getLong(0)).toSet
    val before = ids()
    assert(!before.contains(500L) && before.contains(501L) && before.contains(502L))
    assert(idx.compactShards(minRows = 40) == 2) // the two tiny delta shards
    assert(ids() == before)
    idx.vacuum()
    assert(ids() == before)
    assert(idx.data.columns.contains("codes"))
  }

  test("fp16 ip and cosine metrics match float-storage results on representable data") {
    import spark.implicits._
    val data = representable(120, 8)
    val df = data.toDF("id", "embedding")
    for (metric <- Seq("ip", "cosine")) {
      val f32 = AnnIndexManager.create(spark, s"t_fp16_m32_$metric", df, "id",
        "embedding", "FLAT", Map("metric" -> metric), s"$tmp/m32_$metric")
      val f16 = AnnIndexManager.create(spark, s"t_fp16_m16_$metric", df, "id",
        "embedding", "FLAT", Map("metric" -> metric, "quantization" -> "fp16"),
        s"$tmp/m16_$metric")
      val q = Array(1.0f, 0.5f, 0.25f, 0.75f, 0.125f, 1.5f, 0.375f, 1.0f)
      val a = f32.scan(q, 10).collect().map(_.getLong(0)).toSeq
      val b = f16.scan(q, 10).collect().map(_.getLong(0)).toSeq
      // cosine stores L2-normalized vectors — no longer exactly representable,
      // so allow near-tie reordering there; ip must match exactly
      if (metric == "ip") assert(a == b)
      else assert(a.toSet.intersect(b.toSet).size >= 9, s"$metric: $a vs $b")
    }
  }
}
