package graft.index

import graft.SparkSpec
import graft.functions.{Sq8, VectorKernels}

import java.nio.file.Files

class Sq8Spec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_sq8_spec").toString

  // F5 fixture shape: 10 rows of 0/0.25/0.5/1.0 combinations
  // (reference: diskann_quantization.test:8-19)
  private lazy val qvectors: Seq[(Long, Array[Float])] = Seq(
    (1L, Array(0f, 0f, 0f, 0f)), (2L, Array(1f, 1f, 1f, 1f)),
    (3L, Array(0.25f, 0.5f, 0.25f, 0.5f)), (4L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
    (5L, Array(1f, 0f, 1f, 0f)), (6L, Array(0f, 1f, 0f, 1f)),
    (7L, Array(0.25f, 0.25f, 0.25f, 0.25f)), (8L, Array(1f, 0.5f, 0f, 0.25f)),
    (9L, Array(0f, 0.25f, 0.5f, 1f)), (10L, Array(0.75f, 0.75f, 0.75f, 0.75f)))

  test("kernel: quantize/dequantize round-trip error bounded by scale/255") {
    val p = Sq8.QuantParams(Array(0f, 0f, 0f, 0f), Array(1f, 1f, 1f, 1f))
    for ((_, v) <- qvectors) {
      val rt = Sq8.dequantize(Sq8.quantize(v, p), p)
      v.zip(rt).foreach { case (a, b) => assert(math.abs(a - b) <= 0.5f / 255f + 1e-6f) }
    }
  }

  test("SQ8 index: quantized flag set, exact-match queries return exact ids (F5)") {
    import spark.implicits._
    val idx = AnnIndexManager.create(spark, "sq8_t", qvectors.toDF("id", "embedding"),
      "id", "embedding", "FLAT",
      Map("metric" -> "l2", "quantization" -> "sq8"), s"$tmp/sq8_t")
    assert(idx.meta.quantized)
    assert(idx.dataVecCol == "codes")
    // querying each stored vector must return itself first
    for ((id, v) <- qvectors) {
      val top = idx.scan(v, 1).head()
      assert(top.getLong(0) == id, s"query $id returned ${top.getLong(0)}")
    }
  }

  test("SQ8 persistence round-trip keeps params and results (F5 persist twin)") {
    val reloaded = AnnIndexManager.load(spark, s"$tmp/sq8_t")
    assert(reloaded.meta.quantized && reloaded.quantParams.isDefined)
    val got = reloaded.scan(Array(0.25f, 0.5f, 0.25f, 0.5f), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 3L)
  }

  test("SQ8 top-k ordering matches float ordering on well-separated data") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = Seq.tabulate(100)(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 4f - 2f)))
    val idx = AnnIndexManager.create(spark, "sq8_r", vecs.toDF("id", "embedding"),
      "id", "embedding", "IVF",
      Map("metric" -> "l2", "quantization" -> "sq8", "nlist" -> "4", "nprobe" -> "4"),
      s"$tmp/sq8_r")
    val q = vecs(17)._2
    val got = idx.scan(q, 5).collect().map(_.getLong(0)).toSeq
    val expect = vecs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(got == expect)
  }

  test("Sq8Distance: a null query ELEMENT yields a null distance, never reads 0.0") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    val p = Sq8.QuantParams(Array(0f, 0f), Array(1f, 1f))
    val codes = Sq8.quantize(Array(0.5f, 0.5f), p)
    val df = Seq(
      (codes, Seq[java.lang.Float](0.5f, null)),
      (codes, Seq[java.lang.Float](0.5f, 0.5f))
    ).toDF("codes", "q")
    for (metric <- Seq("l2", "ip", "cosine")) {
      val rows = df.select(GraftBridge.column(graft.functions.Sq8Distance(
        GraftBridge.expression(org.apache.spark.sql.functions.col("codes")),
        GraftBridge.expression(org.apache.spark.sql.functions.col("q")),
        p.mins, p.scales, metric)).as("d")).collect()
      assert(rows(0).isNullAt(0), s"metric $metric: null element must propagate")
      assert(!rows(1).isNullAt(0))
    }
  }
}
