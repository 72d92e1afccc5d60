package graft.operators

import graft.SparkSpec
import graft.index.AnnIndexManager

import java.nio.file.Files

class RecallSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_recall_spec").toString

  // clustered corpus: partial probes genuinely lose recall, full probes don't
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(71)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 10f))
    Seq.tabulate(640) { i =>
      (i.toLong, centers(i % 8).map(x => x + rnd.nextFloat() * 0.5f))
    }
  }

  private lazy val ivf = {
    import spark.implicits._
    AnnIndexManager.create(spark, "recall_ivf", vecs.toDF("id", "embedding"),
      "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "8", "nprobe" -> "1"),
      s"$tmp/ivf")
  }

  private def qs: Seq[Array[Float]] = Seq(3, 117, 256, 541).map(i => vecs(i)._2)

  test("exhaustive probing measures exactly 1.0 on every query") {
    val rows = ivf.evaluateWith(qs)
    assert(rows.length == qs.size)
    assert(rows.forall { case (_, hits, k, recall) => hits == k && recall == 1.0 },
      s"expected perfect recall, got ${rows.toSeq}")
  }

  private implicit class Eval(idx: graft.index.AnnIndex) {
    def evaluateWith(qs: Seq[Array[Float]], sp: Int = 8): Array[(Int, Long, Long, Double)] =
      Recall.evaluate(idx, qs, 10, searchParam = sp).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  }

  test("partial probes: recall in (0, 1], mean consistent with per-query rows") {
    val rows = ivf.evaluateWith(qs, sp = 1)
    assert(rows.length == qs.size)
    assert(rows.forall { case (_, hits, k, _) => hits >= 0 && hits <= k })
    // self-queries on clustered data: the home cell holds most neighbors
    assert(rows.forall { case (_, _, _, r) => r >= 0.5 },
      s"nprobe=1 on clustered data should keep majority recall: ${rows.toSeq}")
    val mean = Recall.meanRecall(ivf, qs, 10, searchParam = 1)
    val expect = rows.map(_._4).sum / rows.length
    assert(math.abs(mean - expect) < 1e-12)
  }

  test("monotone in the probe knob: nprobe 1 <= 2 <= 8 mean recall") {
    val m1 = Recall.meanRecall(ivf, qs, 10, searchParam = 1)
    val m2 = Recall.meanRecall(ivf, qs, 10, searchParam = 2)
    val m8 = Recall.meanRecall(ivf, qs, 10, searchParam = 8)
    assert(m1 <= m2 + 1e-12 && m2 <= m8 + 1e-12, s"recall not monotone: $m1, $m2, $m8")
    assert(m8 == 1.0)
  }

  test("graph engine: exhaustive beam = 1.0; every query row present even at tiny beams") {
    import spark.implicits._
    val vam = AnnIndexManager.create(spark, "recall_vam",
      vecs.toDF("id", "embedding"), "id", "embedding", "DISKANN",
      Map("metric" -> "l2", "max_degree" -> "32", "build_complexity" -> "64",
        "shards" -> "2"), s"$tmp/vam")
    val exact = vam.evaluateWith(qs, sp = 100000)
    assert(exact.forall(_._4 == 1.0), s"exhaustive beam must be exact: ${exact.toSeq}")
    val tiny = vam.evaluateWith(qs, sp = 10)
    assert(tiny.length == qs.size, "zero-hit queries must still appear")
    assert(tiny.map(_._1).toSeq == qs.indices.toSeq)
  }
}
