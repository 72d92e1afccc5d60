package graft.pipeline

import graft.SparkSpec
import graft.functions.VectorKernels

class SemanticDedupSpec extends SparkSpec {

  // 3 well-separated base vectors, each with planted near-duplicates
  // (tiny perturbations) plus singletons
  private def fixture: Seq[(Long, Array[Float])] = {
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    Seq(
      (1L, base(0)), (2L, base(0).map(_ * 1.01f)), // dup of 1 (cos = 1)
      (3L, base(1)), (4L, base(1).map(_ + 0.001f)), // near-dup of 3
      (5L, base(2)), // singleton
      (6L, Array(0.7f, 0.7f, 0f, 0f)) // between 1 and 3, cos ≈ 0.707 to both
    )
  }

  private def cos(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.dot(a, b) /
      (math.sqrt(VectorKernels.dot(a, a)) * math.sqrt(VectorKernels.dot(b, b)))

  test("exact variant drops higher-id members of similar pairs (first id wins)") {
    import spark.implicits._
    val df = fixture.toDF("id", "embedding")
    val survivors = Dedup.semanticDedupExact(df, "id", "embedding", threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L, 5L, 6L)) // 2 dup of 1, 4 dup of 3
    // tighter threshold also sweeps 6 (cos ≈ 0.707 to ids 1 and 3)
    val tight = Dedup.semanticDedupExact(df, "id", "embedding", threshold = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(cos(fixture(0)._2, fixture(5)._2) > 0.7)
    assert(tight == Set(1L, 3L, 5L))
  }

  test("clustered path with one cluster equals the exact variant") {
    import spark.implicits._
    val df = fixture.toDF("id", "embedding")
    val exact = Dedup.semanticDedupExact(df, "id", "embedding", 0.9)
      .collect().map(_.getLong(0)).toSet
    val clustered = Dedup.semanticDedup(df, "id", "embedding", 0.9, nClusters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(clustered == exact)
  }

  test("clustered path finds within-cluster dups and is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextFloat() * 8f))
    // 200 rows around 4 centers; every 10th row is an exact copy of the
    // previous row (a guaranteed within-cluster duplicate)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    for (i <- 0 until 200) {
      val v =
        if (i % 10 == 9) rows(i - 1)._2
        else centers(i % 4).map(x => x + rnd.nextFloat() * 0.1f)
      rows += ((i.toLong, v))
    }
    val df = rows.toSeq.toDF("id", "embedding")
    val s1 = Dedup.semanticDedup(df, "id", "embedding", 0.999999, nClusters = 4)
      .collect().map(_.getLong(0)).toSet
    val s2 = Dedup.semanticDedup(df, "id", "embedding", 0.999999, nClusters = 4)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "clustered dedup must be deterministic across runs")
    // every planted copy (id % 10 == 9) has an identical smaller-id row in
    // the same cluster, so none survive
    assert(rows.indices.filter(_ % 10 == 9).forall(i => !s1.contains(i.toLong)))
  }

  test("oversized clusters pass through undeduped (skew cap)") {
    import spark.implicits._
    val df = fixture.toDF("id", "embedding")
    val survivors = Dedup.semanticDedup(df, "id", "embedding", 0.9,
        nClusters = 1, maxCluster = 3) // the single cluster holds 6 > 3 rows
      .collect().map(_.getLong(0)).toSet
    assert(survivors == fixture.map(_._1).toSet, "capped cluster must not dedup")
  }
}
