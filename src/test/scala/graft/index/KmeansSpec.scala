package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the parallel centroid trainer: the chunked fan-out
  * (seeding distance refresh + Lloyd assignment run on the common pool,
  * chunk partials merged in fixed chunk order) must be deterministic across
  * calls — results can never depend on thread scheduling — and must degrade
  * to sensible clusters. Pure driver-side arithmetic, no SparkSession. */
class KmeansSpec extends AnyFunSuite {

  private def randVecs(n: Int, dim: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  test("multi-chunk training is deterministic across repeated calls") {
    // 40k rows = 5 chunks of 8192: exercises the parallel path (single-chunk
    // inputs short-circuit to the sequential loop)
    val sample = randVecs(40000, 16, seed = 11)
    val a = AnnIndexBuilder.trainCentroids(sample, k = 50, maxIter = 10, seed = 42)
    val b = AnnIndexBuilder.trainCentroids(sample, k = 50, maxIter = 10, seed = 42)
    assert(a.length == 50 && b.length == 50)
    for (((ia, va), (ib, vb)) <- a.zip(b)) {
      assert(ia == ib)
      assert(java.util.Arrays.equals(va, vb), s"centroid $ia differs between runs")
    }
  }

  test("multi-chunk training recovers well-separated planted clusters") {
    // 4 planted centers far apart; 20k points of small jitter around them —
    // trained centroids must land within the jitter radius of the truth
    val centers = Array(
      Array.fill(8)(10f), Array.fill(8)(-10f),
      Array.tabulate(8)(i => if (i % 2 == 0) 10f else -10f),
      Array.fill(8)(0f))
    val rnd = new scala.util.Random(7)
    val sample = Array.tabulate(20000) { i =>
      val c = centers(i % 4)
      c.map(_ + rnd.nextFloat() * 0.2f - 0.1f)
    }
    val got = AnnIndexBuilder.trainCentroids(sample, k = 4, maxIter = 20, seed = 1)
    for (c <- centers) {
      val nearest = got.map { case (_, v) =>
        graft.functions.VectorKernels.l2Sq(c, v)
      }.min
      assert(nearest < 0.05, s"no trained centroid near planted center ${c.head}: d2=$nearest")
    }
  }

  test("single-chunk path unchanged: small-n result matches the pre-chunking shape") {
    // n < chunk size → sequential path; sanity that k>n clamps and output
    // ids are 0..k-1
    val sample = randVecs(100, 4, seed = 3)
    val got = AnnIndexBuilder.trainCentroids(sample, k = 200, maxIter = 5, seed = 9)
    assert(got.length == 100)
    assert(got.map(_._1).toSeq == (0 until 100))
  }
}
