package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private def blobs(nPerBlob: Int, centers: Seq[Array[Float]], noise: Float,
                    seed: Int): Seq[(Long, Int, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    centers.zipWithIndex.flatMap { case (c, b) =>
      (0 until nPerBlob).map { i =>
        val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 2f * noise)
        ((b * nPerBlob + i).toLong, b, v)
      }
    }
  }

  private val centers3 = Seq(
    Array.fill(8)(0f), Array.fill(8)(10f), Array.fill(8)(-10f))

  test("distributed Lloyd recovers well-separated blob centers and their members") {
    import spark.implicits._
    val data = blobs(200, centers3, noise = 1f, seed = 1)
    val df = data.map(t => (t._1, t._3)).toDF("id", "v").repartition(8)
    val cents = CorpusPipeline.trainClusterCentroidsDistributed(
      df, "v", k = 3, maxIter = 10, seed = 42)
    assert(cents.length == 3)
    // every true center has a learned centroid within the noise radius
    for (c <- centers3) {
      val best = cents.map(_._2).map(l =>
        math.sqrt(graft.functions.VectorKernels.l2Sq(l, c))).min
      assert(best < 1.0, s"center ${c.head} off by $best")
    }
    // assignment groups == blob labels (up to centroid relabeling)
    val assigned = CorpusPipeline.assignClusters(df, "v", cents)
      .select("id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byBlob = data.groupBy(_._2).view.mapValues(_.map(t => assigned(t._1)).toSet)
    assert(byBlob.values.forall(_.size == 1)) // each blob maps to ONE cluster
    assert(byBlob.values.map(_.head).toSet.size == 3) // and they're distinct
  }

  test("full-data refinement does not regress the pilot's objective") {
    import spark.implicits._
    val data = blobs(150, centers3, noise = 2f, seed = 7)
    val df = data.map(t => (t._1, t._3)).toDF("id", "v").repartition(4)
    val pilot = CorpusPipeline.trainClusterCentroids(df, "v", k = 3,
      maxIter = 5, sampleCap = 64) // deliberately tiny pilot sample
    val full = CorpusPipeline.trainClusterCentroidsDistributed(df, "v", k = 3,
      maxIter = 10, initSampleCap = 64)
    val costPilot = CorpusPipeline.clusteringCost(df, "v", pilot)
    val costFull = CorpusPipeline.clusteringCost(df, "v", full)
    assert(costFull <= costPilot * 1.0001,
      s"full $costFull worse than pilot $costPilot")
  }

  test("deterministic for a fixed partitioning; assignment partitioning-invariant") {
    import spark.implicits._
    val data = blobs(100, centers3, noise = 1f, seed = 3)
    val df8 = data.map(t => (t._1, t._3)).toDF("id", "v").repartition(8, col("id"))
    val a = CorpusPipeline.trainClusterCentroidsDistributed(df8, "v", 3)
    val b = CorpusPipeline.trainClusterCentroidsDistributed(df8, "v", 3)
    assert(a.map(_._2.toSeq) sameElements b.map(_._2.toSeq)) // bit-identical
    val df3 = data.map(t => (t._1, t._3)).toDF("id", "v").repartition(3, col("v"))
    val c = CorpusPipeline.trainClusterCentroidsDistributed(df3, "v", 3)
    // partitioning changes pilot-sample order → cluster LABELS can permute
    // and float merge order shifts ULPs; on separated data every centroid
    // still has a counterpart within far less than the blob scale, and the
    // induced PARTITION of the ids is identical
    a.map(_._2).foreach { x =>
      val best = c.map(_._2).map(y =>
        math.sqrt(graft.functions.VectorKernels.l2Sq(x, y))).min
      assert(best < 1e-3, s"no counterpart within 1e-3 (best $best)")
    }
    def groups(cents: Array[(Int, Array[Float])]) =
      CorpusPipeline.assignClusters(df8, "v", cents)
        .select("id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._2)
        .values.map(_.map(_._1).toSet).toSet
    assert(groups(a) == groups(c))
  }

  test("k exceeding natural clusters yields valid (possibly empty-cell) centroids") {
    import spark.implicits._
    val data = blobs(30, centers3, noise = 0.1f, seed = 5)
    val df = data.map(t => (t._1, t._3)).toDF("id", "v").repartition(4)
    val cents = CorpusPipeline.trainClusterCentroidsDistributed(df, "v", k = 5,
      maxIter = 8)
    assert(cents.length == 5)
    assert(cents.forall(_._2.forall(f => !f.isNaN && !f.isInfinite)))
    // assignment still covers the 3 real blobs coherently
    val assigned = CorpusPipeline.assignClusters(df, "v", cents)
      .select("id", "cluster_id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byBlob = data.groupBy(_._2).view
      .mapValues(_.map(t => assigned(t._1)).toSet).toMap
    assert(byBlob.values.flatten.toSet.size >= 3)
  }
}
