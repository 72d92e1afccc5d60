package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ProjectionSpec extends SparkSpec {

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  test("projection is deterministic and the codegen path matches the kernel") {
    import spark.implicits._
    val dim = 48; val outDim = 8
    val vecs = randVecs(30, dim, seed = 3)
    val mat = Projection.gaussianMatrix(dim, outDim, seed = 42L)
    val got = vecs.toDF("id", "embedding")
      .select(col("id"), Projection.projectColumn(col("embedding"), dim, outDim).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for ((id, v) <- vecs) {
      val expect = Projection.project(v, mat, outDim)
      assert(got(id).toSeq == expect.toSeq, s"id $id")
    }
    // rerun: bit-identical (no RNG state, the matrix derives from the seed)
    val again = vecs.toDF("id", "embedding")
      .select(col("id"), Projection.projectColumn(col("embedding"), dim, outDim).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(vecs.forall { case (id, _) => again(id).toSeq == got(id).toSeq })
  }

  test("JL property: pairwise L2 distances survive 256 -> 32 within loose distortion") {
    val dim = 256; val outDim = 32
    val vecs = randVecs(60, dim, seed = 7).map(_._2)
    val mat = Projection.gaussianMatrix(dim, outDim, seed = 42L)
    val proj = vecs.map(Projection.project(_, mat, outDim))
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield {
      val d0 = math.sqrt(VectorKernels.l2Sq(vecs(i), vecs(j)))
      val d1 = math.sqrt(VectorKernels.l2Sq(proj(i), proj(j)))
      d1 / d0
    }
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1, s"mean distance ratio $mean far from 1")
    assert(ratios.forall(r => r > 0.4 && r < 2.0),
      s"distortion outlier: ${ratios.min} .. ${ratios.max}")
  }

  test("null element propagates; wrong input dim throws") {
    import spark.implicits._
    val df = Seq(
      Seq[java.lang.Float](1f, null, 3f, 4f),
      Seq[java.lang.Float](1f, 2f, 3f, 4f)
    ).toDF("v")
    val rows = df.select(Projection.projectColumn(col("v"), 4, 2).as("p")).collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
    val bad = Seq(Array(1f, 2f)).toDF("v")
    val e = intercept[Exception] {
      bad.select(Projection.projectColumn(col("v"), 4, 2)).collect()
    }
    assert(e.getMessage.contains("input dim") ||
      Option(e.getCause).exists(_.getMessage.contains("input dim")))
  }

  test("up-projection (outDim > dim) and dim-1 inputs are well-defined") {
    import spark.implicits._
    val df = Seq((1L, Array(2.5f)), (2L, Array(-1.0f))).toDF("id", "v")
    val up = df.select(col("id"), Projection.projectColumn(col("v"), 1, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(up(1L).length == 4)
    // projection of a 1-dim input is the matrix column scaled by the input:
    // opposite-sign inputs give proportional, opposite-sign outputs
    val ratio = up(1L)(0) / up(2L)(0)
    assert(up(1L).indices.forall(j =>
      math.abs(up(1L)(j) / up(2L)(j) - ratio) < 1e-3), "columns proportional")
    assert(ratio < 0.0, "opposite signs preserved")
  }

  test("projected near-dup: a planted duplicate pair survives the reduction") {
    import spark.implicits._
    val vecs = randVecs(80, 64, seed = 11) :+ (999L, randVecs(80, 64, 11)(5)._2)
    val projected = vecs.toDF("id", "embedding")
      .select(col("id"), Projection.projectColumn(col("embedding"), 64, 8).as("embedding"))
    val pairs = graft.pipeline.Dedup.embeddingNearDups(projected, "id", "embedding",
      threshold = 0.95).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((5L, 999L)),
      s"identical vectors must stay identical after projection: ${pairs.toSeq}")
  }
}
