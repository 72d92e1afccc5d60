package graft.index

import graft.SparkSpec
import graft.functions.VectorKernels
import org.apache.spark.sql.functions.col

import java.nio.file.Files

class RebalanceSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_rebalance_spec").toString

  /** 1 fat cluster (480 rows) + 7 tiny ones (20 each): kmeans lands the
    * fat cluster in one cell, making it ~6x the mean. */
  private def skewedVecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(83)
    val centers = Array.fill(8)(Array.fill(8)(rnd.nextFloat() * 20f))
    Seq.tabulate(620) { i =>
      val c = if (i < 480) centers(0) else centers(1 + (i - 480) / 20)
      (i.toLong, c.map(x => x + rnd.nextFloat()))
    }
  }

  test("rebalanceCells splits the skewed cell; searches stay exact under full probes") {
    import spark.implicits._
    val vecs = skewedVecs
    val idx = AnnIndexManager.create(spark, "reb_ivf", vecs.toDF("id", "embedding"),
      "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "8", "nprobe" -> "8"), s"$tmp/reb_ivf")
    val before = idx.centroids.length
    val sizesBefore = idx.data.groupBy("list_id").count()
      .collect().map(_.getLong(1))
    assert(sizesBefore.max > 4.0 * (sizesBefore.sum.toDouble / sizesBefore.length),
      "fixture must actually be skewed")

    val split = idx.rebalanceCells(maxCellFactor = 4.0)
    assert(split >= 1, "the fat cell must split")
    val after = idx.centroids.length
    assert(after > before, s"cell count must grow: $before -> $after")
    // no rows lost or duplicated
    assert(idx.data.count() == 620)
    assert(idx.data.select("id").distinct().count() == 620)
    // skew reduced: no cell above the threshold anymore
    val sizesAfter = idx.data.groupBy("list_id").count().collect().map(_.getLong(1))
    assert(sizesAfter.max <= 4.0 * (sizesAfter.sum.toDouble / sizesAfter.length),
      s"still skewed after rebalance: ${sizesAfter.toSeq.sorted.reverse.take(3)}")

    // exhaustive probing over the NEW cell set is still exact
    val q = vecs(37)._2
    val got = idx.scan(q, 10, searchParam = after).collect().map(_.getLong(0)).toSeq
    val exact = vecs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(got == exact, "rebalanced index must stay exact under full probes")

    // range search radii were re-derived for the sub-cells: still exact
    val radius = 3.0
    val gotRange = idx.rangeScan(q, radius).collect().map(_.getLong(0)).toSet
    val exactRange = vecs.filter { case (_, v) => VectorKernels.l2Sq(q, v) <= radius }
      .map(_._1).toSet
    assert(gotRange == exactRange, "range search must stay exact after rebalance")

    // insert-after-rebalance (same instance): assignment sees the NEW cell
    // set and the inserted row is findable — and survives another rebalance
    import spark.implicits._
    val extra = Seq((9000L, vecs(3)._2.map(_ + 0.05f)))
    idx.insert(extra.toDF("id", "embedding"), "id", "embedding")
    assert(idx.scan(extra.head._2, 1, searchParam = after).collect()
      .head.getLong(0) == 9000L)
    idx.rebalanceCells(maxCellFactor = 4.0)
    assert(idx.data.filter(col("id") === 9000L).count() == 1,
      "inserted row must survive a subsequent rebalance")
  }

  test("balanced index is a no-op; orphan dirs from a crashed run are reclaimed") {
    import spark.implicits._
    val rnd = new scala.util.Random(89)
    val vecs = Seq.tabulate(160)(i => (i.toLong, Array.fill(8)(rnd.nextFloat())))
    val idx = AnnIndexManager.create(spark, "reb_flat_ivf", vecs.toDF("id", "embedding"),
      "id", "embedding", "IVF",
      Map("metric" -> "l2", "nlist" -> "4", "nprobe" -> "4"), s"$tmp/reb_ok")
    // plant an orphan dir (a crashed rebalance's leftover sub-cell)
    Seq((9999L, Array.fill(8)(0.5f), 0L)).toDF("id", "vector", "seg")
      .withColumn("list_id", org.apache.spark.sql.functions.lit(77))
      .write.mode("append").partitionBy("list_id").parquet(s"$tmp/reb_ok/data")
    assert(idx.data.filter(col("id") === 9999L).count() == 1, "orphan visible pre-GC")
    assert(idx.rebalanceCells() == 0, "balanced cells must not split")
    assert(idx.data.filter(col("id") === 9999L).count() == 0, "orphan dir reclaimed")
    assert(idx.data.count() == 160)
  }

  test("rebalanceCells rejects non-IVF engines") {
    import spark.implicits._
    val flat = AnnIndexManager.create(spark, "reb_flat",
      Seq((1L, Array(1f, 2f))).toDF("id", "embedding"), "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/reb_flat")
    val e = intercept[IllegalArgumentException](flat.rebalanceCells())
    assert(e.getMessage.contains("IVF"))
  }
}
