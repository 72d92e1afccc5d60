package graft.plans

import graft.SparkSpec
import graft.functions.AnnFunctions._
import graft.functions.VectorKernels
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._

import java.nio.file.Files

class OptimizerSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_opt_spec").toString

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(300)(i => (i.toLong, Array.fill(6)(rnd.nextFloat())))
  }

  private lazy val tablePath = {
    import spark.implicits._
    val p = s"$tmp/vec_table.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(p)
    p
  }

  private lazy val idx = AnnIndexManager.create(spark, "opt_idx",
    spark.read.parquet(tablePath), "id", "embedding", "FLAT",
    Map("metric" -> "l2", "table_path" -> tablePath), s"$tmp/opt_idx")

  private def q = Array.fill(6)(0.5f)

  private def brute(k: Int): Seq[Long] =
    vecs.map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("rule rewrites ORDER BY l2_distance LIMIT k: Sort removed, results exact") {
    idx // build + register
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(10)
      val plan = df.queryExecution.optimizedPlan.toString
      // replacement signature: index-hits broadcast join carrying _distance;
      // the only Sorts left are over <= k rows inside the replacement
      assert(plan.contains("_distance"), s"no index scan in plan:\n$plan")
      assert(plan.contains("Join Inner"), s"no join-back in plan:\n$plan")
      assert(!plan.contains("l2_distance(embedding") ||
        plan.indexOf("Join Inner") > 0, s"rewrite did not fire:\n$plan")
      val rows = df.collect()
      assert(rows.map(_.getAs[Long]("id")).toSeq == brute(10))
      // projected distance keeps sqrt semantics (not the index's squared)
      val d0 = rows.head.getAs[Double]("_d")
      assert(math.abs(d0 - VectorKernels.l2(q, vecs(brute(1).head.toInt)._2)) < 1e-9)
    } finally AnnOptimizer.disable(spark)
  }

  test("cost gate: k over max selectivity falls back to scan (no rewrite)") {
    idx
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(100) // 100 > 10% of 300
      assert(df.queryExecution.optimizedPlan.toString.contains("Sort ["))
      assert(df.collect().length == 100)
    } finally AnnOptimizer.disable(spark)
  }

  test("filter between sort and scan bails out (reference bailout)") {
    idx
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .filter(col("id") > 100)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(5)
      assert(df.queryExecution.optimizedPlan.toString.contains("Sort ["))
      val got = df.collect().map(_.getAs[Long]("id")).toSeq
      val expect = vecs.filter(_._1 > 100)
        .map { case (id, v) => (id, VectorKernels.l2Sq(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
      assert(got == expect)
    } finally AnnOptimizer.disable(spark)
  }

  test("DESC ordering is not rewritten (faiss_optimizer.test:72-80)") {
    idx
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy(col("_d").desc).limit(5)
      assert(df.queryExecution.optimizedPlan.toString.contains("Sort ["))
    } finally AnnOptimizer.disable(spark)
  }
}
