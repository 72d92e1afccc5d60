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

  test("rule never breaks a valid query: NULL query literal and _distance-name collision bail out") {
    idx
    AnnOptimizer.enable(spark)
    try {
      // typed NULL array literal: vanilla Spark answers this (all-null sort
      // key); the rule must bail, not NPE inside the optimizer
      val nullQ = spark.read.parquet(tablePath)
        .withColumn("_d", l2_distance(col("embedding"),
          lit(null).cast("array<float>")))
        .orderBy("_d").limit(5)
      assert(nullQ.collect().length == 5)

      // a base column named _distance collides with the replacement's
      // internal column: the rewrite must skip, and the query still answers
      val collide = spark.read.parquet(tablePath)
        .withColumn("_distance", lit(0.0))
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(10)
      assert(collide.collect().map(_.getAs[Long]("id")).toSeq == brute(10))
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

  test("rewrite fires and stamps the explain marker (ANN_INDEX_SCAN analogue)") {
    idx
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(10)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__ann_index_scan_opt_idx_k10"), s"marker missing:\n$plan")
      // the marker is internal: it must not leak into the result schema
      assert(!df.schema.fieldNames.exists(_.startsWith("__ann_index_scan")))
    } finally AnnOptimizer.disable(spark)
  }

  private def bruteBy(score: Array[Float] => Double, k: Int): Seq[Long] =
    vecs.map { case (id, v) => (id, score(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)

  test("inner_product DESC routes to an ip index; ip ASC is not rewritten") {
    import spark.implicits._
    val ipIdx = AnnIndexManager.create(spark, "opt_ip",
      spark.read.parquet(tablePath), "id", "embedding", "FLAT",
      Map("metric" -> "ip", "table_path" -> tablePath), s"$tmp/opt_ip")
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .withColumn("_ip", inner_product(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy(col("_ip").desc).limit(10)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__ann_index_scan_opt_ip_k10"), s"ip rewrite did not fire:\n$plan")
      val got = df.collect().map(_.getAs[Long]("id")).toSeq
      assert(got.sorted == bruteBy(v => v.zip(q).map { case (x, w) => x.toDouble * w }.sum, 10).sorted)

      // wrong direction for a larger-is-better metric: no rewrite
      val asc = spark.read.parquet(tablePath)
        .withColumn("_ip", inner_product(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy(col("_ip").asc).limit(10)
      assert(!asc.queryExecution.optimizedPlan.toString.contains("__ann_index_scan_opt_ip"))
      assert(asc.queryExecution.optimizedPlan.toString.contains("Sort ["))
    } finally AnnOptimizer.disable(spark)
  }

  test("cosine_similarity DESC routes to a cosine index; negated ASC too") {
    val cosIdx = AnnIndexManager.create(spark, "opt_cos",
      spark.read.parquet(tablePath), "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "table_path" -> tablePath), s"$tmp/opt_cos")
    AnnOptimizer.enable(spark)
    try {
      def cosScore(v: Array[Float]): Double = {
        val dot = v.zip(q).map { case (x, w) => x.toDouble * w }.sum
        val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
        val nq = math.sqrt(q.map(x => x.toDouble * x).sum)
        dot / (nv * nq)
      }
      val df = spark.read.parquet(tablePath)
        .withColumn("_cos", cosine_similarity(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy(col("_cos").desc).limit(10)
      assert(df.queryExecution.optimizedPlan.toString.contains("__ann_index_scan_opt_cos_k10"))
      assert(df.collect().map(_.getAs[Long]("id")).toSeq.sorted == bruteBy(cosScore, 10).sorted)

      // 1 - cosine ASC (distance form) also routes
      val dist = spark.read.parquet(tablePath)
        .withColumn("_cd", lit(1.0) - cosine_similarity(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy(col("_cd").asc).limit(10)
      assert(dist.queryExecution.optimizedPlan.toString.contains("__ann_index_scan_opt_cos_k10"),
        s"1-cos ASC did not route:\n${dist.queryExecution.optimizedPlan}")
      assert(dist.collect().map(_.getAs[Long]("id")).toSeq.sorted == bruteBy(cosScore, 10).sorted)
    } finally AnnOptimizer.disable(spark)
  }

  test("quantized index: rewrite overfetches and re-ranks exactly; lossless index preferred") {
    // a dedicated table so the PQ index is the ONLY candidate on its path
    import spark.implicits._
    val pqPath = s"$tmp/pq_table.parquet"
    vecs.toDF("id", "embedding").write.mode("overwrite").parquet(pqPath)
    AnnIndexManager.create(spark, "opt_pq",
      spark.read.parquet(pqPath), "id", "embedding", "FLAT",
      // deliberately coarse PQ (m=2): raw ADC top-10 visibly differs from exact
      Map("metric" -> "l2", "quantization" -> "pq", "pq_m" -> "2",
        "table_path" -> pqPath), s"$tmp/opt_pq")
    AnnOptimizer.enable(spark)
    try {
      // mult*k = 300 covers the corpus → the re-ranked rewrite is provably exact
      spark.conf.set("spark.ann.quantizedRerankMultiplier", "30")
      val df = spark.read.parquet(pqPath)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(10)
      assert(df.queryExecution.optimizedPlan.toString.contains("__ann_index_scan_opt_pq_k10"),
        s"quantized rewrite did not fire:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getAs[Long]("id")).toSeq == brute(10),
        "re-ranked quantized rewrite must return the exact ordering")
    } finally {
      spark.conf.unset("spark.ann.quantizedRerankMultiplier")
      AnnOptimizer.disable(spark)
    }

    // routing: with BOTH opt_idx (lossless) and a quantized twin registered
    // on the ORIGINAL table path, the lossless index must win deterministically
    idx // ensure opt_idx is registered
    AnnIndexManager.create(spark, "aaa_quant_twin",
      spark.read.parquet(tablePath), "id", "embedding", "FLAT",
      Map("metric" -> "l2", "quantization" -> "pq", "pq_m" -> "2",
        "table_path" -> tablePath), s"$tmp/opt_twin")
    AnnOptimizer.enable(spark)
    try {
      val df = spark.read.parquet(tablePath)
        .withColumn("_d", l2_distance(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy("_d").limit(10)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__ann_index_scan_opt_idx_k10"),
        s"lossless index must be preferred over the quantized twin " +
          s"(name order would pick aaa_quant_twin):\n$plan")
    } finally {
      AnnIndexManager.drop("aaa_quant_twin")
      AnnOptimizer.disable(spark)
    }
  }

  test("bq index: cosine DESC rewrite re-ranks Hamming candidates exactly") {
    import spark.implicits._
    // centered data — the shared all-positive corpus would collapse every
    // sign pattern to one code and make Hamming ranking degenerate
    val cvecs = {
      val rnd = new scala.util.Random(61)
      Seq.tabulate(300)(i => (i.toLong, Array.fill(6)(rnd.nextFloat() * 2f - 1f)))
    }
    val bqPath = s"$tmp/bq_table.parquet"
    cvecs.toDF("id", "embedding").write.mode("overwrite").parquet(bqPath)
    AnnIndexManager.create(spark, "opt_bq",
      spark.read.parquet(bqPath), "id", "embedding", "FLAT",
      Map("metric" -> "cosine", "quantization" -> "bq", "table_path" -> bqPath),
      s"$tmp/opt_bq")
    AnnOptimizer.enable(spark)
    try {
      // mult*k = 300 covers the corpus → provably exact despite 1-bit codes
      spark.conf.set("spark.ann.quantizedRerankMultiplier", "30")
      val df = spark.read.parquet(bqPath)
        .withColumn("_cos", cosine_similarity(col("embedding"), typedLit(q.map(_.toDouble))))
        .orderBy(col("_cos").desc).limit(10)
      assert(df.queryExecution.optimizedPlan.toString.contains("__ann_index_scan_opt_bq_k10"),
        s"bq rewrite did not fire:\n${df.queryExecution.optimizedPlan}")
      def cosScore(v: Array[Float]): Double =
        VectorKernels.dot(q, v) /
          (math.sqrt(VectorKernels.dot(q, q)) * math.sqrt(VectorKernels.dot(v, v)))
      val exact = cvecs.map { case (id, v) => (id, -cosScore(v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      assert(df.collect().map(_.getAs[Long]("id")).toSeq == exact,
        "re-ranked bq rewrite must return the exact cosine ordering")
    } finally {
      spark.conf.unset("spark.ann.quantizedRerankMultiplier")
      AnnOptimizer.disable(spark)
    }
  }
}
