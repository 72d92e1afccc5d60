package graft.operators

import graft.SparkSpec
import graft.index.AnnIndexManager
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

class MaxSimSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8
  private val nDocs = 60
  private val rnd = new scala.util.Random(7)

  private lazy val docVecs: Seq[(Long, Seq[Seq[Float]])] =
    Seq.tabulate(nDocs) { i =>
      val nTok = 2 + rnd.nextInt(4)
      (i.toLong, Seq.fill(nTok)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    }
  private lazy val docs: DataFrame = docVecs.toDF("doc_id", "vecs")

  private lazy val queryVecs: Seq[(Int, Seq[Seq[Double]])] =
    Seq.tabulate(3)(qi =>
      (qi, Seq.fill(2)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))))
  private lazy val queries: DataFrame = queryVecs.toDF("query_idx", "qvecs")

  /** Scalar reference: Σ_q max_d <q,d>, plain driver-side doubles. */
  private def refScore(q: Seq[Seq[Double]], d: Seq[Seq[Float]]): Double =
    q.map(qv => d.map(dv => qv.zip(dv).map { case (a, b) => a * b.toDouble }.sum).max).sum

  test("searchTable matches the scalar reference exactly") {
    val got = MaxSim.searchTable(queries, "query_idx", "qvecs",
        docs, "doc_id", "vecs", k = 5)
      .select("query_idx", "rank", "doc_id")
      .as[(Int, Long, Long)].collect().toSet
    val want = (for ((qi, q) <- queryVecs) yield {
      docVecs.map { case (id, d) => (id, refScore(q, d)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, _), r) => (qi, (r + 1).toLong, id) }
    }).flatten.toSet
    assert(got == want)
  }

  test("topK (single query) agrees with searchTable on the same query") {
    val q = queryVecs.head._2.map(_.toArray)
    val single = MaxSim.topK(docs, "doc_id", "vecs", q, 5)
      .select("doc_id").as[Long].collect().toSeq
    val batch = MaxSim.searchTable(queries.filter($"query_idx" === 0),
        "query_idx", "qvecs", docs, "doc_id", "vecs", 5)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(single == batch)
  }

  test("meanPool is the per-dimension mean in bag order") {
    val pooled = docs.filter($"doc_id" === 0L)
      .select(MaxSim.meanPool($"vecs")).as[Seq[Double]].head()
    val bag = docVecs.head._2
    val want = Seq.tabulate(dim)(i =>
      bag.map(_(i).toDouble).foldLeft(0.0)(_ + _) / bag.size)
    pooled.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("empty and null bags drop out of scoring instead of NPEing TopK") {
    val withBad = docs.unionByName(Seq(
      (900L, Seq.empty[Seq[Float]]),
      (901L, null.asInstanceOf[Seq[Seq[Float]]])).toDF("doc_id", "vecs"))
    val got = MaxSim.searchTable(queries, "query_idx", "qvecs",
        withBad, "doc_id", "vecs", k = nDocs + 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!got.contains(900L) && !got.contains(901L))
    assert(got.size == nDocs)
  }

  test("ANN-staged rerank equals brute force at full overfetch, high recall at partial") {
    val tmp = Files.createTempDirectory("graft_maxsim").toString
    val pooled = docs.select($"doc_id",
      MaxSim.meanPool($"vecs").cast("array<float>").as("pv"))
    val idx = AnnIndexManager.create(spark, "maxsim_pool_idx", pooled,
      "doc_id", "pv", "FLAT", Map("metric" -> "ip"), s"$tmp/idx")
    try {
      val brute = MaxSim.searchTable(queries, "query_idx", "qvecs",
          docs, "doc_id", "vecs", k = 10)
        .select("query_idx", "rank", "doc_id").as[(Int, Long, Long)]
        .collect().toSet
      val staged = MaxSim.annSearchTable(idx, queries, "query_idx", "qvecs",
          docs, "doc_id", "vecs", k = 10, overfetch = nDocs)
        .select("query_idx", "rank", "doc_id").as[(Int, Long, Long)]
        .collect().toSet
      assert(staged == brute, "full overfetch must be exact")

      val part = MaxSim.annSearchTable(idx, queries, "query_idx", "qvecs",
          docs, "doc_id", "vecs", k = 10, overfetch = 30)
        .select("query_idx", "doc_id").as[(Int, Long)].collect().toSet
      val bruteIds = brute.map { case (q, _, d) => (q, d) }
      val recall = bruteIds.count(part.contains).toDouble / bruteIds.size
      assert(recall >= 0.5, s"pooled first stage should keep most of the " +
        s"true top-10 at overfetch=30/60: recall=$recall")
    } finally AnnIndexManager.drop("maxsim_pool_idx")
  }

  test("searchTable plan broadcasts queries and never shuffles the doc side") {
    val plan = MaxSim.searchTable(queries, "query_idx", "qvecs",
      docs, "doc_id", "vecs", k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
  }

  test("native maxsim_score is value-identical to the HOF composition on adversarial inputs") {
    // the composition MaxSim.score replaced in r16 — kept here as the
    // semantics oracle (nulls at every level, NaN ordering, -0.0 vs 0.0,
    // empty bags)
    def hofScore(q: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      aggregate(q, lit(0.0), (acc, qv) =>
        acc + array_max(transform(d, dv =>
          graft.functions.AnnFunctions.inner_product(qv, dv))))
    val f = Float.NaN
    val rows: Seq[(Int, Seq[Seq[Float]], Seq[Seq[Float]])] = Seq(
      (0, Seq(Seq(1f, 2f), Seq(0.5f, -1f)), Seq(Seq(3f, 4f), Seq(-1f, 0f))),
      (1, Seq.empty, Seq(Seq(1f, 2f))),            // empty Q -> 0.0
      (2, Seq(Seq(1f, 2f)), Seq.empty),            // empty D -> null
      (3, null, Seq(Seq(1f, 2f))),                 // null Q -> null
      (4, Seq(Seq(1f, 2f)), null),                 // null D -> null
      (5, Seq.empty, null),                        // empty Q beats null D -> 0.0
      (6, Seq(Seq(f, 1f)), Seq(Seq(1f, 1f))),      // NaN dot -> NaN total
      (7, Seq(Seq(1f, 1f)), Seq(Seq(f, 0f), Seq(1f, 1f))), // NaN doc wins max
      (8, Seq(Seq(0f, 0f)), Seq(Seq(-0f, 1f), Seq(0f, -1f))), // -0.0 vs 0.0 ties
      (9, Seq(null, Seq(1f, 2f)), Seq(Seq(1f, 1f))),  // null q token -> null
      (10, Seq(Seq(1f, 2f)), Seq(null, Seq(2f, 1f)))) // null d token skipped
    val df = rows.toDF("id", "q", "d")
    val both = df.select(col("id"),
        graft.functions.AnnFunctions.maxsim_score(col("q"), col("d")).as("native"),
        hofScore(col("q"), col("d")).as("hof"))
      .collect()
    both.foreach { r =>
      val n = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val h = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      // compare bit patterns so NaN == NaN and -0.0 != 0.0
      def bits(x: java.lang.Double) =
        if (x == null) null else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(x))
      assert(bits(n) == bits(h), s"row ${r.getInt(0)}: native=$n hof=$h")
    }
    // dim mismatch throws on both paths (inner_product contract)
    val bad = Seq((0, Seq(Seq(1f, 2f)), Seq(Seq(1f, 2f, 3f)))).toDF("id", "q", "d")
    intercept[Exception](bad.select(
      graft.functions.AnnFunctions.maxsim_score(col("q"), col("d"))).collect())
    // null q ELEMENT inside a token vector -> null (every dot nulls)
    val qe = Seq((0, Seq(Seq[java.lang.Float](1f, null)), Seq(Seq(1f, 2f))))
      .toDF("id", "q", "d")
    val r = qe.select(
      graft.functions.AnnFunctions.maxsim_score(col("q"), col("d"))).head()
    assert(r.isNullAt(0))
    // null q ELEMENT + a dim-mismatched doc token: inner_product checks
    // dims BEFORE null elements, so this must THROW (not return null) —
    // exactly as the HOF composition did
    val qeBad = Seq((0, Seq(Seq[java.lang.Float](1f, null)), Seq(Seq(1f, 2f, 3f))))
      .toDF("id", "q", "d")
    intercept[Exception](qeBad.select(
      graft.functions.AnnFunctions.maxsim_score(col("q"), col("d"))).collect())
    // a WHOLLY null q token does not END the fold: a LATER token's dim
    // mismatch must still throw (the composition folded the null
    // accumulator through every remaining token) — r16 ADVICE regression
    val qTokBad: org.apache.spark.sql.DataFrame =
      Seq[(Int, Seq[Seq[Float]], Seq[Seq[Float]])](
        (0, Seq(null, Seq(1f, 2f)), Seq(Seq(1f, 2f, 3f)))).toDF("id", "q", "d")
    intercept[Exception](qTokBad.select(
      graft.functions.AnnFunctions.maxsim_score(col("q"), col("d"))).collect())
    // same shape with matching dims stays null (fold reaches the end)
    val qTokOk: org.apache.spark.sql.DataFrame =
      Seq[(Int, Seq[Seq[Float]], Seq[Seq[Float]])](
        (0, Seq(null, Seq(1f, 2f)), Seq(Seq(1f, 2f)))).toDF("id", "q", "d")
    assert(qTokOk.select(
      graft.functions.AnnFunctions.maxsim_score(col("q"), col("d"))).head().isNullAt(0))
    // an all-docs-skipped token (found=false, here via a null q ELEMENT
    // whose dims DO match) also keeps folding: the LATER mismatched token
    // must still throw
    val ndBad = Seq((0,
        Seq(Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f)),
        Seq(Seq(1f, 2f, 3f)))).toDF("id", "q", "d")
    intercept[Exception](ndBad.select(
      graft.functions.AnnFunctions.maxsim_score(col("q"), col("d"))).collect())
  }

  test("float fast path (non-nullable schema) matches the scalar reference") {
    // toDF infers containsNull=true everywhere, which routes MaxSimScore
    // down the GENERAL codegen path — build an explicitly non-nullable
    // nested-float schema so the scratch-reuse fast path actually runs
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("q", ArrayType(ArrayType(FloatType, false), false), nullable = false),
      StructField("d", ArrayType(ArrayType(FloatType, false), false), nullable = false)))
    val rnd2 = new scala.util.Random(23)
    def bag(n: Int, d: Int) = Seq.fill(n)(Seq.fill(d)(rnd2.nextFloat() * 2 - 1))
    val data = Seq.tabulate(40)(i =>
      Row(i.toLong, bag(2 + i % 3, 16), bag(1 + i % 5, 16)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 4), schema)
    val got = df.select(col("id"),
        graft.functions.AnnFunctions.maxsim_score(col("q"), col("d")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    data.foreach { row =>
      val id = row.getLong(0)
      val q = row.getSeq[Seq[Float]](1)
      val d = row.getSeq[Seq[Float]](2)
      val want = q.map(qv =>
        d.map(dv => qv.zip(dv).map { case (a, b) => a.toDouble * b.toDouble }.sum).max).sum
      assert(math.abs(got(id) - want) < 1e-9, s"id=$id got=${got(id)} want=$want")
    }
    // varying doc-bag sizes across rows exercise the scratch-reuse resize
    assert(got.size == 40)
  }
}
