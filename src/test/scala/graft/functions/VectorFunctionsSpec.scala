package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import AnnFunctions._

  private lazy val _ = AnnFunctions.register(spark)

  private def fixture = {
    import spark.implicits._
    // F1 — minimal unit vectors (reference diskann_basic.test:8-16)
    Seq(
      (1, Array(1f, 0f, 0f)),
      (2, Array(0f, 1f, 0f)),
      (3, Array(0f, 0f, 1f)),
      (4, Array(0.5f, 0.5f, 0f))
    ).toDF("id", "embedding")
  }

  test("l2_distance_sq: orthogonal unit vectors at squared distance 2.0 (F1)") {
    val q = typedLit(Array(1.0, 0.0, 0.0))
    val rows = fixture
      .select(col("id"), l2_distance_sq(col("embedding"), q).as("d"))
      .orderBy("id").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.0, 2.0, 2.0, 0.5))
  }

  test("l2_distance is sqrt of squared (SQL array_distance semantics)") {
    val q = typedLit(Array(0.0, 1.0, 0.0))
    val rows = fixture
      .select(col("id"), l2_distance(col("embedding"), q).as("d"))
      .orderBy("id").collect()
    assert(math.abs(rows(3).getDouble(1) - 0.70710678) < 1e-6) // diskann_optimizer.test:27-33
    assert(math.abs(rows(0).getDouble(1) - math.sqrt(2.0)) < 1e-12)
  }

  test("inner_product and cosine_similarity basics") {
    val q = typedLit(Array(1.0, 1.0, 0.0))
    val rows = fixture
      .select(
        col("id"),
        inner_product(col("embedding"), q).as("ip"),
        cosine_similarity(col("embedding"), q).as("cs"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(3).getDouble(1) == 1.0)
    assert(math.abs(rows(3).getDouble(2) - 1.0) < 1e-12) // parallel vectors
  }

  test("SQL registration: list_distance / array_distance aliases work") {
    AnnFunctions.register(spark)
    fixture.createOrReplaceTempView("f1_vectors")
    val d = spark.sql(
      """SELECT id, list_distance(embedding, array(1.0D, 0.0D, 0.0D)) AS d
        |FROM f1_vectors ORDER BY d, id""".stripMargin).collect()
    assert(d.head.getInt(0) == 1 && d.head.getDouble(1) == 0.0)
  }

  test("SQL registration: maxsim_score over nested array literals") {
    AnnFunctions.register(spark)
    val r = spark.sql(
      """SELECT maxsim_score(
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D)),
        |  array(array(2.0D, 0.0D), array(0.0D, 3.0D))) AS s""".stripMargin).head()
    assert(r.getDouble(0) == 5.0) // max(2,0) + max(0,3)
  }

  test("expressions agree with plain-Scala kernels on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(50)((
      Array.fill(16)(rnd.nextFloat() * 20f - 10f),
      Array.fill(16)(rnd.nextFloat() * 20f - 10f)))
    val rows = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      l2_distance_sq(col("a"), col("b")).as("d2"),
      inner_product(col("a"), col("b")).as("ip"),
      cosine_similarity(col("a"), col("b")).as("cs")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0).toArray; val b = r.getSeq[Float](1).toArray
      assert(math.abs(r.getDouble(2) - VectorKernels.l2Sq(a, b)) < 1e-9)
      assert(math.abs(r.getDouble(3) - VectorKernels.dot(a, b)) < 1e-9)
      val cs = VectorKernels.cosineSimilarity(a, b)
      if (!cs.isNaN) assert(math.abs(r.getDouble(4) - cs) < 1e-9)
    }
  }

  test("dimension mismatch throws") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(l2_distance(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("null ELEMENT propagates to a null distance, never reads as 0.0") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](0f, 5f)),
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](0f, 5f))
    ).toDF("a", "b")
    val rows = df.select(
        l2_distance(col("a"), col("b")).as("d"),
        inner_product(col("a"), col("b")).as("ip"),
        cosine_similarity(col("a"), col("b")).as("cos"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(!rows(1).isNullAt(0) && math.abs(rows(1).getDouble(0) - math.sqrt(10.0)) < 1e-9)
  }

  test("null elements inside NON-nullable array inputs compile and propagate (nullable override)") {
    import spark.implicits._
    // array(a, b) over nullable columns: the CreateArray input itself is
    // non-nullable but containsNull=true — without the nullable override
    // codegen emits `false = true;` and Janino fails
    AnnFunctions.register(spark)
    val df = Seq((Some(1f), Some(2f)), (Some(1f), None))
      .toDF("a", "b")
      .selectExpr("l2_distance(array(a, b), array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS d",
        "normalize_vector(array(a, b)) AS nv")
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - math.sqrt(5.0)) < 1e-9)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("normalize_vector: single-pass unit normalization, zero vector passes through") {
    import spark.implicits._
    val df = Seq(Array(3f, 4f), Array(0f, 0f)).toDF("v")
    val out = df.select(normalize_vector(col("v")).as("n")).collect()
      .map(_.getSeq[Float](0))
    assert(math.abs(out(0)(0) - 0.6f) < 1e-6 && math.abs(out(0)(1) - 0.8f) < 1e-6)
    assert(out(1) == Seq(0f, 0f))
    // norm of the result is 1
    val nrm = math.sqrt(out(0).map(x => x.toDouble * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-6)
  }
}
