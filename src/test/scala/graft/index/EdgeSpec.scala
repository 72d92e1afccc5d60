package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** F6 edge cases (reference: edge_cases.test:8-306) not covered elsewhere. */
class EdgeSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_edge_spec").toString

  test("non-array column rejected at create (wrong column type)") {
    import spark.implicits._
    val bad = Seq((1L, "not a vector")).toDF("id", "data")
    val e = intercept[Exception] {
      AnnIndexManager.create(spark, "e_bad", bad, "id", "data", "FLAT",
        Map("metric" -> "l2"), s"$tmp/e_bad")
    }
    assert(e != null)
  }

  test("unknown engine and unknown metric rejected") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f))).toDF("id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      AnnIndexManager.create(spark, "e_eng", df, "id", "embedding", "BOGUS",
        Map(), s"$tmp/e_eng")
    }
    assert(e1.getMessage.contains("unknown engine"))
    val e2 = intercept[IllegalArgumentException] {
      AnnIndexManager.create(spark, "e_met", df, "id", "embedding", "FLAT",
        Map("metric" -> "hamming"), s"$tmp/e_met")
    }
    assert(e2.getMessage.contains("unknown metric"))
  }

  test("loading a nonexistent index path errors") {
    intercept[Exception] {
      AnnIndexManager.load(spark, s"$tmp/does_not_exist")
    }
  }

  test("multiple indexes on the same column: both listed, both searchable (F6 multi)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = Seq.tabulate(60)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
      .toDF("id", "embedding")
    val a = AnnIndexManager.create(spark, "e_multi_flat", df, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/e_multi_flat")
    val b = AnnIndexManager.create(spark, "e_multi_ivf", df, "id", "embedding",
      "IVF", Map("metric" -> "l2", "nlist" -> "4", "nprobe" -> "4"),
      s"$tmp/e_multi_ivf")
    val names = AnnIndexManager.list(spark).collect().map(_.getString(0)).toSet
    assert(names.contains("e_multi_flat") && names.contains("e_multi_ivf"))
    val q = Array(0.5f, 0.5f, 0.5f, 0.5f)
    assert(a.scan(q, 5).collect().map(_.getLong(0)).toSeq ==
      b.scan(q, 5, searchParam = 4).collect().map(_.getLong(0)).toSeq)
  }

  test("zero vector under cosine metric does not produce NaN rows") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, 0f, 0f)))
      .toDF("id", "embedding")
    val idx = AnnIndexManager.create(spark, "e_zero", df, "id", "embedding",
      "FLAT", Map("metric" -> "cosine"), s"$tmp/e_zero")
    val rows = idx.scan(Array(1f, 1f, 0f), 2).collect()
    assert(rows.length == 2)
    assert(rows.head.getLong(0) == 2L) // real vector ranks above zero vector
  }

  test("drop removes the index from the registry and disk") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f))).toDF("id", "embedding")
    AnnIndexManager.create(spark, "e_drop", df, "id", "embedding", "FLAT",
      Map(), s"$tmp/e_drop")
    assert(AnnIndexManager.registered.contains("e_drop"))
    AnnIndexManager.drop("e_drop")
    assert(!AnnIndexManager.registered.contains("e_drop"))
    assert(!IndexMeta.exists(s"$tmp/e_drop"))
  }

  test("description factory strings select the engine (F7 / faiss index_factory)") {
    import spark.implicits._
    assert(AnnIndexManager.parseDescription("Flat") == ("FLAT", Map.empty))
    assert(AnnIndexManager.parseDescription("IVF100,Flat") == ("IVF", Map("nlist" -> "100")))
    assert(AnnIndexManager.parseDescription("HNSW32") == ("HNSW", Map("hnsw_m" -> "32")))
    // composites: coded IVF and coded flat forms
    assert(AnnIndexManager.parseDescription("IVF8,PQ16") ==
      ("IVF", Map("nlist" -> "8", "quantization" -> "pq", "pq_m" -> "16")))
    assert(AnnIndexManager.parseDescription("IVF8,PQ16x6") ==
      ("IVF", Map("nlist" -> "8", "quantization" -> "pq", "pq_m" -> "16",
        "pq_ksub" -> "64")))
    assert(AnnIndexManager.parseDescription("IVF32,SQ8") ==
      ("IVF", Map("nlist" -> "32", "quantization" -> "sq8")))
    assert(AnnIndexManager.parseDescription("IVF32,SQfp16") ==
      ("IVF", Map("nlist" -> "32", "quantization" -> "fp16")))
    assert(AnnIndexManager.parseDescription("PQ16") ==
      ("FLAT", Map("quantization" -> "pq", "pq_m" -> "16")))
    assert(AnnIndexManager.parseDescription("SQ8") ==
      ("FLAT", Map("quantization" -> "sq8")))
    // rejections name the offending description
    val bad = intercept[IllegalArgumentException] {
      AnnIndexManager.parseDescription("IVF8,LSH") }
    assert(bad.getMessage.contains("LSH"))
    intercept[IllegalArgumentException] { AnnIndexManager.parseDescription("OPQ16,IVF8") }
    intercept[IllegalArgumentException] { AnnIndexManager.parseDescription("IVF8,PQ16x20") }

    val rnd = new scala.util.Random(37)
    val df = Seq.tabulate(60)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
      .toDF("id", "embedding")
    val idx = AnnIndexManager.create(spark, "e_desc", df, "id", "embedding",
      "FLAT" /* overridden */, Map("description" -> "IVF4,Flat", "nprobe" -> "4"),
      s"$tmp/e_desc")
    assert(idx.meta.engine == "IVF")
    assert(idx.scan(Array(0.5f, 0.5f, 0.5f, 0.5f), 5).count() == 5)
  }

  test("engineInfo (S10 analogue) reports codegen + parallelism") {
    val row = AnnIndexManager.engineInfo(spark).head()
    assert(row.getAs[String]("spark_version").nonEmpty)
    assert(row.getAs[Int]("default_parallelism") > 0)
    assert(row.getAs[Boolean]("whole_stage_codegen"))
  }

  test("oversample fetches k*n candidates then returns k (S3 oversample)") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val df = Seq.tabulate(50)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
      .toDF("id", "embedding")
    val idx = AnnIndexManager.create(spark, "e_over", df, "id", "embedding",
      "FLAT", Map("metric" -> "l2"), s"$tmp/e_over")
    val res = idx.search(df, "id", Array(0.5f, 0.5f, 0.5f, 0.5f), 5, oversample = 3)
    assert(res.count() == 5)
  }
}
