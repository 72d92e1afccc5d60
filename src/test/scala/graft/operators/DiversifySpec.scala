package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DiversifySpec extends SparkSpec {

  // pool: two near-duplicate highly-relevant vectors + one orthogonal,
  // slightly less relevant
  private def pool = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0.10), // best relevance
      (2L, Array(0.999f, 0.01f, 0.0f), 0.11), // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f), 0.30) // diverse, less relevant
    ).toDF("id", "vector", "_distance")
  }

  test("lambda=1 is pure relevance order; moderate lambda promotes the diverse result") {
    val pure = Diversify.mmr(pool, "id", "vector", "_distance", k = 3, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(pure == Seq(1L, 2L, 3L), s"pure relevance: $pure")

    val div = Diversify.mmr(pool, "id", "vector", "_distance", k = 2, lambda = 0.5)
      .collect().map(_.getLong(1)).toSeq
    assert(div == Seq(1L, 3L),
      s"diversity must displace the near-duplicate at rank 2: $div")
  }

  test("determinism, k > n, and the pool bound") {
    val a = Diversify.mmr(pool, "id", "vector", "_distance", k = 10, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Diversify.mmr(pool, "id", "vector", "_distance", k = 10, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.length == 3, "k > n returns the whole pool, rerun-stable")

    val e = intercept[IllegalArgumentException] {
      Diversify.mmr(pool, "id", "vector", "_distance", k = 2, maxPool = 2)
    }
    assert(e.getMessage.contains("pool"))
  }

  test("INT ids work, and all-NaN scores terminate instead of throwing") {
    import spark.implicits._
    // id as INT (a label column): must be cast, not ClassCastException
    val intIds = Seq(
      (1, Array(1.0f, 0.0f), 0.1),
      (2, Array(0.0f, 1.0f), 0.2)
    ).toDF("id", "vector", "_distance")
    val out = Diversify.mmr(intIds, "id", "vector", "_distance", k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L, 2L))

    // every candidate scored NaN (NaN distances): loop must exit cleanly
    val nan = Seq(
      (1L, Array(1.0f, 0.0f), Double.NaN),
      (2L, Array(0.0f, 1.0f), Double.NaN)
    ).toDF("id", "vector", "_distance")
    assert(Diversify.mmr(nan, "id", "vector", "_distance", k = 2).count() == 0L,
      "all-NaN pool selects nothing rather than crashing")
  }

  test("MMR over real index hits: near-dup pair never occupies both top slots") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    // centered vectors: random cosine similarities near 0, so redundancy
    // genuinely separates the planted duplicate from ordinary neighbors
    val base = Seq.tabulate(100)(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    // plant an exact duplicate of vector 7 as id 999
    val vecs = base :+ (999L, base(7)._2.clone())
    val idx = graft.index.AnnIndexManager.create(spark, "mmr_idx",
      vecs.toDF("id", "embedding"), "id", "embedding", "FLAT",
      Map("metric" -> "l2"),
      s"${java.nio.file.Files.createTempDirectory("graft_mmr")}/idx")
    val q = base(7)._2
    val hits = idx.scan(q, 20) // (id, _distance): 7 and 999 tie at 0
      .join(vecs.toDF("id", "embedding"), "id")
    val picked = Diversify.mmr(hits, "id", "embedding", "_distance",
      k = 2, lambda = 0.3).collect().map(_.getLong(1)).toSet
    assert(!(picked.contains(7L) && picked.contains(999L)),
      s"exact duplicates must not fill both diversity slots: $picked")
  }

  test("mmrTable: per-query results equal scalar mmr of each pool (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // three queries with pools of different sizes, random centered vectors
    val rows = for {
      qid <- 0L to 2L
      i <- 0 until (8 + qid.toInt * 5)
    } yield (qid, qid * 1000L + i,
      Array.fill(6)(rnd.nextFloat() * 2f - 1f), rnd.nextDouble() * 4)
    val df = rows.toDF("qid", "id", "vec", "d")
    for (lambda <- Seq(0.0, 0.5, 1.0)) {
      val batch = Diversify.mmrTable(df, "qid", "id", "vec", "d", k = 5, lambda)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getLong(1))
          .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq).toMap
      for (qid <- 0L to 2L) {
        val scalar = Diversify.mmr(df.filter(col("qid") === qid),
            "id", "vec", "d", k = 5, lambda)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        assert(batch(qid) == scalar, s"lambda=$lambda qid=$qid")
      }
    }
    // per-group pool bound is enforced executor-side
    val e = intercept[org.apache.spark.SparkException] {
      Diversify.mmrTable(df, "qid", "id", "vec", "d", k = 2, maxPool = 3).collect()
    }
    assert(e.getMessage.contains("pool") ||
      Option(e.getCause).exists(_.getMessage.contains("pool")))
  }

  test("mmrTable: non-numeric query/row ids fail loudly, never merge pools") {
    import spark.implicits._
    val df = Seq(
      ("qA", 1L, Array(1.0f, 0.0f), 0.1),
      ("qB", 2L, Array(0.0f, 1.0f), 0.2)
    ).toDF("qid", "id", "vec", "d")
    val e = intercept[Exception] {
      Diversify.mmrTable(df, "qid", "id", "vec", "d", k = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not castable to long")),
      s"string qid must raise, not null-merge: ${msgs(e)}")
  }
}
