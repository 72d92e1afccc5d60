package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  import spark.implicits._

  // Raw corpus: two sub-populations with disjoint vocabularies; the target
  // draws only from the "code" vocabulary, so DSIR must prefer code docs.
  private lazy val codeDocs = Seq.tabulate(20)(i =>
    (i.toLong, s"spark scala catalyst shuffle partition broadcast $i"))
  private lazy val proseDocs = Seq.tabulate(20)(i =>
    ((100 + i).toLong, s"river meadow sunset violin poem harvest $i"))
  private lazy val raw = (codeDocs ++ proseDocs).toDF("doc_id", "text")
  // Target must carry enough feature mass to dominate the Laplace
  // smoothing floor (alpha * 256 buckets), like any real target corpus.
  private lazy val target = Seq.tabulate(20)(i =>
    (i.toLong, s"spark catalyst shuffle broadcast scala partition plan $i"))
    .toDF("doc_id", "text")

  test("importance weights separate target-like docs from the rest") {
    val model = Dsir.fitLogRatios(raw, target, "text", hexChars = 2)
    val w = Dsir.withImportanceWeight(raw, "text", model)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    val codeMin = codeDocs.map(d => w(d._1)).min
    val proseMax = proseDocs.map(d => w(d._1)).max
    assert(codeMin > proseMax,
      s"every code doc must outscore every prose doc: min=$codeMin max=$proseMax")
  }

  test("resample keeps only target-like docs when n <= the target-like count") {
    val picked = Dsir.resample(raw, "doc_id", "text", target, n = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(picked.size == 10)
    assert(picked.forall(_ < 100), s"Gumbel noise must not outweigh a " +
      s"vocabulary-level gap at n=10: picked $picked")
  }

  test("resample ranks are deterministic across runs and 1..n") {
    val a = Dsir.resample(raw, "doc_id", "text", target, n = 7)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    val b = Dsir.resample(raw, "doc_id", "text", target, n = 7)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1) == (1L to 7L))
  }

  test("weight is the text-order fold: scalar replay matches the distributed pass") {
    val model = Dsir.fitLogRatios(raw, target, "text", hexChars = 2)
    val got = Dsir.withImportanceWeight(raw, "text", model)
      .filter($"doc_id" === 0L).select("dsir_weight").as[Double].head()
    // replay on the driver with the same fold order (unigrams then bigrams)
    val toks = codeDocs.head._2.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val feats = toks.toSeq ++ toks.toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(f: String): String =
      md.digest(f.getBytes("UTF-8")).take(1).map(b => f"$b%02x").mkString
    var s = 0.0
    feats.foreach(f => s += model.ratios.getOrElse(bucket(f), model.default))
    assert(got == s, s"fold mismatch: engine=$got replay=$s")
  }

  test("empty and null texts get weight 0.0 and n_features 0") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val model = Dsir.fitLogRatios(raw, target, "text")
    val rows = Dsir.withImportanceWeight(df, "text", model)
      .select("doc_id", "n_features", "dsir_weight")
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (_, nf, w) => nf == 0L && w == 0.0 })
  }

  test("bucket space bound: fitted table never exceeds 16^hexChars") {
    val m1 = Dsir.fitLogRatios(raw, target, "text", hexChars = 1)
    assert(m1.ratios.size <= 16)
    intercept[IllegalArgumentException] {
      Dsir.fitLogRatios(raw, target, "text", hexChars = 5)
    }
    intercept[IllegalArgumentException] {
      Dsir.fitLogRatios(raw, target, "text", alpha = 0.0)
    }
  }

  test("scoring pass is shuffle-free (no Exchange in the weight plan)") {
    val model = Dsir.fitLogRatios(raw, target, "text")
    val plan = Dsir.withImportanceWeight(raw, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local scoring must not shuffle:\n$plan")
  }
}
