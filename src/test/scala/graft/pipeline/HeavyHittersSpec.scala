package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private def bruteForce(items: Seq[String], phi: Double): Map[String, Long] = {
    val n = items.size.toLong
    val thr = math.max(1L, math.ceil(phi * n).toLong)
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
  }

  private def zipfy(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      // zipf-ish over ~1000 items: item id skewed to small ranks
      val r = math.min(999, (math.pow(rnd.nextDouble(), 3) * 1000).toInt)
      s"item$r"
    }
  }

  test("exact vs brute force on a zipf corpus, across phi and partitionings") {
    import spark.implicits._
    val items = zipfy(20000, seed = 1)
    for (phi <- Seq(0.001, 0.01, 0.05); parts <- Seq(1, 7, 32)) {
      val df = items.toDF("item").repartition(parts)
      val got = HeavyHitters.frequentItems(df, "item", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == bruteForce(items, phi), s"phi=$phi parts=$parts")
    }
  }

  test("adversarial stream that drains MG counters still verifies exactly") {
    import spark.implicits._
    // k = ceil(1/0.1) = 10. One true heavy item interleaved with waves of
    // 10 fresh distinct items — each wave triggers a decrement-all, the
    // classic MG undercount driver. The recount must restore exact counts.
    val heavy = Seq.fill(400)("HH")
    val noise = (1 to 1600).map(i => s"n${i / 10}_${i % 10}") // bursts of 10
    val items = heavy.grouped(2).toSeq.lazyZip(noise.grouped(8).toSeq)
      .flatMap((a, b) => a ++ b)
    val df = items.toDF("item").repartition(3)
    val got = HeavyHitters.frequentItems(df, "item", 0.1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == bruteForce(items, 0.1))
    assert(got.contains("HH") && got("HH") == 400L)
  }

  test("candidate superset always contains every true heavy hitter") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val items = zipfy(5000, seed)
      val phi = 0.02
      val cand = HeavyHitters.mgCandidates(items.toDF("item"), "item", phi)
        .collect().map(_.getString(0)).toSet
      val truth = bruteForce(items, phi).keySet
      assert(truth.subsetOf(cand), s"seed=$seed missing=${truth -- cand}")
    }
  }

  test("grouped heavy hitters: exact per-group vs brute force across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // three groups with different sizes and distributions
    val rows: Seq[(String, String)] =
      (1 to 6000).map(_ => ("big", s"item${math.min(199, (math.pow(rnd.nextDouble(), 3) * 200).toInt)}")) ++
      (1 to 900).map(_ => ("mid", s"m${rnd.nextInt(30)}")) ++
      (1 to 40).map(i => ("tiny", s"t${i % 7}"))
    val phi = 0.03
    val truth = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val n = rs.size
      val thr = math.max(1L, math.ceil(phi * n).toLong)
      rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).map { case (it, c) => (g, it) -> c }
    }
    for (parts <- Seq(1, 5, 32)) {
      val df = rows.toDF("grp", "item").repartition(parts)
      val got = HeavyHitters.frequentItemsByGroup(df, "grp", "item", phi)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == truth, s"parts=$parts")
    }
  }

  test("grouped: unbounded group cardinality, singleton groups included") {
    import spark.implicits._
    val rows = (1 to 800).map(i => (s"g${i % 400}", s"x${i % 3}"))
    val df = rows.toDF("grp", "item").repartition(9)
    val got = HeavyHitters.frequentItemsByGroup(df, "grp", "item", 0.4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val thr = math.max(1L, math.ceil(0.4 * rs.size).toLong)
      rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).map { case (it, c) => (g, it) -> c }
    }
    assert(got == truth)
  }

  test("grouped: co-located path (budget exceeded) is exact and identical to the resident path") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows: Seq[(String, String)] =
      (1 to 4000).map(_ => (s"g${rnd.nextInt(50)}", s"item${math.min(49, (math.pow(rnd.nextDouble(), 3) * 50).toInt)}"))
    val phi = 0.05
    val truth = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val thr = math.max(1L, math.ceil(phi * rs.size).toLong)
      rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).map { case (it, c) => (g, it) -> c }
    }
    val df = rows.toDF("grp", "item").repartition(11)
    // expectedGroups says 50 groups x k=20 counters = 1000 > budget 100 →
    // the operator must take the repartition+sort single-summary path
    spark.conf.set("spark.graft.hh.maxCountersPerTask", "100")
    try {
      val got = HeavyHitters.frequentItemsByGroup(df, "grp", "item", phi,
          expectedGroups = 50L)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == truth)
      // and the auto-estimated gate (no hint) agrees
      val gotAuto = HeavyHitters.frequentItemsByGroup(df, "grp", "item", phi)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(gotAuto == truth)
    } finally spark.conf.unset("spark.graft.hh.maxCountersPerTask")
  }

  test("null items are ignored; empty strings are legitimate items") {
    import spark.implicits._
    val df = (Seq.fill(50)(Some("")) ++ Seq.fill(30)(Option.empty[String]) ++
      Seq.fill(20)(Some("x"))).toDF("item")
    val got = HeavyHitters.frequentItems(df, "item", 0.25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 70 non-null; threshold = 18: "" (50) and "x" (20) both qualify
    assert(got == Map("" -> 50L, "x" -> 20L))
  }

  test("phi = 1 returns only an item filling the whole stream; empty input is empty") {
    import spark.implicits._
    val uni = Seq.fill(9)("only").toDF("item")
    val got = HeavyHitters.frequentItems(uni, "item", 1.0).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("only", 9L)))
    val mixed = (Seq.fill(5)("a") ++ Seq.fill(4)("b")).toDF("item")
    assert(HeavyHitters.frequentItems(mixed, "item", 1.0).collect().isEmpty)
    assert(HeavyHitters.frequentItems(
      Seq.empty[String].toDF("item"), "item", 0.5).collect().isEmpty)
  }

  test("frequentTokens splits, drops empties, and matches the token brute force") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha  gamma"),
      (2L, "beta alpha beta"),
      (3L, "delta alpha")).toDF("id", "text")
    val got = HeavyHitters.frequentTokens(docs, "text", 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 9 tokens; threshold ceil(2.7)=3: alpha(4), beta(3)
    assert(got == Map("alpha" -> 4L, "beta" -> 3L))
  }
}
