package graft.streaming

import graft.SparkSpec

class HeavyHittersMaintenanceSpec extends SparkSpec {

  private def zipfy(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val r = math.min(499, (math.pow(rnd.nextDouble(), 3) * 500).toInt)
      s"item$r"
    }
  }

  test("streamed batches preserve the MG invariants vs the concatenated truth") {
    import spark.implicits._
    val batches = (1 to 6).map(s => zipfy(3000, s))
    val all = batches.flatten
    val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = new HeavyHittersMaintenance(k = 50)
    batches.zipWithIndex.foreach { case (b, i) =>
      m.append(b.toDF("item"), i.toLong)
    }
    assert(m.totalItems == all.size.toLong)
    assert(m.candidates.size <= 50)
    val err = m.errorBound
    // anytime guarantee: est <= true <= est + N/(k+1), for every survivor
    m.candidates.foreach { case (item, est) =>
      val t = truth.getOrElse(item, 0L)
      assert(est <= t && t <= est + err, s"$item est=$est true=$t err=$err")
    }
    // certified superset at phi > 1/(k+1)
    val phi = 0.03
    val thr = math.max(1L, math.ceil(phi * all.size).toLong)
    val trueHH = truth.filter(_._2 >= thr).keySet
    val reported = m.heavyHitters(phi).map(_._1).toSet
    assert(trueHH.subsetOf(reported), s"missing=${trueHH -- reported}")
    // and the reported bounds bracket the truth
    m.heavyHitters(phi).foreach { case (item, lo, hi) =>
      val t = truth.getOrElse(item, 0L)
      assert(lo <= t && t <= hi)
    }
  }

  test("exactHeavyHitters(retained) equals the batch operator — one-call verify hook") {
    import spark.implicits._
    val batches = (1 to 5).map(s => zipfy(2500, s * 7 + 1))
    val all = batches.flatten
    val m = new HeavyHittersMaintenance(k = 40)
    batches.zipWithIndex.foreach { case (b, i) => m.append(b.toDF("item"), i.toLong) }
    val phi = 0.03 // certifiable: > 1/41
    val retained = all.toDF("item")
    val got = m.exactHeavyHitters(retained, phi)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.pipeline.HeavyHitters.frequentItems(retained, "item", phi)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"recounted $got vs batch $want")
    assert(got.nonEmpty)
    // a differently-named retained column recounts through the overload
    val got2 = m.exactHeavyHitters(all.toDF("tok"), phi, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == want)
    // below the certificate the hook must refuse, not silently under-report
    intercept[IllegalArgumentException] { m.exactHeavyHitters(retained, 0.01) }
  }

  test("replayed batch ids are skipped (session-scoped exactly-once)") {
    import spark.implicits._
    val m = new HeavyHittersMaintenance(k = 10)
    m.append(Seq.fill(20)("x").toDF("item"), 0L)
    val n1 = m.totalItems
    m.append(Seq.fill(20)("x").toDF("item"), 0L) // replay — must skip
    assert(m.totalItems == n1 && n1 == 20L)
    m.append(Seq.fill(5)("y").toDF("item"), 1L)
    assert(m.totalItems == 25L)
  }

  test("no-arg appends always apply and never shadow explicit replay ids") {
    import spark.implicits._
    val m = new HeavyHittersMaintenance(k = 10)
    m.append(Seq.fill(20)("x").toDF("item")) // auto — applies
    m.append(Seq.fill(15)("y").toDF("item")) // auto — must NOT be a replay
    assert(m.totalItems == 35L)
    m.append(Seq.fill(5)("z").toDF("item"), 7L) // explicit fresh id
    assert(m.totalItems == 40L)
    m.append(Seq.fill(9)("z").toDF("item"), 7L) // explicit replay — skipped
    assert(m.totalItems == 40L)
    m.append(Seq.fill(3)("w").toDF("item")) // auto after explicit — applies
    assert(m.totalItems == 43L)
    m.append(Seq.fill(2)("v").toDF("item"), 8L) // next REAL id: not shadowed
    assert(m.totalItems == 45L)
  }

  test("capacity stays bounded under a vocabulary far exceeding k") {
    import spark.implicits._
    val m = new HeavyHittersMaintenance(k = 8)
    for (b <- 0 until 5) {
      val items = (1 to 500).map(i => s"u${b}_$i") ++ Seq.fill(100)("HH")
      m.append(items.toDF("item"), b.toLong)
      assert(m.candidates.size <= 8, s"batch $b size=${m.candidates.size}")
    }
    // HH has true count 500 of 3000 total; err bound = 3000/9 = 333 < 500,
    // so it MUST survive and be certified at phi = 0.15 (thr 450)
    val hh = m.heavyHitters(0.15)
    assert(hh.exists(_._1 == "HH"))
    val est = m.candidates.toMap.apply("HH")
    assert(est <= 500L && 500L <= est + m.errorBound)
  }

  test("uncertifiable phi throws rather than silently under-reporting") {
    import spark.implicits._
    val m = new HeavyHittersMaintenance(k = 5)
    m.append(Seq.fill(10)("a").toDF("item"), 0L)
    intercept[IllegalArgumentException] { m.heavyHitters(0.1) } // 1/(k+1)=0.167
  }
}
