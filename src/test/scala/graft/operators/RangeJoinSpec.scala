package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contracts for [[RangeJoin]]: pair-set equivalence with the brute
  * crossJoin+filter on randomized data across bucket widths (including
  * widths that force boundary-straddling intervals), inclusive bounds,
  * inverted-interval drop, keyed/keyless forms, no duplicate pairs, and
  * the no-nested-loop plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randData(seed: Int, np: Int = 300, ni: Int = 80)
      : (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val points = (0 until np).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "k", "ts")
    val intervals = (0 until ni).map { i =>
      val s = rnd.nextInt(1000).toLong
      (1000L + i, rnd.nextInt(3).toLong, s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "k", "s", "e")
    (points, intervals)
  }

  private def brutePairs(points: DataFrame, intervals: DataFrame,
                         keyed: Boolean): Set[(Long, Long)] = {
    val ps = points.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val is = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    (for {
      (pid, pk, ts) <- ps
      (iid, ik, s, e) <- is
      if (!keyed || pk == ik) && ts >= s && ts <= e
    } yield (pid, iid)).toSet
  }

  private def opPairs(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], width: Long): Seq[(Long, Long)] =
    RangeJoin.pointInInterval(points, "ts", intervals, "s", "e", keys, width)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("keyed join equals brute force across bucket widths") {
    val (p, iv) = randData(1)
    val expect = brutePairs(p, iv, keyed = true)
    for (width <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = opPairs(p, iv, Seq("k"), width)
      assert(got.toSet == expect, s"width=$width")
      assert(got.size == got.toSet.size, s"duplicate pairs at width=$width")
    }
  }

  test("keyless join equals brute force") {
    val (p, iv0) = randData(2, np = 120, ni = 40)
    val iv = iv0.drop("k")
    val expect = brutePairs(p, iv0.withColumn("k", lit(-1L))
      .select("iid", "k", "s", "e"), keyed = false)
    assert(opPairs(p.drop("k"), iv, Nil, 50L).toSet == expect)
  }

  test("bounds are inclusive; zero-length and inverted intervals") {
    val p = Seq((1L, 100L), (2L, 101L), (3L, 99L)).toDF("pid", "ts")
    val iv = Seq((10L, 100L, 100L), // zero-length: matches ts=100 only
                 (11L, 105L, 103L)) // inverted: never matches
      .toDF("iid", "s", "e")
    val got = opPairs(p, iv, Nil, 10L)
    assert(got.toSet == Set((1L, 10L)))
  }

  test("negative timestamps bucket correctly (floor division)") {
    val p = Seq((1L, -95L), (2L, -105L), (3L, 5L)).toDF("pid", "ts")
    val iv = Seq((10L, -100L, 10L)).toDF("iid", "s", "e")
    assert(opPairs(p, iv, Nil, 10L).toSet == Set((1L, 10L), (3L, 10L)))
  }

  test("bucket arithmetic is exact beyond 2^53 (nanosecond-scale epochs)") {
    // double floor(ts/w) rounds here: base is not representable as a
    // double, so a boundary point one bucket below an interval start
    // would mis-bucket into a false match (or a true match would vanish)
    val base = (1L << 60) + 1L // odd, far beyond double's 2^53 mantissa
    val w = 1000L
    val p = Seq((1L, base), (2L, base - 1L), (3L, base + 999L))
      .toDF("pid", "ts")
    val iv = Seq((10L, base, base + 999L)).toDF("iid", "s", "e")
    assert(opPairs(p, iv, Nil, w).toSet == Set((1L, 10L), (3L, 10L)))
  }

  test("plan has no cartesian or broadcast-nested-loop join") {
    val (p, iv) = randData(3)
    val out = RangeJoin.pointInInterval(p, "ts", iv, "s", "e", Seq("k"), 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  test("input validation: width, non-integral columns, collisions") {
    val (p, iv) = randData(4)
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(p, "ts", iv, "s", "e", Seq("k"), 0L))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(p.withColumn("ts", col("ts").cast("double")),
        "ts", iv, "s", "e", Seq("k"), 10L))
    intercept[IllegalArgumentException]( // pid exists on both sides
      RangeJoin.pointInInterval(p, "ts", iv.withColumnRenamed("iid", "pid"),
        "s", "e", Seq("k"), 10L))
  }
}
