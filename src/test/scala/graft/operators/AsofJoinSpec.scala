package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contracts for [[AsofJoin]]: equivalence with a brute-force
  * per-left-row argmax on randomized data (ts collisions forced by a
  * small time domain), direction/tolerance/joinType semantics, equal-ts
  * inclusivity, duplicate-right-ts determinism, and the no-join plan
  * shape (one window pass, no join operator). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // small ts domain => guaranteed left/right and right/right ts collisions
  private def randTables(seed: Int, nl: Int = 200, nr: Int = 150)
      : (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val left = (0 until nl).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
      .toDF("lid", "k", "lts", "lval")
    val right = (0 until nr).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
      .toDF("rid", "k", "rts", "rval")
    (left, right)
  }

  /** Driver-side reference: winner = max (ts, rid) among eligible. */
  private def brute(left: DataFrame, right: DataFrame, direction: String,
                    tolerance: Option[Long]): Map[Long, Option[Long]] = {
    val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ls.map { case (lid, k, lts) =>
      val elig = rs.filter { case (_, rk, rts) =>
        rk == k &&
          (if (direction == "backward") rts <= lts else rts >= lts) &&
          tolerance.forall(t => math.abs(lts - rts) <= t)
      }
      val win =
        if (elig.isEmpty) None
        else if (direction == "backward")
          // latest ts; ties -> max rid (the declared tie-break winner)
          Some(elig.maxBy { case (rid, _, rts) => (rts, rid) }._1)
        else
          // earliest ts; ties -> max rid
          Some(elig.minBy { case (rid, _, rts) => (rts, -rid) }._1)
      lid -> win
    }.toMap
  }

  private def runOp(left: DataFrame, right: DataFrame, direction: String,
                    tolerance: Option[Long], joinType: String): Map[Long, Option[Long]] = {
    val out = AsofJoin.join(left, right, Seq("k"), "lts", "rts",
      direction = direction, tolerance = tolerance, joinType = joinType,
      rightTieBreak = Some("rid"))
    out.select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
  }

  test("backward inner equals brute force (random, ts collisions)") {
    for (seed <- 1 to 3) {
      val (l, r) = randTables(seed)
      val expect = brute(l, r, "backward", None).filter(_._2.isDefined)
      assert(runOp(l, r, "backward", None, "inner") == expect)
    }
  }

  test("forward inner equals brute force") {
    val (l, r) = randTables(7)
    val expect = brute(l, r, "forward", None).filter(_._2.isDefined)
    assert(runOp(l, r, "forward", None, "inner") == expect)
  }

  test("nearest equals brute force (closer wins; distance ties prefer backward)") {
    for (seed <- Seq(21, 23)) {
      val (l, r) = randTables(seed)
      val ls = l.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      val rs = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      val expect = ls.map { case (lid, k, lts) =>
        val elig = rs.filter(_._2 == k)
        val win =
          if (elig.isEmpty) None
          else Some(elig.minBy { case (rid, _, rts) =>
            // min |gap|; ties prefer backward (rts <= lts), then max rid
            (math.abs(lts - rts), if (rts <= lts) 0 else 1, -rid)
          }._1)
        lid -> win
      }.toMap.filter(_._2.isDefined)
      assert(runOp(l, r, "nearest", None, "inner") == expect, s"seed=$seed")
    }
  }

  test("forward works on non-integral (timestamp) ts columns") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val (l0, r0) = randTables(29)
    val l = l0.withColumn("lts", timestamp_micros(col("lts") * 1000000L))
    val r = r0.withColumn("rts", timestamp_micros(col("rts") * 1000000L))
    val got = AsofJoin.join(l, r, Seq("k"), "lts", "rts",
      direction = "forward", rightTieBreak = Some("rid"))
      .select("lid", "rid").collect()
      .map(x => x.getLong(0) -> Some(x.getLong(1))).toMap
    val expect = brute(l0, r0, "forward", None).filter(_._2.isDefined)
    assert(got == expect)
  }

  test("left join keeps unmatched rows with null right columns") {
    val (l, r) = randTables(11)
    val expect = brute(l, r, "backward", None)
    val got = runOp(l, r, "backward", None, "left")
    assert(got == expect)
    assert(got.size == l.count())
  }

  test("tolerance drops (inner) / nulls (left) too-distant matches") {
    val (l, r) = randTables(13)
    val tol = Some(3L)
    assert(runOp(l, r, "backward", tol, "inner") ==
      brute(l, r, "backward", tol).filter(_._2.isDefined))
    assert(runOp(l, r, "forward", tol, "left") == brute(l, r, "forward", tol))
  }

  test("a right row at exactly leftTs matches in both directions") {
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "lts")
    val r = Seq((9L, 1L, 100L, "x")).toDF("rid", "k", "rts", "tag")
    for (dir <- Seq("backward", "forward")) {
      val out = AsofJoin.join(l, r, Seq("k"), "lts", "rts", direction = dir,
        rightTieBreak = Some("rid")).collect()
      assert(out.length == 1 && out.head.getAs[String]("tag") == "x", dir)
    }
  }

  test("duplicate right (key, ts) rows: max tie-break wins, deterministically") {
    val l = Seq((1L, 1L, 50L)).toDF("lid", "k", "lts")
    val r = Seq((3L, 1L, 40L, "lo"), (8L, 1L, 40L, "hi"), (5L, 1L, 40L, "mid"))
      .toDF("rid", "k", "rts", "tag").repartition(3) // spread across tasks
    for (_ <- 1 to 3) {
      val out = AsofJoin.join(l, r, Seq("k"), "lts", "rts",
        rightTieBreak = Some("rid")).collect()
      assert(out.length == 1 && out.head.getAs[Long]("rid") == 8L)
    }
  }

  test("plan contains a window, no join operator, one exchange") {
    val (l, r) = randTables(17)
    val out = AsofJoin.join(l, r, Seq("k"), "lts", "rts",
      rightTieBreak = Some("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
  }

  test("NULL keys never match (SQL equality), both join types") {
    val l = Seq((1L, Some(1L), 100L), (2L, None, 100L))
      .toDF("lid", "k", "lts")
    val r = Seq((9L, Some(1L), 90L, "a"), (8L, None, 90L, "b"))
      .toDF("rid", "k", "rts", "tag")
    val inner = AsofJoin.join(l, r, Seq("k"), "lts", "rts",
      rightTieBreak = Some("rid")).collect()
    assert(inner.map(_.getAs[Long]("lid")).toSeq == Seq(1L),
      "null-key left row must not match a null-key right row")
    val outer = AsofJoin.join(l, r, Seq("k"), "lts", "rts",
      joinType = "left", rightTieBreak = Some("rid"))
      .collect().map(row => row.getAs[Long]("lid") -> row.isNullAt(row.fieldIndex("rid"))).toMap
    assert(outer == Map(1L -> false, 2L -> true))
  }

  test("input validation: direction, joinType, ts type mismatch, collisions") {
    val (l, r) = randTables(19)
    intercept[IllegalArgumentException](
      AsofJoin.join(l, r, Seq("k"), "lts", "rts", direction = "sideways"))
    intercept[IllegalArgumentException]( // nearest needs integral ts
      AsofJoin.join(
        l.withColumn("lts", timestamp_micros(col("lts"))),
        r.withColumn("rts", timestamp_micros(col("rts"))),
        Seq("k"), "lts", "rts", direction = "nearest"))
    intercept[IllegalArgumentException](
      AsofJoin.join(l, r, Seq("k"), "lts", "rts", joinType = "full"))
    intercept[IllegalArgumentException](
      AsofJoin.join(l, r.withColumn("rts", col("rts").cast("int")),
        Seq("k"), "lts", "rts"))
    intercept[IllegalArgumentException]( // lval exists on both sides
      AsofJoin.join(l, r.withColumnRenamed("rval", "lval"),
        Seq("k"), "lts", "rts"))
    intercept[IllegalArgumentException](
      AsofJoin.join(l, r, Nil, "lts", "rts"))
  }
}
