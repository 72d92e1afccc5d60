package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** As-of (point-in-time) join: for each left row, the SINGLE right row
  * with the largest `rightTs <= leftTs` (backward, the default), the
  * smallest `rightTs >= leftTs` (forward), or whichever of those two is
  * closer in time (nearest), matching on equal `keys` —
  * the event/feature-alignment step of a training-data pipeline (join
  * every interaction to the most recent model score, price, or error
  * that preceded it). Same semantics as DuckDB's `ASOF JOIN` and
  * pandas `merge_asof`.
  *
  * The reference extension has no as-of machinery
  * (`/root/reference/src`, SURVEY §2.3); this is a Spark-first
  * extension operator.
  *
  * Scale shape — the union-window plan, NOT a join: tag both inputs,
  * union them, and run ONE window pass partitioned by `keys` ordered by
  * (ts, side, tie); `last(right_payload, ignoreNulls)` over the
  * unbounded-preceding frame hands every left row its predecessor.
  * That is a single hash exchange of left+right (no join operator, no
  * per-key row explosion, no range-condition nested loop — Spark's
  * built-in join would plan exactly that for a `ts >= ts` predicate).
  * A hot key is one shuffle partition's worth of sorted rows, never a
  * pair blow-up. At 100 TB both sides stream through the sort; nothing
  * collects.
  *
  * Determinism: equal `rightTs` ties within a key resolve to the LAST
  * row in `rightTieBreak` order (i.e. the max tie-break value). Pass a
  * unique column (an id) whenever right (key, ts) pairs can repeat;
  * with no tie-break and duplicate right timestamps the winner follows
  * shuffle order.
  *
  * A right row at exactly `leftTs` matches in BOTH directions
  * (inclusive comparison, mirroring `ASOF JOIN ... ON l.ts >= r.ts`).
  */
object AsofJoin {

  /** @param keys        equality key columns, present in both inputs
    * @param leftTs      left event-time column (any orderable type;
    *                    integral required when `tolerance` is set or
    *                    `direction` is "nearest" — both need gap
    *                    arithmetic)
    * @param rightTs     right event-time column, same type as `leftTs`
    * @param direction   "backward" (latest right at-or-before left),
    *                    "forward" (earliest right at-or-after left), or
    *                    "nearest" (whichever of the two is closer in
    *                    time; exact-distance ties prefer backward —
    *                    pandas merge_asof semantics)
    * @param tolerance   max |leftTs - rightTs| for a match to count
    *                    (same unit as the ts columns); matches farther
    *                    away are dropped (inner) or nulled (left)
    * @param joinType    "inner" (drop unmatched left rows) or "left"
    *                    (keep them with null right columns)
    * @param rightTieBreak column resolving duplicate right (key, ts)
    *                    rows — the max value wins
    * @return left columns followed by the matched right row's non-key
    *         columns (including `rightTs`); names must not collide
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           direction: String = "backward",
           tolerance: Option[Long] = None,
           joinType: String = "inner",
           rightTieBreak: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got '$joinType'")
    val lt = left.schema(leftTs).dataType
    val rt = right.schema(rightTs).dataType
    require(lt == rt, s"ts type mismatch: $leftTs is $lt, $rightTs is $rt")
    val integral = Seq(ByteType, ShortType, IntegerType, LongType)
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be >= 0, got $t")
      require(integral.contains(lt),
        s"tolerance needs an integral ts column, got $lt")
    }
    if (direction == "nearest")
      require(integral.contains(lt),
        s"nearest direction needs an integral ts column (gap comparison), got $lt")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    require(rPayload.contains(rightTs),
      s"$rightTs must not be one of the key columns")
    val collisions = left.columns.toSet.intersect(rPayload.toSet)
    require(collisions.isEmpty,
      s"rename right columns colliding with left: ${collisions.mkString(", ")}")

    val lRows = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        (rightTieBreak match {
          case Some(tb) => lit(null).cast(right.schema(tb).dataType)
          case None     => lit(null).cast("int")
        }).as("__tie"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))).as("__r")): _*)
    // SQL equality never matches a NULL key: drop null-key right rows so
    // the null-key window partition holds no candidates (null-key left
    // rows then drop under inner / null out under left — join semantics,
    // not group-the-nulls window semantics)
    val rRows = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"),
          lit(0).as("__side"),
          rightTieBreak.map(col).getOrElse(lit(null).cast("int")).as("__tie"),
          lit(null).cast(lRows.schema("__l").dataType).as("__l"),
          struct(rPayload.map(col): _*).as("__r")): _*)

    // Both directions run on ONE hash exchange; each is a window over it
    // (different sort order, same partitioning — Spark reuses the
    // shuffle). Backward frame: rights at equal ts sort BEFORE the left
    // row (side asc) so an exactly-simultaneous right is visible; tie
    // asc + last() = max tie-break wins. Forward frame: rights at equal
    // ts sort AFTER the left row (side desc); tie desc + first() keeps
    // the same max-tie-break winner rule.
    val pb = Window.partitionBy(keys.map(col): _*)
    val wB = pb.orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = pb.orderBy(col("__ts").asc, col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bMatch = last(col("__r"), ignoreNulls = true).over(wB)
    val fMatch = first(col("__r"), ignoreNulls = true).over(wF)

    def gapOf(m: org.apache.spark.sql.Column) =
      abs(m(rightTs).cast("long") - col("__l")(leftTs).cast("long"))
    val matchedCol = direction match {
      case "backward" => bMatch
      case "forward"  => fMatch
      case "nearest" =>
        // closer wins; equal distance or missing forward -> backward
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(gapOf(col("__f")) < gapOf(col("__b")), col("__f"))
          .otherwise(col("__b"))
    }

    val gapOk = tolerance match {
      case None    => lit(true)
      case Some(t) => gapOf(col("__match")) <= t
    }
    val valid = col("__match").isNotNull && gapOk

    val unioned = lRows.unionByName(rRows)
    val base = (direction match {
      case "nearest" =>
        unioned.withColumn("__b", bMatch).withColumn("__f", fMatch)
          .withColumn("__match", matchedCol).drop("__b", "__f")
      case _ => unioned.withColumn("__match", matchedCol)
    }).filter(col("__side") === 1)
    val withMatch =
      if (joinType == "inner") base.filter(valid)
      else base.withColumn("__match", when(valid, col("__match")))
    withMatch.select(
      left.columns.map(c => col("__l")(c).as(c)) ++
        rPayload.map(c => col("__match")(c).as(c)): _*)
  }
}
