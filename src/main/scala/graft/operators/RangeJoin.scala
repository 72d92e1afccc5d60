package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Point-in-interval range join: every (point, interval) pair with
  * `start <= ts <= end` (inclusive) and equal `keys` — "which events
  * fall inside which session / error window / validity period". The
  * training-pipeline uses: windowed label attribution, contamination
  * windows around benchmark timestamps, feature validity intervals.
  *
  * The reference extension has no range-join machinery (SURVEY §2.3);
  * this is a Spark-first extension operator.
  *
  * Scale shape — bucketed equi-join, NOT a nested loop: Spark plans a
  * bare `ts BETWEEN start AND end` predicate as BroadcastNestedLoop /
  * Cartesian (O(|points|·|intervals|) comparisons even when the output
  * is tiny). Instead, time is cut into fixed `bucketWidth` buckets;
  * each interval explodes to the buckets it covers
  * (`(end-start)/width + 1` rows — bounded when widths are chosen near
  * the typical interval length) while each point maps to exactly ONE
  * bucket, so the (keys, bucket) hash equi-join needs NO post-dedup and
  * the exact containment filter runs only on bucket-colocated pairs.
  * One hash exchange per side; comparisons shrink from |P|·|I| to
  * sum over buckets of |P_b|·|I_b|. AQE handles residual bucket skew.
  *
  * Pick `bucketWidth` near the median interval length: much smaller
  * multiplies the interval explode; much larger degrades toward the
  * all-pairs comparison within a bucket.
  */
object RangeJoin {

  /** @param points      point-event side
    * @param tsCol       integral event-time column on `points`
    * @param intervals   interval side; rows with `end < start` never match
    * @param startCol    integral inclusive lower bound on `intervals`
    * @param endCol      integral inclusive upper bound on `intervals`
    * @param keys        optional equality keys present in both inputs
    * @param bucketWidth bucket size in ts units (> 0)
    * @return point columns followed by interval non-key columns; names
    *         must not collide
    */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keys: Seq[String] = Nil,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    for ((df, c) <- Seq((points, tsCol), (intervals, startCol), (intervals, endCol)))
      require(integral.contains(df.schema(c).dataType),
        s"$c must be integral (bucket arithmetic), got ${df.schema(c).dataType}")
    val iPayload = intervals.columns.filterNot(keys.contains).toSeq
    val collisions = points.columns.toSet.intersect(iPayload.toSet)
    require(collisions.isEmpty,
      s"rename interval columns colliding with points: ${collisions.mkString(", ")}")

    // exact integer floor division (sign-correct for negative epochs):
    // (c - pmod(c, w)) is an exact multiple of w, so the SQL `div` has
    // no fraction to truncate. Double-based floor(c/w) would round for
    // |ts| > 2^53 — nanosecond epochs (~1.7e18) would mis-bucket
    // boundary points into missed matches.
    def withBucket(df: DataFrame, of: String*): DataFrame = {
      val tmp = of.zipWithIndex.map { case (c, i) => c -> s"__rjt$i" }
      val named = tmp.foldLeft(df) { case (d, (c, t)) =>
        d.withColumn(t, col(c).cast("long"))
      }
      val bucketExprs = tmp.map { case (_, t) =>
        expr(s"($t - pmod($t, ${bucketWidth}L)) div ${bucketWidth}L")
      }
      val withB =
        if (bucketExprs.size == 1) named.withColumn("__b", bucketExprs.head)
        else named.withColumn("__b",
          explode(sequence(bucketExprs(0), bucketExprs(1))))
      withB.drop(tmp.map(_._2): _*)
    }

    val p = withBucket(points, tsCol)
    val iv = withBucket(intervals.filter(col(endCol) >= col(startCol)),
      startCol, endCol)
    p.join(iv, keys :+ "__b")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .select(points.columns.map(col) ++ iPayload.map(col): _*)
  }
}
