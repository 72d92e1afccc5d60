package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard telemetry/interaction-log
  * grouping step a training-data pipeline runs before per-session
  * filtering, sampling, or sequence assembly: events of one user belong
  * to the same session while consecutive gaps stay within `gap`.
  *
  * Scale posture: one partitioned window pass (shuffle by user, parallel
  * across users; within-user ordering is the sessionization definition,
  * not an implementation choice). Deterministic: ties on the timestamp
  * break by `tieBreakCol`, so session ids are a pure function of the
  * data. The streaming analogue is Spark's built-in
  * `session_window` (see [[graft.streaming.StreamingPipeline]]).
  */
object Sessionize {

  /** Adds `session_seq` (1-based per user, in time order): a new session
    * starts at the first event and whenever `ts - prev_ts > gap`.
    * `tsCol` is any numeric epoch column; `gap` shares its unit (the
    * driver testdata carries nanos). */
  def assign(df: DataFrame, userCol: String, tsCol: String,
             tieBreakCol: String, gap: Long): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreakCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregate: (user, session_seq, n_events, start, end). */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               tieBreakCol: String, gap: Long): DataFrame =
    assign(df, userCol, tsCol, tieBreakCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))

  /** Keep-filter for session-level cuts (e.g. drop bot-like sessions with
    * too many events, or singleton sessions): the session predicate joins
    * back by (user, session_seq) as a semi-join — both sides already
    * shuffled on the user key by the window pass, so AQE plans the cheap
    * side (session keys, one row per session) as the build side. */
  def filterSessions(df: DataFrame, userCol: String, tsCol: String,
                     tieBreakCol: String, gap: Long,
                     keep: Column): DataFrame = {
    val tagged = assign(df, userCol, tsCol, tieBreakCol, gap)
    val keepKeys = tagged.groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))
      .filter(keep)
      .select(col(userCol), col("session_seq"))
    tagged.join(keepKeys, Seq(userCol, "session_seq"), "left_semi")
  }
}
