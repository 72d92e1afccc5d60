package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QuerySupport._

/** Relational-engine sanity surface over the driver's TPC-H-ish testdata.
  * The reference delegates all of this to the DuckDB host engine; here it
  * demonstrates the Spark host side the ANN operators compose with.
  * All plans are scale-clean: partial aggregation, broadcastable dims,
  * no driver-side loops.
  */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q2_join_agg" -> ((s: SparkSession, dir: String) => {
      val customer = table(s, dir, "customer")
      val nation = table(s, dir, "nation")
      val orders = table(s, dir, "orders")
      // nation is tiny → broadcast; customer joins orders on custkey (shuffle
      // hash at scale, AQE decides). No order-sensitive double arithmetic.
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("n_name")
    }),

    "q3_window" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      table(s, dir, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id", "rn")
        .orderBy("user_id", "rn")
    }),

    "q4_topk_orders" -> ((s: SparkSession, dir: String) => {
      // global top-k: executes as per-partition TakeOrdered + merge.
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // §2.6 set operations: INTERSECT/EXCEPT composition (distinct set
    // semantics, matching SQL INTERSECT/EXCEPT)
    "q6_setops" -> ((s: SparkSession, dir: String) => {
      val orders = table(s, dir, "orders")
      val customer = table(s, dir, "customer")
      val bigSpenders = orders.filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      val richCustomers = customer.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val nation3 = customer.filter(col("c_nationkey") === 3)
        .select(col("c_custkey").as("custkey"))
      bigSpenders.intersect(richCustomers).except(nation3).orderBy("custkey")
    }),

    "q5_events_hourly" -> ((s: SparkSession, dir: String) => {
      // epoch-micros integer arithmetic keeps full precision on either ts
      // vintage (raw-nanos magnitudes exceed double's 53-bit mantissa).
      val ev = table(s, dir, "events")
      ev.withColumn("__tsu", QuerySupport.tsMicros(ev))
        .groupBy(
          col("event_type"),
          (expr("__tsu div 3600000000") * 3600L).as("hour_epoch"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "hour_epoch")
    }),

    // gap-based sessionization (30-minute gaps): per-session aggregates
    // over the interaction log — one partitioned window pass, ties broken
    // by event_id so session ids are a pure function of the data. Both
    // engines compute on MICROSECOND-truncated epochs (DuckDB's TIMESTAMP
    // arithmetic is micros; Spark's raw nanos `div 1000` matches it
    // exactly). Strict.
    "events_sessions" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
      graft.pipeline.Sessionize.sessions(
          ev.withColumn("ts_us", QuerySupport.tsMicros(ev)),
          "user_id", "ts_us", "event_id", gap = 1800000000L)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("start_ts"), col("end_ts"))
        .orderBy("user_id", "session_seq")
    }),

    // as-of join (backward): each click joined to the most recent error
    // at-or-before it by the same user — the union-window plan (one hash
    // exchange, no join operator; AsofJoin scaladoc). The right side is
    // pre-deduped on (user, ts) keeping max event_id so both engines are
    // deterministic even under timestamp collisions. Strict vs DuckDB's
    // native ASOF JOIN.
    "events_asof" -> ((s: SparkSession, dir: String) => {
      val ev0 = table(s, dir, "events")
      val ev = ev0.withColumn("ts_us", QuerySupport.tsMicros(ev0))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val dedup = Window.partitionBy("user_id", "err_ts")
        .orderBy(col("err_event_id").desc)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us").as("err_ts"),
          col("event_id").as("err_event_id"), col("value").as("err_value"))
        .withColumn("__rn", row_number().over(dedup))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsofJoin.join(clicks, errors, Seq("user_id"),
          "ts_us", "err_ts", rightTieBreak = Some("err_event_id"))
        .orderBy("event_id")
    }),

    // as-of join (forward + tolerance): the next error within 12 h after
    // each click — the label-attribution shape ("did an error follow this
    // interaction soon enough"). Strict vs DuckDB ASOF with <=.
    "events_asof_fwd" -> ((s: SparkSession, dir: String) => {
      val ev0 = table(s, dir, "events")
      val ev = ev0.withColumn("ts_us", QuerySupport.tsMicros(ev0))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val dedup = Window.partitionBy("user_id", "err_ts")
        .orderBy(col("err_event_id").desc)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us").as("err_ts"),
          col("event_id").as("err_event_id"))
        .withColumn("__rn", row_number().over(dedup))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsofJoin.join(clicks, errors, Seq("user_id"),
          "ts_us", "err_ts", direction = "forward",
          tolerance = Some(43200000000L), rightTieBreak = Some("err_event_id"))
        .orderBy("event_id")
    }),

    // as-of join (left-outer): every click kept; the 150 first-activity
    // clicks with no prior error carry null right columns. Strict vs
    // DuckDB's native ASOF LEFT JOIN.
    "events_asof_left" -> ((s: SparkSession, dir: String) => {
      val ev0 = table(s, dir, "events")
      val ev = ev0.withColumn("ts_us", QuerySupport.tsMicros(ev0))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val dedup = Window.partitionBy("user_id", "err_ts")
        .orderBy(col("err_event_id").desc)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us").as("err_ts"),
          col("event_id").as("err_event_id"))
        .withColumn("__rn", row_number().over(dedup))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsofJoin.join(clicks, errors, Seq("user_id"),
          "ts_us", "err_ts", joinType = "left",
          rightTieBreak = Some("err_event_id"))
        .orderBy("event_id")
    }),

    // as-of join (nearest): the temporally closest error to each click,
    // either side, distance ties preferring backward (pandas merge_asof
    // semantics). Strict vs a DuckDB join-then-argmin emulation — the
    // oracle pays the pair term the operator avoids, fine at oracle SF.
    "events_asof_nearest" -> ((s: SparkSession, dir: String) => {
      val ev0 = table(s, dir, "events")
      val ev = ev0.withColumn("ts_us", QuerySupport.tsMicros(ev0))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us").as("err_ts"),
          col("event_id").as("err_event_id"))
      graft.operators.AsofJoin.join(clicks, errors, Seq("user_id"),
          "ts_us", "err_ts", direction = "nearest",
          rightTieBreak = Some("err_event_id"))
        .orderBy("event_id")
    }),

    // range (interval containment) join: clicks falling inside the 12 h
    // window after EVERY error by the same user — multi-match, unlike the
    // as-of single-winner. Bucketed equi-join (RangeJoin scaladoc), no
    // nested loop. Strict vs DuckDB's inequality join.
    "events_range_join" -> ((s: SparkSession, dir: String) => {
      val ev0 = table(s, dir, "events")
      val ev = ev0.withColumn("ts_us", QuerySupport.tsMicros(ev0))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val windows = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_event_id"),
          col("ts_us").as("err_ts"),
          (col("ts_us") + 43200000000L).as("win_end"))
      graft.operators.RangeJoin.pointInInterval(clicks, "ts_us", windows,
          "err_ts", "win_end", Seq("user_id"), bucketWidth = 43200000000L)
        .select("event_id", "user_id", "ts_us", "err_event_id", "err_ts")
        .orderBy("event_id", "err_event_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_join_agg" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q3_window" ->
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS BIGINT) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "q4_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q6_setops" ->
      """SELECT * FROM (
        |  (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
        |   INTERSECT
        |   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_nationkey = 3) t
        |ORDER BY custkey""".stripMargin,

    "q5_events_hourly" ->
      """SELECT event_type,
        | CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same lag/cumsum arithmetic on epoch-micros; 30 min = 1.8e9 us
    "events_sessions" ->
      """SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
        | min(tsu) AS start_ts, max(tsu) AS end_ts
        |FROM (
        |  SELECT user_id, tsu,
        |    CAST(SUM(CASE WHEN prev IS NULL OR tsu - prev > 1800000000
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu,
        |          lag(epoch_us(ts)) OVER (
        |            PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |        FROM events) a) b
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    // DuckDB's native ASOF JOIN is the independent implementation of the
    // same point-in-time semantics; QUALIFY dedup mirrors the Spark side's
    // deterministic (user, ts) winner
    "events_asof" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                   event_type, value FROM events),
        |l AS (SELECT event_id, user_id, ts_us, value FROM ev
        |      WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts_us AS err_ts, event_id AS err_event_id,
        |             value AS err_value
        |      FROM ev WHERE event_type = 'error'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts_us
        |                                 ORDER BY event_id DESC) = 1)
        |SELECT l.event_id, l.user_id, l.ts_us, l.value,
        |       r.err_event_id, r.err_ts, r.err_value
        |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.err_ts
        |ORDER BY l.event_id""".stripMargin,

    "events_asof_fwd" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                   event_type FROM events),
        |l AS (SELECT event_id, user_id, ts_us FROM ev
        |      WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts_us AS err_ts, event_id AS err_event_id
        |      FROM ev WHERE event_type = 'error'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts_us
        |                                 ORDER BY event_id DESC) = 1)
        |SELECT l.event_id, l.user_id, l.ts_us, r.err_ts, r.err_event_id
        |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts_us <= r.err_ts
        |WHERE r.err_ts - l.ts_us <= 43200000000
        |ORDER BY l.event_id""".stripMargin,

    "events_asof_left" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                   event_type FROM events),
        |l AS (SELECT event_id, user_id, ts_us FROM ev
        |      WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts_us AS err_ts, event_id AS err_event_id
        |      FROM ev WHERE event_type = 'error'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts_us
        |                                 ORDER BY event_id DESC) = 1)
        |SELECT l.event_id, l.user_id, l.ts_us, r.err_event_id, r.err_ts
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.err_ts
        |ORDER BY l.event_id""".stripMargin,

    // join-then-argmin: min |gap|, backward preferred on distance ties,
    // max err_event_id on full ties — the operator's exact winner rule
    "events_asof_nearest" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                   event_type FROM events),
        |l AS (SELECT event_id, user_id, ts_us FROM ev
        |      WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts_us AS err_ts, event_id AS err_event_id
        |      FROM ev WHERE event_type = 'error'),
        |pairs AS (
        |  SELECT l.event_id, l.user_id, l.ts_us, r.err_event_id, r.err_ts,
        |         abs(l.ts_us - r.err_ts) AS gap,
        |         CASE WHEN r.err_ts <= l.ts_us THEN 0 ELSE 1 END AS fw
        |  FROM l JOIN r USING (user_id))
        |SELECT event_id, user_id, ts_us, err_event_id, err_ts FROM pairs
        |QUALIFY row_number() OVER (PARTITION BY event_id
        |                           ORDER BY gap, fw, err_event_id DESC) = 1
        |ORDER BY event_id""".stripMargin,

    "events_range_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                   event_type FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM ev
        |      WHERE event_type = 'click'),
        |e AS (SELECT event_id AS err_event_id, user_id, ts_us AS err_ts
        |      FROM ev WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, c.ts_us, e.err_event_id, e.err_ts
        |FROM c JOIN e ON c.user_id = e.user_id
        |  AND c.ts_us >= e.err_ts AND c.ts_us <= e.err_ts + 43200000000
        |ORDER BY c.event_id, e.err_event_id""".stripMargin
  )
}
