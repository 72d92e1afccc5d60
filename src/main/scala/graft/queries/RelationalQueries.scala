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
        |ORDER BY user_id, session_seq""".stripMargin
  )
}
