package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Relational, TimeSeries}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in [[oracleSql]]
  * (DuckDB-runnable over the same parquet tables) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  *
  * Determinism rules (so the DuckDB compare hash-matches):
  *  - timestamps leave the engine as epoch-microsecond BIGINTs (`ts_us`);
  *  - double sums/averages go through exact DECIMAL(18,2) accumulation
  *    (order-independent) before casting back to double;
  *  - every LIMIT is preceded by a total-order ORDER BY.
  */
object SparkEntry {

  // Shared query constants (mirrored verbatim in the oracle SQL below).
  private val RangeStart = "2024-01-05 00:00:00"
  private val RangeEnd   = "2024-01-12 00:00:00"
  private val LimitCap   = 500
  private val ShipBefore = "2000-01-01 00:00:00"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TimeSeries.rangeScan(
      Tables.events(spark, "/root/testdata/sf0.001"), RangeStart, RangeEnd)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference-fidelity core (SURVEY §2.1 O2-O6 + §2.2 window ops) ---
    "q_range_scan" -> ((s, dir) =>
      TimeSeries.rangeScan(Tables.events(s, dir), RangeStart, RangeEnd)),
    "q_range_scan_limit" -> ((s, dir) =>
      TimeSeries.rangeScanLimit(Tables.events(s, dir), RangeStart, RangeEnd, LimitCap)),
    "q_shard_prune" -> ((s, dir) =>
      TimeSeries.shardPrune(Tables.events(s, dir))),
    "q_downsample_1h" -> ((s, dir) =>
      TimeSeries.downsample1h(Tables.events(s, dir))),
    "q_window_delta" -> ((s, dir) =>
      TimeSeries.windowDelta(Tables.events(s, dir))),
    "q_moving_avg" -> ((s, dir) =>
      TimeSeries.movingAvg(Tables.events(s, dir))),
    "q_topk_hours" -> ((s, dir) =>
      TimeSeries.topkHours(Tables.events(s, dir), 5)),

    // --- relational extension surface (SURVEY §2.2) ---
    "q_tpch_pricing" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir), ShipBefore)),
    "q_join_segment_revenue" -> ((s, dir) =>
      Relational.segmentRevenue(Tables.orders(s, dir), Tables.customer(s, dir))),
    "q_star_join_region" -> ((s, dir) =>
      Relational.regionNationRevenue(
        Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir), "ASIA")),
    "q_semi_join" -> ((s, dir) =>
      Relational.customersWithOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_anti_join" -> ((s, dir) =>
      Relational.customersWithoutOrders(Tables.customer(s, dir), Tables.orders(s, dir), "P")),
    "q_rollup" -> ((s, dir) =>
      Relational.rollupQty(Tables.lineitem(s, dir))),
    "q_cube" -> ((s, dir) =>
      Relational.cubeOrders(Tables.orders(s, dir))),
    "q_except" -> ((s, dir) =>
      Relational.exceptCustkeys(Tables.customer(s, dir), Tables.orders(s, dir), "P")),
    "q_intersect" -> ((s, dir) =>
      Relational.intersectCustkeys(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_topk_orders" -> ((s, dir) =>
      Relational.topkOrders(Tables.orders(s, dir), 10)),
    "q_json_extract" -> ((s, dir) =>
      Relational.jsonKeyDistribution(Tables.events(s, dir))),
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.asOf(purchases, errors, "user_id", "ts",
          Seq("ts" -> "err_ts", "value" -> "err_value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("err_ts")).as("err_ts_us"),
          col("err_value"))
    }),
  )

  /** DuckDB oracle SQL, one per [[queries]] key; column names/aliases match
    * the Spark output exactly (driver compare sorts columns by name). */
  def oracleSql: Map[String, String] = Map(
    "q_range_scan" ->
      s"""SELECT event_id, epoch_us(ts) AS ts_us, value
         |FROM events
         |WHERE ts BETWEEN TIMESTAMP '$RangeStart' AND TIMESTAMP '$RangeEnd'""".stripMargin,
    "q_range_scan_limit" ->
      s"""SELECT event_id, epoch_us(ts) AS ts_us, value
         |FROM events
         |WHERE ts BETWEEN TIMESTAMP '$RangeStart' AND TIMESTAMP '$RangeEnd'
         |ORDER BY ts_us, event_id LIMIT $LimitCap""".stripMargin,
    "q_shard_prune" ->
      """SELECT epoch_ms(ts) // 3600000 AS shard_hour,
        |       count(*) AS n_points,
        |       min(epoch_us(ts)) AS min_ts_us,
        |       max(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY 1""".stripMargin,
    "q_downsample_1h" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
        |       count(*) AS n_points,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_window_delta" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us, value,
        |       value - lag(value, 1) OVER w AS delta,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS ts_delta_us
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin,
    "q_moving_avg" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / count(*) OVER w AS moving_avg
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |             ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_topk_hours" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
        |       count(*) AS n_points
        |FROM events GROUP BY 1
        |ORDER BY avg_value DESC, bucket_us LIMIT 5""".stripMargin,
    "q_tpch_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         |         AS sum_disc_price,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$ShipBefore'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_segment_revenue" ->
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_star_join_region" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |       count(*) AS n,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY 1""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |       epoch_us(e.ts) AS err_ts_us, e.value AS err_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id AND e.ts <= p.ts""".stripMargin,
  )
}
