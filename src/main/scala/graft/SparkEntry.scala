package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TimeSeries
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
  )
}
