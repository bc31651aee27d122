package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.{shardHourCol, ShardDurationMs}

/** Structured-Streaming ingest — the durable write path the reference's
  * README *claims* (WAL + memtable, README.md:17-23) but never implements
  * (SURVEY.md §1.3): checkpointed exactly-once file-sink ingestion plays the
  * WAL role; watermarked tumbling windows reproduce the hour-shard
  * aggregation semantics on late/out-of-order data with a *defined* policy
  * (the reference silently appends out-of-order points, SURVEY.md §1.4).
  */
object StreamingIngest {

  /** Continuous ingest: stream a source directory of point files into the
    * hour-partitioned store with checkpointed (WAL) progress. */
  def ingestStream(spark: SparkSession, sourceDir: String, schema: StructType,
      storePath: String, checkpoint: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("shard_hour", shardHourCol(col("timestamp")))
      .writeStream
      .partitionBy("shard_hour")
      .format("parquet")
      .option("path", storePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Exactly-once streaming ingest into a SNAPSHOT-MANIFEST store (log
    * v2, r11). The plain [[ingestStream]] file sink is exactly-once only
    * for readers of ITS `_spark_metadata`; a snapshot store's truth is
    * the manifest, and `foreachBatch` is AT-LEAST-ONCE on restart (the
    * batch in flight when the query died is re-delivered). Each commit
    * therefore carries a `txn <appId> <batchId>` high-water in the
    * manifest — the Delta-style idempotence token: a re-delivered batch
    * id at-or-below the committed high-water is a no-op, and an attempt
    * that wrote files but died pre-commit leaves only quarantined
    * orphans (the batch-scoped diff commits each attempt's own files).
    * One streaming writer per `appId` per store — the committer's
    * single-writer contract, per app. */
  def snapshotSinkStream(points: Dataset[graft.model.DataPoint],
      storePath: String, checkpoint: String,
      appId: String = "graft-stream",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val cm = graft.operators.Snapshot.committer(points.sparkSession, storePath)
    points.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[graft.model.DataPoint], batchId: Long) =>
        cm.ingestOnce(batch, appId, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Watermarked tumbling 1-hour downsample over a streaming events frame
    * (`ts` timestamp, `value` double). Late rows beyond the watermark are
    * dropped — the defined late-data policy. Output: append mode per closed
    * window. */
  def downsampleStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        unix_micros(col("window.start")).as("bucket_us"),
        col("n_points"), col("sum_value"), col("min_value"), col("max_value"))

  /** Watermarked streaming OHLC bars: open/high/low/close per tumbling hour
    * over a streaming (`ts`, `value`) frame — the streaming form of
    * [[graft.operators.TimeSeries.ohlcBars]]. Same single-aggregation shape
    * (min_by/max_by on a TOTAL-order key): the frame has no unique row id,
    * so the key is (ts, value) — equal-timestamp ties resolve to the
    * smaller/larger value deterministically, where the batch operator (with
    * event ids available) breaks them by id. Emitted per closed window in
    * append mode; late rows beyond the watermark are dropped. */
  def ohlcStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("value"))).as("close"),
        count(lit(1)).as("n_points"))
      .select(
        unix_micros(col("window.start")).as("bucket_us"),
        col("open"), col("high"), col("low"), col("close"), col("n_points"))

  // --- stateful sessionization (flatMapGroupsWithState) ---

  final case class SessionEvent(user_id: Long, ts_us: Long)
  /** [[SessionEvent]] plus the derived event-time column the watermark (and
    * therefore the session-expiry timeout) is anchored to. */
  final case class SessionEventT(
      user_id: Long, ts_us: Long, event_time: java.sql.Timestamp)
  /** Open session carried across micro-batches. */
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)
  final case class ClosedSession(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  /** Per-user gap-based sessionizer over a streaming Dataset: each
    * micro-batch folds its (sorted) events into the open session from state,
    * emits every session CLOSED by a gap, and parks the still-open session
    * back in state for the next batch — the custom-state operator the
    * reference's synchronous API could never express (SURVEY.md §2.2).
    *
    * Idle sessions expire on EVENT TIME: once the watermark passes
    * `last_us + gapUs`, no admissible event can extend the session, so the
    * timeout EMITS it as closed (matching what the batch operator would
    * produce) and removes the state entry — a forever-running stream over a
    * churning user space holds state only for users active within the
    * watermark horizon.
    *
    * @param watermark watermark delay on the derived event-time column —
    *   both the late-data bound and the clock session expiry fires on. */
  def sessionizeStream(events: Dataset[SessionEvent], gapUs: Long,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[SessionEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEventT], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // the watermark passed last_us + gap: the session can no longer
            // be extended — emit it closed and drop the key's state
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start_us, s.last_us, s.n))
          } else {
            // primitive array + in-place sort: the hot-key task of a
            // 99%-one-key batch folds millions of rows alone, and the
            // former boxed `toSeq.sorted` held ~24 bytes/row of boxed
            // Longs + cons cells live through the sort (r12 skew probe);
            // Array[Long] is 8 bytes/row and Arrays.sort is allocation-free
            val sorted = { val b = Array.newBuilder[Long]
              rows.foreach(r => b += r.ts_us); b.result() }
            java.util.Arrays.sort(sorted)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { ts =>
              open match {
                case Some(s) if ts - s.last_us <= gapUs =>
                  // max: a LATE event (ts < last_us from a prior batch) joins
                  // the open session without rewinding its end
                  open = Some(s.copy(
                    start_us = math.min(s.start_us, ts),
                    last_us = math.max(s.last_us, ts), n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(userId, s.start_us, s.last_us, s.n)
                  open = Some(OpenSession(ts, ts, 1))
                case None =>
                  open = Some(OpenSession(ts, ts, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark passes the gap boundary (clamped
              // above the current watermark — Spark rejects timestamps at
              // or below it)
              state.setTimeoutTimestamp(math.max(
                s.last_us / 1000L + gapUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
      }
  }

  final case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  final case class FunnelEventT(user_id: Long, event_type: String,
      ts_us: Long, event_time: java.sql.Timestamp)
  final case class FunnelProgress(stage_idx: Int, reached_at_us: Long)
  final case class StageReached(user_id: Long, stage_idx: Int, stage: String,
      reached_at_us: Long)

  /** Streaming conversion funnel — a per-user STAGE MACHINE in
    * flatMapGroupsWithState: state is (stage reached, when); each batch
    * folds the user's events in event-time order and emits one
    * [[StageReached]] row per NEW stage completed (stage i admits an
    * event of `stages(i)` within `horizonUs` after stage i−1). Counting
    * emitted rows per stage therefore reproduces the batch
    * [[graft.operators.Analytics.funnel]] counts over the same closed
    * data (parity spec). Cross-batch ordering follows arrival: an event
    * delivered AFTER a later-stage event already advanced the machine
    * cannot rewind it — the batch operator over the replayed log is the
    * out-of-order source of truth, same contract as the sessionizer.
    * State per user is two numbers, and a user whose horizon has passed
    * without progress can never advance again, so the event-time timeout
    * evicts it — bounded state on a churning user space. */
  def funnelStream(events: Dataset[FunnelEvent], stages: Seq[String],
      horizonUs: Long, watermark: String = "10 minutes"): Dataset[StageReached] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[FunnelEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, StageReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FunnelEventT],
            state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            // watermark passed reached_at + horizon: no admissible event
            // can advance this user again — drop the state entry
            state.remove()
            Iterator.empty
          } else {
            val relevant = rows
              .filter(e => stageIdx.contains(e.event_type))
              .map(e => (e.ts_us, stageIdx(e.event_type))).toSeq.sorted
            var cur = state.getOption
            val out = Seq.newBuilder[StageReached]
            relevant.foreach { case (ts, idx) =>
              val admissible = cur match {
                case None => idx == 0
                case Some(p) => idx == p.stage_idx + 1 &&
                  ts >= p.reached_at_us && ts <= p.reached_at_us + horizonUs
              }
              if (admissible) {
                cur = Some(FunnelProgress(idx, ts))
                out += StageReached(userId, idx + 1, stages(idx), ts)
              }
            }
            cur.foreach { p =>
              state.update(p)
              if (p.stage_idx < stages.size - 1)
                state.setTimeoutTimestamp(math.max(
                  p.reached_at_us / 1000L + horizonUs / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
              else state.setTimeoutTimestamp( // funnel complete: evict asap
                state.getCurrentWatermarkMs() + 1L)
            }
            out.result().iterator
          }
      }
  }

  final case class RatePoint(series: String, ts_us: Long, value: Double)
  final case class RatePointT(series: String, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp)
  final case class RateState(last_ts_us: Long, last_value: Double)
  final case class Increase(series: String, ts_us: Long, inc: Double)
  final case class HoldingInterval(series: String, ts_us: Long,
      dur_us: Long, value: Double)

  /** Streaming twin of the interval derivation inside
    * [[graft.operators.TimeSeries.timeWeightedAvg]]: state per series
    * is the last sample; each arriving sample CLOSES the previous
    * one's holding interval and emits (series, interval start, µs
    * held, held value). The open tail interval stays in state — exactly
    * the batch operator's excluded last sample — so any downstream
    * aggregation of the emitted intervals (Σ value·dur / Σ dur per
    * series) reproduces the batch TWA on closed data, spec-gated.
    * Same micro-batch fold order, idle eviction, and state shape as
    * [[counterRateStream]]. */
  def holdingIntervalStream(events: Dataset[RatePoint],
      idleTimeoutUs: Long = 24L * 3600L * 1000000L,
      watermark: String = "10 minutes"): Dataset[HoldingInterval] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[RatePointT]
      .groupByKey(_.series)
      .flatMapGroupsWithState[RateState, HoldingInterval](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, rows: Iterator[RatePointT], state: GroupState[RateState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption
            val out = Vector.newBuilder[HoldingInterval]
            rows.toSeq.sortBy(r => (r.ts_us, r.value)).foreach { r =>
              last.foreach { s =>
                out += HoldingInterval(series, s.last_ts_us,
                  r.ts_us - s.last_ts_us, s.last_value)
              }
              last = Some(RateState(r.ts_us, r.value))
            }
            last.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(
                s.last_ts_us / 1000L + idleTimeoutUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  final case class StateEvent(user_id: Long, event_id: Long,
      state_type: String, ts_us: Long)
  final case class StateEventT(user_id: Long, event_id: Long,
      state_type: String, ts_us: Long, event_time: java.sql.Timestamp)
  final case class Scd2State(state_type: String, since_us: Long,
      last_seen_us: Long)
  final case class ClosedInterval(user_id: Long, state: String,
      valid_from_us: Long, valid_to_us: Long)

  /** Streaming SCD Type-2 — the stateful form of
    * [[graft.operators.Analytics.scd2]]: state per user is the OPEN
    * (type, since) interval; an arriving event of a DIFFERENT type
    * closes it (emit (user, state, from, to)) and opens the new one,
    * while same-type events extend silently. The open tail stays in
    * state — exactly the batch operator's `is_current` row — so closed
    * intervals match the batch build on closed data, spec-gated.
    * Micro-batch rows fold in the batch operator's (ts, event_id)
    * order; idle users are evicted by event-time timeout (their open
    * interval is deliberately dropped, not emitted — it never closed).
    *
    * Ordering caveat (declared): rows are sorted (ts, event_id) WITHIN a
    * micro-batch only. An event that is within the watermark but arrives
    * in a LATER micro-batch than a newer event for the same user folds
    * after it, so batch parity holds only for in-order-across-batches
    * delivery (the watermark drives state timeout, not reordering). The
    * full-parity alternative — buffering events in state until the
    * watermark passes before folding — costs a per-user event buffer and
    * one watermark of emission latency; this operator deliberately trades
    * that for immediate emission, matching the reference's
    * append-in-arrival-order ingest (shard.cpp appends as received).
    * Within that trade the output is still kept WELL-FORMED: a row older
    * than the open interval's start (a cross-batch straggler) is STALE
    * and dropped — without that guard it would close the interval at an
    * earlier timestamp, emitting valid_to < valid_from (r10 late-storm
    * probe; spec-pinned in StreamingSpec). */
  def scd2Stream(events: Dataset[StateEvent],
      idleTimeoutUs: Long = 24L * 3600L * 1000000L,
      watermark: String = "10 minutes"): Dataset[ClosedInterval] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[StateEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, ClosedInterval](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StateEventT], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption
            val out = Vector.newBuilder[ClosedInterval]
            // allocation-REDUCED comparator sort (the row objects still
            // exist; what's gone is the per-row boxed key TUPLE that
            // `toSeq.sortBy((ts, id))` built) — on a 99%-one-key batch
            // the hot task carries millions of rows, so per-row key
            // allocation was the skew bottleneck (r12 skew probe)
            val arr = rows.toArray
            java.util.Arrays.sort(arr,
              (a: StateEventT, b: StateEventT) => {
                val c = java.lang.Long.compare(a.ts_us, b.ts_us)
                if (c != 0) c else java.lang.Long.compare(a.event_id, b.event_id)
              })
            arr.foreach { r =>
              cur match {
                // STALE row: older than the open interval's start (only
                // possible via cross-batch reordering). Without this
                // guard a late different-type row would close the open
                // interval at an EARLIER timestamp — an inverted
                // (valid_to < valid_from) interval (r10 late-storm probe
                // caught it). Policy: transitions apply forward in time
                // only; stale rows drop, the batch operator over the
                // replayed log stays the out-of-order source of truth.
                case Some(s) if r.ts_us < s.since_us => ()
                case Some(s) if s.state_type != r.state_type =>
                  out += ClosedInterval(user, s.state_type, s.since_us, r.ts_us)
                  cur = Some(Scd2State(r.state_type, r.ts_us, r.ts_us))
                case Some(s) => // same type: run extends, refresh liveness
                  cur = Some(s.copy(last_seen_us = math.max(s.last_seen_us,
                    r.ts_us)))
                case None => cur = Some(Scd2State(r.state_type, r.ts_us,
                  r.ts_us))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // idle = no events AT ALL, keyed off last activity — a long
              // same-type run must not evict a still-active user
              state.setTimeoutTimestamp(math.max(
                s.last_seen_us / 1000L + idleTimeoutUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming counter rate — the stateful form of
    * [[graft.operators.TimeSeries.counterRate]]'s per-sample increase:
    * state per series is the last (ts, value) seen; each sample emits
    * `value - last` (or `value` on a counter reset, i.e. a negative
    * delta); the first sample of a series emits nothing, matching the
    * batch operator's NULL first increase. Rows are folded in (ts, value)
    * order within a micro-batch; cross-batch ordering follows arrival
    * (the batch operator over the replayed log is the source of truth for
    * out-of-order history). Idle series are evicted by event-time timeout
    * once the watermark passes their last sample by `idleTimeoutUs`. */
  final case class AlertEvent(event_type: String, ts_us: Long, value: Double)
  final case class AlertEventT(event_type: String, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp)
  final case class OpenHour(bucket_us: Long, sum_cents: Long, n: Long)
  final case class AlertRunState(open: Seq[OpenHour], finalizedThrough: Long,
      lastBreachHour: Long, runLen: Int, runStart: Long)
  final case class AlertFired(event_type: String, alert_start_us: Long,
      fired_at_us: Long, n_hours: Int)

  /** Streaming twin of [[graft.operators.TimeSeries.alertFor]] — PromQL
    * `for:` alerting as a per-series state machine: open hours accumulate
    * EXACT integer cent sums in state; an hour FINALIZES once the
    * event-time watermark passes its end (no admissible event can change
    * it), finalized hours evaluate the same strict `Σcents > cents·n`
    * breach test in bucket order, and an alert FIRES the moment a run of
    * consecutive breach hours reaches `forHours` — once per episode, at
    * the earliest hour the condition is knowable (the batch operator
    * reports whole episodes retrospectively; every batch episode of
    * length ≥ forHours corresponds to exactly one streaming firing with
    * the same start, parity-spec'd on closed data).
    *
    * State is bounded: open hours live only inside the watermark horizon,
    * run bookkeeping is three numbers, and an idle series evicts once the
    * watermark is two hours past its last breach (run continuity can no
    * longer matter — the next breach hour cannot be consecutive). Rows
    * for already-finalized hours are DROPPED (same contract as the
    * upstream watermark; the batch operator over the replayed log is the
    * out-of-order source of truth). */
  def alertForStream(events: Dataset[AlertEvent], thresholdCents: Long,
      forHours: Int, watermark: String = "10 minutes"): Dataset[AlertFired] = {
    require(forHours >= 1, "hold duration must be at least one bucket")
    import events.sparkSession.implicits._
    val hourUs = 3600000000L
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[AlertEventT]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AlertRunState, AlertFired](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[AlertEventT],
            state: GroupState[AlertRunState]) =>
          val st0 = state.getOption
            .getOrElse(AlertRunState(Nil, -1L, -1L, 0, -1L))
          // fold new rows into open hours in exact cents, normalized
          // IDENTICALLY to the batch operator's cast(value as
          // decimal(18,2)): BigDecimal of the double's shortest decimal
          // repr, HALF_UP by magnitude — so stream and batch agree even
          // on sub-cent / negative inputs (math.round would half-up
          // toward +inf and diverge on e.g. -0.005)
          val acc = scala.collection.mutable.Map(
            st0.open.map(h => h.bucket_us -> (h.sum_cents, h.n)): _*)
          rows.foreach { e =>
            val b = (e.ts_us / hourUs) * hourUs
            if (b > st0.finalizedThrough) {
              val (s, n) = acc.getOrElse(b, (0L, 0L))
              // mirror the batch try_cast(value AS decimal(18,2)) on
              // pathological inputs instead of throwing (a query-killing
              // stream/batch divergence): NaN/Infinity and values past
              // decimal(18,2) range try_cast to NULL in batch — sum
              // skips them but count(lit(1)) still counts the row — so
              // here they contribute 0 cents and 1 to n
              val cents =
                if (!java.lang.Double.isFinite(e.value)) 0L
                else {
                  val scaled = BigDecimal(e.value)
                    .setScale(2, BigDecimal.RoundingMode.HALF_UP)
                  if (scaled.precision > 18) 0L // overflows decimal(18,2)
                  else scaled.*(BigDecimal(100)).toLongExact
                }
              acc(b) = (s + cents, n + 1)
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) = acc.toSeq.partition(_._1 + hourUs <= wmUs)
          var (lastBreach, runLen, runStart) =
            (st0.lastBreachHour, st0.runLen, st0.runStart)
          var finalized = st0.finalizedThrough
          val out = Vector.newBuilder[AlertFired]
          done.sortBy(_._1).foreach { case (b, (s, n)) =>
            if (s > thresholdCents * n) {
              if (lastBreach >= 0 && b == lastBreach + hourUs) runLen += 1
              else { runLen = 1; runStart = b }
              lastBreach = b
              if (runLen == forHours) out += AlertFired(key, runStart, b, forHours)
            }
            // a non-breach hour needs no reset: the next breach fails the
            // consecutive check against lastBreach and restarts the run
            finalized = math.max(finalized, b)
          }
          val idle = open.isEmpty &&
            (lastBreach < 0 || wmUs > lastBreach + 2 * hourUs)
          if (idle) state.remove()
          else {
            state.update(AlertRunState(
              open.map { case (b, (s, n)) => OpenHour(b, s, n) },
              finalized, lastBreach, runLen, runStart))
            // wake when the watermark moves so trailing hours finalize
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          out.result().iterator
      }
  }

  def counterRateStream(events: Dataset[RatePoint],
      idleTimeoutUs: Long = 24L * 3600L * 1000000L,
      watermark: String = "10 minutes"): Dataset[Increase] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[RatePointT]
      .groupByKey(_.series)
      .flatMapGroupsWithState[RateState, Increase](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, rows: Iterator[RatePointT], state: GroupState[RateState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption
            val out = Vector.newBuilder[Increase]
            rows.toSeq.sortBy(r => (r.ts_us, r.value)).foreach { r =>
              last match {
                case Some(s) =>
                  val inc = if (r.value >= s.last_value) r.value - s.last_value
                            else r.value // counter reset
                  out += Increase(series, r.ts_us, inc)
                case None => () // first sample: no increase (batch parity)
              }
              last = Some(RateState(r.ts_us, r.value))
            }
            last.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(
                s.last_ts_us / 1000L + idleTimeoutUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join: each left row joins the right rows with
    * `r.ts ∈ [l.ts, l.ts + windowSecs]` on the same key — the streaming form
    * of [[graft.operators.RangeJoin.intervalJoin]]. BOTH sides carry
    * watermarks and the join predicate carries an explicit event-time bound,
    * which is exactly what lets Spark expire right-side state once the
    * watermark passes `ts + windowSecs` (without the bound the state store
    * grows with the stream). Columns are prefixed so the output schema is
    * sink-safe. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      windowSecs: Long, watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(
      left.columns.map(c => col(c).as(s"l_$c")): _*)
      .withWatermark("l_ts", watermark)
    val r = right.select(
      right.columns.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"l_$key = r_$key AND r_ts >= l_ts AND " +
        s"r_ts <= l_ts + interval $windowSecs seconds"))
  }

  /** Streaming exact dedup: emit exactly ONE row per content hash, dropping
    * any duplicate that arrives within the watermark horizon. Which
    * duplicate survives is ARRIVAL-ORDER-dependent (unlike the batch
    * [[graft.operators.Dedup.exactKeepFirst]], whose min-doc_id survivor is
    * deterministic) — the guarantee here is one-per-hash, and the batch
    * operator is the replayable source of truth when survivor identity
    * matters. State is one (hash → expiry) entry per distinct content and is
    * evicted once the event-time watermark passes it, so state size is
    * bounded by the dedup horizon, not the stream length — the property that
    * makes this runnable forever on a 100 TB/day feed (a global-forever
    * dedup would instead checkpoint against the batch store). `docs` needs
    * an event-time column `ts` and a `text` column. */
  def dedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Stream-static anomaly flagging: watermarked hourly sums over the
    * live stream, joined to a PRECOMPUTED per-type baseline (the
    * stream-static join shape — the tiny baseline frame is broadcast,
    * the streaming side stays append with windowed state only) and
    * filtered to |z| > threshold. The baseline is
    * [[graft.operators.Analytics.momentStats]] output from the batch
    * engine — score today's traffic against yesterday's statistics;
    * identical hours produce identical flags to the batch detector
    * (parity spec). Emitted per closed window in append mode. */
  def anomalyStream(events: DataFrame, baseline: DataFrame,
      threshold: Double, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("s"))
      .select(col("event_type"), unix_micros(col("window.start")).as("bucket_us"),
        col("s"))
      .join(broadcast(baseline), "event_type") // fixed-size side: hint is safe
      .withColumn("z", graft.operators.Analytics.zScore(col("s")))
      .filter(abs(col("z")) > threshold)
      // hourly_sum as DOUBLE, matching the batch detector's output schema
      .select(col("event_type"), col("bucket_us"),
        col("s").cast("double").as("hourly_sum"), col("z").as("zscore"))
}
