package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming form of
  * [[graft.operators.AsOfJoin]]: every probe (left) row is emitted with the
  * payload of the latest reference (right) row at or before its timestamp,
  * per key.
  *
  * Structured Streaming has no built-in stream-stream AS-OF join, so this is
  * a custom stateful operator (`flatMapGroupsWithState` over the union-
  * tagged stream — the same union-tag trick as the batch operator, but the
  * "window" is carried in keyed state):
  *
  *  - state per key = the reference rows seen so far, kept sorted by ts;
  *  - each micro-batch folds its rows in (ts, side) order — reference rows
  *    BEFORE probe rows at an equal ts (inclusive `<=` semantics, matching
  *    the batch operator and DuckDB ASOF);
  *  - probe rows look up the latest at-or-before entry in the buffer, so a
  *    probe with an EARLIER ts than the newest reference row still matches
  *    correctly (a keep-only-latest state would silently mismatch late
  *    probes);
  *  - at production scale the buffer is pruned to the watermark horizon
  *    (rows older than the oldest possible probe); here it is kept whole —
  *    the plumbing point is the operator shape, the cap is one `dropWhile`;
  *  - idle KEYS expire via event-time timeout: a key silent for
  *    `idleTimeoutUs` has its whole state entry dropped once the watermark
  *    passes, so a forever-running stream over a growing key space (user
  *    churn) does not leak state entries — per-key buffers were already
  *    horizon-bounded, this bounds the key dimension too.
  *
  * Emission is deterministic for in-order arrival (equal to the batch as-of
  * join row-for-row — asserted in `StreamingSpec`); a reference row that
  * arrives AFTER a probe row already emitted is not retracted — the defined
  * at-most-once-enrichment policy (the batch operator is the replayable
  * source of truth, SURVEY.md §1.4's late-data stance).
  */
object StreamingAsOf {

  final case class AsOfEvent(
      user_id: Long, ts_us: Long, side: Int, event_id: Long, value: Double)
  /** [[AsOfEvent]] plus the derived event-time column the watermark (and
    * therefore the idle-key timeout) is anchored to. */
  final case class AsOfEventT(
      user_id: Long, ts_us: Long, side: Int, event_id: Long, value: Double,
      event_time: java.sql.Timestamp)
  final case class RefRow(ts_us: Long, value: Double)
  final case class AsOfState(refs: Vector[RefRow], max_ts_us: Long = Long.MinValue)
  final case class Enriched(
      event_id: Long, user_id: Long, ts_us: Long,
      err_ts_us: Option[Long], err_value: Option[Double])

  val SideRef = 0
  val SideProbe = 1

  /** Tag helper: build the union stream from typed probe/reference rows. */
  def tagProbe(userId: Long, tsUs: Long, eventId: Long): AsOfEvent =
    AsOfEvent(userId, tsUs, SideProbe, eventId, 0.0)
  def tagRef(userId: Long, tsUs: Long, value: Double): AsOfEvent =
    AsOfEvent(userId, tsUs, SideRef, 0L, value)

  /** Default idle-key expiry: a key with no events for a day is dropped. */
  val DefaultIdleTimeoutUs: Long = 24L * 3600L * 1000000L

  /** @param horizonUs state-retention horizon: once the newest event seen
    *   for a key is `t`, reference rows older than `t - horizonUs` can no
    *   longer be the best match for any future probe that is itself within
    *   the horizon — so the buffer keeps only the newest such row (the
    *   boundary carrier) plus everything younger. State per key is then
    *   bounded by reference density × horizon, not stream length — the same
    *   contract as a watermark. Default: retain everything.
    * @param idleTimeoutUs event-time idle-key expiry: once the watermark
    *   passes a key's newest event by this much, the key's WHOLE state entry
    *   is removed (a probe arriving later starts from an empty buffer). This
    *   bounds total state by |active keys|, not |ever-seen keys|.
    * @param watermark watermark delay on the derived event-time column —
    *   both the late-data bound and the clock the idle timeout fires on. */
  def asOfStream(tagged: Dataset[AsOfEvent],
      horizonUs: Long = Long.MaxValue,
      idleTimeoutUs: Long = DefaultIdleTimeoutUs,
      watermark: String = "10 minutes"): Dataset[Enriched] = {
    import tagged.sparkSession.implicits._
    tagged
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[AsOfEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[AsOfEventT], state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) {
            // idle key: the watermark passed its newest event by the idle
            // horizon — drop the whole entry (nothing to emit)
            state.remove()
            Iterator.empty
          } else {
            var refs = state.getOption.map(_.refs).getOrElse(Vector.empty)
            var maxTs = state.getOption.map(_.max_ts_us).getOrElse(Long.MinValue)
            val out = Vector.newBuilder[Enriched]
            // (ts, side, value): reference rows sort before probes at equal
            // ts; among duplicate (key, ts) references the LARGEST payload
            // wins — enforced on INSERT (replace-if-greater), so the
            // tiebreak matches the batch operator's payload-struct window
            // order even when the duplicates arrive in different
            // micro-batches
            rows.toSeq.sortBy(e => (e.ts_us, e.side, e.value)).foreach { e =>
              if (e.ts_us > maxTs) maxTs = e.ts_us
              if (e.side == SideRef) {
                // insert keeping the buffer sorted and ts-unique (appends
                // are O(1) for the common in-order case)
                val at = refs.lastIndexWhere(_.ts_us <= e.ts_us) + 1
                if (at > 0 && refs(at - 1).ts_us == e.ts_us) {
                  if (e.value > refs(at - 1).value)
                    refs = refs.updated(at - 1, RefRow(e.ts_us, e.value))
                } else {
                  refs = (refs.take(at) :+ RefRow(e.ts_us, e.value)) ++ refs.drop(at)
                }
              } else {
                // latest reference at or before the probe ts (scan from the
                // newest end — probes usually trail the freshest reference)
                val i = refs.lastIndexWhere(_.ts_us <= e.ts_us)
                val m = if (i >= 0) Some(refs(i)) else None
                out += Enriched(e.event_id, userId, e.ts_us,
                  m.map(_.ts_us), m.map(_.value))
              }
            }
            // prune expired state, keeping the newest at-or-below-cutoff row:
            // it is still the correct match for the oldest admissible probe
            if (horizonUs != Long.MaxValue && maxTs != Long.MinValue) {
              val cutoff = maxTs - horizonUs
              val boundary = refs.lastIndexWhere(_.ts_us <= cutoff)
              if (boundary > 0) refs = refs.drop(boundary)
            }
            state.update(AsOfState(refs, maxTs))
            // arm the idle alarm: fire once the watermark passes the key's
            // newest event + idle horizon (clamped above the current
            // watermark — Spark rejects timestamps at or below it)
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(math.max(
                maxTs / 1000L + idleTimeoutUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }
}
