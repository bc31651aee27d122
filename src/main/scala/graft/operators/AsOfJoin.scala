package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the TSDB-essential operator Spark lacks as a built-in
  * (SURVEY.md §2.2 "Joins"). For each left row, attach the latest right row
  * with `right.ts <= left.ts` within the same key.
  *
  * Spark-first design (preference order (a): composition of built-ins —
  * see /opt guide §"Custom operator"): instead of a range join (O(n·m) or an
  * interval-bucketed shuffle), we UNION the two sides with a tag column and
  * run ONE partitioned window pass:
  *
  *   sort key = (ts, side, tiebreak) with right rows ordered BEFORE left rows
  *   at an equal timestamp (inclusive `<=` semantics), then
  *   `last(right_payload, ignoreNulls = true)` over rows UNBOUNDED PRECEDING.
  *
  * Cost at scale: one shuffle on the join key + one sort per partition —
  * identical asymptotics to a sort-merge join, no skew-prone range
  * explosion, no broadcast requirement. This is the classic log-structured
  * merge formulation of as-of joins and scales linearly in rows per key.
  */
object AsOfJoin {

  /** Generic as-of join on one key column and one ordered timestamp column.
    *
    * @param left      left (probe) side
    * @param right     right (reference) side
    * @param key       join key column name present on both sides
    * @param ts        timestamp column name present on both sides
    * @param rightPayload right-side columns to carry (renamed in output)
    * @return left rows + for each, the payload of the latest right row at or
    *         before its timestamp (nulls when no such row exists)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[(String, String)]): DataFrame =
    asOfDirectional(left, right, key, ts, rightPayload, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` (pandas `merge_asof(direction='forward')`).
    * Same one-shuffle union-window plan traversed in REVERSE time order,
    * so the frame stays a running aggregate (linear per key). Among
    * duplicate right (key, ts) rows the winner is the MIN payload struct
    * — deterministic, the mirror of the backward operator's max. */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[(String, String)]): DataFrame =
    asOfDirectional(left, right, key, ts, rightPayload, forward = true)

  /** Nearest as-of (pandas `direction='nearest'`): the closer of the
    * backward and forward matches by |Δts|; exact ties (including the
    * Δ=0 equal-timestamp case, which the backward pass already matches)
    * resolve BACKWARD. Two union-window passes — still shuffle-bound on
    * the key, no range explosion. */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[(String, String)]): DataFrame = {
    def tsNum(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c
      }
    val tsType = left.schema(ts).dataType
    val bPay = rightPayload.map { case (in, out) => in -> s"__b_$out" } :+
      (ts -> "__b_ts")
    val fPay = rightPayload.map { case (in, out) => in -> s"__f_$out" } :+
      (ts -> "__f_ts")
    val both = asOfDirectional(
      asOfDirectional(left, right, key, ts, bPay, forward = false),
      right, key, ts, fPay, forward = true)
    val chooseBack = col("__b_ts").isNotNull && (col("__f_ts").isNull ||
      (tsNum(col(ts), tsType) - tsNum(col("__b_ts"), tsType)) <=
        (tsNum(col("__f_ts"), tsType) - tsNum(col(ts), tsType)))
    both.select(left.columns.map(col) ++ rightPayload.map { case (_, out) =>
      when(chooseBack, col(s"__b_$out")).otherwise(col(s"__f_$out")).as(out)
    }: _*)
  }

  private def asOfDirectional(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[(String, String)],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns
    // The whole right payload travels as ONE struct: `last(ignoreNulls)`
    // then skips only left-side placeholder rows (whole struct null), never
    // a matched right row whose individual payload VALUE is null — and all
    // payload fields are guaranteed to come from the SAME right row.
    val payloadStruct =
      struct(rightPayload.map { case (in, out) => col(in).as(out) }: _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    // side: 0 = right (reference), 1 = left (probe) — with `__side`
    // ascending SECOND in the sort, the reference row at an EXACTLY equal
    // timestamp lands inside the probe row's running frame in both
    // directions (backward sorts ts ascending, forward ts DESCENDING —
    // either way right-before-left at equal ts).
    val (leftSide, rightSide) = (1, 0)
    val taggedLeft = left
      .withColumn("__side", lit(leftSide))
      .select(
        col(key).as("__key") +: col(ts).as("__ts") +: col("__side") +:
          leftCols.map(c => col(c).as(s"__l_$c")) :+
          lit(null).cast(payloadType).as("__r"): _*)
    val taggedRight = right
      .withColumn("__side", lit(rightSide))
      .select(
        col(key).as("__key") +: col(ts).as("__ts") +: col("__side") +:
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
          payloadStruct.as("__r"): _*)

    // __r as the final sort key: with duplicate right-side (key, ts) rows
    // carrying DIFFERENT payloads, `last` must not depend on partition
    // order — struct ordering makes the carried row the deterministic max.
    // A payload containing a non-orderable type (e.g. map<,>) cannot join
    // the sort key: such payloads still work, but the winner among
    // duplicate (key, ts) reference rows is then unspecified.
    val tiebreak: Seq[Column] =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payloadType))
        Seq(col("__r"))
      else Seq.empty
    // BOTH directions use the GROWING (unboundedPreceding, currentRow)
    // frame — Spark evaluates it as a running aggregate, O(rows) per key.
    // Forward simply traverses time in reverse: ts descending, so the
    // "latest seen" reference is the EARLIEST at-or-after one, and the
    // tiebreak flips to descending so the last-seen duplicate is the MIN
    // payload. (A (currentRow, unboundedFollowing) frame would recompute
    // per row — O(rows²) on a hot key.)
    val ordered = Window.partitionBy(col("__key")).orderBy(
      (if (forward) col("__ts").desc else col("__ts")) +:
        col("__side") +: tiebreak.map(c => if (forward) c.desc else c): _*)
    val carried = last(col("__r"), ignoreNulls = true).over(
      ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    taggedLeft.unionByName(taggedRight)
      .withColumn("__carried", carried)
      .filter(col("__side") === leftSide)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map { case (_, out) => col("__carried").getField(out).as(out) }: _*)
  }
}
