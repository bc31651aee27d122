package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.DataPoint

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.2 "UDF/UDAF") — the
  * typed-Dataset path for custom aggregation when built-ins don't fit.
  *
  * `PointStats` folds a `DataPoint` stream into (count, exact cent-sum,
  * min/max ts) with a commutative/associative merge, so results are
  * independent of partitioning and row order — the same determinism rule
  * the SQL surface gets from DECIMAL accumulation. */
object aggregators {

  final case class PointStatsBuf(
      n: Long, sumCents: Long, minTs: Long, maxTs: Long)
  final case class PointStats(
      n: Long, sum_value: Double, min_ts: Long, max_ts: Long)

  /** Exact stats over a DataPoint group; values are accumulated in integer
    * cents (the testdata domain is 2-decimal), so reduce/merge order cannot
    * change the result. */
  object PointStatsAgg extends Aggregator[DataPoint, PointStatsBuf, PointStats] {
    override def zero: PointStatsBuf =
      PointStatsBuf(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: PointStatsBuf, p: DataPoint): PointStatsBuf =
      PointStatsBuf(
        b.n + 1,
        b.sumCents + math.round(p.value * 100.0),
        math.min(b.minTs, p.timestamp),
        math.max(b.maxTs, p.timestamp))
    override def merge(a: PointStatsBuf, b: PointStatsBuf): PointStatsBuf =
      PointStatsBuf(a.n + b.n, a.sumCents + b.sumCents,
        math.min(a.minTs, b.minTs), math.max(a.maxTs, b.maxTs))
    override def finish(b: PointStatsBuf): PointStats =
      PointStats(b.n, b.sumCents / 100.0, b.minTs, b.maxTs)
    override def bufferEncoder: Encoder[PointStatsBuf] = Encoders.product
    override def outputEncoder: Encoder[PointStats] = Encoders.product
  }
}
