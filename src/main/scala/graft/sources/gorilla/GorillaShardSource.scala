package graft.sources.gorilla

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for the reference engine's on-disk format: a
  * directory of `<shard_start_ms>-<shard_end_ms>.bin` Gorilla-compressed
  * shard files (/root/reference/engine/insight.cpp:9-14, shard.cpp). A user
  * of the reference can point this engine DIRECTLY at their existing `data/`
  * directory:
  *
  * {{{ spark.read.format("graft.sources.gorilla.GorillaShardSource").load("data/") }}}
  *
  * Scan design: one InputPartition per shard file (the reference's own unit
  * of parallelism-by-time); timestamp range predicates are pushed into the
  * scan and prune whole shard files by the [start, end] encoded in their
  * names — the reference's shard-skip loop (insight.cpp:31-35) reproduced as
  * DSv2 `SupportsPushDownFilters`. Filters are also left in the plan as
  * residuals, so row-level semantics never depend on the pruning.
  */
class GorillaShardSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GorillaShardSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GorillaShardTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object GorillaShardSource {
  val schema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

class GorillaShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"gorilla_shards($path)"
  override def schema(): StructType = GorillaShardSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GorillaScanBuilder(path)
}

class GorillaScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var tsLo = Long.MinValue
  private var tsHi = Long.MaxValue
  private var pushed = Array.empty[Filter]
  private var required: StructType = GorillaShardSource.schema
  private var aggsPushed: Seq[String] = Nil
  private var limitPushed: Int = -1

  // LIMIT pushdown: each file partition stops DECODING after `limit` points
  // (the streaming decoder makes this a genuine early exit, not a decode-
  // then-truncate). Spark only offers the push when no operator between the
  // limit and the scan changes row counts. Returning true with the default
  // isPartiallyPushed()=true is the contract for a PARTIAL push: Spark
  // keeps its own Limit above the scan, which caps the union of the
  // per-partition prefixes.
  override def pushLimit(limit: Int): Boolean = {
    limitPushed = limit
    true
  }

  // COUNT(*) / MIN(timestamp) / MAX(timestamp) pushdown: each shard-file
  // partition emits ONE partial-stats row from a timestamp-only sweep
  // (value varints skipped, tuples never materialized — GorillaCodec
  // .tsStats); Spark merges the partials (sum/min/max). Spark only offers
  // aggregate pushdown when every filter was fully pushed — ours stay
  // residual (pushFilters returns them), so a filtered aggregate still
  // evaluates row-by-row and stays correct. Filenames are NOT used for
  // min/max: they carry hour-bucket boundaries, not point extremes.
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def isTsCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("timestamp"))
        case _ => false
      }
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return false
    val descs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if isTsCol(m.column) => Some("min_ts")
      case m: Max if isTsCol(m.column) => Some("max_ts")
      case _ => None
    }
    if (!descs.forall(_.isDefined)) return false
    aggsPushed = descs.flatten
    required = StructType(aggsPushed.map {
      case "count"  => StructField("count(*)", LongType, nullable = false)
      // nullable: a zero-point file has no min/max but must still emit its
      // count partial, so the row carries nulls there
      case "min_ts" => StructField("min(timestamp)", LongType, nullable = true)
      case "max_ts" => StructField("max(timestamp)", LongType, nullable = true)
    })
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.flatMap {
      case f @ GreaterThanOrEqual("timestamp", v: Long) => tsLo = tsLo.max(v); Some(f)
      case f @ GreaterThan("timestamp", v: Long) => tsLo = tsLo.max(v + 1); Some(f)
      case f @ LessThanOrEqual("timestamp", v: Long) => tsHi = tsHi.min(v); Some(f)
      case f @ LessThan("timestamp", v: Long) => tsHi = tsHi.min(v - 1); Some(f)
      case _ => None
    }
    filters // everything stays as a residual: pruning is an optimization only
  }
  override def pushedFilters(): Array[Filter] = pushed

  // column pruning: the codec must still decode both streams (they are
  // interleaved per point), but pruned scans emit narrow rows so projections
  // like count(*) or ts-only reads don't carry the value column upward
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GorillaScan(path, tsLo, tsHi, required, aggsPushed, limitPushed)
}

case class GorillaFilePartition(file: String) extends InputPartition

class GorillaScan(path: String, tsLo: Long, tsHi: Long, required: StructType,
    aggsPushed: Seq[String] = Nil, limitPushed: Int = -1)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GorillaShardScan(path=$path, ts in [$tsLo, $tsHi], " +
      s"cols=${required.fieldNames.mkString(",")}, " +
      s"pushedAggs=${if (aggsPushed.isEmpty) "none" else aggsPushed.mkString("+")}, " +
      s"pushedLimit=${if (limitPushed < 0) "none" else limitPushed.toString})"

  /** File-level pruning from the `<start>-<end>.bin` naming convention. */
  override def planInputPartitions(): Array[InputPartition] = {
    val ShardName = """(\d+)-(\d+)\.bin""".r
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    files.toSeq.sortBy(_.getName).flatMap { f =>
      f.getName match {
        case ShardName(s, e) if s.toLong <= tsHi && e.toLong >= tsLo =>
          Some(GorillaFilePartition(f.getAbsolutePath): InputPartition)
        case _ => None
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (aggsPushed.nonEmpty) GorillaStatsReaderFactory(aggsPushed)
    else GorillaReaderFactory(required.fieldNames, limitPushed)
}

/** Partial-stats reader: one row per shard file carrying the requested
  * (count / min_ts / max_ts) partials from a timestamp-only sweep. EVERY
  * file emits its row — a zero-point file (crashed writer, lone dropped
  * leading-ts==0 point) contributes count 0 with NULL min/max, so a pushed
  * `count(*)` over an all-empty store still merges to 0 (dropping the row
  * would make the final Sum-of-partials NULL), and `min`/`max` correctly
  * ignore the nulls. */
case class GorillaStatsReaderFactory(aggs: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GorillaFilePartition].file
    new PartitionReader[InternalRow] {
      private var emitted = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (emitted) false
        else {
          emitted = true
          // compute ONCE here — get() may be called repeatedly per next()
          val (n, mn, mx) = GorillaCodec.tsStats(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(file)))
          row = new GenericInternalRow(aggs.map {
            case "count"  => n: Any
            case "min_ts" => if (n == 0L) null else (mn: Any)
            case "max_ts" => if (n == 0L) null else (mx: Any)
          }.toArray)
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Row reader over the STREAMING decoder: points decode lazily (no whole-
  * shard tuple buffer), and a pushed limit stops decoding mid-file. */
case class GorillaReaderFactory(fields: Array[String], limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GorillaFilePartition].file
    new PartitionReader[InternalRow] {
      private val decoded = GorillaCodec.decodeIterator(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))
      private val points = if (limit >= 0) decoded.take(limit) else decoded
      private var current: (Long, Double) = _
      override def next(): Boolean = {
        if (points.hasNext) { current = points.next(); true } else false
      }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "timestamp" => current._1: Any
          case "value" => current._2: Any
        })
      override def close(): Unit = ()
    }
  }
}
