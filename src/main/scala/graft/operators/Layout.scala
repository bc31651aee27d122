package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * two-dimensional file skipping.
  *
  * A store sorted on ONE column gives tight parquet min/max stats (and so
  * row-group/file skipping) on that column only; a predicate on any other
  * column scans everything. Interleaving the bits of two key columns into
  * a Morton code and sorting on THAT bounds every file to a small square
  * of the (x, y) key space — per-file min/max stays tight on BOTH
  * columns, so either predicate skips most files. This is the standard
  * lakehouse layout trick (Delta/Iceberg `ZORDER BY`), built here from
  * plain integer expressions — fully codegen'd, no UDF.
  *
  * Scale: the write is `repartitionByRange(z)` (one range shuffle, same
  * cost as any global sort-write) and skipping benefits grow with file
  * count — at 100 TB a two-column predicate touches O(√files) instead of
  * O(files). */
object Layout {

  /** Morton code of the low `bits` bits of two non-negative longs:
    * x's bit j lands at position 2j, y's at 2j+1. A fixed fold of
    * shift/mask/or ops — whole-stage-codegen'd integer math (no UDF),
    * and exactly mirrorable in any SQL engine with bit operators. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { j =>
      (shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))) +
        (shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
    }.reduce(_ + _)
  }

  /** Write `df` clustered by the Z-order of (xCol, yCol): range-partition
    * on the Morton code (each output file owns a compact Z-range = a small
    * tile of the key plane), sort within partitions so row groups nest the
    * same way, drop the helper column. `numFiles` bounds output file count. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .parquet(path)
}
