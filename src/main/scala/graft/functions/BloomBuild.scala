package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.BloomFilter

/** Uncapped distributed Bloom-filter build over a LONG column.
  *
  * `DataFrameStatFunctions.bloomFilter` is NOT safe for budget-sized
  * filters: since Spark ≥ 3.5 it is implemented with the same
  * `BloomFilterAggregate` that backs injected runtime filters, and that
  * aggregate silently CLAMPS the sketch to the runtime-filter limits
  * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` = 4 M items,
  * `…maxNumBits` = 2^26 bits = 8 MB by default). Past ~7 M distinct
  * items at 1 % fpp the clamped filter SATURATES while reporting
  * success — measured here: 80 M edges produced bitSize = 67,108,864
  * and expectedFpp = 0.99999, a filter that passes everything. That
  * silently disabled every budget-sized prefilter in this engine at
  * exactly the scales they were built for.
  *
  * This builder allocates the REQUESTED size with
  * `util.sketch.BloomFilter.create` (no cap) and aggregates in three
  * bounded steps:
  *
  *  1. `coalesce(buildParts)` (narrow, no shuffle) bounds how many
  *     FULL-SIZE partial filters exist: partial movement is
  *     `buildParts × filterBytes` (partials are ~4 % set bits at 1 %
  *     fpp and barely compress), so buildParts is sized to keep that
  *     under ~1 GB while leaving at least 2-way insert parallelism —
  *     inserts are ~50 ns/row, so even 300 M rows per build task is
  *     tens of seconds, while an oversized partial fleet measurably
  *     cancels the candidate-shuffle savings the filter exists to buy
  *     (conf `spark.graft.bloom.buildPartitions` pins it).
  *  2. One `reduceByKey` into a SINGLE partition ORs the partials in
  *     one reducer task (2 × filterBytes peak there), so the driver
  *     receives exactly ONE merged filter as a task result — which is
  *     why callers must keep `filterBytes` under
  *     `spark.driver.maxResultSize` (see `Graph.bloomEdgeBudget`,
  *     which folds that ceiling into the edge budget).
  *  3. `collect` of that one filter.
  */
object BloomBuild {
  def overLongColumn(hashes: DataFrame, column: String,
      expectedItems: Long, fpp: Double): BloomFilter = {
    val spark = hashes.sparkSession
    val filterBytes = math.max(8L,
      (expectedItems * -math.log(fpp) /
        (math.log(2) * math.log(2)) / 8).toLong)
    val buildParts =
      spark.conf.getOption("spark.graft.bloom.buildPartitions")
        .map(_.toInt)
        .getOrElse {
          val byMovement = ((1L << 30) / filterBytes).toInt
          math.max(2, math.min(
            math.min(spark.sparkContext.defaultParallelism, 64),
            math.max(1, byMovement)))
        }
    val rdd = hashes.select(column).rdd.map(_.getLong(0))
    if (rdd.getNumPartitions == 0) return BloomFilter.create(expectedItems, fpp)
    rdd.coalesce(math.max(1, buildParts))
      .mapPartitions { it =>
        val f = BloomFilter.create(expectedItems, fpp)
        while (it.hasNext) f.putLong(it.next())
        Iterator.single(f)
      }
      .map((0, _))
      .reduceByKey((a, b) => { a.mergeInPlace(b); a }, 1)
      .values
      .collect()(0)
  }
}
