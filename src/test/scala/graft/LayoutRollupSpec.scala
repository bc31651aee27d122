package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Rollup}

/** Z-order layout: per-file min/max stats must stay tight on BOTH key
  * columns (that is the entire point — two-dimensional file skipping);
  * rollup store: multi-resolution serving must be bit-identical to
  * re-aggregating the base data. */
class LayoutRollupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-computed Morton codes)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 6).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5) = x bits {0,1} -> 1+4; y bits {0,2} -> 2+32 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, 4095L))
  }

  test("z-ordered files bound both dimensions; x-sorted files bound only x") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val zDir = Files.createTempDirectory("graft_zorder_").toString
    val xDir = Files.createTempDirectory("graft_xsort_").toString
    Layout.writeZOrdered(df, zDir, "x", "y", bits = 6, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    def fileStats(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
            .collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }

    val zStats = fileStats(zDir)
    val xStats = fileStats(xDir)
    assert(zStats.size == 16 && xStats.size == 16)
    // x-sorted layout: every file spans the FULL y range -> a y predicate
    // can never skip a file
    assert(xStats.forall { case (_, _, yMin, yMax) => yMin == 0L && yMax == 63L })
    // z-ordered: every file is a compact tile (neither dimension's span
    // exceeds two aligned quadrants)
    assert(zStats.forall { case (xMin, xMax, yMin, yMax) =>
      xMax - xMin <= 48L && yMax - yMin <= 48L }, s"tiles too wide: $zStats")
    // the actual payoff: a predicate on the NON-leading dimension
    // (y <= 15) overlaps the min/max stats of only a fraction of z-order
    // files, while every x-sorted file must be read
    val zTouched = zStats.count { case (_, _, yMin, _) => yMin <= 15L }
    val xTouched = xStats.count { case (_, _, yMin, _) => yMin <= 15L }
    assert(xTouched == 16)
    assert(zTouched * 2 <= 16, s"y-band predicate touches $zTouched/16 z-files")
  }

  test("multiResRange equals direct re-aggregation of the base rows") {
    // 3 types x 5 days of hourly points, value = deterministic function
    val events = (for {
      t <- Seq("a", "b"); d <- 0 until 5; h <- 0 until 24
    } yield (t, d * 24L + h, (d * 31 + h) % 7 + 0.25))
      .toDF("event_type", "hour", "value")
      .select(col("event_type"),
        timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    // range: day0 18:00 -> day4 06:00 (edges on both sides)
    val startUs = 18L * Rollup.HourUs
    val endUs = 4L * Rollup.DayUs + 6L * Rollup.HourUs
    val served = Rollup.multiResRangeFromBase(events, startUs, endUs)
    val resolutions = served.groupBy("resolution").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 6 + 6 edge hours x 2 types; 3 whole days x 2 types
    assert(resolutions == Map("hour" -> 24L, "day" -> 6L))
    val totals = served
      .agg(sum(col("n_events")).cast("long"),
        sum(col("sum_value")).cast("decimal(18,2)")).collect()(0)
    val direct = events
      .filter(unix_micros(col("ts")).between(startUs, endUs - 1))
      .agg(count(lit(1)),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)"))
      .collect()(0)
    assert(totals.getLong(0) == direct.getLong(0))
    assert(totals.getDecimal(1) == direct.getDecimal(1),
      "decomposed sums must be bit-identical to the direct aggregate")
  }

  test("serving from the materialized rollup store matches the inline form") {
    val events = (for (h <- 0 until 72) yield ("a", h.toLong, h * 0.5))
      .toDF("event_type", "hour", "value")
      .select(col("event_type"),
        timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    val store = Files.createTempDirectory("graft_rollup_").toString
    Rollup.writeRollups(events, store)
    val fromStore = Rollup.serveFromStore(spark, store, 0L, 72L * Rollup.HourUs)
      .orderBy("resolution", "event_type", "bucket_us").collect().toSeq
    val inline = Rollup.multiResRangeFromBase(events, 0L, 72L * Rollup.HourUs)
      .orderBy("resolution", "event_type", "bucket_us").collect().toSeq
    assert(fromStore == inline)
  }

  test("streaming rollup maintenance converges to the batch rollup store") {
    val src = Files.createTempDirectory("graft_rollsink_src_").toString
    val store = Files.createTempDirectory("graft_rollsink_store_").toString
    val ckpt = Files.createTempDirectory("graft_rollsink_ckpt_").toString
    def batchRows(off: Int) =
      (for (h <- 0 until 30; t <- Seq("a", "b"))
        yield (t, (off * 30 + h).toLong, (off * 7 + h) % 5 + 0.5))
        .toDF("event_type", "hour", "value")
        .select(col("event_type"),
          timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    batchRows(0).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = Rollup.rollupSink(
      spark.readStream.schema(schema).parquet(src), store, ckpt)
    try {
      q.processAllAvailable()
      batchRows(1).write.mode("append").parquet(src) // second micro-batch
      q.processAllAvailable()
    } finally q.stop()
    // the incrementally-merged store must equal writeRollups over ALL data
    val batchStore = Files.createTempDirectory("graft_rollsink_batch_").toString
    Rollup.writeRollups(spark.read.parquet(src), batchStore)
    for (grain <- Seq("rollup_hour", "rollup_day")) {
      val streamed = spark.read.parquet(s"$store/$grain")
        .orderBy("event_type", "bucket_us").collect().toSeq
      val batch = spark.read.parquet(s"$batchStore/$grain")
        .orderBy("event_type", "bucket_us").collect().toSeq
      assert(streamed == batch, s"$grain diverged")
    }
  }

  test("mergeRollups skips a re-delivered micro-batch id (replay guard)") {
    val store = Files.createTempDirectory("graft_rollreplay_").toString
    val events = (for (h <- 0 until 12) yield ("a", h.toLong, 2.0))
      .toDF("event_type", "hour", "value")
      .select(col("event_type"),
        timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    Rollup.mergeRollups(events, store, batchId = 0L)
    def total(): Long = spark.read.parquet(s"$store/rollup_hour")
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total() == 12L)
    // at-least-once replay of the SAME batch id: must be a no-op, not a
    // double-count
    Rollup.mergeRollups(events, store, batchId = 0L)
    assert(total() == 12L, "replayed batch double-counted")
    // a NEW batch id merges additively as usual
    Rollup.mergeRollups(events, store, batchId = 1L)
    assert(total() == 24L)
  }

  test("batch-mode mergeRollups carries the replay marker forward") {
    val store = Files.createTempDirectory("graft_rollmarker_").toString
    val events = (for (h <- 0 until 12) yield ("a", h.toLong, 2.0))
      .toDF("event_type", "hour", "value")
      .select(col("event_type"),
        timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    Rollup.mergeRollups(events, store, batchId = 3L)
    def total(): Long = spark.read.parquet(s"$store/rollup_hour")
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total() == 12L)
    // an unguarded batch-mode merge on the SAME store must not erase the
    // marker...
    Rollup.mergeRollups(events, store)
    assert(total() == 24L)
    // ...so a streaming restart re-delivering micro-batch 3 stays a no-op
    Rollup.mergeRollups(events, store, batchId = 3L)
    assert(total() == 24L, "replay guard erased by batch-mode merge")
    // and a genuinely new micro-batch still applies
    Rollup.mergeRollups(events, store, batchId = 4L)
    assert(total() == 36L)
  }

  test("mergeRollups heals a swap that crashed between its renames") {
    val store = Files.createTempDirectory("graft_rollheal_").toString
    val events = (for (h <- 0 until 24) yield ("a", h.toLong, 1.0))
      .toDF("event_type", "hour", "value")
      .select(col("event_type"),
        timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    Rollup.writeRollups(events, store)
    // simulate the crash state: hour table moved aside, swap never finished
    val dir = new java.io.File(s"$store/rollup_hour")
    val aside = new java.io.File(s"$store/.rollup_hour_old")
    assert(dir.renameTo(aside))
    // next merge must restore the aside, then apply the increment on top
    Rollup.mergeRollups(events.limit(0), store)
    assert(!aside.exists() && dir.exists())
    assert(spark.read.parquet(s"$store/rollup_hour").count() == 24)
  }

  test("multiResRange rejects unaligned ranges, handles sub-day ranges") {
    val events = Seq(("a", 0L, 1.0)).toDF("event_type", "hour", "value")
      .select(col("event_type"),
        timestamp_micros(col("hour") * Rollup.HourUs).as("ts"), col("value"))
    intercept[IllegalArgumentException] {
      Rollup.multiResRangeFromBase(events, 1L, Rollup.HourUs)
    }
    // sub-day range: everything served at hour grain
    val got = Rollup.multiResRangeFromBase(events, 0L, 2L * Rollup.HourUs).collect()
    assert(got.length == 1 && got(0).getString(0) == "hour")
  }
}
