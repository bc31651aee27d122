package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.DataPoint
import graft.operators.Snapshot

/** Manifest zone maps (r13): per-file timestamp min/max recorded at
  * commit time and used by [[graft.sources.ManifestFileIndex]] to skip
  * files WITHIN an hour on a pushed timestamp predicate — Delta-style
  * data skipping, planned entirely from the log. The contract under
  * test: skipping never changes results (conservative by construction),
  * files without stats are never pruned, and the stats survive every
  * lifecycle transition (increments, checkpoints, compaction, vacuum)
  * while dying with their tombstoned file. */
class ZoneMapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val hourMs = 3600000L
  private val baseMs = 1700000000000L - (1700000000000L % hourMs)
  private val hour0 = baseMs / hourMs

  /** `n` points in hour 0 with timestamps exactly [baseMs+lo, baseMs+hi],
    * one parquet file (single partition). */
  private def slice(lo: Long, hi: Long, n: Int = 100) = {
    require(hi > lo && hi < hourMs)
    spark.range(n).select(
      (lit(baseMs + lo) + floor(col("id") * lit(hi - lo) / lit(n - 1)))
        .cast("long").as("timestamp"),
      col("id").cast("double").as("value"),
      lit("cpu").as("metric")).as[DataPoint].repartition(1)
  }

  /** Execute `df` and return how many files the parquet scan READ — the
    * observable the zone maps exist to shrink. */
  private def filesScanned(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def ts = col("timestamp")

  test("a pushed timestamp predicate skips non-overlapping files inside " +
      "one hour; results are exact") {
    val store = Files.createTempDirectory("graft_zm1_").toString
    // four single-file commits, disjoint quarter-hour ranges
    Snapshot.ingestCommitted(slice(0L, 899999L), store)
    Snapshot.ingestCommitted(slice(900000L, 1799999L), store)
    Snapshot.ingestCommitted(slice(1800000L, 2699999L), store)
    Snapshot.ingestCommitted(slice(2700000L, 3599999L), store)
    val all = Snapshot.read(spark, store)
    assert(filesScanned(all) == 4 && all.count() == 400)
    // one quarter → one file
    val q2 = Snapshot.read(spark, store)
      .filter(ts >= 900000L + baseMs && ts <= 1799999L + baseMs)
    assert(filesScanned(q2) == 1)
    assert(q2.count() == 100)
    // a range straddling two quarters → two files
    val straddle = Snapshot.read(spark, store)
      .filter(ts.between(1700000L + baseMs, 1900000L + baseMs))
    assert(filesScanned(straddle) == 2)
    // point lookup → one file
    val point = Snapshot.read(spark, store).filter(ts === baseMs + 2700000L)
    assert(filesScanned(point) == 1 && point.count() >= 1)
    // boundary inclusivity: predicate ending EXACTLY on a file's max
    // keeps that file (the reference's inclusive range semantics)
    val edge = Snapshot.read(spark, store).filter(ts <= baseMs + 899999L)
    assert(filesScanned(edge) == 1 && edge.count() == 100)
    // strict < on a file's min excludes it
    val below = Snapshot.read(spark, store).filter(ts < baseMs + 900000L)
    assert(filesScanned(below) == 1)
  }

  test("files committed with stats disabled are never pruned — and never " +
      "break the read") {
    val store = Files.createTempDirectory("graft_zm2_").toString
    sys.props("spark.graft.commitStats") = "false"
    try {
      Snapshot.ingestCommitted(slice(0L, 899999L), store)
      Snapshot.ingestCommitted(slice(900000L, 1799999L), store)
    } finally sys.props.remove("spark.graft.commitStats")
    Snapshot.ingestCommitted(slice(1800000L, 2699999L), store)
    Snapshot.ingestCommitted(slice(2700000L, 3599999L), store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(Snapshot.loadState(fs, store).zmaps.size == 2,
      "exactly the stats-enabled commits should carry zone maps")
    // target the last quarter: its own file plus the two BLIND files
    // must be read (no stats = no skipping), the third is skipped
    val q4 = Snapshot.read(spark, store)
      .filter(ts >= baseMs + 2700000L)
    assert(filesScanned(q4) == 3)
    assert(q4.count() == 100)
  }

  test("zone maps survive compaction + vacuum checkpoints; tombstoned " +
      "files drop theirs; pruning still works on the compacted layout") {
    val store = Files.createTempDirectory("graft_zm3_").toString
    Snapshot.ingestCommitted(slice(0L, 899999L), store)
    Snapshot.ingestCommitted(slice(900000L, 1799999L), store)
    Snapshot.ingestCommitted(slice(1800000L, 2699999L), store)
    Snapshot.ingestCommitted(slice(2700000L, 3599999L), store)
    Snapshot.compactShard(spark, store, hour0, targetFiles = 2)
    Snapshot.vacuum(spark, store, graceMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val st = Snapshot.loadState(fs, store)
    assert(st.live.size == 2)
    assert(st.zmaps.keySet == st.live.toSet,
      "post-vacuum checkpoint must carry stats for exactly the live files")
    // r14 (ADVICE r13): compaction RANGE-partitions rows on timestamp, so
    // the 2 compacted files own disjoint contiguous slices of the hour —
    // intra-hour skipping survives compaction (hash partitioning spread
    // every file across the whole hour, defeating the refreshed stats)
    val q1 = Snapshot.read(spark, store).filter(ts < baseMs + 900000L)
    assert(filesScanned(q1) == 1 && q1.count() == 100,
      "a quarter-hour query on the compacted layout must hit one file")
    // a predicate outside every recorded range scans zero files
    val none = Snapshot.read(spark, store).filter(ts > baseMs + 3599999L)
    none.collect()
    assert(none.count() == 0)
    val counts = Snapshot.read(spark, store)
    assert(counts.count() == 400)
  }

  /** `n` points in hour 0, ts in [baseMs+lo, baseMs+hi], value in
    * [vbase, vbase+n-1] — distinct per-file VALUE ranges for the r14
    * value zone maps. */
  private def vslice(lo: Long, hi: Long, vbase: Double, n: Int = 100) = {
    require(hi > lo && hi < hourMs)
    spark.range(n).select(
      (lit(baseMs + lo) + floor(col("id") * lit(hi - lo) / lit(n - 1)))
        .cast("long").as("timestamp"),
      (lit(vbase) + col("id").cast("double")).as("value"),
      lit("cpu").as("metric")).as[DataPoint].repartition(1)
  }

  test("r14 value zone maps: a pushed value predicate skips files whose " +
      "recorded [min, max] provably misses; composes with ts pruning; " +
      "strict-bound and blind-file conservatism hold") {
    val store = Files.createTempDirectory("graft_zmv_").toString
    // four single-file commits: disjoint ts quarters AND value bands
    Snapshot.ingestCommitted(vslice(0L, 899999L, 0.0), store)
    Snapshot.ingestCommitted(vslice(900000L, 1799999L, 100.0), store)
    Snapshot.ingestCommitted(vslice(1800000L, 2699999L, 200.0), store)
    Snapshot.ingestCommitted(vslice(2700000L, 3599999L, 300.0), store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val st = Snapshot.loadState(fs, store)
    assert(st.zmaps.size == 4 &&
      st.zmaps.values.forall(z => z.value.isDefined && z.rows == Some(100L)),
      s"every commit should record value range + row count: ${st.zmaps}")
    def v = col("value")
    // top band → one file
    val hi = Snapshot.read(spark, store).filter(v >= 300.0)
    assert(filesScanned(hi) == 1 && hi.count() == 100)
    // interior band → one file
    val mid = Snapshot.read(spark, store).filter(v.between(150.0, 160.0))
    assert(filesScanned(mid) == 1 && mid.count() == 11)
    // equality → one file
    val eq = Snapshot.read(spark, store).filter(v === 250.0)
    assert(filesScanned(eq) == 1 && eq.count() == 1)
    // strict bound lands EXACTLY on a file's max: closed-interval
    // conservatism keeps that file (4 scanned), rows still exact
    val strict = Snapshot.read(spark, store).filter(v > 99.0)
    assert(filesScanned(strict) == 4 && strict.count() == 300)
    // ts AND value prune compose: quarter-2 ts range + top value band
    // provably miss every file — zero rows, and no file survives both
    val both = Snapshot.read(spark, store)
      .filter(ts.between(baseMs + 900000L, baseMs + 1799999L) && v >= 300.0)
    assert(both.count() == 0)
    assert(filesScanned(
      Snapshot.read(spark, store).filter(ts >= baseMs + 2700000L && v >= 300.0))
      == 1)
    // a blind file (stats disabled) is never pruned by a value predicate
    sys.props("spark.graft.commitStats") = "false"
    try Snapshot.ingestCommitted(vslice(0L, 899999L, 400.0), store)
    finally sys.props.remove("spark.graft.commitStats")
    val hi2 = Snapshot.read(spark, store).filter(v >= 300.0)
    assert(filesScanned(hi2) == 2 && hi2.count() == 200,
      "blind file must be scanned; value-banded file still pruned")
  }

  test("Committer increments carry zone maps; a replayed reader prunes " +
      "from them") {
    val store = Files.createTempDirectory("graft_zm4_").toString
    val c = Snapshot.committer(spark, store)
    c.ingest(slice(0L, 899999L))
    c.ingest(slice(900000L, 1799999L))
    c.ingest(slice(1800000L, 2699999L))
    val q = Snapshot.read(spark, store)
      .filter(ts.between(baseMs, baseMs + 899999L))
    assert(filesScanned(q) == 1 && q.count() == 100)
    // the caller-hours fast path records stats too
    c.ingest(slice(2700000L, 3599999L), Seq(hour0))
    val q4 = Snapshot.read(spark, store).filter(ts >= baseMs + 2700000L)
    assert(filesScanned(q4) == 1 && q4.count() == 100)
  }

  test("the streaming snapshot sink records zone maps per micro-batch " +
      "commit; the store prunes from them") {
    val store = Files.createTempDirectory("graft_zm6_").toString
    val ckpt = Files.createTempDirectory("graft_zm6_ck_").toString
    val src = Files.createTempDirectory("graft_zm6_src_").toString
    // two files = two micro-batches (maxFilesPerTrigger=1), disjoint ts
    slice(0L, 899999L).write.parquet(s"$src/b0")
    slice(900000L, 1799999L).write.parquet(s"$src/b1")
    val stream = spark.readStream
      .schema(graft.model.dataPointSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
      .as[DataPoint]
    graft.streaming.StreamingIngest
      .snapshotSinkStream(stream, store, ckpt, appId = "zm6")
      .awaitTermination()
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val st = Snapshot.loadState(fs, store)
    assert(st.live.nonEmpty && st.zmaps.keySet == st.live.toSet,
      "every streamed file should carry a zone map")
    val q = Snapshot.read(spark, store)
      .filter(ts.between(baseMs, baseMs + 899999L))
    assert(q.count() == 100)
    assert(filesScanned(q) < st.live.size,
      "the ts predicate should skip at least one streamed file")
  }

  test("pruning composes with hour partition pruning and ignores " +
      "non-timestamp predicates") {
    val store = Files.createTempDirectory("graft_zm5_").toString
    Snapshot.ingestCommitted(slice(0L, 899999L), store)
    Snapshot.ingestCommitted(slice(900000L, 1799999L), store)
    // second hour: one file
    val h1 = spark.range(100).select(
      (lit(baseMs + hourMs) + col("id")).as("timestamp"),
      col("id").cast("double").as("value"),
      lit("mem").as("metric")).as[DataPoint].repartition(1)
    Snapshot.ingestCommitted(h1, store)
    // hour filter + ts filter: partition pruning drops hour 1, zone maps
    // drop the second hour-0 file
    val q = Snapshot.read(spark, store)
      .filter(col("shard_hour") === hour0 && ts < baseMs + 900000L)
    assert(filesScanned(q) == 1 && q.count() == 100)
    // metric predicate alone derives no ts bound: all files scanned,
    // rows still exact
    val m = Snapshot.read(spark, store).filter(col("metric") === "mem")
    assert(filesScanned(m) == 3 && m.count() == 100)
  }
}
