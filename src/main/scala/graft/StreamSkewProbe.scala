package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only HOT-KEY SKEW probe for the three stateful streaming
  * operators — `sessionizeStream`, `scd2Stream`, `alertForStream`
  * (r11 verdict #1: every prior streaming probe shipped UNIFORM keys;
  * the batch window family needed a real fix under 90%-one-key skew, so
  * uniform-key streaming evidence does not transfer).
  *
  * Distribution: 99% of rows belong to ONE key, the remaining 1% spread
  * over many cold keys — the worst case for `flatMapGroupsWithState`,
  * where a key's batch rows fold in a SINGLE task. The probe checks,
  * per operator, with the RocksDB state store provider:
  *  - CLOSED-FORM exactness (counts and shapes derived from the
  *    generator, not from a reference run);
  *  - per-batch wall + state-store metrics (rows, memory, SST bytes —
  *    RocksDB compaction behavior shows up as SST growth/collapse);
  *  - per-stage task-time skew via a listener (max vs median task —
  *    the hot key's task IS the max; the check is that it stays LINEAR
  *    in its row share, not that it disappears: a 99%-row task doing
  *    ~99% of the work is the floor for a keyed stateful operator).
  *
  * Why no "blocked" rewrite here (the batch sessionize treatment): a
  * batch operator can split one key's rows into blocks, process them in
  * parallel, and stitch boundaries in a second pass; a STATEFUL stream
  * cannot — the key's state transition is inherently sequential across
  * its batch rows. What CAN be fixed is per-row cost in the hot task:
  * r12 replaced sessionize's boxed `toSeq.sorted` (24+ B/row live
  * through the sort) with a primitive `Array[Long]` + `Arrays.sort`,
  * and scd2's `sortBy(tuple)` (a boxed key tuple per row) with an
  * in-place comparator sort. alertForStream already folds each row into
  * bounded per-hour state in O(1) with no batch materialization.
  *
  * Usage: `StreamSkewProbe [sessionize|scd2|alert|warm|fatcold|all]
  * [nRows] [kill]` (default: all 10M). `warm` = r13 axis 2 (32 warm
  * keys, full-occupancy balance on local[32]); `fatcold` = r13 axis 3
  * (1 hot key + 1 M cold state rows — RocksDB compaction under a fat
  * working set). With `kill`, each stream is stopped from the
  * probe thread the moment its first batch commits — mid-flight of a
  * FAT hot-key batch — and restarted from the checkpoint; every
  * closed-form assertion must hold ACROSS the kill (the
  * [[AlertStreamProbe]] discipline, now under 99 % skew: the
  * re-delivered batch replays the hot key's millions of rows against
  * recovered state). Deterministic: `spark.range` generators, fixed
  * epochs.
  */
object StreamSkewProbe {
  private val baseUs = 1700000000000000L
  private val hourUs = 3600L * 1000000L

  /** Collects task durations per stage; reports max-vs-median skew. */
  private final class TaskStats extends SparkListener {
    val durs = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskInfo != null && t.taskInfo.successful)
        durs.getOrElseUpdate(t.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) +=
          t.taskInfo.duration
    }
    def report(tag: String): Unit = synchronized {
      println(s"$tag: top stages by max task ms (skew = max/median):")
      println(s"$tag: stage  tasks  med_ms  max_ms   skew")
      durs.toSeq.filter(_._2.size >= 2)
        .sortBy(-_._2.max).take(6).foreach { case (sid, d) =>
          val s = d.sorted
          val med = s(s.size / 2).max(1L)
          println(f"$tag: $sid%5d ${s.size}%6d ${med}%7d ${s.last}%7d " +
            f"${s.last.toDouble / med}%6.1f")
        }
      durs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("all")
    val n = if (args.length > 1) args(1).toLong else 10000000L
    killMidRun = args.lift(2).contains("kill")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    if (op == "all" || op == "sessionize") sessionize(spark, stats, n)
    if (op == "all" || op == "scd2") scd2(spark, stats, n)
    if (op == "all" || op == "alert") alert(spark, stats, n)
    // r13 second + third skew axes (r12 verdict #6): many-warm-keys
    // full-occupancy balance, and a FAT cold working set under skew
    if (op == "all" || op == "warm") {
      sessionizeWarm(spark, stats, n); scd2Warm(spark, stats, n)
    }
    if (op == "all" || op == "fatcold") sessionizeFatCold(spark, stats, n)
    org.apache.spark.sql.GraftColumnBridge.stopStateStores()
    spark.stop()
  }

  private var killMidRun = false

  /** Start (and with `kill`, stop-after-first-commit then restart) the
    * query, drain it, and report per-batch + task-skew telemetry. */
  private def runAndReport(startQuery: () => org.apache.spark.sql.streaming.StreamingQuery,
      stats: TaskStats, tag: String): Unit = {
    if (killMidRun) {
      val q1 = startQuery()
      while (q1.isActive && !q1.recentProgress.exists(_.numInputRows > 0))
        Thread.sleep(50)
      q1.stop() // interrupts whatever fat batch is mid-flight
      println(s"$tag: KILL landed after batchId=" +
        Option(q1.lastProgress).map(_.batchId).getOrElse(-1L))
    }
    val q = startQuery()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"$tag: batch  input_rows  batch_ms  state_rows  removed  state_mem_mb  sst_mb")
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.head
      val custom = scala.jdk.CollectionConverters
        .MapHasAsScala(so.customMetrics).asScala
      val sstMb = custom.getOrElse("rocksdbSstFileSize", 0L)
        .asInstanceOf[Number].longValue() / 1e6
      println(f"$tag: ${p.batchId}%5d ${p.numInputRows}%11d ${p.batchDuration}%9d " +
        f"${so.numRowsTotal}%11d ${so.numRowsRemoved}%8d " +
        f"${so.memoryUsedBytes / 1e6}%12.1f $sstMb%7.1f")
    }
    q.stop()
    println(f"$tag: stream wall ${wall}%.1f s")
    stats.report(tag)
  }

  /** 99%-one-user sessionizer: hot user 0 carries `0.99n` events at 1 ms
    * spacing (the whole hot timeline spans ~hotN ms — hours, safely
    * inside the 48 h watermark) with a 120 s jump every `sessLen` events
    * (gap 60 s closes a session at each jump); cold users get one event
    * each inside the hot range. Closed form: hot emits
    * ceil(hotN/sessLen) sessions whose n_events sum to hotN, every cold
    * user exactly one 1-event session; the flush key's own open session
    * never closes (stays in state, unemitted). One file per chunk —
    * parquet part names are random UUIDs, so multi-file chunks would
    * scramble cross-batch arrival order. */
  private def sessionize(spark: SparkSession, stats: TaskStats, n: Long): Unit = {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val hotN = (n * 99L) / 100L
    val nCold = n - hotN
    val sessLen = (hotN + 7L) / 8L
    val hotSessions = (hotN + sessLen - 1) / sessLen
    val srcDir = Files.createTempDirectory("graft_skewsess_src_").toString
    val ckDir = Files.createTempDirectory("graft_skewsess_ck_").toString
    val outDir = Files.createTempDirectory("graft_skewsess_out_").toString
    // 4 chunk files in time order: each micro-batch folds ~hotN/4 rows
    // of the hot key in ONE task
    val chunks = 4
    (0 until chunks).foreach { c =>
      val lo = hotN * c / chunks; val hi = hotN * (c + 1) / chunks
      spark.range(lo, hi).select(
        lit(0L).as("user_id"),
        (lit(baseUs) + col("id") * 1000L +
          expr(s"id div ${sessLen}L") * 120000000L).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    // cold users: ids 1..nCold, one event each, inside the hot time range
    spark.range(1L, nCold + 1L).select(
      col("id").as("user_id"),
      (lit(baseUs) + (col("id") % 3600L) * 1000L).as("ts_us"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    // watermark flush: one far-future event closes every open session
    Seq((-1L, baseUs + 90L * 24L * hourUs)).toDF("user_id", "ts_us")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = StreamingIngest.sessionizeStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(srcDir).as[StreamingIngest.SessionEvent],
      gapUs = 60L * 1000000L, watermark = "48 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    runAndReport(() => startQuery(), stats, "SESSIONIZE")

    val sink = spark.read.parquet(outDir)
    val hot = sink.filter(col("user_id") === 0L)
      .agg(count(lit(1)), sum("n_events")).collect()(0)
    val coldOk = sink.filter(col("user_id") > 0L && col("n_events") === 1L).count()
    val total = sink.count()
    println(s"SESSIONIZE expected: hot_sessions=$hotSessions hot_events=$hotN " +
      s"cold=$nCold total=${hotSessions + nCold}")
    println(s"SESSIONIZE got:      hot_sessions=${hot.getLong(0)} " +
      s"hot_events=${hot.getLong(1)} cold_ok=$coldOk total=$total")
    assert(hot.getLong(0) == hotSessions && hot.getLong(1) == hotN)
    assert(coldOk == nCold && total == hotSessions + nCold)
    println(s"SESSIONIZE OK at $n rows, 99% one key")
  }

  /** 99%-one-user SCD2: hot user alternates type A/B every event at 1 ms
    * spacing — every event after the first closes an interval of exactly
    * 1 ms, so hot closes hotN−1 intervals; each cold user sends A then B
    * 1 ms apart (closes exactly one). The probe also stresses EMISSION
    * volume: the hot task emits ~0.99n closed intervals alone. */
  private def scd2(spark: SparkSession, stats: TaskStats, n: Long): Unit = {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val hotN = (n * 99L) / 100L
    val nCold = (n - hotN) / 2L
    val srcDir = Files.createTempDirectory("graft_skewscd2_src_").toString
    val ckDir = Files.createTempDirectory("graft_skewscd2_ck_").toString
    val outDir = Files.createTempDirectory("graft_skewscd2_out_").toString
    val chunks = 4
    (0 until chunks).foreach { c =>
      val lo = hotN * c / chunks; val hi = hotN * (c + 1) / chunks
      spark.range(lo, hi).select(
        lit(0L).as("user_id"),
        col("id").as("event_id"),
        when(col("id") % 2L === 0L, "A").otherwise("B").as("state_type"),
        (lit(baseUs) + col("id") * 1000L).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    // cold: two events per user (A at t, B at t+1ms) inside the hot range
    spark.range(1L, nCold + 1L).select(
      col("id").as("user_id"), lit(0L).as("event_id"),
      lit("A").as("state_type"),
      (lit(baseUs) + (col("id") % 3600L) * 1000L).as("ts_us"))
      .union(spark.range(1L, nCold + 1L).select(
        col("id").as("user_id"), lit(1L).as("event_id"),
        lit("B").as("state_type"),
        (lit(baseUs) + (col("id") % 3600L) * 1000L + 1000L).as("ts_us")))
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((-1L, 0L, "A", baseUs + 90L * 24L * hourUs))
      .toDF("user_id", "event_id", "state_type", "ts_us")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = StreamingIngest.scd2Stream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(srcDir).as[StreamingIngest.StateEvent],
      watermark = "48 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    runAndReport(() => startQuery(), stats, "SCD2")

    val sink = spark.read.parquet(outDir)
    val hot = sink.filter(col("user_id") === 0L)
    val hotCount = hot.count()
    // every hot interval is exactly 1 ms — shape check in one aggregate
    val hotExact = hot.filter(col("valid_to_us") - col("valid_from_us")
      === 1000L).count()
    val coldOk = sink.filter(col("user_id") > 0L && col("state") === "A" &&
      col("valid_to_us") - col("valid_from_us") === 1000L).count()
    val total = sink.count()
    println(s"SCD2 expected: hot_closed=${hotN - 1} cold=$nCold " +
      s"total=${hotN - 1 + nCold}")
    println(s"SCD2 got:      hot_closed=$hotCount exact_1s=$hotExact " +
      s"cold_ok=$coldOk total=$total")
    assert(hotCount == hotN - 1 && hotExact == hotN - 1)
    assert(coldOk == nCold && total == hotN - 1 + nCold)
    println(s"SCD2 OK at $n rows, 99% one key")
  }

  /** MANY-WARM-KEYS sessionizer (r13 axis 2): 32 keys × n/32 rows — on
    * local[32] every core folds one key's batch slice, the
    * full-occupancy BALANCE point the 99 %-one-key axis cannot see
    * (there the bound is one core; here it is the scheduler + state
    * store under 32 concurrently fat groups). Same per-key session
    * script as the hot axis: 1 ms spacing, a 120 s jump every `sessLen`
    * events. Closed form: every key emits ceil(perKey/sessLen) sessions
    * whose n_events sum to perKey; the flush key stays open. */
  private def sessionizeWarm(spark: SparkSession, stats: TaskStats, n: Long): Unit = {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val keys = 32L
    val perKey = n / keys
    val sessLen = (perKey + 7L) / 8L
    val sessPerKey = (perKey + sessLen - 1) / sessLen
    val srcDir = Files.createTempDirectory("graft_warmsess_src_").toString
    val ckDir = Files.createTempDirectory("graft_warmsess_ck_").toString
    val outDir = Files.createTempDirectory("graft_warmsess_out_").toString
    // 4 chunk files in per-key-time order; each micro-batch carries a
    // fat slice of EVERY key (32 concurrently hot groups)
    val chunks = 4
    (0 until chunks).foreach { c =>
      val lo = perKey * c / chunks; val hi = perKey * (c + 1) / chunks
      spark.range(lo * keys, hi * keys).select(
        (col("id") % keys).as("user_id"),
        (lit(baseUs) + expr(s"id div ${keys}L") * 1000L +
          expr(s"(id div ${keys}L) div ${sessLen}L") * 120000000L).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    Seq((-1L, baseUs + 90L * 24L * hourUs)).toDF("user_id", "ts_us")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = StreamingIngest.sessionizeStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(srcDir).as[StreamingIngest.SessionEvent],
      gapUs = 60L * 1000000L, watermark = "48 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    runAndReport(() => startQuery(), stats, "WARMSESS")

    val sink = spark.read.parquet(outDir)
    val perKeyOk = sink.filter(col("user_id") >= 0L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("s"), sum("n_events").as("e"))
      .filter(col("s") === sessPerKey && col("e") === perKey).count()
    val total = sink.count()
    println(s"WARMSESS expected: keys=$keys sessions/key=$sessPerKey " +
      s"events/key=$perKey total=${keys * sessPerKey}")
    println(s"WARMSESS got:      keys_exact=$perKeyOk total=$total")
    assert(perKeyOk == keys && total == keys * sessPerKey)
    println(s"WARMSESS OK at $n rows, $keys warm keys (full occupancy)")
  }

  /** MANY-WARM-KEYS SCD2 (r13 axis 2): 32 keys × n/32 rows alternating
    * A/B at 1 ms spacing — every key closes perKey−1 exactly-1 ms
    * intervals, and every core carries one fat group's fold AND its
    * emission volume (~n total closed intervals through the sink). */
  private def scd2Warm(spark: SparkSession, stats: TaskStats, n: Long): Unit = {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val keys = 32L
    val perKey = n / keys
    val srcDir = Files.createTempDirectory("graft_warmscd2_src_").toString
    val ckDir = Files.createTempDirectory("graft_warmscd2_ck_").toString
    val outDir = Files.createTempDirectory("graft_warmscd2_out_").toString
    val chunks = 4
    (0 until chunks).foreach { c =>
      val lo = perKey * c / chunks; val hi = perKey * (c + 1) / chunks
      spark.range(lo * keys, hi * keys).select(
        (col("id") % keys).as("user_id"),
        expr(s"id div ${keys}L").as("event_id"),
        when(expr(s"(id div ${keys}L) % 2") === 0L, "A")
          .otherwise("B").as("state_type"),
        (lit(baseUs) + expr(s"id div ${keys}L") * 1000L).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    Seq((-1L, 0L, "A", baseUs + 90L * 24L * hourUs))
      .toDF("user_id", "event_id", "state_type", "ts_us")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = StreamingIngest.scd2Stream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(srcDir).as[StreamingIngest.StateEvent],
      watermark = "48 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    runAndReport(() => startQuery(), stats, "WARMSCD2")

    val sink = spark.read.parquet(outDir)
    val perKeyOk = sink.filter(col("user_id") >= 0L &&
        col("valid_to_us") - col("valid_from_us") === 1000L)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") === perKey - 1L).count()
    val total = sink.count()
    println(s"WARMSCD2 expected: keys=$keys closed/key=${perKey - 1} " +
      s"total=${keys * (perKey - 1)}")
    println(s"WARMSCD2 got:      keys_exact=$perKeyOk total=$total")
    assert(perKeyOk == keys && total == keys * (perKey - 1))
    println(s"WARMSCD2 OK at $n rows, $keys warm keys")
  }

  /** FAT-COLD-STATE sessionizer (r13 axis 3): ONE hot key plus 1 M cold
    * keys with one open session each — the state store carries a ~1 M-row
    * working set (RocksDB memtable flush + compaction pressure) WHILE the
    * hot key's fold serializes on one core. Closed form: hot emits
    * ceil(hotN/sessLen) sessions summing to hotN; every cold key exactly
    * one 1-event session once the flush advances the watermark. */
  private def sessionizeFatCold(spark: SparkSession, stats: TaskStats, n: Long): Unit = {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val nCold = math.min(1000000L, n / 10L)
    val hotN = n - nCold
    val sessLen = (hotN + 7L) / 8L
    val hotSessions = (hotN + sessLen - 1) / sessLen
    val srcDir = Files.createTempDirectory("graft_fatsess_src_").toString
    val ckDir = Files.createTempDirectory("graft_fatsess_ck_").toString
    val outDir = Files.createTempDirectory("graft_fatsess_out_").toString
    // cold keys FIRST so the fat state set exists before the hot chunks
    // fold on top of it
    spark.range(1L, nCold + 1L).select(
      col("id").as("user_id"),
      (lit(baseUs) + (col("id") % 3600L) * 1000L).as("ts_us"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val chunks = 4
    (0 until chunks).foreach { c =>
      val lo = hotN * c / chunks; val hi = hotN * (c + 1) / chunks
      spark.range(lo, hi).select(
        lit(0L).as("user_id"),
        (lit(baseUs) + col("id") * 1000L +
          expr(s"id div ${sessLen}L") * 120000000L).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    Seq((-1L, baseUs + 90L * 24L * hourUs)).toDF("user_id", "ts_us")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = StreamingIngest.sessionizeStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(srcDir).as[StreamingIngest.SessionEvent],
      gapUs = 60L * 1000000L, watermark = "48 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    runAndReport(() => startQuery(), stats, "FATCOLD")

    val sink = spark.read.parquet(outDir)
    val hot = sink.filter(col("user_id") === 0L)
      .agg(count(lit(1)), sum("n_events")).collect()(0)
    val coldOk = sink.filter(col("user_id") > 0L && col("n_events") === 1L).count()
    val total = sink.count()
    println(s"FATCOLD expected: hot_sessions=$hotSessions hot_events=$hotN " +
      s"cold=$nCold total=${hotSessions + nCold}")
    println(s"FATCOLD got:      hot_sessions=${hot.getLong(0)} " +
      s"hot_events=${hot.getLong(1)} cold_ok=$coldOk total=$total")
    assert(hot.getLong(0) == hotSessions && hot.getLong(1) == hotN)
    assert(coldOk == nCold && total == hotSessions + nCold)
    println(s"FATCOLD OK at $n rows, 1 hot key + $nCold cold state rows")
  }

  /** 99%-one-series alert-for: the hot series carries `0.99n` samples
    * spread over 8 hours (breach script: hours 0-2 at 100, rest at 1,
    * threshold mean 60, for: 3 h → fires ONCE at hour 2); cold series
    * get one sample per hour, same script, one firing each. Unlike the
    * other two, alertForStream folds each row into bounded per-hour
    * state — the hot task is pure O(rows) fold with no materialization. */
  private def alert(spark: SparkSession, stats: TaskStats, n: Long): Unit = {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val hotN = (n * 99L) / 100L
    val nColdSeries = (n - hotN) / 8L
    val breach = Set(0L, 1L, 2L)
    val srcDir = Files.createTempDirectory("graft_skewalert_src_").toString
    val ckDir = Files.createTempDirectory("graft_skewalert_ck_").toString
    val outDir = Files.createTempDirectory("graft_skewalert_out_").toString
    val perHour = hotN / 8L
    (0L until 8L).foreach { h =>
      spark.range(perHour).select(
        lit("hot").as("event_type"),
        (lit(baseUs + h * hourUs) + (col("id") % 3600L) * 1000000L).as("ts_us"),
        lit(if (breach(h)) 100.0 else 1.0).as("value"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      spark.range(nColdSeries).select(
        concat(lit("s"), col("id")).as("event_type"),
        lit(baseUs + h * hourUs).as("ts_us"),
        lit(if (breach(h)) 100.0 else 1.0).as("value"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    Seq(("wm_advance", baseUs + 24L * hourUs, 1.0))
      .toDF("event_type", "ts_us", "value")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = StreamingIngest.alertForStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").option("latestFirst", "false")
        .parquet(srcDir).as[StreamingIngest.AlertEvent],
      thresholdCents = 6000L, forHours = 3, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    runAndReport(() => startQuery(), stats, "ALERT")

    val sink = spark.read.parquet(outDir)
    val h0 = (baseUs / hourUs) * hourUs
    val expected = 1L + nColdSeries
    val total = sink.count()
    val exact = sink.filter(col("alert_start_us") === h0 &&
      col("fired_at_us") === h0 + 2L * hourUs && col("n_hours") === 3).count()
    val hotFired = sink.filter(col("event_type") === "hot").count()
    println(s"ALERT expected: firings=$expected (hot=1, cold=$nColdSeries)")
    println(s"ALERT got:      firings=$total exact_shape=$exact hot=$hotFired")
    assert(total == expected && exact == expected && hotFired == 1L)
    println(s"ALERT OK at $n rows, 99% one key")
  }
}
