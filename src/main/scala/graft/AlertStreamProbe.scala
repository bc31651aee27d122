package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale probe for [[graft.streaming.StreamingIngest
  * .alertForStream]] — the third stateful operator, parity-spec'd at toy
  * size only until this existed. Drives a GENERATED `nSeries`-key stream
  * (RocksDB provider) through a fixed per-series breach script with a
  * CLOSED-FORM firing count, then checks state growth, watermark-timeout
  * finalization, and idle eviction at a realistic keyspace.
  *
  * Script per series (threshold mean 60.00, `for:` = 3 h, one sample per
  * hour): hours 0-2 breach (mean 100) → fires ONCE with start=hour 0 at
  * hour 2; hour 3 quiet; hours 4-5 breach — a 2-run, never fires; hours
  * 6-7 quiet. A final watermark batch (one dummy series at hour +24)
  * wakes every key by event-time timeout, finalizes the tail hours, and
  * — since every run is long closed — must EVICT all `nSeries` states
  * (state_rows collapses to ~1). Closed form: exactly `nSeries` firings,
  * every one `(start=hour0, fired=hour2, n=3)`.
  *
  * Usage: `AlertStreamProbe [nSeries] [kill]` (default 10M). With
  * `kill`, the stream is stopped from a side thread the moment the
  * first batch commits (mid-flight of the next — the
  * [[Scd2RecoveryProbe]] discipline) and restarted from the checkpoint;
  * every closed-form assertion must hold ACROSS the kill, proving the
  * run-tracking state machine (open hours + breach run bookkeeping)
  * recovers exactly, not just the simpler scd2 open-interval state.
  * Deterministic: `spark.range` generator, fixed epoch times.
  */
object AlertStreamProbe {
  def main(args: Array[String]): Unit = {
    val nSeries = if (args.length > 0) args(0).toLong else 10000000L
    val killMidRun = args.lift(1).contains("kill")
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
    import spark.implicits._

    val srcDir = Files.createTempDirectory("graft_alertprobe_src_").toString
    val ckDir = Files.createTempDirectory("graft_alertprobe_ck_").toString
    val outDir = Files.createTempDirectory("graft_alertprobe_out_").toString
    val baseUs = 1700000000000000L
    val hourUs = 3600L * 1000000L
    val breachHours = Set(0, 1, 2, 4, 5)

    (0 to 7).foreach { h =>
      spark.range(nSeries).select(
        concat(lit("s"), col("id")).as("event_type"),
        lit(baseUs + h * hourUs).as("ts_us"),
        lit(if (breachHours(h)) 100.0 else 1.0).as("value"))
        .coalesce(4).write.mode("append").parquet(srcDir)
    }
    // watermark batch: one dummy series far in the future — every real
    // key must finalize its tail via event-time timeout and then evict
    Seq(("wm_advance", baseUs + 24 * hourUs, 1.0))
      .toDF("event_type", "ts_us", "value")
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def startQuery() = graft.streaming.StreamingIngest.alertForStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(srcDir)
        .as[graft.streaming.StreamingIngest.AlertEvent],
      thresholdCents = 6000L, forHours = 3,
      watermark = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()
    if (killMidRun) {
      val q1 = startQuery()
      while (q1.isActive && !q1.recentProgress.exists(_.numInputRows > 0))
        Thread.sleep(50)
      q1.stop() // interrupts whatever batch is mid-flight
      println(s"KILL landed after batchId=" +
        Option(q1.lastProgress).map(_.batchId).getOrElse(-1L))
    }
    val q = startQuery()
    q.processAllAvailable()

    println("batch  input_rows  batch_ms  state_rows  removed  state_mem_mb  sst_mb")
    q.recentProgress.filter(p => p.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.head
      val custom = scala.jdk.CollectionConverters
        .MapHasAsScala(so.customMetrics).asScala
      val sstMb = custom.getOrElse("rocksdbSstFileSize", 0L)
        .asInstanceOf[Number].longValue() / 1e6
      println(f"${p.batchId}%5d ${p.numInputRows}%11d ${p.batchDuration}%9d " +
        f"${so.numRowsTotal}%11d ${so.numRowsRemoved}%8d " +
        f"${so.memoryUsedBytes / 1e6}%12.1f $sstMb%7.1f")
    }
    val lastState =
      q.recentProgress.last.stateOperators.head.numRowsTotal
    q.stop()

    val sink = spark.read.parquet(outDir)
    val total = sink.count()
    val h0 = (baseUs / hourUs) * hourUs // hour BUCKET of the first sample
    val exact = sink.filter(col("alert_start_us") === h0 &&
      col("fired_at_us") === h0 + 2 * hourUs &&
      col("n_hours") === 3).count()
    val keys = sink.select(col("event_type")).distinct().count()
    println(s"EXPECTED firings=$nSeries  got=$total  exact_shape=$exact " +
      s"distinct_keys=$keys  final_state_rows=$lastState")
    assert(total == nSeries, s"firing count $total != $nSeries")
    assert(exact == nSeries, s"wrong episode shape on ${nSeries - exact}")
    assert(keys == nSeries, s"duplicate/missing series: $keys")
    assert(lastState <= 2, s"idle eviction missing: $lastState states left")
    println(s"ALERT-FOR OK at $nSeries series: closed-form firings, " +
      "single-fire per episode, full idle eviction")
    org.apache.spark.sql.GraftColumnBridge.stopStateStores()
    spark.stop()
  }
}
