package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only late/out-of-order STORM probe for the stateful streams (r10:
  * the 10 M-key kill-restart probes shipped in-order batches; this one
  * ships adversarial reordering with closed-form expectations, including
  * the declared drop policies).
  *
  * `LateStormProbe [nKeys] [alert|scd2|both]`
  *
  * alertFor storm script (watermark 3 h, threshold mean 60, for: 3 h) —
  * batch boundaries are enforced by writing one file-set per batch and
  * draining between writes:
  *   b0  per-key hour-2 sample value 50         (arrives FIRST)
  *   b1  per-key hour-0 sample value 100        (late-in-horizon)
  *   b2  per-key hour-1 value 100 + a SECOND hour-2 sample value 90
  *       (split sample: hour-2 mean (50+90)/2 = 70 breaches only if the
  *       late half is folded)
  *   b3  one dummy row at hour 6 → watermark advances to hour 3
  *   b4  per-key POISON: hour-0 and hour-2 rows value 1.0, now BELOW the
  *       watermark → must drop (if leaked, hour-0 mean 50.5 breaks the
  *       run and the firing below never happens)
  *   b5  one dummy row at hour 30 → every key finalizes by event-time
  *       timeout, fires, and evicts
  * Closed form: exactly nKeys firings, all (start=hour0, fired=hour2,
  * n=3); terminal state rows ≤ 2.
  *
  * scd2 storm script (watermark 3 h):
  *   b0  per-user A@h0 + B@h2 (same batch; closes A)
  *   b1  per-user STALE C@h1 — inside the horizon but older than the
  *       open interval's start → the operator's stale guard drops it
  *       (pre-r10 this emitted an INVERTED interval closing B at h1)
  *   b2  dummy @h8 → watermark to h5
  *   b3  per-user D@h4 — below watermark → Spark drops it
  *   b4  per-user A@h6 — closes B at h6
  * Closed form: per user exactly (A, h0→h2) and (B, h2→h6); zero
  * inverted intervals; zero C or D states anywhere. */
object LateStormProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.length > 0) args(0).toLong else 10000000L
    val which = args.lift(1).getOrElse("both")
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

    val hourUs = 3600L * 1000000L
    val baseUs = 1700000000000000L - (1700000000000000L % hourUs)
    def h(i: Int): Long = baseUs + i * hourUs

    def progress(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      println("batch  input_rows  batch_ms  state_rows  removed")
      q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        val so = p.stateOperators.head
        println(f"${p.batchId}%5d ${p.numInputRows}%11d ${p.batchDuration}%9d " +
          f"${so.numRowsTotal}%11d ${so.numRowsRemoved}%8d")
      }
    }

    if (which == "alert" || which == "both") {
      val src = Files.createTempDirectory("graft_storm_alert_src_").toString
      val ck = Files.createTempDirectory("graft_storm_alert_ck_").toString
      val out = Files.createTempDirectory("graft_storm_alert_out_").toString
      def keyed(hh: Int, v: Double) = spark.range(nKeys).select(
        concat(lit("s"), col("id")).as("event_type"),
        lit(h(hh)).as("ts_us"), lit(v).as("value")).coalesce(4)
      // write b0 first so the stream has a schema + first batch
      keyed(2, 50.0).write.mode("append").parquet(src)
      val schema = spark.read.parquet(src).schema
      val q = graft.streaming.StreamingIngest.alertForStream(
        spark.readStream.schema(schema).parquet(src)
          .as[graft.streaming.StreamingIngest.AlertEvent],
        thresholdCents = 6000L, forHours = 3, watermark = "3 hours")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("parquet").option("path", out).start()
      val t0 = System.nanoTime()
      q.processAllAvailable()                                   // b0
      keyed(0, 100.0).write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b1
      keyed(1, 100.0).unionAll(keyed(2, 90.0))
        .write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b2
      Seq(("wm1", h(6), 1.0)).toDF("event_type", "ts_us", "value")
        .write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b3
      keyed(0, 1.0).unionAll(keyed(2, 1.0))
        .write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b4 poison
      Seq(("wm2", h(30), 1.0)).toDF("event_type", "ts_us", "value")
        .write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b5
      val wall = (System.nanoTime() - t0) / 1e9
      progress(q)
      val lastState = q.recentProgress.last.stateOperators.head.numRowsTotal
      q.stop()
      val sink = spark.read.parquet(out)
      val total = sink.count()
      val exact = sink.filter(col("alert_start_us") === h(0) &&
        col("fired_at_us") === h(2) && col("n_hours") === 3).count()
      val keys = sink.select("event_type").distinct().count()
      println(f"ALERT-STORM nKeys=$nKeys wall=$wall%.1f firings=$total " +
        s"exact_shape=$exact distinct_keys=$keys final_state=$lastState")
      assert(total == nKeys, s"firings $total != $nKeys")
      assert(exact == nKeys, s"shape wrong on ${nKeys - exact}")
      assert(keys == nKeys, s"keys $keys")
      assert(lastState <= 2, s"eviction: $lastState left")
      println(s"ALERT-STORM OK at $nKeys keys")
    }

    if (which == "scd2" || which == "both") {
      import graft.streaming.StreamingIngest.StateEvent
      val src = Files.createTempDirectory("graft_storm_scd2_src_").toString
      val ck = Files.createTempDirectory("graft_storm_scd2_ck_").toString
      val out = Files.createTempDirectory("graft_storm_scd2_out_").toString
      def keyed(tp: String, hh: Int, eid: Long) = spark.range(nKeys).select(
        col("id").as("user_id"), lit(eid).as("event_id"),
        lit(tp).as("state_type"), lit(h(hh)).as("ts_us")).coalesce(4)
      keyed("A", 0, 0L).unionAll(keyed("B", 2, 1L))
        .write.mode("append").parquet(src)
      val schema = spark.read.parquet(src).schema
      val q = graft.streaming.StreamingIngest.scd2Stream(
        spark.readStream.schema(schema).parquet(src).as[StateEvent],
        watermark = "3 hours")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("parquet").option("path", out).start()
      val t0 = System.nanoTime()
      q.processAllAvailable()                                   // b0
      keyed("C", 1, 2L).write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b1 stale
      Seq(StateEvent(-1L, 3L, "WM", h(8))).toDS()
        .write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b2
      keyed("D", 4, 4L).write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b3 late
      keyed("A", 6, 5L).write.mode("append").parquet(src)
      q.processAllAvailable()                                   // b4
      val wall = (System.nanoTime() - t0) / 1e9
      progress(q)
      q.stop()
      val sink = spark.read.parquet(out)
      val total = sink.count()
      val aOk = sink.filter(col("state") === "A" &&
        col("valid_from_us") === h(0) && col("valid_to_us") === h(2)).count()
      val bOk = sink.filter(col("state") === "B" &&
        col("valid_from_us") === h(2) && col("valid_to_us") === h(6)).count()
      val inverted = sink.filter(col("valid_to_us") < col("valid_from_us")).count()
      val phantom = sink.filter(col("state").isin("C", "D", "WM")).count()
      println(f"SCD2-STORM nKeys=$nKeys wall=$wall%.1f rows=$total " +
        s"a_ok=$aOk b_ok=$bOk inverted=$inverted phantom=$phantom")
      assert(total == 2 * nKeys, s"rows $total != ${2 * nKeys}")
      assert(aOk == nKeys && bOk == nKeys, s"shapes a=$aOk b=$bOk")
      assert(inverted == 0, s"$inverted inverted intervals")
      assert(phantom == 0, s"$phantom phantom states")
      println(s"SCD2-STORM OK at $nKeys keys")
    }
    org.apache.spark.sql.GraftColumnBridge.stopStateStores()
    spark.stop()
  }
}
