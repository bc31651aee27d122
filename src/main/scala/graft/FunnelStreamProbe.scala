package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stateful-streaming stress probe #2: drives
  * [[graft.streaming.StreamingIngest.funnelStream]] through a GENERATED
  * multi-million-user conversion funnel on `RocksDBStateStoreProvider`.
  * [[StreamProbe]] proved scd2 (interval state, idle eviction) at 10 M
  * keys; the funnel exercises the OTHER state-machine shape — per-user
  * stage progression with horizon timeouts — whose closed-form output is
  * checkable to the row:
  *
  *   batch 0: every user fires `view`; batch 1: the first half fires
  *   `cart` (+2 h, inside the 4 h horizon); batch 2: the first quarter
  *   fires `buy`; batches 3+: fresh 1000-user cohorts keep the watermark
  *   advancing so stalled users time out of the store.
  *
  * Expected emissions are exact: stage 1 = nKeys + 1000·idleBatches,
  * stage 2 = nKeys/2, stage 3 = nKeys/4 (`require`d, counted via
  * foreachBatch). Expected final state rows are exact too: a batch-b
  * fresh cohort evicts at batch b+4 (watermark = prev batch max − 10 min
  * crosses its horizon then), completed buyers evict one batch after
  * completing, view/cart stallers when the watermark passes their
  * horizon — the probe computes the surviving-cohort count and
  * `require`s the store matches. Usage: `FunnelStreamProbe [nKeys]
  * [idleBatches]` (defaults 10 M / 4). */
object FunnelStreamProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.length > 0) args(0).toLong else 10000000L
    val idleBatches = if (args.length > 1) args(1).toInt else 4
    require(nKeys % 4 == 0, "nKeys must divide by 4 for exact stage counts")
    require(idleBatches >= 3, "need >= 3 trailing batches to see evictions")
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

    val srcDir = Files.createTempDirectory("graft_funnelprobe_src_").toString
    val ckDir = Files.createTempDirectory("graft_funnelprobe_ck_").toString
    val baseUs = 1700000000000000L
    val advanceUs = 2L * 3600L * 1000000L // 2 h event time per batch
    val horizonUs = 4L * 3600L * 1000000L
    val freshPerBatch = 1000L
    val stages = Seq("view", "cart", "buy")

    def writeBatch(b: Int, keyLo: Long, keyN: Long, stage: String): Unit =
      spark.range(keyN).select(
        (col("id") + keyLo).as("user_id"),
        lit(stage).as("event_type"),
        (lit(baseUs + b.toLong * advanceUs) + col("id") % 1000).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)

    writeBatch(0, 0L, nKeys, "view")
    writeBatch(1, 0L, nKeys / 2, "cart")
    writeBatch(2, 0L, nKeys / 4, "buy")
    (0 until idleBatches).foreach(i =>
      writeBatch(3 + i, nKeys + i * freshPerBatch, freshPerBatch, "view"))
    val lastBatch = 2 + idleBatches

    val stageCounts = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val schema = spark.read.parquet(srcDir).schema
    val q = graft.streaming.StreamingIngest.funnelStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(srcDir)
        .as[graft.streaming.StreamingIngest.FunnelEvent],
      stages, horizonUs, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          graft.streaming.StreamingIngest.StageReached], _: Long) =>
        df.groupBy(col("stage_idx")).count().collect().foreach(r =>
          stageCounts.synchronized {
            stageCounts(r.getInt(0)) += r.getLong(1)
          })
      }.start()
    q.processAllAvailable()

    println("batch  input_rows  batch_ms  state_rows  removed  " +
      "state_mem_mb  sst_mb  out_rows")
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.head
      val custom = scala.jdk.CollectionConverters
        .MapHasAsScala(so.customMetrics).asScala
      val sstMb = custom.getOrElse("rocksdbSstFileSize", 0L)
        .asInstanceOf[Number].longValue() / 1e6
      println(f"${p.batchId}%5d ${p.numInputRows}%11d " +
        f"${p.batchDuration}%9d ${so.numRowsTotal}%11d " +
        f"${so.numRowsRemoved}%8d ${so.memoryUsedBytes / 1e6}%13.1f " +
        f"$sstMb%7.1f ${p.sink.numOutputRows}%8d")
    }
    val finalRows = q.recentProgress.filter(_.numInputRows > 0)
      .last.stateOperators.head.numRowsTotal
    q.stop()
    org.apache.spark.sql.GraftColumnBridge.stopStateStores()

    // closed-form checks
    val wantStage = Map(
      1 -> (nKeys + freshPerBatch * idleBatches),
      2 -> nKeys / 2,
      3 -> nKeys / 4)
    println(s"STAGE_COUNTS got=${stageCounts.toMap} want=$wantStage")
    require(stageCounts.toMap == wantStage,
      s"funnel stage counts wrong: got $stageCounts want $wantStage")
    // survivors: fresh cohort written at batch b evicts at batch b+4
    // (watermark at batch k start = t(k−1) − 10 min; > t(b) + 4 h needs
    // k ≥ b+4), so cohorts with b+4 > lastBatch are still in the store
    val survivingCohorts = (3 to lastBatch).count(b => b + 4 > lastBatch)
    val wantFinal = survivingCohorts * freshPerBatch
    println(s"FINAL state_rows=$finalRows want=$wantFinal " +
      s"(cohorts=$survivingCohorts x $freshPerBatch)")
    require(finalRows == wantFinal,
      s"final state rows $finalRows != expected $wantFinal")
    println("FUNNELPROBE identical=true")
    spark.stop()
  }
}
