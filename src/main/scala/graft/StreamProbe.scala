package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stateful-streaming stress probe: drives [[graft.streaming
  * .StreamingIngest.scd2Stream]] through a GENERATED multi-million-key
  * stream on `RocksDBStateStoreProvider` and prints per-batch state-store
  * telemetry (rows total/updated/removed, state memory, rocksdb SST
  * bytes, batch latency). The toy-sized `RocksDBStateStoreSpec` proves
  * provider parity; this main proves the operator at a REALISTIC keyspace
  * — the 100-TB question is "does per-user state stay bounded and do
  * idle keys actually evict", which only shows up past millions of keys.
  *
  * Usage: `StreamProbe [nKeys] [buildBatches] [idleBatches]`
  * (defaults 10M / 4 / 4). Phase 1 (`buildBatches`) touches disjoint
  * key ranges until all `nKeys` carry state; phase 2 (`idleBatches`)
  * keeps only the first 10% of keys active while event time advances
  * 2 h per batch — with the probe's 4 h idle timeout the other 90% must
  * time out and leave the store, so `numRowsTotal` has to fall back
  * toward the active set by the final batch. Event times are fixed
  * (epoch-based), the generator is `spark.range` — fully deterministic.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.length > 0) args(0).toLong else 10000000L
    val buildBatches = if (args.length > 1) args(1).toInt else 4
    val idleBatches = if (args.length > 2) args(2).toInt else 4
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

    val srcDir = Files.createTempDirectory("graft_streamprobe_src_").toString
    val ckDir = Files.createTempDirectory("graft_streamprobe_ck_").toString
    val baseUs = 1700000000000000L // fixed epoch-micros origin
    val advanceUs = 2L * 3600L * 1000000L // event time step per batch
    val idleTimeoutUs = 4L * 3600L * 1000000L
    val perBuild = nKeys / buildBatches
    val activeIdle = math.max(1L, nKeys / 10L)

    // one parquet file per micro-batch, written up front in batch order;
    // maxFilesPerTrigger=1 replays them as an ordered stream
    def writeBatch(b: Int, keyLo: Long, keyN: Long): Unit =
      spark.range(keyN).select(
        (col("id") + keyLo).as("user_id"),
        (col("id") * 10 + b).as("event_id"),
        // alternate per batch so revisited keys close an interval each time
        when(lit(b % 2 == 0), lit("A")).otherwise(lit("B")).as("state_type"),
        (lit(baseUs + b.toLong * advanceUs) + col("id") % 1000).as("ts_us"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    (0 until buildBatches).foreach(b => writeBatch(b, b * perBuild, perBuild))
    (0 until idleBatches).foreach(b =>
      writeBatch(buildBatches + b, 0L, activeIdle))

    val schema = spark.read.parquet(srcDir).schema
    val q = graft.streaming.StreamingIngest.scd2Stream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(srcDir)
        .as[graft.streaming.StreamingIngest.StateEvent],
      idleTimeoutUs = idleTimeoutUs,
      watermark = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("noop").start()
    q.processAllAvailable()

    println("batch  input_rows  batch_ms  state_rows  upd  removed  " +
      "state_mem_mb  sst_mb  out_rows")
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.head
      val custom = scala.jdk.CollectionConverters
        .MapHasAsScala(so.customMetrics).asScala
      val sstMb = custom.getOrElse("rocksdbSstFileSize", 0L)
        .asInstanceOf[Number].longValue() / 1e6
      println(f"${p.batchId}%5d ${p.numInputRows}%11d " +
        f"${p.batchDuration}%9d ${so.numRowsTotal}%11d " +
        f"${so.numRowsUpdated}%4d ${so.numRowsRemoved}%8d " +
        f"${so.memoryUsedBytes / 1e6}%13.1f $sstMb%7.1f " +
        f"${p.sink.numOutputRows}%8d")
    }
    val last = q.recentProgress.filter(_.numInputRows > 0).last
    val finalRows = last.stateOperators.head.numRowsTotal
    println(s"FINAL state_rows=$finalRows active_set=$activeIdle " +
      s"(evictions ${if (finalRows <= activeIdle * 2) "OK" else "MISSING"})")
    q.stop()
    // close the cached RocksDB providers BEFORE JVM teardown — without
    // this the native compaction threads outlive DestroyJavaVM and
    // segfault the exit (see GraftColumnBridge.stopStateStores)
    org.apache.spark.sql.GraftColumnBridge.stopStateStores()
    spark.stop()
  }
}
