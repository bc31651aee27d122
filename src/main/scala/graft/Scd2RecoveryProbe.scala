package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only checkpoint-RECOVERY probe for [[graft.streaming
  * .StreamingIngest.scd2Stream]] on RocksDB state: the exactly-once spec
  * covers the file-sink commit log at toy size, and [[StreamProbe]]
  * covers 10 M-key state growth/eviction — but neither ever KILLS a run
  * and restarts it from the checkpoint, which is the failure mode a
  * 1000-executor deployment actually exercises weekly. This main:
  *
  *  1. writes `batches` parquet micro-batches, EACH touching all `nKeys`
  *     users with the state type alternating per batch — so every batch
  *     after the first closes exactly one interval per user and the
  *     closed-form total is `nKeys * (batches - 1)`;
  *  2. starts the stream (RocksDB provider, parquet file sink) and stops
  *     it from a side thread the moment the first sink commit lands —
  *     deliberately NOT at a batch boundary, so the restart has to
  *     recover whatever half-finished batch was in flight;
  *  3. restarts the IDENTICAL query on the same checkpoint + sink and
  *     drains the remaining input;
  *  4. reads the sink back THROUGH its `_spark_metadata` commit log and
  *     asserts zero lost and zero duplicate closed intervals against the
  *     closed form (any orphan files from the killed attempt are invisible
  *     by construction — that is the exactly-once contract under test).
  *
  * Usage: `Scd2RecoveryProbe [nKeys] [batches]` (defaults 10M / 6).
  * Event times are fixed epoch-based, the generator is `spark.range` —
  * fully deterministic; the only nondeterminism is WHERE the kill lands,
  * which the probe prints but the assertion is independent of.
  */
object Scd2RecoveryProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.length > 0) args(0).toLong else 10000000L
    val batches = if (args.length > 1) args(1).toInt else 6
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

    val srcDir = Files.createTempDirectory("graft_scd2rec_src_").toString
    val ckDir = Files.createTempDirectory("graft_scd2rec_ck_").toString
    val outDir = Files.createTempDirectory("graft_scd2rec_out_").toString
    val baseUs = 1700000000000000L
    val advanceUs = 2L * 3600L * 1000000L

    (0 until batches).foreach { b =>
      spark.range(nKeys).select(
        col("id").as("user_id"),
        (col("id") * 100 + b).as("event_id"),
        when(lit(b % 2 == 0), lit("A")).otherwise(lit("B")).as("state_type"),
        lit(baseUs + b.toLong * advanceUs).as("ts_us"))
        .coalesce(4).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema

    def startQuery() = graft.streaming.StreamingIngest.scd2Stream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .option("latestFirst", "false")
        .parquet(srcDir)
        .as[graft.streaming.StreamingIngest.StateEvent],
      idleTimeoutUs = Long.MaxValue / 4, // no evictions: pure closed form
      watermark = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir).start()

    // ---- attempt 1: kill as soon as the first batch commits ----
    // (poll batchId, not sink.numOutputRows — a file sink reports -1)
    val q1 = startQuery()
    val t0 = System.nanoTime()
    while (q1.isActive && !q1.recentProgress.exists(_.numInputRows > 0))
      Thread.sleep(50)
    q1.stop() // interrupts whatever batch is mid-flight
    val killedAt = Option(q1.lastProgress).map(_.batchId).getOrElse(-1L)
    println(f"KILL landed after batchId=$killedAt " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s in)")

    // ---- attempt 2: same checkpoint, same sink, drain the rest ----
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.head
      println(f"RESUME batch=${p.batchId}%3d in=${p.numInputRows}%9d " +
        f"ms=${p.batchDuration}%7d state_rows=${so.numRowsTotal}%9d " +
        f"out=${p.sink.numOutputRows}%9d")
    }
    q2.stop()

    // ---- verdict: read THROUGH the sink commit log ----
    val expected = nKeys * (batches - 1)
    val sink = spark.read.parquet(outDir)
    val total = sink.count()
    val distinct =
      sink.select(col("user_id"), col("valid_from_us")).distinct().count()
    println(s"EXPECTED closed=$expected  got=$total  distinct=$distinct")
    assert(total == expected, s"lost/duplicated rows: $total != $expected")
    assert(distinct == expected, s"duplicate intervals: $distinct")
    // every user carries exactly batches-1 closed intervals
    val badUsers = sink.groupBy(col("user_id")).count()
      .filter(col("count") =!= (batches - 1)).count()
    assert(badUsers == 0, s"$badUsers users with wrong interval count")
    println("RECOVERY OK: zero lost, zero duplicate closed intervals " +
      s"across a mid-run kill at batch $killedAt")
    org.apache.spark.sql.GraftColumnBridge.stopStateStores()
    spark.stop()
  }
}
