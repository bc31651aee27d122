package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.DataPoint
import graft.operators.Ingest
import graft.streaming.StreamingIngest

/** Streaming parity: the checkpointed streaming ingest and the watermarked
  * tumbling downsample must agree with their batch equivalents on the same
  * data (SURVEY.md §2.2 streaming row).
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val points =
    (0 until 5000).map(i => DataPoint(i * 3000L, 50.0 + 20.0 * math.sin(i / 100.0)))

  test("streaming ingest lands the same rows as batch ingest, hour-partitioned") {
    val src = Files.createTempDirectory("graft_stream_src_").toString
    val store = Files.createTempDirectory("graft_stream_store_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    points.toDS().toDF().write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val q = StreamingIngest.ingestStream(spark, src, schema, store, ckpt)
    q.awaitTermination(120000)

    val got = spark.read.parquet(store)
    assert(got.count() == points.size)
    assert(got.select("shard_hour").distinct().count() ==
      points.map(_.timestamp / 3600000L).distinct.size)
    // restart with no new data: checkpoint prevents duplicate ingestion
    val q2 = StreamingIngest.ingestStream(spark, src, schema, store, ckpt)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(store).count() == points.size)
  }

  test("watermarked streaming downsample equals the batch aggregation") {
    val src = Files.createTempDirectory("graft_stream_agg_").toString
    points.toDS().toDF()
      .select(timestamp_millis(col("timestamp")).as("ts"), col("value"))
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val streamed = StreamingIngest.downsampleStream(
      spark.readStream.schema(schema).parquet(src))
    val qname = "downsample_out"
    val q = streamed.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table(qname)
    val want = spark.read.parquet(src)
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
