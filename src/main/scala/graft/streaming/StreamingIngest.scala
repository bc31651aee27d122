package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.ShardDurationMs

/** Structured-Streaming ingest — the durable write path the reference's
  * README *claims* (WAL + memtable, README.md:17-23) but never implements
  * (SURVEY.md §1.3): checkpointed exactly-once file-sink ingestion plays the
  * WAL role; watermarked tumbling windows reproduce the hour-shard
  * aggregation semantics on late/out-of-order data with a *defined* policy
  * (the reference silently appends out-of-order points, SURVEY.md §1.4).
  */
object StreamingIngest {

  /** Continuous ingest: stream a source directory of point files into the
    * hour-partitioned store with checkpointed (WAL) progress. */
  def ingestStream(spark: SparkSession, sourceDir: String, schema: StructType,
      storePath: String, checkpoint: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("shard_hour", floor(col("timestamp") / lit(ShardDurationMs)).cast("long"))
      .writeStream
      .partitionBy("shard_hour")
      .format("parquet")
      .option("path", storePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked tumbling 1-hour downsample over a streaming events frame
    * (`ts` timestamp, `value` double). Late rows beyond the watermark are
    * dropped — the defined late-data policy. Output: append mode per closed
    * window. */
  def downsampleStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        unix_micros(col("window.start")).as("bucket_us"),
        col("n_points"), col("sum_value"), col("min_value"), col("max_value"))
}
