package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full pushdown:
  * column pruning and predicate pushdown reach the vectorized parquet scan
  * (check `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The time-series core table (plays the reference's DataPoint stream role).
    *
    * The parquet file stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader only accepts as a raw nanosecond Long
    * (`spark.sql.legacy.parquet.nanosAsLong`). We floor-divide nanos→micros —
    * the same truncation DuckDB applies when it reads nanos into its
    * microsecond TIMESTAMP — so both engines see identical instants. The
    * result is session-TZ TimestampType; with spark.sql.session.timeZone=UTC
    * the wall clock matches DuckDB's naive reading.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // keep the raw nanos column: predicates on the PHYSICAL column push
        // down to parquet row-group stats, predicates on the derived
        // timestamp expression do not (see TimeSeries.rangeScan)
        raw.select(col("*"), col("ts").as("ts_ns"))
          // integer `div`, not `/`: nanos ~1.7e18 exceeds double's 2^53 exactness
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast(TimestampType))

  def orders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast(TimestampType))

  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
