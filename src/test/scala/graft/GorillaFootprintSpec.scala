package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries
import graft.sources.Tables

/** Golden test: the relational Gorilla-size oracle must equal an
  * independent, direct Scala transcription of the reference codec's byte
  * accounting (delta-of-delta + zigzag + XOR + LEB128 varint,
  * /root/reference/engine/shard.cpp:107-126) on every hour shard. */
class GorillaFootprintSpec extends AnyFunSuite with SparkSpec {

  private def varintLen(x: Long): Long = {
    var v = x; var n = 1L
    while ((v & ~0x7FL) != 0L) { v = v >>> 7; n += 1 }
    n
  }
  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)

  /** Direct reimplementation of the writer's size bookkeeping. */
  private def goldenBytes(stream: Seq[(Long, Double)]): Long = {
    var prevTs = 0L; var prevDelta = 0L; var prevBits = 0L
    var first = true; var bytes = 0L
    stream.foreach { case (ts, v) =>
      if (first) { bytes += varintLen(ts); first = false }
      else {
        val delta = ts - prevTs
        bytes += varintLen(zigzag(delta - prevDelta))
        prevDelta = delta
      }
      prevTs = ts
      val bits = java.lang.Double.doubleToRawLongBits(v)
      bytes += varintLen(bits ^ prevBits)
      prevBits = bits
    }
    bytes
  }

  test("relational footprint equals the direct codec transcription on every shard") {
    val got = TimeSeries.gorillaFootprint(Tables.events(spark, sf0001))
      .collect().map(r => r.getAs[Long]("shard_hour") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("gorilla_bytes")))).toMap

    val rows = Tables.events(spark, sf0001)
      .select(col("event_id"), (unix_micros(col("ts")) / 1000).cast("long").as("ts_ms"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = rows
      .groupBy(_._2 / 3600000L)
      .map { case (shard, pts) =>
        val stream = pts.sortBy(p => (p._2, p._1)).map(p => (p._2, p._3)).toSeq
        shard -> (pts.length.toLong, goldenBytes(stream))
      }

    assert(got.keySet == want.keySet)
    want.foreach { case (shard, (n, bytes)) =>
      assert(got(shard) == ((n, bytes)), s"shard $shard mismatch")
    }
    // the split streams must partition the total exactly
    TimeSeries.gorillaFootprint(Tables.events(spark, sf0001))
      .collect().foreach { r =>
        assert(r.getAs[Long]("ts_bytes") + r.getAs[Long]("value_bytes") ==
          r.getAs[Long]("gorilla_bytes"))
      }
  }

  test("relational footprint equals the ACTUAL encoded byte length per shard") {
    val rows = Tables.events(spark, sf0001)
      .select(col("event_id"), (unix_micros(col("ts")) / 1000).cast("long").as("ts_ms"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val encoded = rows.groupBy(_._2 / 3600000L).map { case (shard, pts) =>
      val stream = pts.sortBy(p => (p._2, p._1)).map(p => (p._2, p._3)).toSeq
      shard -> graft.sources.gorilla.GorillaCodec.encode(stream).length.toLong
    }
    val got = TimeSeries.gorillaFootprint(Tables.events(spark, sf0001))
      .collect().map(r => r.getAs[Long]("shard_hour") ->
        r.getAs[Long]("gorilla_bytes")).toMap
    assert(got == encoded)
  }

  test("bytes/point on the reference's workload is in the Gorilla ballpark") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val pts = (0 until 50000).map(i => (
      i.toLong,
      1664632800000L + i * 1000L,
      50.0 + 20.0 * math.sin(i / 100.0) + (rng.nextDouble() * 2.0 - 1.0)))
    val df = pts.toDF("event_id", "ts_ms_in", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms_in"))).drop("ts_ms_in")
    val total = TimeSeries.gorillaFootprint(df)
      .agg(sum("gorilla_bytes"), sum("n_points")).head()
    val bpp = total.getLong(0).toDouble / total.getLong(1)
    // reference reports ~8.2 B/pt for this generator (README.md:99)
    assert(bpp > 6.0 && bpp < 11.0, s"bytes/point=$bpp")
  }
}
