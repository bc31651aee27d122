package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.DataPoint
import graft.operators.Ingest
import graft.sources.gorilla.GorillaShardSource

/** The switch-over story end-to-end: a user of the reference engine points
  * this library at their existing `.bin` shard store, migrates it into the
  * hour-partitioned parquet store with one statement, and every range query
  * answers identically before, during, and after — plus the reverse
  * direction, so stores stay interoperable both ways. */
class MigrationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val fmt = classOf[GorillaShardSource].getName

  private val pts = (0 until 5000).map(i =>
    DataPoint(1000L + i * 2500L, 50.0 + 20.0 * math.sin(i / 100.0)))

  test("bin store -> parquet store migration answers range queries identically") {
    val binStore = Files.createTempDirectory("graft_mig_bin_").toString
    val pqStore = Files.createTempDirectory("graft_mig_pq_").toString
    // the reference's own on-disk layout, written by the reverse-migration
    // writer (end-inclusive shard names the reference engine reconstructs)
    graft.sources.gorilla.GorillaShardWriter.writeShards(pts.toDS(), binStore)

    // ONE statement migrates: DSv2 read of the .bin shards -> typed points
    // -> hour-partitioned parquet ingest
    val binPoints = spark.read.format(fmt).load(binStore)
      .select(col("timestamp"), col("value"), lit("default").as("metric"))
      .as[DataPoint]
    Ingest.ingestBatch(binPoints, pqStore)

    // the same inclusive range queries answer identically from both stores
    val ranges = Seq((0L, 20000000L), (1000L, 1000L), (3600000L, 7200000L),
      (0L, Long.MaxValue / 2))
    ranges.foreach { case (s, e) =>
      val fromBin = spark.read.format(fmt).load(binStore)
        .filter(col("timestamp").between(s, e))
        .orderBy("timestamp").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val fromPq = Ingest.queryRange(spark, pqStore, s, e, Int.MaxValue)
        .collect().map(r => (r.getAs[Long]("timestamp"), r.getAs[Double]("value")))
      assert(fromBin.toSeq == fromPq.toSeq, s"range [$s, $e] diverged")
    }
    // total row parity
    assert(spark.read.format(fmt).load(binStore).count() ==
      spark.read.parquet(pqStore).count())
  }

  test("round trip parquet -> bin -> parquet preserves every point") {
    val pqStore = Files.createTempDirectory("graft_rt_pq_").toString
    val binStore = Files.createTempDirectory("graft_rt_bin_").toString
    Ingest.ingestBatch(pts.toDS(), pqStore)
    val back = Ingest.readPoints(spark, pqStore)
      .select(col("timestamp"), col("value"), col("metric")).as[DataPoint]
    graft.sources.gorilla.GorillaShardWriter.writeShards(back, binStore)
    val got = spark.read.format(fmt).load(binStore)
      .orderBy("timestamp").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == pts.sortBy(_.timestamp).map(p => (p.timestamp, p.value)))
  }
}
