package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.DataPoint
import graft.operators.{Ingest, Snapshot}

/** The snapshot-manifest store: commit/read/compact/vacuum lifecycle,
  * the exact-rows-across-compaction guarantee, and the two-phase delete
  * (tombstones survive until vacuum; old generations stay readable). */
class SnapshotStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val hourMs = 3600000L
  private val baseMs = 1700000000000L - (1700000000000L % hourMs)

  private def points(n: Long, hour: Int, metric: String) =
    spark.range(n).select(
      (lit(baseMs + hour * hourMs) + col("id") % 3600000L).as("timestamp"),
      col("id").cast("double").as("value"),
      lit(metric).as("metric")).as[DataPoint]

  test("commit folds appended files in; read sees exactly the committed rows") {
    val store = Files.createTempDirectory("graft_snap1_").toString
    Ingest.ingestBatch(points(1000, 0, "cpu"), store)
    val g0 = Snapshot.commit(spark, store)
    assert(g0 == 0 && Snapshot.read(spark, store).count() == 1000)
    // uncommitted append is INVISIBLE to snapshot readers
    Ingest.ingestBatch(points(500, 1, "cpu"), store)
    assert(Snapshot.read(spark, store).count() == 1000)
    val g1 = Snapshot.commit(spark, store)
    assert(g1 == 1 && Snapshot.read(spark, store).count() == 1500)
    // partition column survives the explicit-file-list read
    assert(Snapshot.read(spark, store)
      .filter(col("shard_hour") === baseMs / hourMs).count() == 1000)
  }

  test("compaction preserves rows exactly, tombstones old files, and " +
      "old files stay on disk until vacuum") {
    val store = Files.createTempDirectory("graft_snap2_").toString
    (0 until 8).foreach(i => Ingest.ingestBatch(points(100, 0, s"m$i"), store))
    Ingest.ingestBatch(points(300, 1, "cpu"), store)
    Snapshot.commit(spark, store)
    val before = Snapshot.read(spark, store)
      .groupBy("metric").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val (_, live0, _) = Snapshot.latest(spark, store)
    val hour0 = live0.count(_.startsWith(s"shard_hour=${baseMs / hourMs}/"))
    assert(hour0 >= 8)
    Snapshot.compactShard(spark, store, baseMs / hourMs, targetFiles = 2)
    val (_, live1, dead1) = Snapshot.latest(spark, store)
    assert(live1.count(_.startsWith(s"shard_hour=${baseMs / hourMs}/")) == 2)
    assert(dead1.size == hour0)
    // tombstoned files still physically present (in-flight readers)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    dead1.foreach(f => assert(
      new java.io.File(s"$store/$f").exists(), s"tombstone $f deleted early"))
    val after = Snapshot.read(spark, store)
      .groupBy("metric").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before)
    // vacuum with zero grace deletes tombstones; reads unaffected
    val del = Snapshot.vacuum(spark, store, graceMs = 0L)
    assert(del == hour0.toLong, s"deleted $del of $hour0")
    dead1.foreach(f => assert(!new java.io.File(s"$store/$f").exists()))
    val (g2, _, dead2) = Snapshot.latest(spark, store)
    assert(dead2.isEmpty)
    assert(Snapshot.read(spark, store).groupBy("metric").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == before)
    // vacuum trims old generations but keeps the latest readable
    assert(g2 >= 2)
  }

  test("vacuum grace keeps young tombstones; manifest-free store falls " +
      "back to a directory read") {
    val store = Files.createTempDirectory("graft_snap3_").toString
    Ingest.ingestBatch(points(200, 0, "a"), store)
    Ingest.ingestBatch(points(200, 0, "b"), store)
    assert(Snapshot.read(spark, store).count() == 400) // no manifest yet
    Snapshot.commit(spark, store)
    Snapshot.compactShard(spark, store, baseMs / hourMs)
    val (_, _, dead) = Snapshot.latest(spark, store)
    assert(dead.nonEmpty)
    // freshly tombstoned files are inside any sane grace window
    assert(Snapshot.vacuum(spark, store, graceMs = 3600000L) == 0L)
    val (_, _, deadAfter) = Snapshot.latest(spark, store)
    assert(deadAfter.toSet == dead.toSet)
    assert(Snapshot.vacuum(spark, store, graceMs = 0L) == dead.size.toLong)
  }
}
