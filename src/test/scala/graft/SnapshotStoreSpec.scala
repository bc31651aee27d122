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
    dead1.foreach(t => assert(
      new java.io.File(s"$store/${t.path}").exists(),
      s"tombstone ${t.path} deleted early"))
    val after = Snapshot.read(spark, store)
      .groupBy("metric").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before)
    // vacuum with zero grace deletes tombstones; reads unaffected
    val del = Snapshot.vacuum(spark, store, graceMs = 0L)
    assert(del == hour0.toLong, s"deleted $del of $hour0")
    dead1.foreach(t => assert(!new java.io.File(s"$store/${t.path}").exists()))
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

  test("the DEFAULT read path is manifest-aware: Ingest.readPoints and " +
      "queryRange stay exact through the compact-without-vacuum window") {
    val store = Files.createTempDirectory("graft_snap4_").toString
    (0 until 6).foreach(i => Ingest.ingestBatch(points(500, 0, s"m$i"), store))
    Ingest.ingestBatch(points(700, 1, "cpu"), store)
    Snapshot.commit(spark, store)
    val total = 6 * 500 + 700
    assert(Ingest.readPoints(spark, store).count() == total)
    Snapshot.compactShard(spark, store, baseMs / hourMs)
    // old + compacted files coexist on disk NOW — the r10 trap window.
    // A plain directory read would double-count hour 0; the Ingest entry
    // points must not.
    assert(spark.read.parquet(store).count() > total,
      "fixture failed to create the double-count window")
    assert(Ingest.readPoints(spark, store).count() == total)
    val q = Ingest.queryRange(spark, store, baseMs, baseMs + hourMs - 1,
      cap = 10000)
    assert(q.count() == 3000) // exactly hour 0's rows, once each
    // q_range_scan shape: values exact, no duplicated points
    assert(q.groupBy("timestamp", "metric").count()
      .filter(col("count") > 1).count() == 0)
    Snapshot.vacuum(spark, store, graceMs = 0L)
    assert(Ingest.readPoints(spark, store).count() == total)
  }

  test("destructive plain-path lifecycle ops refuse to run on a " +
      "manifest-managed store") {
    val store = Files.createTempDirectory("graft_snap5_").toString
    Ingest.ingestBatch(points(100, 0, "cpu"), store)
    // manifest-free: plain compaction is fine
    Ingest.compactShard(spark, store, baseMs / hourMs)
    Snapshot.commit(spark, store)
    intercept[IllegalArgumentException] {
      Ingest.compactShard(spark, store, baseMs / hourMs)
    }
    intercept[IllegalArgumentException] {
      Ingest.expireShards(spark, store, baseMs / hourMs + 100)
    }
    intercept[IllegalArgumentException] {
      Ingest.deleteRange(spark, store, baseMs, baseMs + 10)
    }
    intercept[IllegalArgumentException] {
      Ingest.upsertPoints(spark, store, points(1, 0, "cpu"))
    }
    // the snapshot equivalents still work
    Snapshot.compactShard(spark, store, baseMs / hourMs)
    assert(Ingest.readPoints(spark, store).count() == 100)
  }

  test("vacuum grace runs from TOMBSTONE time, not file mtime: " +
      "long-lived files compacted away survive the grace window") {
    val store = Files.createTempDirectory("graft_snap6_").toString
    Ingest.ingestBatch(points(100, 0, "a"), store)
    Ingest.ingestBatch(points(100, 0, "b"), store)
    Snapshot.commit(spark, store)
    // age the data files: written "100 days ago" as far as mtime shows
    val (_, live, _) = Snapshot.latest(spark, store)
    val past = System.currentTimeMillis() - 100L * 86400000L
    live.foreach { f =>
      assert(new java.io.File(s"$store/$f").setLastModified(past))
    }
    Snapshot.compactShard(spark, store, baseMs / hourMs)
    // mtime-based grace would delete these instantly (the r10 advisor
    // finding); tombstone-time grace keeps them for the full hour
    assert(Snapshot.vacuum(spark, store, graceMs = 3600000L) == 0L)
    val (_, _, dead) = Snapshot.latest(spark, store)
    assert(dead.nonEmpty)
    dead.foreach(t => assert(new java.io.File(s"$store/${t.path}").exists()))
    assert(Snapshot.read(spark, store).count() == 200)
  }

  test("a pinned reader holds its generation across vacuum; closing the " +
      "lease releases it") {
    val store = Files.createTempDirectory("graft_snap7_").toString
    (0 until 4).foreach(i => Ingest.ingestBatch(points(250, 0, s"m$i"), store))
    Snapshot.commit(spark, store)
    val (pinnedDf, lease) = Snapshot.pin(spark, store)
    Snapshot.compactShard(spark, store, baseMs / hourMs)
    // zero grace, but the lease floor retains every file the pinned plan
    // can touch (tombstone gen > lease gen)
    assert(Snapshot.vacuum(spark, store, graceMs = 0L) == 0L)
    // the long reader completes correctly AFTER the vacuum attempt
    assert(pinnedDf.count() == 1000)
    lease.close()
    val (_, _, dead) = Snapshot.latest(spark, store)
    assert(Snapshot.vacuum(spark, store, graceMs = 0L) == dead.size.toLong)
    assert(Snapshot.read(spark, store).count() == 1000)
  }

  test("expired leases stop blocking vacuum (crashed-reader TTL)") {
    val store = Files.createTempDirectory("graft_snap8_").toString
    Ingest.ingestBatch(points(100, 0, "a"), store)
    Ingest.ingestBatch(points(100, 0, "b"), store)
    Snapshot.commit(spark, store)
    val (_, lease) = Snapshot.pin(spark, store)
    Snapshot.compactShard(spark, store, baseMs / hourMs)
    assert(Snapshot.vacuum(spark, store, graceMs = 0L) == 0L) // pinned
    // crash the reader: the lease file goes stale instead of closed
    val leaseFile = new java.io.File(s"$store/${Snapshot.ManifestDir}")
      .listFiles().find(_.getName.startsWith("lease-")).get
    assert(leaseFile.setLastModified(System.currentTimeMillis() - 7200000L))
    val (_, _, dead) = Snapshot.latest(spark, store)
    assert(Snapshot.vacuum(spark, store, graceMs = 0L,
      leaseTtlMs = 3600000L) == dead.size.toLong)
    assert(!leaseFile.exists(), "expired lease not cleaned up")
    lease.close() // no-op on the already-deleted file
  }

  test("ingestCommitted commits exactly its own files: a torn earlier " +
      "write's orphan is quarantined, not adopted") {
    val store = Files.createTempDirectory("graft_snap9_").toString
    val g0 = Snapshot.ingestCommitted(points(400, 0, "cpu"), store)
    assert(g0 == 0 && Snapshot.read(spark, store).count() == 400)
    // simulate a torn write: a task file promoted into the partition dir
    // by a job that died before its commit ever ran
    val hourDir = new java.io.File(s"$store/shard_hour=${baseMs / hourMs}")
    val donor = hourDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val orphan = new java.io.File(hourDir, "part-torn-orphan.parquet")
    java.nio.file.Files.copy(donor.toPath, orphan.toPath)
    // the next exact-list ingest must NOT fold the orphan in
    Snapshot.ingestCommitted(points(300, 1, "cpu"), store)
    assert(Snapshot.read(spark, store).count() == 700)
    assert(Ingest.readPoints(spark, store).count() == 700)
    // adopt-everything commit() is the explicit opt-in that takes it
    Snapshot.commit(spark, store)
    assert(Snapshot.read(spark, store).count() > 700)
  }
}
