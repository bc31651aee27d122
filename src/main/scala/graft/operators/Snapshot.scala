package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot isolation for the hour-partitioned store — the minimal
  * manifest log that makes SERVE-WHILE-COMPACT safe on a plain
  * filesystem (r10; the ServingUnderWriteProbe demonstrated concurrent
  * readers dying with FILE_NOT_EXIST the instant [[Ingest.compactShard]]
  * rename-swapped a shard under them — the documented maintenance-window
  * caveat, now measured instead of declared).
  *
  * Design (a Delta/Iceberg log scoped to exactly what the probe needs):
  *  - `_graft_manifest/m<gen>` files, one per commit, written via
  *    temp + rename-to-fresh-name (atomic on POSIX AND object-store
  *    semantics — no overwrite anywhere). Readers list the dir, take the
  *    max gen, and plan over exactly that file list (`basePath` keeps
  *    the `shard_hour` partition column). A reader never observes a
  *    half-commit: it sees gen N or gen N+1, never in between.
  *  - a manifest line is `live <relpath>` or `dead <relpath>`:
  *    compaction REPLACES an hour's live set with the compacted files
  *    and TOMBSTONES the old ones instead of deleting — in-flight
  *    queries planned against gen N keep reading files that still
  *    exist. [[vacuum]] physically deletes tombstones later (grace =
  *    longer than any query's lifetime), the same two-phase delete
  *    every transactional table format uses.
  *  - appends stay plain parquet appends: [[commit]] folds
  *    (directory − known live − known dead) in as new live files, so
  *    the writer needs no knowledge of the part-file names its write
  *    produced.
  * Single concurrent committer assumed (the store's existing
  * pause-writers contract); readers are unlimited. */
object Snapshot {
  val ManifestDir = "_graft_manifest"

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestGens(fs: FileSystem, root: String): Seq[(Long, Path)] = {
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.startsWith("m"))
      .flatMap(st => st.getPath.getName.stripPrefix("m").toLongOption
        .map(g => (g, st.getPath)))
      .sortBy(_._1)
  }

  /** (gen, live, dead) of the latest manifest; gen −1 when none. */
  def latest(spark: SparkSession, root: String): (Long, Seq[String], Seq[String]) = {
    val fs = fsFor(spark, root)
    manifestGens(fs, root).lastOption match {
      case None => (-1L, Seq.empty, Seq.empty)
      case Some((gen, p)) =>
        val in = fs.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toVector finally in.close()
        (gen,
          lines.collect { case l if l.startsWith("live ") => l.drop(5) },
          lines.collect { case l if l.startsWith("dead ") => l.drop(5) })
    }
  }

  private def listDataFiles(fs: FileSystem, root: String): Seq[String] = {
    val base = new Path(root)
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard_hour="))
      .flatMap { dir =>
        fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => s"${dir.getPath.getName}/${f.getPath.getName}")
      }
  }

  private def writeManifest(fs: FileSystem, root: String, gen: Long,
      live: Seq[String], dead: Seq[String]): Unit = {
    val dir = new Path(root, ManifestDir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val outS = fs.create(tmp, false)
    try {
      val body = (live.sorted.map("live " + _) ++ dead.sorted.map("dead " + _))
        .mkString("", "\n", "\n")
      outS.write(body.getBytes("UTF-8"))
    } finally outS.close()
    val target = new Path(dir, s"m$gen")
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest commit lost the race for gen $gen (concurrent committer?)")
    }
  }

  /** Fold any new directory files into the live set and commit gen+1.
    * Returns the committed generation. */
  def commit(spark: SparkSession, root: String): Long = {
    val fs = fsFor(spark, root)
    val (gen, live, dead) = latest(spark, root)
    val known = live.toSet ++ dead.toSet
    val added = listDataFiles(fs, root).filterNot(known)
    val next = gen + 1
    writeManifest(fs, root, next, live ++ added, dead)
    next
  }

  /** Snapshot read of the latest committed generation (falls back to a
    * plain directory read when the store has no manifest). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (gen, live, _) = latest(spark, root)
    if (gen < 0) spark.read.parquet(root)
    else if (live.isEmpty)
      spark.read.parquet(root).limit(0)
    else spark.read.option("basePath", root)
      .parquet(live.map(f => s"$root/$f"): _*)
  }

  /** Snapshot-safe shard compaction: write the hour's compacted files
    * ALONGSIDE the old ones (no rename swap), then commit a manifest
    * that swaps the hour's live set and tombstones the replaced files.
    * Readers planned before the commit keep reading the old files,
    * which stay on disk until [[vacuum]]. */
  def compactShard(spark: SparkSession, root: String, shardHour: Long,
      targetFiles: Int = 1): Long = {
    val fs = fsFor(spark, root)
    val (gen, live, dead) = latest(spark, root)
    require(gen >= 0, s"no manifest at $root — commit() before compacting")
    val prefix = s"shard_hour=$shardHour/"
    val hourOld = live.filter(_.startsWith(prefix))
    require(hourOld.nonEmpty, s"no live files for shard_hour=$shardHour")
    val tmp = new Path(root, s".compact_snap_${shardHour}_${java.util.UUID.randomUUID()}")
    spark.read.option("basePath", root)
      .parquet(hourOld.map(f => s"$root/$f"): _*)
      .drop("shard_hour")
      .repartition(targetFiles).sortWithinPartitions(col("timestamp"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.writer.version", "v2")
      .parquet(tmp.toString)
    val partDir = new Path(root, s"shard_hour=$shardHour")
    val moved = fs.listStatus(tmp).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val name = s"compact-$shardHour-${java.util.UUID.randomUUID()}.parquet"
        require(fs.rename(f.getPath, new Path(partDir, name)),
          s"could not move ${f.getPath} into $partDir")
        s"shard_hour=$shardHour/$name"
      }
    fs.delete(tmp, true)
    val next = gen + 1
    writeManifest(fs, root, next,
      live.filterNot(_.startsWith(prefix)) ++ moved,
      dead ++ hourOld)
    next
  }

  /** Physically delete tombstoned files older than `graceMs` (grace must
    * exceed the longest query lifetime — in-flight plans may still hold
    * the previous generation's list) and trim old manifests, keeping the
    * last `keepManifests`. Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, root: String, graceMs: Long = 0L,
      keepManifests: Int = 3): Long = {
    val fs = fsFor(spark, root)
    val (gen, live, dead) = latest(spark, root)
    require(gen >= 0, s"no manifest at $root")
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0L
    val remaining = dead.filter { f =>
      val p = new Path(root, f)
      if (!fs.exists(p)) false // already gone: drop the tombstone
      else if (fs.getFileStatus(p).getModificationTime <= cutoff) {
        fs.delete(p, false); deleted += 1; false
      } else true // inside grace: keep the tombstone for next vacuum
    }
    writeManifest(fs, root, gen + 1, live, remaining)
    manifestGens(fs, root).dropRight(keepManifests)
      .foreach { case (_, p) => fs.delete(p, false) }
    deleted
  }
}
