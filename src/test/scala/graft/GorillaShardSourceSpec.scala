package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.gorilla.{GorillaCodec, GorillaShardSource}

/** DSv2 reader over the reference's own shard-file format: write files with
  * the byte-exact codec, read them back through spark.read, and check that
  * timestamp predicates prune whole shard files by name. */
class GorillaShardSourceSpec extends AnyFunSuite with SparkSpec {

  private val fmt = classOf[GorillaShardSource].getName

  test("codec round-trips random streams byte-exactly") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val pts = (0 until 200).map(i =>
        (1000L + i * 997L + rng.nextInt(50), rng.nextDouble() * 1000 - 500))
      assert(GorillaCodec.decode(GorillaCodec.encode(pts)) == pts)
    }
  }

  /** The reference's A1 fixture laid out exactly as its engine would:
    * one file per hour shard, named end-INCLUSIVE <start>-<start+3599999>.bin
    * (insight.cpp:11). */
  private def writeA1Store(): String = {
    val dir = Files.createTempDirectory("gorilla_store_").toString
    val shards = Map(
      0L -> Seq((1000L, 10.0), (2000L, 20.0)),
      1L -> Seq((3600000L, 30.0), (4000000L, 40.0)),
      2L -> Seq((8000000L, 50.0)))
    shards.foreach { case (h, pts) =>
      val start = h * 3600000L
      Files.write(Paths.get(dir, s"$start-${start + 3599999L}.bin"),
        GorillaCodec.encode(pts))
    }
    dir
  }

  test("ts==0 semantics match the reference reader/writer exactly") {
    // shard.cpp:35 keys raw-vs-DoD encoding off prev_timestamp==0, and
    // shard.cpp:52-54 drops a LEADING ts==0 point while still folding its
    // value into the XOR chain — the reference cannot store a ts==0 point.
    val withLeadingZero = Seq((0L, 42.0), (1000L, 10.0), (2000L, 20.0))
    assert(GorillaCodec.decode(GorillaCodec.encode(withLeadingZero)) ==
      Seq((1000L, 10.0), (2000L, 20.0)))
    // a mid-stream ts==0 point survives and resets the next point to raw
    // encoding (prev_timestamp==0 again), exactly like ShardWriter::append
    val withMidZero = Seq((5000L, 1.0), (0L, 2.0), (7000L, 3.0))
    assert(GorillaCodec.decode(GorillaCodec.encode(withMidZero)) == withMidZero)
  }

  test("spark.read over reference-format shard files returns all points") {
    val got = spark.read.format(fmt).load(writeA1Store())
      .orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1000L, 10.0), (2000L, 20.0), (3600000L, 30.0),
      (4000000L, 40.0), (8000000L, 50.0)))
  }

  test("inclusive range filter matches the reference's query semantics") {
    val df = spark.read.format(fmt).load(writeA1Store())
      .filter(col("timestamp").between(1500L, 3700000L))
    assert(df.orderBy("timestamp").collect().map(_.getLong(0)).toSeq ==
      Seq(2000L, 3600000L))
  }

  test("round-trip migration: Dataset -> reference shard files -> spark.read") {
    import spark.implicits._
    import graft.model.DataPoint
    val dir = Files.createTempDirectory("gorilla_rt_").toString
    // start at ts=2500, not 0: the reference format cannot represent a
    // leading ts==0 point (its reader drops it — see the ts==0 test above)
    val pts = (1 until 10001).map(i =>
      DataPoint(i * 2500L, math.sin(i / 30.0) * 100))
    graft.sources.gorilla.GorillaShardWriter.writeShards(pts.toDS(), dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.count() == pts.size)
    val got = back.orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == pts.map(p => (p.timestamp, p.value)))
  }

  test("column pruning reaches the scan (ts-only projection reads narrow rows)") {
    val df = spark.read.format(fmt).load(writeA1Store()).select("timestamp")
    assert(df.orderBy("timestamp").collect().map(_.getLong(0)).toSeq ==
      Seq(1000L, 2000L, 3600000L, 4000000L, 8000000L))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=timestamp"), scan)
    // and a value-only projection still decodes correctly
    val vals = spark.read.format(fmt).load(writeA1Store()).select("value")
    assert(vals.collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(10.0, 20.0, 30.0, 40.0, 50.0))
  }

  test("count(*) pushes into the scan as per-file partial counts") {
    val df = spark.read.format(fmt).load(writeA1Store()).groupBy().count()
    assert(df.head().getLong(0) == 5L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggs=count") || plan.contains("PushedAggregates"), plan)
    // a FILTERED count must NOT push (filters stay residual) and stays exact
    val filtered = spark.read.format(fmt).load(writeA1Store())
      .filter(col("timestamp") <= 3600000L).groupBy().count()
    assert(filtered.head().getLong(0) == 3L)
    assert(filtered.queryExecution.executedPlan.toString.contains("pushedAggs=none"))
  }

  test("min/max(timestamp) push into the scan and equal the unpushed plan") {
    val dir = writeA1Store()
    val pushed = spark.read.format(fmt).load(dir)
      .agg(min("timestamp").as("mn"), max("timestamp").as("mx"), count(lit(1)).as("n"))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggs=min_ts+max_ts+count") ||
      plan.contains("pushedAggs=count+min_ts+max_ts"), plan)
    val r = pushed.head()
    // the unpushed plan: same aggregates evaluated over the full row scan
    // (adding a residual filter true-for-all rows blocks the pushdown)
    val unpushed = spark.read.format(fmt).load(dir)
      .filter(col("timestamp") >= Long.MinValue + 1)
      .agg(min("timestamp").as("mn"), max("timestamp").as("mx"), count(lit(1)).as("n"))
    assert(unpushed.queryExecution.executedPlan.toString.contains("pushedAggs=none"))
    val u = unpushed.head()
    assert(r.getLong(0) == u.getLong(0) && r.getLong(1) == u.getLong(1) &&
      r.getLong(2) == u.getLong(2), s"pushed=$r unpushed=$u")
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1000L, 8000000L, 5L))
  }

  test("limit pushdown stops decoding per file and keeps results exact") {
    val dir = writeA1Store()
    val limited = spark.read.format(fmt).load(dir).limit(3)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=3"), plan)
    assert(limited.count() == 3)
    // values are a prefix-of-some-files subset of the full store
    val full = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val got = limited.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 3 && got.forall(full.contains))
    // a filtered limit must NOT push (filters stay residual above the scan)
    val filteredLimit = spark.read.format(fmt).load(dir)
      .filter(col("timestamp") > 1000L).limit(2)
    assert(filteredLimit.queryExecution.executedPlan.toString
      .contains("pushedLimit=none"))
    assert(filteredLimit.count() == 2)
  }

  test("pushed count+min/max stay exact over zero-point shard files") {
    val dir = Files.createTempDirectory("graft_gorilla_empty_").toString
    Files.write(Paths.get(dir, "0-3599999.bin"), Array.empty[Byte])
    // lone leading ts==0 point: decode drops it -> file has 0 points
    Files.write(Paths.get(dir, "3600000-7199999.bin"),
      GorillaCodec.encode(Seq((0L, 1.0))))
    val allEmpty = spark.read.format(fmt).load(dir)
      .agg(count(lit(1)).as("n"), min("timestamp").as("mn"), max("timestamp").as("mx"))
    val r = allEmpty.head()
    assert(r.getLong(0) == 0L, "count over an all-empty store must be 0, not null")
    assert(r.isNullAt(1) && r.isNullAt(2), "min/max over no points must be null")
    // a mixed store: empty files contribute nothing to min/max, 0 to count
    Files.write(Paths.get(dir, "7200000-10799999.bin"),
      GorillaCodec.encode(Seq((7300000L, 1.0), (7400000L, 2.0))))
    val mixed = spark.read.format(fmt).load(dir)
      .agg(count(lit(1)), min("timestamp"), max("timestamp")).head()
    assert(mixed.getLong(0) == 2L && mixed.getLong(1) == 7300000L &&
      mixed.getLong(2) == 7400000L)
  }

  test("min/max pushdown survives out-of-order points inside a shard") {
    // the reference appends out-of-order silently — stats must come from the
    // decoded stream, never the hour-boundary filename
    val dir = Files.createTempDirectory("graft_gorilla_ooo_").toString
    Files.write(Paths.get(dir, "3600000-7199999.bin"),
      GorillaCodec.encode(Seq((5000000L, 1.0), (3700000L, 2.0), (7100000L, 3.0))))
    val df = spark.read.format(fmt).load(dir)
      .agg(min("timestamp"), max("timestamp"))
    assert(df.queryExecution.executedPlan.toString.contains("pushedAggs=min_ts+max_ts"),
      "should push")
    assert(df.head() == org.apache.spark.sql.Row(3700000L, 7100000L))
  }

  test("timestamp predicates prune whole shard files by filename") {
    val dir = writeA1Store()
    // a shard entirely outside the predicate, filled with bytes that decode
    // to garbage values — if the scan read it, the count would change
    Files.write(Paths.get(dir, s"${36000000000L}-${36003599999L}.bin"),
      GorillaCodec.encode(Seq((36000000001L, 1.0), (36000000002L, 2.0))))
    val pruned = spark.read.format(fmt).load(dir)
      .filter(col("timestamp") <= 9000000L)
    assert(pruned.count() == 5)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("GorillaShardScan") || plan.contains("BatchScan"), plan)
  }
}
