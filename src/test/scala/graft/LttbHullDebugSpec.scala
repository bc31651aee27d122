package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Minimal geometry checks for [[graft.functions.LttbHullFilter]]: the
  * filter must actually DROP strict-interior points (the property spec
  * asserts winners survive, which a no-op filter satisfies trivially —
  * this spec asserts the filtering itself). */
class LttbHullDebugSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hullOf(pts: Seq[(Long, Long, Double)]): Seq[(Long, Long)] = {
    val df = pts.toDF("ts_us", "event_id", "value")
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"),
        col("value"), col("ts_us").cast("decimal(38,0)").as("xd"),
        round(col("value") * 100).cast("decimal(38,0)").as("yd")))).as("pts"))
    df.select(GraftColumnBridge.column(graft.functions.LttbHullFilter(
        GraftColumnBridge.expression(col("pts")))).as("kept"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  test("strict-interior points are dropped, boundary and collinear kept") {
    // square (0,0)(0,100)(100,0)(100,100) + center (50,50): center drops
    val sq = hullOf(Seq((0L, 0L, 0.0), (0L, 1L, 1.0), (100L, 2L, 0.0),
      (100L, 3L, 1.0), (50L, 4L, 0.5)))
    assert(!sq.contains((50L, 4L)), s"center must drop, kept=$sq")
    assert(sq.size == 4, sq.toString)
    // collinear edge point on the boundary must SURVIVE (tie rule)
    val tri = hullOf(Seq((0L, 0L, 0.0), (50L, 1L, 0.5), (100L, 2L, 1.0),
      (50L, 3L, 0.0)))
    assert(tri.contains((50L, 1L)), s"collinear boundary point kept=$tri")
    // a dense interior cloud collapses to its boundary
    val rng = new scala.util.Random(5)
    val cloud = Seq((0L, 1000L, 0.0), (0L, 1001L, 50.0), (1000L, 1002L, 0.0),
      (1000L, 1003L, 50.0)) ++
      (0 until 500).map(i =>
        (100L + rng.nextInt(800).toLong, i.toLong, 5 + rng.nextInt(40) / 1.0))
    val keptCloud = hullOf(cloud)
    assert(keptCloud.size < cloud.size / 2,
      s"dense interior must collapse: kept ${keptCloud.size} of ${cloud.size}")
  }

  test("coincident duplicate positions: interior dups drop, boundary dups " +
      "all survive (the ScaleGen-replication regression)") {
    // every position duplicated 20x with distinct event_ids — the exact
    // shape of a ScaleGen-replicated stress set (ts and value unshifted
    // across copies). Duplicates used to stall the chain's pop loop
    // (consecutive equal entries → cross ≡ 0) and silently disable the
    // filter: hull_sizes at sf10 measured 9,999,990 of 9,999,990 kept.
    val base = Seq((0L, 0.0), (0L, 1.0), (100L, 0.0), (100L, 1.0),
      (50L, 0.5), (30L, 0.4), (70L, 0.6)) // square + 3 interior
    val dup = for {
      ((x, v), pi) <- base.zipWithIndex
      c <- 0 until 20
    } yield (x, (pi * 20 + c).toLong, v)
    val kept = hullOf(dup)
    // all 80 corner duplicates survive (ties need every copy), all 60
    // interior duplicates drop (strictly sub-max for every functional)
    assert(kept.size == 80, s"kept ${kept.size}: $kept")
    val interiorIds = dup.filter(p => p._3 == 0.5 || p._3 == 0.4 || p._3 == 0.6)
      .map(_._2).toSet
    assert(kept.forall(p => !interiorIds.contains(p._2)), kept.toString)
  }
}
