package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only hot-SERIES skew probe for the blocked window family —
  * the batch twin of [[StreamSkewProbe]]: measures the plain
  * single-window forms against the `*Adaptive` dispatchers (which pick
  * the COUNT-blocked decompositions at these distributions) on
  * generated events tables where ONE series holds 99 % of rows, along
  * two DENSITY axes:
  *
  *   - `spread`: hot rows span 30 days (the r12 shape — any blocking
  *     scheme parallelizes it);
  *   - `burst`:  hot rows all land inside ONE HOUR (the r12 verdict's
  *     carried gap — a TIME-blocked form with the default 1 h block
  *     would re-serialize the entire hot series onto one task; the r13
  *     count-block family must stay flat because its blocks are cut by
  *     row index, not wall-clock).
  *
  * The plain forms put the hot series in ONE window partition (one
  * task); the blocked forms bound partitions by (series, block) —
  * hot-series parallelism = ceil(rows / blockRows). Outputs are
  * bit-identical (OperatorInvariantsSpec); this probe measures the
  * WALL-CLOCK trade at skew, rows-equality double-checked per pair on
  * rep 1.
  *
  * Usage: `SeriesSkewProbe [nRows] [reps]` (default 10M, 3).
  * Deterministic: `spark.range`, fixed epoch.
  */
object SeriesSkewProbe {
  /** Collects successful task durations; the MAX SINGLE TASK is the
    * bounded-max-task evidence the burst axis exists to show: the
    * plain window's hot fold is one task ≈ the whole hot series, the
    * blocked forms' largest task is ~one block whatever the density. */
  private final class MaxTask extends org.apache.spark.scheduler.SparkListener {
    private var mx = 0L
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        if (t.taskInfo != null && t.taskInfo.successful)
          mx = math.max(mx, t.taskInfo.duration)
      }
    def drainMs(): Long = synchronized { val v = mx; mx = 0L; v }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val axisFilter = args.lift(2).getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val maxTask = new MaxTask
    spark.sparkContext.addSparkListener(maxTask)

    val baseUs = 1700000000000000L
    val coldSpanUs = 30L * 86400L * 1000000L // 30 days
    val hotN = (n * 99L) / 100L
    val cold = n - hotN

    def gen(dir: String, hotSpanUs: Long): Unit =
      spark.range(hotN).select(
        lit("hot").as("event_type"),
        col("id").as("event_id"),
        timestamp_micros(lit(baseUs) + col("id") * (hotSpanUs / hotN)).as("ts"),
        (round(rand(42) * 10000) / 100.0).as("value"),
        (col("id") % 1000L).as("user_id"))
        .union(spark.range(cold).select(
          concat(lit("s"), col("id") % 100L).as("event_type"),
          (col("id") + hotN).as("event_id"),
          timestamp_micros(lit(baseUs) + col("id") * (coldSpanUs / cold)).as("ts"),
          (round(rand(43) * 10000) / 100.0).as("value"),
          (col("id") % 1000L).as("user_id")))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val pairs = Seq(
      "q_window_delta" -> "q_window_delta_adaptive",
      "q_moving_avg" -> "q_moving_avg_adaptive",
      "q_counter_rate" -> "q_counter_rate_adaptive",
      "q_cumsum" -> "q_cumsum_adaptive",
      "q_time_weighted_avg" -> "q_time_weighted_avg_adaptive",
      "q_availability" -> "q_availability_adaptive")

    for ((axis, hotSpanUs) <- Seq(
        "spread" -> coldSpanUs,
        "burst" -> 3600000000L)
        if axisFilter == "all" || axisFilter == axis) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_seriesskew_${axis}_").toString
      gen(dir, hotSpanUs)
      val (share, hotRows, hotHour) =
        graft.operators.TimeSeries.sampledKeyDensityStats(
          graft.sources.Tables.events(spark, dir), "event_type", 0.01)
      val dispatch = graft.operators.TimeSeries.blockDispatch(
        graft.sources.Tables.events(spark, dir), "event_type",
        262144L, 0.01, 0.2)
      println(f"SERIESSKEW axis=$axis n=$n hot_share=$share%.3f " +
        f"est_hot_rows=${hotRows}%.0f densest_hour=${hotHour}%.0f " +
        s"dispatch=$dispatch (expect Time on spread, Count on burst)")
      println("SERIESSKEW op                      plain_min_s  adaptive_min_s  speedup  plain_maxtask_s  adaptive_maxtask_s  rows_equal")
      pairs.foreach { case (plain, adaptive) =>
        // release each pair's leftover localCheckpoints (the count-block
        // plans pin a ~10 M-row checkpoint per construction; without
        // this the 4th+ op runs under eviction churn and its max task
        // reads as a straggler, not as the operator) — the Bench
        // delta-unpersist pattern
        val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
        // (min wall over reps, max single task over the same reps) —
        // the max task is the scale-safety number: it bounds what ONE
        // core must fold however big the run, so it, not the 10 M wall
        // tie, is what survives a 100× scale-up
        def time(q: String): (Double, Double) = {
          maxTask.drainMs()
          val wall = (0 until reps).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }.min
          Thread.sleep(1000) // let the async listener bus drain task events
          (wall, maxTask.drainMs() / 1e3)
        }
        // warm both plans once, then equality (cheap vs the timed reps)
        val a = SparkEntry.queries(plain)(spark, dir)
        val b = SparkEntry.queries(adaptive)(spark, dir)
        val equal = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
        maxTask.drainMs() // the equality pass is not evidence
        val (tp, mp) = time(plain)
        val (ta, ma) = time(adaptive)
        println(f"SERIESSKEW [$axis] ${plain.stripPrefix("q_")}%-22s " +
          f"$tp%11.2f $ta%15.2f ${tp / ta}%8.2f $mp%16.2f $ma%19.2f  $equal")
        assert(equal, s"$plain vs $adaptive rows differ at skew ($axis)")
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!pinnedBefore.contains(id)) rdd.unpersist(blocking = false) }
      }
    }
    spark.stop()
  }
}
