package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only hot-SERIES skew probe for the r12 blocked window family —
  * the batch twin of [[StreamSkewProbe]]: measures the plain
  * single-window forms against the `*Adaptive` dispatchers (which pick
  * the blocked decompositions at this distribution) on a generated
  * events table where ONE series holds 99 % of rows.
  *
  * The plain forms put the hot series in ONE window partition (one
  * task); the blocked forms bound partitions by (series, block) —
  * hot-series parallelism = block count. Outputs are bit-identical
  * (OperatorInvariantsSpec); this probe measures the WALL-CLOCK trade
  * at skew, rows-equality double-checked per pair on rep 1.
  *
  * Usage: `SeriesSkewProbe [nRows] [reps]` (default 10M, 3).
  * Deterministic: `spark.range`, fixed epoch; hot rows span 30 days so
  * the default 1 h block gives ~720-way hot parallelism.
  */
object SeriesSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft_seriesskew_").toString
    val baseUs = 1700000000000000L
    val spanUs = 30L * 86400L * 1000000L // 30 days
    val hotN = (n * 99L) / 100L
    val cold = n - hotN
    // hot series: hotN rows spread over the span; cold: 100 series
    // sharing the remaining 1 %, same span. value has 2 decimals.
    spark.range(hotN).select(
      lit("hot").as("event_type"),
      col("id").as("event_id"),
      timestamp_micros(lit(baseUs) + col("id") * (spanUs / hotN)).as("ts"),
      (round(rand(42) * 10000) / 100.0).as("value"),
      (col("id") % 1000L).as("user_id"))
      .union(spark.range(cold).select(
        concat(lit("s"), col("id") % 100L).as("event_type"),
        (col("id") + hotN).as("event_id"),
        timestamp_micros(lit(baseUs) + col("id") * (spanUs / cold)).as("ts"),
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
    val share = graft.operators.TimeSeries.sampledMaxKeyShare(
      graft.sources.Tables.events(spark, dir), "event_type", 0.01)
    println(f"SERIESSKEW n=$n hot_share=$share%.3f (dispatch goes blocked at >= 0.2)")
    println("SERIESSKEW op                      plain_min_s  adaptive_min_s  speedup  rows_equal")
    pairs.foreach { case (plain, adaptive) =>
      def time(q: String): Double =
        (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
      // warm both plans once, then equality (cheap vs the timed reps)
      val a = SparkEntry.queries(plain)(spark, dir)
      val b = SparkEntry.queries(adaptive)(spark, dir)
      val equal = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      val tp = time(plain)
      val ta = time(adaptive)
      println(f"SERIESSKEW ${plain.stripPrefix("q_")}%-22s $tp%11.2f $ta%15.2f " +
        f"${tp / ta}%8.2f  $equal")
      assert(equal, s"$plain vs $adaptive rows differ at skew")
    }
    spark.stop()
  }
}
