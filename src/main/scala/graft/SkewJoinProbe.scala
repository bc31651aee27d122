package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only skew-axis probe (r10): does AQE's skew-join splitting engage,
  * and what does it buy, on the hot-key join shape?
  *
  * `SkewJoinProbe <skewDir> [reps]`
  *
  * The shape: events (hot user holds ~99 % of rows at ScaleGen skew ×100)
  * joined to a per-user profile on user_id — many-to-one, so the join
  * output stays linear and the ONLY pathology is partition imbalance,
  * exactly what AQE skew splitting exists for. Broadcast is disabled
  * because this simulates the 100 TB shape where the user dim (hundreds
  * of millions of rows) exceeds any broadcast budget; at test scale the
  * 1.5 k-row dim would otherwise broadcast and hide the skew entirely.
  * The skew thresholds are scaled to the probe's bytes (8 MiB advisory /
  * 16 MiB skew threshold vs the 64 MiB / 256 MiB defaults) for the same
  * reason the broadcast is disabled: at 100 TB the hot partition crosses
  * the DEFAULT thresholds by orders of magnitude, while a 10 M-row local
  * probe sits under them — the RATIO hot/median is what's being probed,
  * and it is scale-invariant (99 % on one key). The aggregate on top
  * reuses the join's partitioning, so without a split the whole
  * sort+join+agg chain of the hot partition runs on ONE task.
  *
  * `SkewJoinProbe synth:<share> [reps] [rows]` (r11, advisor follow-up)
  * replaces the ScaleGen dir with a SYNTHETIC events frame whose hot key
  * holds exactly `share` of `rows` (rest uniform over 100 k keys) — the
  * knob that brackets the BREAK-EVEN region: share 0 (balanced — the
  * force must never fire), a hot partition just past the skew threshold
  * (the advisor's regression concern: the forced extra shuffle vs a
  * downstream agg that collapses cheaply), and the 99 % pathology. */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder(), cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.scheduler._
    val taskShuffleRead = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val taskRunTime = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          if (te.taskMetrics.shuffleReadMetrics != null)
            taskShuffleRead.add(te.taskMetrics.shuffleReadMetrics.totalBytesRead)
          taskRunTime.add(te.taskMetrics.executorRunTime)
        }
    })

    val events =
      if (dir.startsWith("synth:")) {
        val share = dir.stripPrefix("synth:").toDouble
        val n = if (args.length > 2) args(2).toLong else 10000000L
        val hot = (n * share).toLong
        spark.range(n).select(
          when(col("id") < hot, lit(0L))
            .otherwise(pmod(col("id"), lit(100000L)) + 1L).as("user_id"),
          (col("id") % 1000).cast("double").as("value"))
          // freeze the synthetic frame: the probe measures the join, not
          // a fused range generator
          .localCheckpoint()
      } else graft.sources.Tables.events(spark, dir)
        .select(col("user_id"), col("value"))
    val profile = events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_total"), max(col("value")).as("max_value"))
      .localCheckpoint() // freeze the dim; we are probing the join below

    // keyagg: groupBy the JOIN KEY on top — reuses the join's hash
    // partitioning, which (finding) makes AQE REFUSE the skew split
    // unless forceOptimizeSkewedJoin accepts the extra shuffle.
    // globalagg: a consumer with no distribution requirement — AQE is
    // free to split.
    def joined(): DataFrame = events.join(profile, Seq("user_id"))
    def keyagg(): DataFrame = joined()
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("s"),
        max(col("n_total")).as("n_total"))
    def globalagg(): DataFrame = joined()
      .agg(sum(col("value").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))

    val allModes = Seq(
      ("keyagg_skew_on",   "true",  "false", () => keyagg()),
      ("keyagg_skew_off",  "false", "false", () => keyagg()),
      ("keyagg_forced",    "true",  "true",  () => keyagg()),
      ("globalagg_skew_on","true",  "false", () => globalagg()),
      ("globalagg_skew_off","false","false", () => globalagg()))
    // SKEWJOIN_MODES=tag1,tag2 selects AND orders the modes — the knob
    // that separates a position effect (first mode pays JIT/warmup) from
    // a conf effect when a single mode looks pathological.
    val modes = sys.env.get("SKEWJOIN_MODES") match {
      case Some(sel) => sel.split(",").toSeq
        .map(t => allModes.find(_._1 == t.trim)
          .getOrElse(sys.error(s"unknown mode $t")))
      case None => allModes
    }
    // Two untimed warmup executions: the first plan in a fresh JVM pays
    // codegen compilation + C2 JIT of the whole shuffle/agg path —
    // measured 15-40× on this box (the r11 position-vs-mode experiment:
    // whichever mode ran FIRST was pathological, on BALANCED data).
    modes.headOption.foreach { case (_, on, force, join) =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
      join().collect(); join().collect()
    }
    // Interleaved round-robin: rep i runs EVERY mode before rep i+1, so
    // slow-VM noise windows (wall swings 1-8 s on identical work here)
    // hit all modes alike instead of whichever mode-block they land on.
    import scala.jdk.CollectionConverters._
    val walls = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (0 until reps).foreach { _ =>
      modes.foreach { case (tag, on, force, join) =>
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
        taskShuffleRead.clear(); taskRunTime.clear()
        val t0 = System.nanoTime()
        val df = join()
        val out = df.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val xs = taskShuffleRead.asScala.toArray.filter(_ > 0).sorted
        val rt = taskRunTime.asScala.toArray.sorted
        val p50 = if (xs.nonEmpty) xs(xs.length / 2) else 0L
        val mx = if (xs.nonEmpty) xs.last else 0L
        val rtMax = if (rt.nonEmpty) rt.last else 0L
        val rtSum = rt.sum
        val plan = df.queryExecution.executedPlan.toString
        val skewed = plan.contains("skewed")
        println(f"SKEWJOIN $tag wall=$dt%.3f rows=${out.length} " +
          f"shuffleTasks=${xs.length} p50read=${p50 / 1024}KiB " +
          f"maxread=${mx / 1024 / 1024}MiB " +
          f"taskTimeMax=${rtMax}ms taskTimeSum=${rtSum}ms " +
          f"aqe_skew_split=$skewed")
        walls(tag) = walls(tag) :+ dt
      }
    }
    modes.foreach { case (tag, _, _, _) =>
      val w = walls(tag).sorted
      println(f"SKEWJOIN $tag median=${w(w.size / 2)}%.3f min=${w.head}%.3f")
    }
    if (sys.env.contains("SKEWJOIN_PLAN")) modes.foreach { case (tag, on, force, join) =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
      val df = join(); df.collect()
      println(s"SKEWJOIN plan $tag\n" +
        df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
