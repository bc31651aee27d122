package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only evidence probe for the wedge-census bloom prefilter: runs the
  * closing-edge probe over the part co-purchase graph three ways — bloom
  * at full 1 % fpp (broadcast `graft_bloom_might_contain`), bloom
  * DEGRADED to a quarter of the edge budget (fpp ≈ 0.32 — the over-budget
  * regime where the bits stay fixed and the fpp rises), and plain
  * (shuffle_hash semi-join only) — under a listener that sums every
  * stage's shuffle WRITE bytes, and prints each total plus the triangle
  * count (which must be identical across all three: the bloom is a
  * prefilter, the exact semi-join kills its false positives). Usage:
  * `BloomShuffleProbe <sfDir>`. */
object BloomShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(listener)

    def run(label: String, maxBloomEdges: Long): Long = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      shuffleWrite = 0L
      val t0 = System.nanoTime()
      val cen = operators.Graph.wedgeCensus(
        operators.Graph.partCoPurchasePairs(
          sources.Tables.lineitem(spark, sfDir)))
      val tri = operators.Graph.closedWedges(cen,
        maxBloomEdges = maxBloomEdges, minBloomWedges = 0L).count()
      Thread.sleep(2000) // let the listener bus drain the final stages
      println(f"BLOOMPROBE $label%-8s triangles=$tri%12d " +
        f"shuffle_write=${shuffleWrite / 1e6}%10.1f MB " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")
      tri
    }
    val nEdges = operators.Graph.wedgeCensus(
      operators.Graph.partCoPurchasePairs(
        sources.Tables.lineitem(spark, sfDir))).oriented.count()
    println(s"BLOOMPROBE oriented_edges=$nEdges")
    val a = run("bloom", Long.MaxValue)
    val d = run("degraded", math.max(1L, nEdges / 4L)) // fpp ~0.32
    val b = run("plain", 0L)
    require(a == b && d == b,
      s"triangle counts diverged: bloom=$a degraded=$d plain=$b")
    println("BLOOMPROBE identical=true")
    spark.stop()
  }
}
