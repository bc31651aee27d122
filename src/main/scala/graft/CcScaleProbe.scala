package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only evidence probe for [[operators.Dedup.dedupClusters]]' BIG-graph
  * path — the distributed min-label + pointer-jumping loop that takes over
  * past the `DriverCcMaxEdges` (2 M) union-find guard and has so far only
  * been spec'd at toy size. Two closed-form workloads:
  *
  *  1. RING FIELD (volume): N nodes in rings of S — N edges, N/S
  *     components, and every node's cluster must be its ring's minimum
  *     id `(doc_id div S)·S`, checkable with one aggregate.
  *  2. CHAIN (depth): one path of C nodes — diameter C−1, the worst
  *     convergence case for label propagation; pointer jumping must
  *     close it in O(log C) rounds, not O(C).
  *
  * Prints wall clocks, the loop's round count (inferred from the
  * query-execution count via a listener would overfit; instead the probe
  * relies on the wall clock — a linear-round regression at C=1 M would
  * take hours and is unmissable) and `require`s both cluster outcomes.
  * Usage: `runMain graft.CcScaleProbe [nRingNodes] [ringSize] [chainLen]`
  * (defaults 20 M / 100 / 1 M). */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val s = args.lift(1).map(_.toLong).getOrElse(100L)
    val c = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // rings: node i ~ next-in-ring (base + (i−base+1) mod S)
    val rings = spark.range(n).select(
      col("id").as("doc_id_1"),
      ((col("id") / s).cast("long") * s +
        (col("id") % s + 1) % s).as("doc_id_2"))
    var t0 = System.nanoTime()
    // driverMaxEdges = 0 forces the distributed loop even for the chain
    // (whose 1 M edges would otherwise fall under the union-find guard)
    val ringBad = operators.Dedup.dedupClusters(rings, driverMaxEdges = 0L)
      .filter(col("cluster_id") =!= (col("doc_id") / s).cast("long") * s)
      .count()
    println(f"CCPROBE rings n=$n s=$s components=${n / s} " +
      f"wrong_labels=$ringBad wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")

    // chain: 0-1-2-…-(c−1); every node must land in cluster 0
    val chain = spark.range(c - 1).select(
      col("id").as("doc_id_1"), (col("id") + 1).as("doc_id_2"))
    t0 = System.nanoTime()
    val chainLabels = operators.Dedup.dedupClusters(chain, driverMaxEdges = 0L)
    val chainBad = chainLabels.filter(col("cluster_id") =!= 0L).count()
    val chainRows = chainLabels.count()
    println(f"CCPROBE chain len=$c wrong_labels=$chainBad " +
      f"rows=$chainRows wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    require(ringBad == 0L && chainBad == 0L && chainRows == c,
      s"CC diverged: ringBad=$ringBad chainBad=$chainBad rows=$chainRows")
    println("CCPROBE identical=true")
    spark.stop()
  }
}
