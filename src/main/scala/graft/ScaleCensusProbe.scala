package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only evidence probe for the wedge census PAST the old 500 M-edge
  * driver-literal bloom ceiling: builds a synthetic circulant graph
  * C_N(1, 2, 50, 90) — node i ~ i±1, i±2, i±50, i±90 mod N;
  * degree-8-regular, 4N edges. The id-tie-broken orientation generates
  * 6 wedges per apex (pairs over out-neighbors {i+1, i+2, i+50, i+90}),
  * of which exactly ONE closes — the only additive identity inside the
  * offset set is 1+1=2, so triangles = N exactly (closed-form
  * `require`) and 5 of 6 wedges are non-closing, giving the bloom real
  * rows to drop (the earlier C_N(1,2,3) variant closed EVERY wedge and
  * measured nothing). Builds
  * the census ONCE, probes the closing edges three ways — full-budget
  * bloom (fpp 0.01), degraded bloom forced to a quarter budget
  * (fpp ≈ 0.32), and plain semi-join — under a listener summing every
  * stage's shuffle WRITE bytes. `System.gc()` between configs lets the
  * ContextCleaner reclaim each config's dereferenced shuffle files.
  * Usage: `SPARK_DRIVER_MEM=64g … runMain graft.ScaleCensusProbe
  * [nNodes]` (default 150 M nodes = 600 M edges, 900 M wedges). */
object ScaleCensusProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(150000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // wedge-sized shuffles at this scale are ~20 GB: 32 partitions
      // would be ~700 MB each, so run the probe at 256 (1024 for the
      // 1 B-edge run: the closing probe's shuffle_hash BUILD side is
      // edges/partitions rows per task and cannot spill — 256 parts at
      // 1 B edges is ~4 M rows/task and OOMs the contended execution
      // pool; partition count is exactly the knob a real cluster turns)
      // and let AQE coalesce the small stages back down
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALECENSUS_PARTS", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the r8 1 B-edge attempt died on local scratch (~90 GB vs 78
      // free): localCheckpoint blocks are UNCOMPRESSED by default
      // (spark.rdd.compress=false) and everything else is lz4 — zstd
      // the whole scratch path (blocks, shuffle, spill) for the probe
      .config("spark.rdd.compress", "true")
      .config("spark.io.compression.codec", "zstd")
      // r10 envelope fix: the 1-in-3 OOM at 32 thr/64 g is AQE
      // re-coalescing the 1024-partition build down toward DEFAULT
      // PARALLELISM (parallelismFirst=true, the default): stage 8 (the
      // oriented-edge degree joins) landed at 45 tasks × ~1.98 GB peak
      // sort memory = 63 GB concurrent demand vs the ~38 GB execution
      // pool — UnsafeExternalRowSorter's pointer-array growth then
      // catches the pool at zero mid-GCLocker and aborts instead of
      // spilling. zstd makes it worse: AQE coalesces on COMPRESSED
      // bytes (~111 MB/task) that decompress to ~2 GB in sort memory.
      // parallelismFirst=false + a 32 MB advisory keeps the build at
      // byte-sized tasks (~150+ partitions), per-task peak ~0.6 GB,
      // 32-thread demand ~19 GB — inside the pool with margin.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SCALECENSUS_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SCALECENSUS_ADVISORY", "32m"))
      // the 1 B-edge bloom's hash-prefix shards total ~1.2 GB on the
      // driver before torrent broadcast — above the 1 GiB default cap
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val debug = sys.env.contains("SCALECENSUS_DEBUG")
    // scratch high-water mark: sample the tmp filesystem's free space —
    // high-water = max observed (initial − free) across the run
    val tmpFile = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val freeAtStart = tmpFile.getUsableSpace
    @volatile var scratchHighWater = 0L
    val sampler = new Thread(() => {
      while (true) {
        val used = freeAtStart - tmpFile.getUsableSpace
        if (used > scratchHighWater) scratchHighWater = used
        Thread.sleep(5000)
      }
    })
    sampler.setDaemon(true); sampler.start()
    @volatile var shuffleWrite = 0L
    // r10 envelope attribution: peakExecutionMemory is the stage's
    // ACCUMULATED per-task execution-memory peak — the number that,
    // summed over concurrently running tasks, has to fit the execution
    // pool. Track the top stages so an OOM (or a near-miss) names its
    // stage instead of being folklore.
    val memTop = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val b = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleWrite += b
        memTop.add((s.stageInfo.stageId, s.stageInfo.numTasks,
          s.stageInfo.taskMetrics.peakExecutionMemory,
          b, s.stageInfo.details.linesIterator.toSeq.headOption.getOrElse("")))
        if (debug && b > 0)
          println(f"SCALECENSUS   stage=${s.stageInfo.stageId}%4d " +
            f"write=${b / 1e6}%10.1f MB  ${s.stageInfo.name.take(80)}")
      }
    })
    def printMemTop(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val top = memTop.asScala.toSeq.sortBy(-_._3).take(5)
      top.foreach { case (id, nt, pm, sw, _) =>
        println(f"SCALECENSUS memtop[$tag] stage=$id%4d tasks=$nt%4d " +
          f"peakExecMemSum=${pm / 1e9}%6.2f GB shuffleWrite=${sw / 1e6}%8.1f MB")
      }
      memTop.clear()
    }

    // circulant C_N(offsets): unordered pairs {i, (i+k) mod N} — degree
    // 2|K| regular, so the census wedge BOUND / edges ratio is exactly
    // 2|K|−1: SCALECENSUS_OFFSETS dials the graph across the
    // WedgeEdgeRatioGate for the break-even measurement (r10). Closed
    // form: each triangle {i, i+a, i+c} anchors at its minimal vertex,
    // so triangles = N · #{(a,c) : a < c, a,c ∈ K, c−a ∈ K}.
    val offsets = sys.env.getOrElse("SCALECENSUS_OFFSETS", "1,2,50,90")
      .split(',').map(_.trim.toLong).toSeq
    require(offsets.distinct.size == offsets.size && offsets.forall(_ > 0))
    val triPerNode = (for {
      a <- offsets; c <- offsets
      if a < c && offsets.contains(c - a)
    } yield 1).size
    println(s"SCALECENSUS offsets=${offsets.mkString(",")} " +
      s"degree=${2 * offsets.size} bound_ratio=${2 * offsets.size - 1} " +
      s"tri_per_node=$triPerNode")
    val pairs = spark.range(n)
      .select(col("id"),
        explode(array(offsets.map(lit): _*)).as("k"))
      .select(col("id").as("a"), ((col("id") + col("k")) % n).as("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
    val t0 = System.nanoTime()
    val cen = operators.Graph.wedgeCensus(pairs)
    val nEdges = cen.oriented.count()
    println(f"SCALECENSUS nodes=$n oriented_edges=$nEdges " +
      f"census_build=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    printMemTop("build")

    def run(label: String, maxBloomEdges: Long): Long = {
      shuffleWrite = 0L
      val t = System.nanoTime()
      val df = operators.Graph.closedWedges(cen,
        maxBloomEdges = maxBloomEdges, minBloomWedges = 0L)
      val tri = df.count()
      Thread.sleep(2000) // let the listener bus drain the final stages
      if (debug)
        println(s"SCALECENSUS plan[$label]:\n" +
          df.queryExecution.executedPlan.toString.take(4000))
      println(f"SCALECENSUS $label%-8s triangles=$tri%12d " +
        f"shuffle_write=${shuffleWrite / 1e6}%10.1f MB " +
        f"wall=${(System.nanoTime() - t) / 1e9}%7.2f s")
      printMemTop(label)
      // the config's frames are dereferenced here — GC hands their
      // shuffle files to the ContextCleaner before the next config
      System.gc(); Thread.sleep(3000)
      tri
    }
    // configs via args(1), comma-separated
    val configs = args.lift(1).getOrElse("bloom,degraded,plain").split(',')
    val got = configs.map {
      case "bloom"    => run("bloom", Long.MaxValue)
      case "degraded" => run("degraded", nEdges / 4L) // fpp ~0.32
      case "plain"    => run("plain", 0L)
      case other      => sys.error(s"unknown config $other")
    }
    // closed-form oracle: N · triPerNode triangles (for the default
    // C_N(1,2,50,90) the only additive identity is 1+1=2 → N), so every
    // config is checked without a reference run
    require(got.forall(_ == n * triPerNode),
      s"triangle counts wrong: ${configs.zip(got).toSeq} " +
        s"expected=${n * triPerNode}")
    println(f"SCALECENSUS identical=true " +
      f"scratch_high_water=${scratchHighWater / 1e9}%.1f GB")
    spark.stop()
  }
}
