package graft

import org.apache.spark.sql.SparkSession

/** Dev-only isolated per-query probe: `Probe <sfDir> <reps> <q1,q2,…>`.
  * Runs each named [[SparkEntry.queries]] entry `reps` times in a fresh
  * warmed session and prints median/min/max — the only trustworthy
  * per-query signal on this throttling-prone host (round-5 evidence:
  * identical code measured 12× apart in back-to-back bench runs). */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, names) = args
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.sources.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    // dev pseudo-queries for pipeline-stage attribution
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "_pr_edges" -> ((s, dir) => graft.operators.Graph.customerSupplierEdges(
        graft.sources.Tables.orders(s, dir), graft.sources.Tables.lineitem(s, dir))),
      "_pr_iter0" -> ((s, dir) => graft.operators.Graph.pageRank(
        graft.operators.Graph.customerSupplierEdges(
          graft.sources.Tables.orders(s, dir), graft.sources.Tables.lineitem(s, dir)),
        iters = 0, damping = 0.85)),
      "_pr_iter1" -> ((s, dir) => graft.operators.Graph.pageRank(
        graft.operators.Graph.customerSupplierEdges(
          graft.sources.Tables.orders(s, dir), graft.sources.Tables.lineitem(s, dir)),
        iters = 1, damping = 0.85)),
      "_pr_iter2" -> ((s, dir) => graft.operators.Graph.pageRank(
        graft.operators.Graph.customerSupplierEdges(
          graft.sources.Tables.orders(s, dir), graft.sources.Tables.lineitem(s, dir)),
        iters = 2, damping = 0.85)),
      // r8 watch item: the co-purchase DISTINCT's hash-agg maps outgrow
      // L2 at sf10 (DRAM-latency knee). _dd_hash = the product path;
      // _dd_sort = sort-within-partition + dedup-consecutive (sequential
      // access, no giant map) — if it wins at sf10 the build flips
      "_dd_hash" -> ((s, dir) =>
        graft.operators.Graph.partCoPurchasePairs(
          graft.sources.Tables.lineitem(s, dir))),
      "_dd_sort" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val li = graft.sources.Tables.lineitem(s, dir)
        val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
        val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
        val pairs = a.join(b, Seq("k")).filter(col("u") < col("v"))
          .select(col("u"), col("v"))
        import s.implicits._
        pairs.repartition(col("u"), col("v"))
          .sortWithinPartitions(col("u"), col("v"))
          .as[(Long, Long)]
          .mapPartitions { it =>
            var last: (Long, Long) = null
            it.filter { p =>
              val fresh = last == null || p != last
              last = p
              fresh
            }
          }.toDF("u", "v")
      }))
    // "__order__" prints the bench Map-iteration order and exits — used to
    // reproduce bench-context anomalies (a query can measure 5× slower in
    // the bench than isolated purely from what ran before it).
    if (names == "__order__") {
      SparkEntry.queries.keys.zipWithIndex.foreach { case (k, i) =>
        println(s"ORDER $i $k")
      }
      spark.stop(); return
    }
    names.split(',').foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, extras(name))
      var rows = -1L
      val times = (0 until reps).map { _ =>
        // release only the rep's OWN leftovers (snapshot/delta, same
        // discipline as Bench) — reps share nothing, and pinned
        // leftovers at sf10 OOM the session before rep 2
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .foreach { case (id, rdd) =>
            if (!before.contains(id)) rdd.unpersist(blocking = false) }
        dt
      }.sorted
      println(f"PROBE $name%-24s median=${times(times.size / 2)}%.3f " +
        f"min=${times.head}%.3f max=${times.last}%.3f reps=$reps rows=$rows")
    }
    spark.stop()
  }
}
