package graft

/** Dev tool: print the formatted physical plan of declared queries —
  * `Explain <sfDir> <q1,q2,...> [exec]`. With `exec`, each query RUNS
  * first and the AQE-FINAL executed plan is printed instead of the
  * static one — the only way to see which join strategy AQE actually
  * picked at that data size. The plan-audit loop the scale notes call
  * for ("explain until it's the plan you'd want") without writing a
  * throwaway main each time. */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dir, names, exec) = args match {
      case Array(d, n)         => (d, n, false)
      case Array(d, n, "exec") => (d, n, true)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus, "graft-explain")
    // dev pseudo-queries (Probe's A/B twins) explainable by their
    // underscore names — currently just the r15 modularity twin
    val extras: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "_jp_window" -> ((s, d) =>
        graft.operators.Dedup.prefixJaccardPairsWindowed(
          graft.sources.Tables.documents(s, d), 3, 3, 10)),
      "_degree_dist_joined" -> ((s, d) =>
        graft.operators.Graph.degreeDistribution(
          graft.operators.Graph.partCoPurchasePairsJoined(
            graft.sources.Tables.lineitem(s, d)))),
      "_modularity_unshared" -> ((s, d) => {
        val pairs = graft.operators.Graph.partCoPurchasePairs(
          graft.sources.Tables.lineitem(s, d))
        graft.operators.Graph.modularity(pairs,
          graft.operators.Graph.labelPropagation(
            graft.operators.Graph.symmetricEdges(pairs), rounds = 2))
      }))
    names.split(",").foreach { q =>
      println(s"==== $q ====")
      val df = SparkEntry.queries.getOrElse(q.trim, extras(q.trim))(spark, dir)
      if (exec) {
        // drive THIS QueryExecution (df.count() builds its own, leaving
        // the printed plan unexecuted — isFinalPlan stays false and the
        // printed strategies are the STATIC guesses, not AQE's choices;
        // the r13 zone-map probe hit the identical trap)
        df.queryExecution.toRdd.count()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
