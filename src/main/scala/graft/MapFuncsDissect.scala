package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only dissection for the q_map_funcs growth trend (r9 verdict item
  * 2): runs variants with a stage-metrics listener and prints per-stage
  * task counts, run time, and GC time, plus a whole-stage-codegen on/off
  * A/B — the plan-level probes (`_mf_*` in [[Probe]]) localized the cost
  * to plans containing Generate over regex-derived values, which the
  * stage metrics here attribute. */
object MapFuncsDissect {
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
    @volatile var stages = List.empty[(Int, Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages ::= ((si.stageId, si.numTasks,
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime,
          si.name.take(60)))
      }
    })
    def run(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm JIT + code cache
      stages = Nil
      val t0 = System.nanoTime()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"DISSECT $tag%-22s wall=$dt%.3f rows=$n")
      stages.reverse.foreach { case (id, nt, rt, gc, nm) =>
        println(f"  stage=$id%-4d tasks=$nt%-3d runTime=${rt}ms gc=${gc}ms  $nm")
      }
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    run("map_funcs") {
      graft.functions.TextAnalysis.mapClassCounts(docs)
    }
    run("token_forced") {
      graft.functions.TextAnalysis.tokenCount(docs)
        .agg(sum(col("n_alpha") + col("n_num") + col("n_sym")).as("n"))
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    run("map_funcs_nowscg") {
      graft.functions.TextAnalysis.mapClassCounts(docs)
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    run("agg_then_explode") {
      graft.functions.TextAnalysis.tokenCount(docs)
        .groupBy(col("doc_id"))
        .agg(max(col("n_alpha")).as("n_alpha"), max(col("n_num")).as("n_num"),
          max(col("n_sym")).as("n_sym"))
        .select(col("doc_id"),
          explode(map(
            lit("alpha"), col("n_alpha"), lit("num"), col("n_num"),
            lit("sym"), col("n_sym"))))
    }
    run("split_agg") {
      graft.functions.TextAnalysis.tokenCount(docs)
        .repartition(32)
        .agg(sum(col("n_alpha") + col("n_num") + col("n_sym")).as("n"))
    }
    spark.stop()
  }
}
