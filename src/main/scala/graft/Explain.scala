package graft

/** Dev tool: print the formatted physical plan of declared queries —
  * `Explain <sfDir> <q1,q2,...>`. The plan-audit loop the scale notes
  * call for ("explain until it's the plan you'd want") without writing
  * a throwaway main each time. */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(dir, names) = args
    val spark = GraftSession.local(8, "graft-explain")
    names.split(",").foreach { q =>
      println(s"==== $q ====")
      SparkEntry.queries(q.trim)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
