package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The native custom operator (AsOfJoinPlan/Strategy/Exec) must plan through
  * the injected strategy and agree row-for-row with the compositional
  * union+window formulation. */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkSpec {

  private def native = SparkEntry.queries("q_asof_native")(spark, sf0001)
  private def composed = SparkEntry.queries("q_asof_join")(spark, sf0001)

  test("physical plan uses AsOfJoinExec with EnsureRequirements-injected sort") {
    val plan = native.queryExecution.executedPlan.toString
    // SparkPlan nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort ["), "children should be sorted for the merge")
    assert(plan.contains("Exchange hashpartitioning(user_id"),
      "EnsureRequirements should cluster both sides on the key")
  }

  test("native as-of equals the union+window formulation row-for-row") {
    assert(native.count() > 0)
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
  }

  test("left rows with no match carry nulls (user with no prior errors)") {
    val ev = Tables.events(spark, sf0001)
    // synthesize: purchases before ANY error for some user must yield null
    val firstErr = ev.filter(col("event_type") === "error")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("first_err_us"))
    val unmatched = native.join(firstErr, Seq("user_id"), "left")
      .filter(col("ts_us") < col("first_err_us") || col("first_err_us").isNull)
    assert(unmatched.filter(col("err_ts_us").isNotNull).count() == 0)
  }
}
