package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.aggregators.PointStatsAgg
import graft.model.DataPoint

/** The typed Aggregator must agree with the untyped SQL aggregation and be
  * partitioning-independent. */
class TypedAggregatorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val pts = (0 until 5000).map(i =>
    DataPoint(i * 1000L, (i % 700) / 100.0, if (i % 2 == 0) "a" else "b"))

  test("typed aggregator equals the SQL aggregation per metric") {
    val typed = pts.toDS().groupByKey(_.metric)
      .agg(PointStatsAgg.toColumn.name("stats"))
      .collect().toMap
    import org.apache.spark.sql.functions._
    val sql = pts.toDS().toDF()
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min("timestamp").as("min_ts"), max("timestamp").as("max_ts"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    sql.foreach { case (k, (n, s, lo, hi)) =>
      val t = typed(k)
      assert(t.n == n && t.sum_value == s && t.min_ts == lo && t.max_ts == hi, k)
    }
  }

  test("result is independent of partitioning") {
    val a = pts.toDS().repartition(1).groupByKey(_.metric)
      .agg(PointStatsAgg.toColumn.name("s")).collect().toMap
    val b = pts.toDS().repartition(17).groupByKey(_.metric)
      .agg(PointStatsAgg.toColumn.name("s")).collect().toMap
    assert(a == b)
  }
}
