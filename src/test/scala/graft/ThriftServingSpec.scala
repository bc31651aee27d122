package graft

import java.sql.DriverManager

import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.funsuite.AnyFunSuite

/** Boots the documented serving surface (README "Serving"): Spark's
  * Thrift JDBC server started IN-PROCESS over the library's session, the
  * library's queries exposed as views, and a real `hive-jdbc` client
  * round-trip — the evidence that the reference's HTTP endpoint family
  * (api/main.py:47-102) maps onto stock Spark serving infrastructure
  * rather than bespoke code. Views are GLOBAL (global_temp) because a
  * JDBC connection gets its own Spark session; global temp views are the
  * cross-session publication mechanism.
  *
  * ONE server lifecycle for the whole suite: `HiveThriftServer2` keeps
  * static Hive state, so a second `startWithContext` in the same JVM
  * never binds — all JDBC assertions share the single boot. */
class ThriftServingSpec extends AnyFunSuite with SparkSpec {

  test("Thrift JDBC server answers library queries over hive-jdbc: " +
      "flagship view, registerViews(global) surface, aggregate + join") {
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    spark.conf.set("hive.server2.thrift.port", port.toString)
    // publish the flagship range scan exactly as a deployment would...
    SparkEntry.queries("q_range_scan")(spark, sf0001)
      .createOrReplaceGlobalTempView("q_range_scan")
    // ...and the WHOLE declared surface through the library call
    SparkEntry.registerViews(spark, sf0001, global = true)
    val published = spark.sql("SHOW VIEWS IN global_temp")
      .collect().map(_.getString(1)).toSet
    assert(SparkEntry.queries.keySet.subsetOf(published),
      s"missing views: ${SparkEntry.queries.keySet -- published}")
    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously — retry the connect briefly
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "graft", "")
        catch {
          case e: Exception if attempts < 60 =>
            attempts += 1; Thread.sleep(500)
          case e: Exception => throw e
        }
      }
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT * FROM global_temp.q_range_scan LIMIT 1")
        assert(rs.next(), "expected at least one served row")
        // the reference's GET /query returns (timestamp, value) pairs;
        // our served row carries the scan's (event_id, ts_us, value)
        assert(rs.getMetaData.getColumnCount >= 3)
        assert(!rs.next(), "LIMIT 1 must cap the result")
        // a full aggregate over a served operator view — the client
        // composes SQL over the library's plan, not a canned result
        val agg = st.executeQuery(
          "SELECT count(*) AS n, min(bucket_us) AS first_hour " +
            "FROM global_temp.q_downsample_1h")
        assert(agg.next() && agg.getLong(1) > 0,
          "served aggregate must see rows")
        // and a cross-view join, exercising two published plans at once
        val join = st.executeQuery(
          "SELECT count(*) AS n FROM global_temp.q_topk_hours t " +
            "JOIN global_temp.q_downsample_1h d ON t.bucket_us = d.bucket_us")
        assert(join.next() && join.getLong(1) > 0,
          "served cross-view join must see rows")
      } finally conn.close()
    } finally server.stop()
  }
}
