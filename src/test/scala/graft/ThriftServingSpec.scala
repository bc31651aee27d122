package graft

import java.sql.DriverManager

import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.funsuite.AnyFunSuite

/** Boots the documented serving surface (README "Serving"): Spark's
  * Thrift JDBC server started IN-PROCESS over the library's session, a
  * library query exposed as a view, and a real `hive-jdbc` client
  * round-trip — the evidence that the reference's HTTP endpoint family
  * (api/main.py:47-102) maps onto stock Spark serving infrastructure
  * rather than bespoke code. The view is GLOBAL (global_temp) because a
  * JDBC connection gets its own Spark session; global temp views are the
  * cross-session publication mechanism. */
class ThriftServingSpec extends AnyFunSuite with SparkSpec {

  test("Thrift JDBC server answers a library query over hive-jdbc") {
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    spark.conf.set("hive.server2.thrift.port", port.toString)
    // publish the flagship range scan exactly as a deployment would
    SparkEntry.queries("q_range_scan")(spark, sf0001)
      .createOrReplaceGlobalTempView("q_range_scan")
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
        val rs = conn.createStatement()
          .executeQuery("SELECT * FROM global_temp.q_range_scan LIMIT 1")
        assert(rs.next(), "expected at least one served row")
        // the reference's GET /query returns (timestamp, value) pairs;
        // our served row carries the scan's (event_id, ts_us, value)
        assert(rs.getMetaData.getColumnCount >= 3)
        assert(!rs.next(), "LIMIT 1 must cap the result")
      } finally conn.close()
    } finally server.stop()
  }
}
