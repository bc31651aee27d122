package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Regression: a matched right row whose payload VALUE is null must be
  * carried as null — not skipped in favor of a stale older row — and all
  * payload fields must come from the same right row. */
class AsOfJoinNullPayloadSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("null payload value on the matched row is carried, not skipped") {
    val left = Seq((1L, 25L)).toDF("key", "ts")
    val right = Seq(
      (1L, 10L, Some(5.0)),
      (1L, 20L, None: Option[Double])).toDF("key", "ts", "payload")
    val out = AsOfJoin.asOf(left, right, "key", "ts",
      Seq("ts" -> "m_ts", "payload" -> "m_payload")).collect().head
    assert(out.getAs[Long]("m_ts") == 20L, "must match the ts=20 row")
    assert(out.isNullAt(out.fieldIndex("m_payload")),
      "matched row's null payload must be carried as null, not the stale 5.0")
  }

  test("payload fields always come from the same right row") {
    val left = Seq((1L, 100L)).toDF("key", "ts")
    val right = Seq(
      (1L, 10L, Some(1.0)),
      (1L, 50L, None: Option[Double])).toDF("key", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "key", "ts",
      Seq("ts" -> "m_ts", "v" -> "m_v")).collect().head
    assert(out.getAs[Long]("m_ts") == 50L && out.isNullAt(out.fieldIndex("m_v")),
      "m_ts and m_v must both come from the ts=50 row")
  }

  test("left row before any right row carries a fully-null payload") {
    val left = Seq((1L, 5L)).toDF("key", "ts")
    val right = Seq((1L, 10L, 1.0)).toDF("key", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "key", "ts",
      Seq("ts" -> "m_ts", "v" -> "m_v")).collect().head
    assert(out.isNullAt(out.fieldIndex("m_ts")) && out.isNullAt(out.fieldIndex("m_v")))
  }

  test("non-orderable (map) payload columns still join — tiebreak falls away") {
    // a map<,> payload cannot enter the window ORDER BY: the operator must
    // drop the deterministic-duplicate tiebreak rather than fail analysis
    val left = Seq((1L, 25L)).toDF("key", "ts")
    val right = Seq((1L, 10L, Map("a" -> 1.0)))
      .toDF("key", "ts", "attrs")
    val out = AsOfJoin.asOf(left, right, "key", "ts",
      Seq("ts" -> "m_ts", "attrs" -> "m_attrs")).collect().head
    assert(out.getAs[Long]("m_ts") == 10L)
    assert(out.getAs[Map[String, Double]]("m_attrs") == Map("a" -> 1.0))
  }
}
