package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

/** Randomized property net for the as-of join — BOTH implementations
  * (union-tag + window composition, and the native LogicalPlan/Strategy/
  * SparkPlan operator) must equal a brute-force nested-loop model on
  * adversarial inputs: duplicate timestamps on both sides, duplicate
  * (key, ts) reference rows with different payloads (max-payload tiebreak),
  * keys missing from either side, and probes before any reference. */
class AsOfPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(23)

  private def randomCase(): (Seq[(Long, Long, Long)], Seq[(Long, Long, Double)]) = {
    // left: (key, ts, id); right: (key, ts, value) — small domains force
    // collisions (duplicate ts, duplicate (key, ts) with different values)
    val left = (1 to 60).map(i =>
      (1L + rng.nextInt(4), rng.nextInt(30).toLong, i.toLong))
    val right = (1 to 40).map(_ =>
      (1L + rng.nextInt(5), rng.nextInt(30).toLong,
        (rng.nextInt(9) + 1).toDouble))
    (left, right)
  }

  /** The semantic model: latest right at-or-before per key; among ties on
    * ts, the MAX payload (the engine's documented deterministic tiebreak). */
  private def brute(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Double)]): Set[(Long, Option[Long], Option[Double])] =
    left.map { case (k, ts, id) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      if (cands.isEmpty) (id, None, None)
      else {
        val best = cands.maxBy(r => (r._2, r._3))
        (id, Some(best._2), Some(best._3))
      }
    }.toSet

  /** Forward model: earliest right at-or-after; ties on ts -> MIN payload
    * (the forward operator's documented mirror tiebreak). */
  private def bruteForward(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Double)]): Set[(Long, Option[Long], Option[Double])] =
    left.map { case (k, ts, id) =>
      val cands = right.filter(r => r._1 == k && r._2 >= ts)
      if (cands.isEmpty) (id, None, None)
      else {
        val best = cands.minBy(r => (r._2, r._3))
        (id, Some(best._2), Some(best._3))
      }
    }.toSet

  /** Nearest model: smaller |Δts| of the two directional winners, exact
    * ties resolve backward. */
  private def bruteNearest(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Double)]): Set[(Long, Option[Long], Option[Double])] = {
    val b = brute(left, right).map(x => x._1 -> (x._2, x._3)).toMap
    val f = bruteForward(left, right).map(x => x._1 -> (x._2, x._3)).toMap
    left.map { case (_, ts, id) =>
      (b(id), f(id)) match {
        case ((Some(bt), bv), (Some(ft), fv)) =>
          if (ts - bt <= ft - ts) (id, Some(bt), bv) else (id, Some(ft), fv)
        case ((Some(bt), bv), (None, _)) => (id, Some(bt), bv)
        case ((None, _), (Some(ft), fv)) => (id, Some(ft), fv)
        case _ => (id, None, None)
      }
    }.toSet
  }

  private def runOp(op: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, Seq[(String, String)]) => org.apache.spark.sql.DataFrame,
      l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Double)]) =
    op(l.toDF("key", "ts", "id"), r.toDF("key", "ts", "value"), "key", "ts",
      Seq("ts" -> "m_ts", "value" -> "m_value"))
      .select(col("id"), col("m_ts"), col("m_value")).collect()
      .map(x => (x.getAs[Long]("id"),
        Option(x.getAs[Any]("m_ts")).map(_.asInstanceOf[Long]),
        Option(x.getAs[Any]("m_value")).map(_.asInstanceOf[Double]))).toSet

  test("forward and nearest as-of equal their brute-force models on random inputs") {
    (1 to 4).foreach { round =>
      val (l, r) = randomCase()
      assert(runOp(AsOfJoin.asOfForward, l, r) == bruteForward(l, r),
        s"forward diverged in round $round")
      assert(runOp(AsOfJoin.asOfNearest, l, r) == bruteNearest(l, r),
        s"nearest diverged in round $round")
    }
  }

  test("composed and native as-of equal the brute-force model on random inputs") {
    (1 to 4).foreach { round =>
      val (l, r) = randomCase()
      val want = brute(l, r)
      val leftDf = l.toDF("key", "ts", "id")
      val rightDf = r.toDF("key", "ts", "value")

      val composed = AsOfJoin.asOf(leftDf, rightDf, "key", "ts",
        Seq("ts" -> "m_ts", "value" -> "m_value"))
        .select(col("id"), col("m_ts"), col("m_value")).collect()
        .map(x => (x.getAs[Long]("id"), Option(x.getAs[Any]("m_ts")).map(_.asInstanceOf[Long]),
          Option(x.getAs[Any]("m_value")).map(_.asInstanceOf[Double]))).toSet
      assert(composed == want, s"composed diverged in round $round")

      val native = AsOfJoinNative.asOf(
        leftDf, rightDf.select(col("key").as("rkey"), col("ts").as("rts"),
          col("value").as("rvalue")),
        "key", "rkey", "ts", "rts")
        .select(col("id"), col("rts"), col("rvalue")).collect()
        .map(x => (x.getAs[Long]("id"), Option(x.getAs[Any]("rts")).map(_.asInstanceOf[Long]),
          Option(x.getAs[Any]("rvalue")).map(_.asInstanceOf[Double]))).toSet
      assert(native == want, s"native diverged in round $round")
    }
  }
}
