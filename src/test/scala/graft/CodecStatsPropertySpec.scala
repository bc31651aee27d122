package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.gorilla.GorillaCodec

/** Property net for the timestamp-only stats sweep backing the DSv2
  * MIN/MAX/COUNT pushdown: on ANY encoded stream — including the codec's
  * ts==0 quirks (raw re-encode after a zero timestamp, leading-zero drop)
  * and out-of-order appends — `tsStats` must agree exactly with the stats
  * derived from the full `decode`. */
class CodecStatsPropertySpec extends AnyFunSuite {

  private def check(pts: Seq[(Long, Double)]): Unit = {
    val bytes = GorillaCodec.encode(pts)
    val decoded = GorillaCodec.decode(bytes)
    val (n, mn, mx) = GorillaCodec.tsStats(bytes)
    assert(n == decoded.length.toLong, s"count mismatch on $pts")
    if (decoded.nonEmpty) {
      assert(mn == decoded.map(_._1).min, s"min mismatch on $pts")
      assert(mx == decoded.map(_._1).max, s"max mismatch on $pts")
    }
  }

  test("tsStats == decode-derived stats on random streams") {
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = rng.nextInt(50)
      val pts = (0 until n).map { _ =>
        val ts = rng.nextInt(5) match {
          case 0 => 0L // exercise the ts==0 raw-encode path
          case 1 => rng.nextLong(1000L) // small, collision-prone
          case _ => math.abs(rng.nextLong()) % 10_000_000_000L
        }
        (ts, rng.nextDouble() * 100 - 50)
      }
      check(pts)
    }
  }

  test("tsStats edge cases: empty, single, leading zero, all zeros, descending") {
    check(Seq.empty)
    check(Seq((42L, 1.0)))
    check(Seq((0L, 1.0), (5L, 2.0))) // leading ts==0 dropped by decode
    check(Seq((0L, 1.0), (0L, 2.0), (0L, 3.0)))
    check(Seq((100L, 1.0), (50L, 2.0), (10L, 3.0))) // out-of-order appends
    check(Seq((5L, 1.0), (0L, 2.0), (7L, 3.0))) // mid-stream zero resets DoD
  }
}
