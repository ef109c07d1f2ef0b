package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WatermarkClaims
import graft.streaming.WatermarkClaims._

class WatermarkSpec extends AnyFunSuite {

  test("combined watermark is min across partitions; absent claims block it") {
    val expected = Set("p0", "p1", "p2")
    var s = State.empty
    s = s.advance(Claim("p0", 100)).toOption.get
    s = s.advance(Claim("p1", 50)).toOption.get
    assert(s.combined(expected).isEmpty) // p2 never claimed
    s = s.advance(Claim("p2", 80)).toOption.get
    assert(s.combined(expected) == Some(50)) // weakest partition bounds
    s = s.advance(Claim("p1", 120)).toOption.get
    assert(s.combined(expected) == Some(80))
  }

  test("idle-partition exclusion: a stalled shard stops holding the watermark back") {
    val expected = Set("p0", "p1", "p2")
    var s = State.empty
    s = s.advance(Claim("p0", 100)).toOption.get
    s = s.advance(Claim("p1", 200)).toOption.get
    // p2 silent since t=0; p0/p1 heard recently
    val heard = Map("p0" -> 9_500L, "p1" -> 9_800L, "p2" -> 0L)
    // without exclusion the missing claim blocks everything
    assert(s.combined(expected).isEmpty)
    // with exclusion the idle shard is dropped from the min
    assert(combinedWithIdleExclusion(s, expected, heard, nowMs = 10_000L,
      idleAfterMs = 5_000L) == Some(100))
    // a live-but-unclaimed partition still blocks (no fabricated completeness)
    assert(combinedWithIdleExclusion(s, expected, heard + ("p2" -> 9_900L),
      nowMs = 10_000L, idleAfterMs = 5_000L).isEmpty)
    // everything idle → None, never a claim out of thin air
    assert(combinedWithIdleExclusion(s, expected, heard.view.mapValues(_ => 0L).toMap,
      nowMs = 10_000L, idleAfterMs = 5_000L).isEmpty)
    // zero wait is a contract error (reference law)
    intercept[IllegalArgumentException] {
      combinedWithIdleExclusion(s, expected, heard, 10_000L, idleAfterMs = 0L)
    }
  }

  test("claim regression is a violation; equal re-claims are fine") {
    val s = State.empty.advance(Claim("p0", 100)).toOption.get
    assert(s.advance(Claim("p0", 99)).isLeft)
    assert(s.advance(Claim("p0", 100)).isRight)
  }

  test("operator behavior: preserve / monotone transform / drop") {
    assert(through(Some(100L), Behavior.Preserve) == Some(100L))
    assert(through(Some(100L), Behavior.Transform(-10)) == Some(90L))
    assert(through(Some(100L), Behavior.Drop).isEmpty)
    assert(through(None, Behavior.Transform(5)).isEmpty)
  }

  test("settlement units: byte/op ceilings never split a transaction") {
    import graft.streaming.Settlement._
    val p = Policy(maxOps = 10, maxBytes = 1000)
    val txns = Seq(Txn(1, 4, 300), Txn(2, 4, 300), Txn(3, 4, 300),
      Txn(4, 50, 5000), // oversized: must be its own unit, never split
      Txn(5, 2, 100), Txn(6, 2, 100))
    val units = pack(txns, p)
    assert(validate(txns, units, p))
    assert(units(0) == Seq(Txn(1, 4, 300), Txn(2, 4, 300))) // 3rd would exceed ops? 12>10
    assert(units.exists(_.== (Seq(Txn(4, 50, 5000))))) // oversized alone
    // order preserved end-to-end
    assert(units.flatten.map(_.txId) == txns.map(_.txId))
    // commit order is a law
    intercept[IllegalArgumentException](pack(Seq(Txn(2, 1, 1), Txn(1, 1, 1)), p))
  }
}
