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
}
