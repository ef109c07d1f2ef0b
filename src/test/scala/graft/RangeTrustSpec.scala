package graft

import org.apache.spark.sql.functions._

import graft.contract.{ContractPolicy, RowRule, TrustPreset, ValidationDepth, ValidationProgram}
import graft.operators.RangeJoin

class RangeTrustSpec extends SparkSpec {
  import spark.implicits._

  test("range join: boundary-exact bucketing, no duplicates, matches brute force") {
    val left = Seq((1L, "k", 100L), (2L, "k", 250L), (3L, "x", 100L)).toDF("lid", "k", "lt")
    val right = Seq(
      (10L, "k", 100L), (11L, "k", 199L), (12L, "k", 200L), // 200 = lt+window boundary
      (13L, "k", 260L), (14L, "x", 500L)).toDF("rid", "k", "rt")
    val got = RangeJoin.joinWithin(left, right, Seq("k"), "lt", "rt", windowUs = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val brute = left.join(right, "k")
      .filter(col("rt") >= col("lt") && col("rt") <= col("lt") + 100L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == brute)
    assert(got == Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 13L)))
  }

  test("trust presets bundle depth + escalation + drift defaults") {
    val rules = Seq(RowRule.Range("r", "qty", 0, 10))
    val raw = TrustPreset.policy(TrustPreset.Raw, rules)
    assert(raw.depth == ValidationDepth.Discovery && raw.fatalRules.isEmpty)
    val gov = TrustPreset.policy(TrustPreset.Governed, rules)
    assert(gov.depth == ValidationDepth.Full && gov.fatalRules.isEmpty)
    val cert = TrustPreset.policy(TrustPreset.Certified, rules)
    assert(cert.fatalRules == Set("r"))
    // certified: a violation is RejectBatch, not Quarantine
    val df = Seq((11.0, 1L)).toDF("qty", "id")
    val annotated = ValidationProgram.compile(cert).annotate(df)
    val disp = annotated.select(ValidationProgram.DispositionCol).as[String].head()
    assert(disp == "reject_batch")
    assert(TrustPreset.Certified.driftNewColumns == "reject_batch")
  }
}
